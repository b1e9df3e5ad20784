package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{EventOps, Lww}
import graft.recon.Reconciler
import graft.streaming.StreamOps

/** Second CDC pack: the §2 operators not covered by [[CdcQueries]] —
  * J1 conflict-check lookup join with T6 annotation, J3 job↔mismatch
  * hydration, U1 per-key set diff, session windows (batch form), and a
  * per-language n-gram profile.
  */
object Cdc2Queries {

  /** LWW state SQL over an arbitrary WHERE. */
  private def lwwSql(where: String): String =
    s"""(SELECT user_id, event_id, ts_us, event_type, value_cents FROM (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
       |         CAST(round(value*100, 0) AS BIGINT) AS value_cents,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
       |  FROM events WHERE $where) WHERE rn = 1)""".stripMargin.replace("\n", " ")

  private def lwwState(s: SparkSession, dir: String, pred: org.apache.spark.sql.Column): DataFrame = {
    val base = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("ts_us"), col("event_type"),
      EventOps.cents(col("value")).as("value_cents"))
    Lww.latestPerKey(base.filter(pred), Seq("user_id"), Seq(col("ts_us"), col("event_id")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 + T6: per-key conflict-check join of an incoming state against a
    // target, annotated with the reference's _conflict_resolution struct.
    "cdc_conflict_annotate" -> ((s, dir) => {
      val incoming = lwwState(s, dir, col("event_id") % 2 === 0)
      val target = lwwState(s, dir, col("event_id") % 2 =!= 0)
      Lww.resolveAgainstTarget(incoming, target, "user_id", "ts_us", "event_id")
        .select(
          col("user_id"), col("event_id"), col("ts_us"),
          col("_conflict_resolution.was_accepted").as("was_accepted"),
          col("_conflict_resolution.had_conflict").as("had_conflict"),
          col("_conflict_resolution.timestamp_diff_micros").as("timestamp_diff_micros"))
    }),

    // J3: job ↔ mismatch hydration join — each per-bucket reconciliation
    // job carries its (sorted) mismatched keys.
    "cdc_job_mismatch_hydration" -> ((s, dir) => {
      val e = Tables.events(s, dir).withColumn("tbl", col("user_id") % 10)
      val srcC = e.groupBy("tbl").agg(count(lit(1)).as("source_count"))
      val tgtC = e.filter(col("event_id") % 97 =!= 0)
        .groupBy("tbl").agg(count(lit(1)).as("target_count"))
      val jobs = srcC.join(tgtC, Seq("tbl"), "left_outer")
        .withColumn("target_count", coalesce(col("target_count"), lit(0L)))
        // (long * 100.0) / long — same op order as the oracle
        .withColumn("drift_percentage", round(
          abs(col("source_count") - col("target_count")) * lit(100.0) /
            col("source_count"), 2))
      // Mismatch keys serialized to a sorted comma-joined string: the
      // oracle harness hashes scalar cells only (array cells are
      // unhashable in its comparator), and the string form is the same
      // information.
      val mism = Reconciler.checksumMismatches(
          lwwState(s, dir, lit(true)),
          lwwState(s, dir, col("event_id") % 97 =!= 0),
          "user_id", Seq("event_id", "event_type", "value_cents", "ts_us"))
        .withColumn("tbl", col("user_id") % 10)
        .groupBy("tbl")
        .agg(concat_ws(",",
          transform(sort_array(collect_list(col("user_id"))), _.cast("string")))
          .as("mismatch_user_ids"))
      jobs.join(mism, Seq("tbl"), "left_outer")
        .withColumn("mismatch_user_ids", coalesce(col("mismatch_user_ids"), lit("")))
        .select("tbl", "source_count", "target_count", "drift_percentage", "mismatch_user_ids")
    }),

    // U1: per-key set diff between source and target column populations
    // (the reference's dict-diff on mismatched rows, set-at-a-time).
    "cdc_dict_diff" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def typeSets(df: DataFrame, as: String) =
        df.groupBy("user_id").agg(sort_array(collect_set(col("event_type"))).as(as))
      val src = typeSets(e, "src_types")
      val tgt = typeSets(e.filter(col("event_id") % 7 =!= 0), "tgt_types")
      // Set-diff results serialized to sorted comma-joined strings so every
      // output cell is scalar (the oracle comparator can't hash arrays).
      src.join(tgt, Seq("user_id"), "left_outer")
        .withColumn("tgt_types", coalesce(col("tgt_types"), array()))
        .select(
          col("user_id"),
          concat_ws(",", sort_array(array_except(col("src_types"), col("tgt_types")))).as("source_only"),
          concat_ws(",", sort_array(array_except(col("tgt_types"), col("src_types")))).as("target_only"),
          concat_ws(",", sort_array(array_intersect(col("src_types"), col("tgt_types")))).as("common"))
    }),

    // Session windows, batch form (the flatMapGroupsWithState semantics as
    // a window-function query; 30-minute inactivity gap). Uses the
    // generic (keyCol, tsCol) entry — the key name is a parameter, not a
    // fixture-ism.
    "events_sessionize" -> ((s, dir) =>
      StreamOps.closeOpenSessions(Tables.events(s, dir), "user_id", "ts_us",
        gapUs = 1800000000L)),

    // AS-OF enrichment: every click gets the same user's most recent
    // purchase at-or-before it (ties: max purchase event_id — LWW). The
    // scalable union+window re-expression of a temporal range join.
    "events_asof_purchase" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.ops.AsOf.joinAtOrBefore(clicks, purchases, Seq("user_id"),
        leftTs = "ts_us", rightTs = "ts_us", rightTie = "p_event_id",
        rightVals = Seq("p_event_id", "p_value"), prefix = "")
    }),

    // Per-language n-gram profile: top-3 trigrams by frequency — the
    // language-model fingerprint a lang-ID classifier trains on.
    "text_ngram_freq" -> ((s, dir) => {
      // widen: parallelize the trigram explode when the scan is narrow
      // (single fixture file); no-op on an already-wide scan
      val sh = graft.llm.Dedup.widen(Tables.documents(s, dir)
        .select(col("lang"), split(col("text"), " ").as("_toks")))
        .select(col("lang"), explode(
          when(size(col("_toks")) >= 3,
            expr("transform(sequence(1, size(_toks) - 2), i -> concat_ws(' ', slice(_toks, i, 3)))"))
            .otherwise(array())).as("sh"))
      val counts = sh.groupBy("lang", "sh").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("sh"))
      counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "cdc_conflict_annotate" ->
      s"""SELECT s.user_id, s.event_id, s.ts_us,
         |  CASE WHEN t.user_id IS NULL THEN TRUE
         |       WHEN s.ts_us > t.ts_us THEN TRUE
         |       WHEN s.ts_us = t.ts_us AND s.event_id > t.event_id THEN TRUE
         |       WHEN t.ts_us IS NULL AND s.ts_us IS NOT NULL THEN TRUE
         |       ELSE FALSE END AS was_accepted,
         |  t.user_id IS NOT NULL AS had_conflict,
         |  s.ts_us - coalesce(t.ts_us, s.ts_us) AS timestamp_diff_micros
         |FROM ${lwwSql("event_id % 2 = 0")} s
         |LEFT JOIN ${lwwSql("event_id % 2 <> 0")} t ON s.user_id = t.user_id"""
        .stripMargin.replace("\n", " "),

    "cdc_job_mismatch_hydration" ->
      s"""WITH src AS (SELECT user_id % 10 AS tbl, count(*) AS source_count FROM events GROUP BY 1),
         |tgt AS (SELECT user_id % 10 AS tbl, count(*) AS target_count FROM events
         |        WHERE event_id % 97 <> 0 GROUP BY 1),
         |jobs AS (SELECT src.tbl, source_count, coalesce(target_count, 0) AS target_count,
         |  round(abs(source_count - coalesce(target_count, 0)) * 100.0 / source_count, 2) AS drift_percentage
         |  FROM src LEFT JOIN tgt ON src.tbl = tgt.tbl),
         |s AS (SELECT user_id, ${EventOps.checksumSqlDuck(Seq("event_id", "event_type", "value_cents", "ts_us"))} AS cks
         |      FROM ${lwwSql("TRUE")} ss),
         |t AS (SELECT user_id, ${EventOps.checksumSqlDuck(Seq("event_id", "event_type", "value_cents", "ts_us"))} AS cks
         |      FROM ${lwwSql("event_id % 97 <> 0")} tt),
         |m AS (SELECT coalesce(s.user_id, t.user_id) AS user_id
         |      FROM s FULL OUTER JOIN t ON s.user_id = t.user_id
         |      WHERE s.cks IS NULL OR t.cks IS NULL OR s.cks <> t.cks),
         |hyd AS (SELECT user_id % 10 AS tbl,
         |        array_to_string(list_sort(list(user_id)), ',') AS mismatch_user_ids
         |        FROM m GROUP BY 1)
         |SELECT jobs.tbl, source_count, target_count, drift_percentage,
         |  coalesce(mismatch_user_ids, '') AS mismatch_user_ids
         |FROM jobs LEFT JOIN hyd ON jobs.tbl = hyd.tbl""".stripMargin.replace("\n", " "),

    "cdc_dict_diff" ->
      """WITH src AS (SELECT user_id, list_sort(list(DISTINCT event_type)) AS s FROM events GROUP BY 1),
        |tgt AS (SELECT user_id, list_sort(list(DISTINCT event_type)) AS t FROM events
        |        WHERE event_id % 7 <> 0 GROUP BY 1),
        |j AS (SELECT src.user_id, s, coalesce(t, []) AS t FROM src LEFT JOIN tgt ON src.user_id = tgt.user_id)
        |SELECT user_id,
        |  coalesce(array_to_string(list_sort(list_filter(s, x -> NOT list_contains(t, x))), ','), '') AS source_only,
        |  coalesce(array_to_string(list_sort(list_filter(t, x -> NOT list_contains(s, x))), ','), '') AS target_only,
        |  coalesce(array_to_string(list_sort(list_filter(s, x -> list_contains(t, x))), ','), '') AS common
        |FROM j""".stripMargin.replace("\n", " "),

    "events_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT user_id, ts_us,
        |  CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
        |         OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) > 1800000000
        |       THEN 1 ELSE 0 END AS new_s FROM e),
        |s AS (SELECT user_id, ts_us, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  count(*) AS n_events, max(ts_us) - min(ts_us) AS duration_us
        |FROM s GROUP BY user_id, sid""".stripMargin.replace("\n", " "),

    // LATERAL top-1 subquery — the declarative statement of the as-of
    // contract the union+window plan implements
    "events_asof_purchase" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts_us, q.p_event_id, q.p_value
        |FROM c LEFT JOIN LATERAL (
        |  SELECT p.event_id AS p_event_id, p.value AS p_value FROM p
        |  WHERE p.user_id = c.user_id AND p.ts_us <= c.ts_us
        |  ORDER BY p.ts_us DESC, p.event_id DESC LIMIT 1) q ON true"""
        .stripMargin.replace("\n", " "),

    "text_ngram_freq" ->
      """WITH toks AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT lang, concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |c AS (SELECT lang, sh, count(*) AS n FROM sh GROUP BY lang, sh),
        |r AS (SELECT lang, sh, n, row_number() OVER (PARTITION BY lang ORDER BY n DESC, sh) AS rank FROM c)
        |SELECT lang, sh, n, rank FROM r WHERE rank <= 3""".stripMargin.replace("\n", " ")
  )
}
