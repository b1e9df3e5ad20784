package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.EventAnalytics

/** Product-analytics shapes over the event stream: the ordered
  * conversion funnel (with a conversion window) and the cohort-retention
  * triangle — [[graft.ops.EventAnalytics]] gated end-to-end. All time
  * arithmetic is integer epoch-µs; both plans are user-keyed with no
  * global ordering.
  */
object EventQueries {

  private val FunnelStages = Seq("signup", "view", "click", "purchase")

  private val ConversionWindowUs = 86400000000L // 24 h per stage — at
  // the fixture's event density this decays the funnel non-trivially at
  // both gate scales (sf0.01: 150→39→16→5)

  private val RetentionPeriodUs = 86400000000L // daily cohorts — weekly
  // periods saturate (every fixture user is active every week)

  /** Explicit pivot value list (alphabetical — the deterministic column
    * set; a pivot without one costs a driver-side distinct at scale).
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val HistoryN = 5 // recent-history window length

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered conversion funnel: stage k strictly after stage k-1 and
    // within the 24 h conversion window of it; per-stage user counts.
    "events_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(Tables.events(s, dir), "user_id", "event_type",
        "ts_us", FunnelStages, ConversionWindowUs)),

    // Daily cohort retention triangle: cohort = first active day,
    // retained at offset w iff any event on cohort_day + w.
    "events_retention_cohort" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(Tables.events(s, dir), "user_id",
        "ts_us", RetentionPeriodUs)
        .withColumnRenamed("cohort_period", "cohort_day")
        .withColumnRenamed("period_offset", "day_offset")),

    // Where users stall: exact lower-median conversion latency per
    // funnel stage (integer rank median, no float percentile).
    "events_funnel_latency" -> ((s, dir) =>
      EventAnalytics.funnelLatency(Tables.events(s, dir), "user_id",
        "event_type", "ts_us", FunnelStages, ConversionWindowUs)),

    // Relational PIVOT: per-user event-type count matrix with an
    // EXPLICIT value list (the only scale-sane pivot — value discovery
    // is a driver-side distinct collect) and zero-filled empty cells.
    "events_type_pivot" -> ((s, dir) => {
      val p = Tables.events(s, dir).groupBy("user_id")
        .pivot("event_type", EventTypes).agg(count(lit(1)))
      p.select(col("user_id") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    }),

    // UNPIVOT (melt) of the same matrix back to (user, type, n) — the
    // wide↔long round trip, zero cells included.
    "events_type_unpivot" -> ((s, dir) => {
      val p = Tables.events(s, dir).groupBy("user_id")
        .pivot("event_type", EventTypes).agg(count(lit(1)))
        .select(col("user_id") +:
          EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      p.unpivot(Array(col("user_id")), EventTypes.map(col).toArray,
        "event_type", "n")
    }),

    // Robust per-user outlier profile: exact lower-median + MAD over
    // integer cents, strict |v−med| > 3·MAD flag.
    "events_anomaly_mad" -> ((s, dir) =>
      EventAnalytics.madOutliers(Tables.events(s, dir), "user_id",
        graft.ops.EventOps.cents(col("value")), k = 3)),

    // Z-order layout key: the Morton interleave of (user, hour) — the
    // 2-D data-skipping sort key; exact magic-bit arithmetic shared with
    // the oracle. The write-side layout (range partition + sort on this
    // value) is asserted in CurationSelectSpec.
    "events_zorder_key" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("zx"),
        pmod(expr("ts_us div 3600000000"), lit(65536L)).as("zy"))
        .withColumn("zvalue",
          graft.warehouse.ZOrder.zValue(col("zx"), col("zy")))),

    // Zone-map pruning audit — per range predicate: zones kept by the
    // min/max manifest, rows the kept zones force you to SCAN, rows
    // that actually MATCH. Zones are insertion-order blocks (event_id
    // div 1024), so the time predicates prune hard (the fixture log is
    // time-ordered) while the uncorrelated user/value predicates keep
    // every zone — the audit exhibits exactly when zone maps pay and
    // when a re-cluster (Z-order) is needed.
    "zonemap_prune_audit" -> ((s, dir) =>
      graft.warehouse.ZoneMap.pruneAudit(Tables.events(s, dir),
        expr("event_id div 1024"), ZonePreds)),

    // Per-user recent-history assembly: the last 5 events most-recent-
    // first as one deterministic pipe-joined id string — the sequence
    // windows behavioral training data is cut into. One user-keyed
    // exchange; the rank filter is a WindowGroupLimit.
    "events_user_histories" -> ((s, dir) =>
      EventAnalytics.userHistories(Tables.events(s, dir),
        "user_id", "event_id", "ts_us", n = HistoryN)),

    // The history's register identity in-plan: last-n survivor sets are
    // TRUE registers (last-n of A ∪ B == last-n of the per-batch
    // last-ns unioned), so two ts-parity batch legs keep ≤n rows each
    // per user and the merged ≤2n rows re-rank to the ONE-PASS
    // histories — oracle shared verbatim with events_user_histories.
    "events_user_histories_stream" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def leg(pred: org.apache.spark.sql.Column) =
        EventAnalytics.recentEvents(ev.filter(pred),
          "user_id", "event_id", "ts_us", n = HistoryN)
      EventAnalytics.historiesFromRecent(
        leg(col("ts_us") % 2 === 0).unionByName(leg(col("ts_us") % 2 === 1)),
        "user_id", "event_id", "ts_us", n = HistoryN)
    })
  )

  /** Audited predicates: two time ranges (zone-correlated), a user and
    * a value range (uncorrelated). Epoch-µs bounds: Jan 2–3 and Jan 15
    * of the fixture's 2024-01 month.
    */
  private val ZonePreds = Seq(
    graft.warehouse.ZoneMap.RangePred(
      "ts_jan02_03", "ts_us", 1704153600000000L, 1704326399999999L),
    graft.warehouse.ZoneMap.RangePred(
      "ts_jan15", "ts_us", 1705276800000000L, 1705363199999999L),
    graft.warehouse.ZoneMap.RangePred("user_lt100", "user_id", 0L, 99L),
    graft.warehouse.ZoneMap.RangePred("value_100_150", "value", 100L, 150L))

  val oracleSql: Map[String, String] = Map(
    "events_funnel" -> {
      val w = ConversionWindowUs
      val stageCtes = FunnelStages.zipWithIndex.drop(1).map { case (st, i) =>
        val k = i + 1
        s"""s$k AS (SELECT e.user_id, min(e.ts_us) AS t$k
           |  FROM e JOIN s$i ON e.user_id = s$i.user_id
           |    AND e.ts_us > s$i.t$i AND e.ts_us <= s$i.t$i + $w
           |  WHERE e.event_type = '$st' GROUP BY e.user_id)""".stripMargin
      }.mkString(", ")
      val unions = FunnelStages.zipWithIndex.map { case (st, i) =>
        s"SELECT ${i + 1} AS stage_no, '$st' AS stage, " +
          s"CAST(count(*) AS BIGINT) AS n_users FROM s${i + 1}"
      }.mkString(" UNION ALL ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
         |    FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
         |  WHERE event_type = '${FunnelStages.head}' GROUP BY user_id),
         |$stageCtes
         |$unions""".stripMargin.replace("\n", " ")
    },

    "events_funnel_latency" -> {
      val w = ConversionWindowUs
      val stageCtes = FunnelStages.zipWithIndex.drop(1).map { case (st, i) =>
        val k = i + 1
        s"""s$k AS (SELECT e.user_id, min(e.ts_us) AS t$k
           |  FROM e JOIN s$i ON e.user_id = s$i.user_id
           |    AND e.ts_us > s$i.t$i AND e.ts_us <= s$i.t$i + $w
           |  WHERE e.event_type = '$st' GROUP BY e.user_id)""".stripMargin
      }.mkString(", ")
      val unions = FunnelStages.zipWithIndex.drop(1).map { case (st, i) =>
        val k = i + 1
        s"""SELECT $k AS stage_no, '$st' AS stage,
           |  CAST(n AS BIGINT) AS n_users, CAST(gap AS BIGINT) AS median_gap_us
           |FROM (SELECT s$k.t$k - s$i.t$i AS gap,
           |    row_number() OVER (ORDER BY s$k.t$k - s$i.t$i) AS rk,
           |    count(*) OVER () AS n
           |  FROM s$k JOIN s$i ON s$k.user_id = s$i.user_id)
           |WHERE rk = (n + 1) // 2""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
         |    FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
         |  WHERE event_type = '${FunnelStages.head}' GROUP BY user_id),
         |$stageCtes
         |$unions""".stripMargin.replace("\n", " ")
    },

    "events_type_pivot" -> {
      val cols = EventTypes.map(t =>
        s"CAST(count(CASE WHEN event_type = '$t' THEN 1 END) AS BIGINT) AS \"$t\"")
        .mkString(", ")
      s"SELECT user_id, $cols FROM events GROUP BY user_id"
    },

    "events_type_unpivot" -> {
      val vals = EventTypes.map(t => s"('$t')").mkString(", ")
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |t(event_type) AS (VALUES $vals),
         |c AS (SELECT user_id, event_type, count(*) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT u.user_id, t.event_type,
         |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
         |FROM u CROSS JOIN t
         |LEFT JOIN c ON c.user_id = u.user_id
         |  AND c.event_type = t.event_type""".stripMargin.replace("\n", " ")
    },

    "events_anomaly_mad" ->
      """WITH b AS (SELECT user_id AS k,
        |    CAST(round(value*100, 0) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT k, v AS median_v FROM (
        |    SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) AS rk,
        |      count(*) OVER (PARTITION BY k) AS n FROM b)
        |  WHERE rk = (n + 1) // 2),
        |d AS (SELECT b.k, abs(b.v - m.median_v) AS dd, m.median_v
        |  FROM b JOIN m ON b.k = m.k),
        |md AS (SELECT k, dd AS mad_v FROM (
        |    SELECT k, dd, row_number() OVER (PARTITION BY k ORDER BY dd) AS rk,
        |      count(*) OVER (PARTITION BY k) AS n FROM d)
        |  WHERE rk = (n + 1) // 2)
        |SELECT d.k AS user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  max(d.median_v) AS median_v, max(md.mad_v) AS mad_v,
        |  CAST(sum(CASE WHEN d.dd > 3 * md.mad_v THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_anomalies
        |FROM d JOIN md ON d.k = md.k GROUP BY d.k"""
        .stripMargin.replace("\n", " "),

    "events_zorder_key" -> {
      val z = graft.warehouse.ZOrder.zValueSqlDuck("zx", "zy")
      s"""WITH b AS (SELECT event_id,
         |    user_id % 65536 AS zx,
         |    (epoch_us(ts) // 3600000000) % 65536 AS zy
         |  FROM events)
         |SELECT event_id, CAST(zx AS BIGINT) AS zx, CAST(zy AS BIGINT) AS zy,
         |  CAST($z AS BIGINT) AS zvalue FROM b""".stripMargin.replace("\n", " ")
    },

    "zonemap_prune_audit" -> {
      val statCols = ZonePreds.map(_.column).distinct
        .map(c => s"min($c) AS ${c}_min, max($c) AS ${c}_max").mkString(", ")
      val predRows = ZonePreds.map { p =>
        val keep = s"${p.column}_max >= ${p.lo} AND ${p.column}_min <= ${p.hi}"
        s"""SELECT '${p.id}' AS pred_id,
           |  (SELECT count(*) FROM st) AS zones_total,
           |  (SELECT count(*) FROM st WHERE $keep) AS zones_kept,
           |  (SELECT CAST(COALESCE(sum(n_rows), 0) AS BIGINT) FROM st
           |    WHERE $keep) AS rows_scanned,
           |  (SELECT count(*) FROM z
           |    WHERE ${p.column} BETWEEN ${p.lo} AND ${p.hi}) AS rows_match"""
          .stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH z AS (SELECT event_id // 1024 AS zone, epoch_us(ts) AS ts_us,
         |    user_id, value FROM events),
         |st AS (SELECT zone, count(*) AS n_rows, $statCols
         |  FROM z GROUP BY 1)
         |$predRows""".stripMargin.replace("\n", " ")
    },

    "events_retention_cohort" ->
      s"""WITH p AS (SELECT DISTINCT user_id,
         |    epoch_us(ts) // $RetentionPeriodUs AS period FROM events),
         |f AS (SELECT user_id, min(period) AS cohort_day FROM p
         |  GROUP BY user_id)
         |SELECT f.cohort_day, p.period - f.cohort_day AS day_offset,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM p JOIN f ON p.user_id = f.user_id
         |GROUP BY f.cohort_day, p.period - f.cohort_day"""
        .stripMargin.replace("\n", " "),

    "events_user_histories" ->
      s"""WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
         |  FROM events),
         |r AS (SELECT user_id, event_id, ts_us, row_number() OVER (
         |    PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC)
         |    AS rn FROM v),
         |k AS (SELECT * FROM r WHERE rn <= $HistoryN)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_recent,
         |  min(ts_us) AS first_ts_us, max(ts_us) AS last_ts_us,
         |  string_agg(CAST(event_id AS VARCHAR), '|' ORDER BY rn)
         |    AS history
         |FROM k GROUP BY user_id""".stripMargin.replace("\n", " "),

    // the register identity: the two-leg survivor fold must land on the
    // ONE-PASS histories — oracle shared verbatim
    "events_user_histories_stream" ->
      s"""WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
         |  FROM events),
         |r AS (SELECT user_id, event_id, ts_us, row_number() OVER (
         |    PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC)
         |    AS rn FROM v),
         |k AS (SELECT * FROM r WHERE rn <= $HistoryN)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_recent,
         |  min(ts_us) AS first_ts_us, max(ts_us) AS last_ts_us,
         |  string_agg(CAST(event_id AS VARCHAR), '|' ORDER BY rn)
         |    AS history
         |FROM k GROUP BY user_id""".stripMargin.replace("\n", " ")
  )
}
