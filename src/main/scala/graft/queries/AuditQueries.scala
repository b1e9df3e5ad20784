package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Dedup, Sampling, TextAnalysis}
import graft.ops.TableProfile
import graft.sketch.Sketches

/** Round-11 late-wave audit gates — pre-flight measurements a 100 TB
  * pipeline takes BEFORE committing to a plan, each with the identical
  * derivation rendered into its DuckDB oracle:
  *
  *   - `split_leakage_audit` — near-dup pairs straddling the train/test
  *     boundary under doc-hash vs cluster splitting (the measurement
  *     that justifies [[graft.llm.Sampling.clusterSplit]]);
  *   - `sketch_join_size` — equi-join cardinality from CMS inner
  *     products next to the exact legs (Cormode & Muthukrishnan 2005),
  *     the "will this join explode" estimate from 2·d·w integers;
  *   - `tokenizer_fertility` — BPE-ish tokens per 1000 words by
  *     predicted language, the tokenizer-parity audit.
  */
object AuditQueries {

  private val TrainPermille = 800 // the split_cluster_assign operating
  private val ValPermille = 100   // point — the audited configuration
  private val JoinD = 4   // CMS shape for the join-size estimate:
  private val JoinW = 64  // 4 rows × 64 buckets = 256 ints per side

  /** Corpus doc → component label over the LSH candidate graph,
    * singletons labeled themselves (the split_cluster_assign label
    * derivation, reused so the leakage audit grades the SAME labels the
    * gated split ships).
    */
  private def ccLabels(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs.select("doc_id")
      .join(Dedup.connectedComponents(
        Dedup.lshCandidatePairs(docs, "doc_id", "text"), "doc_a", "doc_b"),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Train/test leakage through near-duplicates: the same LSH pair
    // graph the dedup family resolves, with each endpoint assigned a
    // split two ways — by its own id hash (naive) and by its component
    // label (the shipped scheme). The cluster row's cross_pairs = 0 is
    // COMPUTED (both endpoints independently join the label table); the
    // doc_hash row's nonzero count is the leak the cluster split closes.
    "split_leakage_audit" -> ((s, dir) =>
      Sampling.splitLeakageAudit(
        Dedup.lshCandidatePairs(Tables.documents(s, dir), "doc_id", "text"),
        "doc_a", "doc_b",
        ccLabels(s, dir), "doc_id", "cluster_id",
        TrainPermille, ValPermille)),

    // Equi-join cardinality estimate: |view events ⋈ purchase events|
    // on user_id from two 4×64 CMS cell tables (inner-product rowsums,
    // min over rows — an overestimate by construction), next to the
    // exact per-key frequency join it stands in for. The pre-flight
    // "will this join explode" audit: at 100 TB the estimate reads 512
    // integers where the exact leg is itself a full join.
    "sketch_join_size" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Sketches.cmsJoinSize(
        ev.filter(col("event_type") === "view"),
        col("user_id").cast("string"),
        ev.filter(col("event_type") === "purchase"),
        col("user_id").cast("string"),
        d = JoinD, w = JoinW)
    }),

    // Tokenizer-parity audit: BPE-ish tokens per 1000 whitespace words
    // and chars per token ×100, by the engine's own language verdict —
    // one map pass into a languages-sized partial agg.
    "tokenizer_fertility" -> ((s, dir) =>
      TextAnalysis.tokenizerFertility(Tables.documents(s, dir),
        "doc_id", "text")),

    // Generic per-column profiler over orders: exact rows / nulls /
    // distincts / min-max per column in ONE scan (multi-distinct rides
    // Spark's Expand), long format one row per column. The timestamp
    // column is profiled through the repo's epoch-µs derivation — never
    // a raw temporal/double string render.
    "table_profile_orders" -> ((s, dir) =>
      TableProfile.columnProfile(
        Tables.orders(s, dir).withColumn("o_orderdate_us",
          unix_micros(col("o_orderdate").cast("timestamp"))),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
          "o_orderdate_us")))
  )

  private val bpePatternDuck =
    TextAnalysis.BpeishPattern.replace("'", "''")
  private val stopListDuck =
    TextAnalysis.StopWords.map(s => s"'$s'").mkString(", ")

  /** md5-per-mille bucket of an int64 key, rendered exactly as
    * [[graft.llm.Sampling.hashPermille]] computes it.
    */
  private def permilleDuck(x: String): String =
    s"CAST(concat('0x', substr(md5(CAST($x AS VARCHAR)), 1, 8)) AS BIGINT) % 1000"

  private def splitDuck(x: String): String =
    s"""CASE WHEN ${permilleDuck(x)} < $TrainPermille THEN 'train'
       |  WHEN ${permilleDuck(x)} < ${TrainPermille + ValPermille} THEN 'val'
       |  ELSE 'test' END""".stripMargin.replace("\n", " ")

  /** CMS cell table for one side of the join-size oracle: the engine's
    * MinHash row hashes over the 32-bit md5 key hash, counts per
    * (row, bucket).
    */
  private def cmsCellsDuck(name: String, pred: String): String = {
    val rows = (0 until JoinD).map { i =>
      val (a, b) = (Dedup.MinhashA(i), Dedup.MinhashB(i))
      s"SELECT $i AS r, (($a * hh + $b) % ${Dedup.MinhashP}) % $JoinW AS b FROM ${name}_h"
    }.mkString(" UNION ALL ")
    s"""${name}_h AS (SELECT
       |  CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hh
       |  FROM events WHERE $pred),
       |${name}_c AS (SELECT r, b, count(*) AS c FROM ($rows) GROUP BY 1, 2)"""
      .stripMargin.replace("\n", " ")
  }

  def oracleSql: Map[String, String] = Map(

    "split_leakage_audit" ->
      s"""WITH RECURSIVE ${LlmQueries.lshCtes}, prs AS (${LlmQueries.lshPairSelect}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |  UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(v, r) AS (SELECT src, src FROM edges
         |  UNION SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.v = e.dst),
         |lab0 AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
         |lab AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN lab0 l ON d.doc_id = l.doc_id),
         |naive AS (SELECT 'doc_hash' AS scheme,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN ${splitDuck("doc_a")} <> ${splitDuck("doc_b")}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS cross_pairs FROM prs),
         |clus AS (SELECT 'cluster' AS scheme,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN ${splitDuck("la.cluster_id")} <> ${splitDuck("lb.cluster_id")}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS cross_pairs
         |  FROM prs JOIN lab la ON prs.doc_a = la.doc_id
         |  JOIN lab lb ON prs.doc_b = lb.doc_id),
         |u AS (SELECT * FROM naive UNION ALL SELECT * FROM clus)
         |SELECT scheme, n_pairs, cross_pairs,
         |  1000 * cross_pairs // n_pairs AS cross_permille FROM u"""
        .stripMargin.replace("\n", " "),

    "sketch_join_size" ->
      s"""WITH ${cmsCellsDuck("va", "event_type = 'view'")},
         |${cmsCellsDuck("pb", "event_type = 'purchase'")},
         |est AS (SELECT CAST(min(rowsum) AS BIGINT) AS cms_join_est FROM (
         |  SELECT a.r, sum(CAST(a.c AS HUGEINT) * b.c) AS rowsum
         |  FROM va_c a JOIN pb_c b ON a.r = b.r AND a.b = b.b GROUP BY a.r)),
         |fa AS (SELECT user_id, count(*) AS fa FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |fb AS (SELECT user_id, count(*) AS fb FROM events
         |  WHERE event_type = 'purchase' GROUP BY user_id),
         |ex AS (SELECT CAST(coalesce(sum(CAST(fa AS HUGEINT) * fb), 0) AS BIGINT)
         |  AS join_exact FROM fa JOIN fb USING (user_id)),
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM events WHERE event_type = 'view'),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM events WHERE event_type = 'purchase')
         |SELECT n_a, n_b, join_exact, cms_join_est FROM na, nb, ex, est"""
        .stripMargin.replace("\n", " "),

    "tokenizer_fertility" ->
      s"""WITH f AS (SELECT
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  CAST(len(list_filter(string_split(text, ' '),
         |    x -> x IN ($stopListDuck))) AS BIGINT) AS n_stop,
         |  CAST(len(regexp_extract_all(text, '$bpePatternDuck')) AS BIGINT) AS n_bpe,
         |  CAST(length(text) AS BIGINT) AS n_chars FROM documents),
         |g AS (SELECT CASE WHEN n_stop * 1000 // n_words >= 50
         |    THEN 'en' ELSE 'und' END AS predicted_lang, * FROM f)
         |SELECT predicted_lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  1000 * CAST(sum(n_bpe) AS BIGINT) // CAST(sum(n_words) AS BIGINT)
         |    AS fertility_permille,
         |  100 * CAST(sum(n_chars) AS BIGINT) // CAST(sum(n_bpe) AS BIGINT)
         |    AS chars_per_token_x100
         |FROM g GROUP BY predicted_lang"""
        .stripMargin.replace("\n", " "),

    "table_profile_orders" -> {
      def leg(c: String, e: String) =
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count($e) AS BIGINT) AS n_nonnull,
           |  CAST(count(DISTINCT $e) AS BIGINT) AS n_distinct,
           |  CAST(min($e) AS VARCHAR) AS min_s,
           |  CAST(max($e) AS VARCHAR) AS max_s FROM orders"""
          .stripMargin.replace("\n", " ")
      Seq("o_orderkey" -> "o_orderkey", "o_custkey" -> "o_custkey",
        "o_orderstatus" -> "o_orderstatus",
        "o_orderpriority" -> "o_orderpriority",
        "o_orderdate_us" -> "epoch_us(o_orderdate)")
        .map { case (c, e) => leg(c, e) }.mkString(" UNION ALL ")
    }
  )
}
