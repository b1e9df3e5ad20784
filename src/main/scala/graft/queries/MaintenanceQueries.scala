package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.Dedup
import graft.ops.SkewProfile

/** Corpus-maintenance gates: the operations that keep a 100 TB corpus's
  * DERIVED state current without recomputing it — incremental
  * connected-components folding (the dedup-cluster map under daily
  * ingest, completing the incremental family next to HLL registers,
  * quantile registers, Bloom words, and CMS cells) — plus the
  * pre-flight key-skew audit that decides HOW the next shuffle over
  * that corpus should be planned. Integer-exact, oracle-gated like
  * every other tranche.
  */
object MaintenanceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Incremental cluster-map maintenance: prior labels built over 2/3
    // of the corpus, then one delta batch (every doc_id ≡ 0 mod 3) is
    // folded in via cluster contraction — CC runs over the DELTA-sized
    // contracted graph and the corpus state is touched by exactly one
    // equi-join. The oracle is the FULL-corpus recursive closure
    // (dedup_clusters' SQL): the gate's whole claim is that the
    // incremental fold lands bit-exactly on the full recompute.
    "dedup_clusters_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val newPred = col("doc_id") % 3 === 0
      val priorLabels = Dedup.connectedComponents(
        Dedup.lshCandidatePairs(docs.filter(!newPred), "doc_id", "text"),
        "doc_a", "doc_b")
      // the delta a real ingest derives from banding the new docs
      // against the full band table: every candidate pair touching a
      // new doc (prior↔prior pairs are unchanged by new arrivals, so
      // prior labels already summarize them)
      val delta = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .filter(col("doc_a") % 3 === 0 || col("doc_b") % 3 === 0)
      Dedup.incrementalComponents(priorLabels, delta, "doc_a", "doc_b")
    }),

    // Pre-flight shuffle-key skew audit over the event log's user_id —
    // the measurement that picks plain vs salted vs broadcast BEFORE
    // the join is committed: top-20 heaviest keys with their share and
    // hot-factor (n_rows over the uniform per-key expectation, ×1000).
    "skew_key_profile" -> ((s, dir) =>
      SkewProfile.keySkewProfile(Tables.events(s, dir), col("user_id"),
        topN = 20)))

  val oracleSql: Map[String, String] = Map(
    // the full-corpus closure — incremental == full recompute IS the
    // contract, so the oracle is dedup_clusters' SQL verbatim
    "dedup_clusters_incremental" ->
      s"""WITH RECURSIVE ${LlmQueries.lshCtes},
         |prs AS (${LlmQueries.lshPairSelect}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |  UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(v, r) AS (SELECT src, src FROM edges
         |  UNION SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.v = e.dst)
         |SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v"""
        .stripMargin.replace("\n", " "),

    // n_total sums to HUGEINT in DuckDB — every derived ratio CASTs
    // back to BIGINT (the export discipline)
    "skew_key_profile" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS n_rows
        |    FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |t AS (SELECT count(*) AS n_keys,
        |    CAST(sum(n_rows) AS BIGINT) AS n_total FROM c),
        |top AS (SELECT key, n_rows,
        |    row_number() OVER (ORDER BY n_rows DESC, key) AS rank
        |  FROM c ORDER BY n_rows DESC, key LIMIT 20)
        |SELECT key, rank, n_rows,
        |  (n_rows * 1000) // n_total AS share_permille,
        |  CAST((CAST(n_rows AS HUGEINT) * n_keys * 1000) // n_total
        |    AS BIGINT) AS hot_factor_permille,
        |  n_keys, n_total
        |FROM top CROSS JOIN t""".stripMargin.replace("\n", " "))
}
