package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Privacy, Similarity, Ulm}

/** Round-15 gates: the unigram-LM (SentencePiece-family) tokenizer —
  * training, Viterbi segmentation, corpus encoding — next to the BPE
  * family in [[LlmQueries6]]; the index-backed contrastive-triple
  * assembly (the |anchors| ≈ |corpus| mining path); and the
  * value-distribution drift panel (the [[graft.streaming.TableMonitors]]
  * walk, oracled). ULM oracles are generated from the SAME constants
  * (vocab size, piece/word caps, EM rounds, cost scale) by
  * [[Ulm.trainSqlDuck]]/[[Ulm.segmentSqlDuck]]/[[Ulm.encodeCorpusSqlDuck]],
  * with the EM rounds and DP positions unrolled as MATERIALIZED CTEs —
  * the [[graft.llm.Bpe]] round-chain discipline.
  */
object LlmQueries9 {

  private val DriftBuckets = 32
  private val DriftHi = 32768L // value ≤ ~330 → ×100 ≤ 33000, clamped tail

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ulm_train" -> ((s, dir) =>
      Ulm.train(Tables.documents(s, dir), "text")),

    "ulm_segment" -> ((s, dir) =>
      Ulm.segment(Tables.documents(s, dir), "text")),

    "ulm_encode_corpus" -> ((s, dir) =>
      Ulm.encodeCorpus(Tables.documents(s, dir), "doc_id", "text")),

    // The SentencePiece EM → prune → EM refinement: drop never-used
    // multi-char pieces, renormalize, one more hard-EM round.
    "ulm_pruned_vocab" -> ((s, dir) =>
      Ulm.trainPruned(Tables.documents(s, dir), "text")),

    // Index-backed triple mining: best positive AND hardest negative
    // both bounded to the anchor's probed IVF cells (one candidate
    // scan, two WindowGroupLimit branches — the production shape when
    // every document is an anchor).
    "ann_contrastive_triples_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.contrastiveTriplesIvf(emb, emb.filter(col("vec_id") < 50),
        "label", numCentroids = 16, nprobe = 3)
    }),

    // The TableMonitors drift walk, oracled: per event type, the
    // integer EMD between the even- and odd-event-id halves' value
    // distributions (a deterministic two-window split standing in for
    // prior-history vs latest-batch).
    "events_value_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def leg(pred: org.apache.spark.sql.Column) =
        Privacy.tClosenessCounts(ev.filter(pred),
          Seq("etype" -> col("event_type")), round(col("value") * 100, 0),
          lo = 0L, hi = DriftHi, buckets = DriftBuckets)
      Privacy.emdBetweenCounts(
        leg(col("event_id") % 2 === 0), leg(col("event_id") % 2 === 1),
        Seq("etype"), buckets = DriftBuckets)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ulm_train" -> Ulm.trainSqlDuck("documents", "text"),
    "ulm_segment" -> Ulm.segmentSqlDuck("documents", "text"),
    "ulm_encode_corpus" ->
      Ulm.encodeCorpusSqlDuck("documents", "doc_id", "text"),
    "ulm_pruned_vocab" -> Ulm.trainPrunedSqlDuck("documents", "text"),

    // the ann_hard_negatives_ivf CTEs with BOTH labels kept in the
    // cell-candidate join, then the brute-force triples' pos/neg
    // row_number branches + pivot over the IVF candidate set
    "ann_contrastive_triples_ivf" -> {
      val quantDuck = Similarity.quantizeSqlDuck
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      s"""WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |  $quantDuck AS qv FROM embeddings WHERE CAST(label AS BIGINT) IS NOT NULL),
         |n AS (SELECT vec_id, label, qv,
         |  ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |cents AS (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent FROM
         |  (SELECT vec_id, qv, nrm FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
         |ca AS (SELECT vec_id, label, qv, nrm, cent_id AS cell FROM (
         |  SELECT n.vec_id, n.label, n.qv, n.nrm, c.cent_id,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("n.qv", "c.centv"), "n.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM n, cents c) WHERE crn = 1),
         |qa AS (SELECT vec_id, label, qv, nrm, cent_id AS cell FROM (
         |  SELECT nq.vec_id, nq.label, nq.qv, nq.nrm, c.cent_id,
         |    row_number() OVER (PARTITION BY nq.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("nq.qv", "c.centv"), "nq.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM (SELECT * FROM n WHERE vec_id < 50) nq, cents c) WHERE crn <= 3),
         |s AS (SELECT qa.vec_id AS qid, qa.label AS q_label,
         |    ca.vec_id AS cid, ca.label AS c_label,
         |    ${cos(Similarity.dotQSqlDuck("qa.qv", "ca.qv"), "qa.nrm", "ca.nrm")} AS cos_sim
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id),
         |pos AS (SELECT qid, q_label, cid AS pos_id, cos_sim AS pos_cos,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, cid) AS rn
         |  FROM s WHERE c_label = q_label),
         |neg AS (SELECT qid, cid AS neg_id, cos_sim AS neg_cos,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, cid) AS rn
         |  FROM s WHERE c_label <> q_label)
         |SELECT pos.qid, pos.q_label, pos.pos_id, pos.pos_cos,
         |  neg.neg_id, neg.neg_cos, pos.pos_cos - neg.neg_cos AS margin
         |FROM pos JOIN neg ON pos.qid = neg.qid
         |WHERE pos.rn = 1 AND neg.rn = 1""".stripMargin.replace("\n", " ")
    },

    "events_value_drift" ->
      s"""WITH sv AS (SELECT event_id, event_type AS etype,
         |    CAST(round(value * 100, 0) AS BIGINT) AS v
         |  FROM events WHERE value IS NOT NULL),
         |bk AS (SELECT event_id, etype,
         |  CAST(CAST(least(${DriftHi - 1}, greatest(0, v)) AS HUGEINT)
         |    * $DriftBuckets // $DriftHi AS BIGINT) AS b FROM sv),
         |ha AS (SELECT etype, b, CAST(count(*) AS BIGINT) AS na
         |  FROM bk WHERE event_id % 2 = 0 GROUP BY 1, 2),
         |hb AS (SELECT etype, b, CAST(count(*) AS BIGINT) AS nb
         |  FROM bk WHERE event_id % 2 = 1 GROUP BY 1, 2),
         |keys AS (SELECT DISTINCT etype FROM
         |  (SELECT etype FROM ha UNION ALL SELECT etype FROM hb)),
         |gr AS (SELECT CAST(range AS BIGINT) AS b FROM range($DriftBuckets)),
         |grid AS (SELECT k.etype, gr.b FROM keys k CROSS JOIN gr),
         |j AS (SELECT grid.etype, grid.b,
         |    coalesce(ha.na, 0) AS na, coalesce(hb.nb, 0) AS nb
         |  FROM grid LEFT JOIN ha ON ha.etype = grid.etype AND ha.b = grid.b
         |  LEFT JOIN hb ON hb.etype = grid.etype AND hb.b = grid.b),
         |cc AS (SELECT etype, b, na, nb,
         |  CAST(sum(na) OVER (PARTITION BY etype ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
         |  CAST(sum(nb) OVER (PARTITION BY etype ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
         |  FROM j),
         |tot AS (SELECT etype, CAST(sum(na) AS BIGINT) AS n_a,
         |  CAST(sum(nb) AS BIGINT) AS n_b FROM j GROUP BY 1)
         |SELECT t.etype, t.n_a, t.n_b,
         |  CASE WHEN t.n_a = 0 OR t.n_b = 0 THEN NULL
         |       ELSE CAST(sum(abs(cc.ca * 1000000 // t.n_a
         |         - cc.cb * 1000000 // t.n_b)) // ${DriftBuckets - 1}
         |         AS BIGINT) END AS emd_x1e6
         |FROM cc JOIN tot t ON cc.etype = t.etype
         |GROUP BY t.etype, t.n_a, t.n_b""".stripMargin.replace("\n", " ")
  )
}
