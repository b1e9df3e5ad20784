package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{HeadTrain, Similarity, Ulm}

/** Round-16 gates: in-engine training of the n-gram quality head (the
  * [[graft.llm.NgramHead]] frozen scorer's missing fit step — round-15
  * verdict #4) and the recall audit for the index-backed hard-negative
  * mining path (verdict #5: every approximate tier ships its recall
  * number, and until now the NEGATIVE mining leg didn't). Oracles render
  * the identical unrolled integer arithmetic from the same constants
  * ([[HeadTrain.trainSqlDuck]]; the ann_hard_negatives/_ivf CTE pair +
  * overlap).
  */
object LlmQueries10 {

  private val MineK = 5        // the gated mining operating point —
  private val MineCentroids = 16 // identical to ann_hard_negatives_ivf,
  private val MineProbe = 3    // so the audit grades the shipped config
  private val MineQueriesBound = 50

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hard-sigmoid logistic head distilled from the stub-teacher label
    // by 8 unrolled integer gradient rounds (size-normalized step) on
    // the non-held-out fold; output is the exact micro-unit weight
    // table. HeadTrainSpec grades the trained weights against the
    // frozen scorer on the held-out fold's AUC.
    "quality_head_train" -> ((s, dir) =>
      HeadTrain.train(Tables.documents(s, dir), "doc_id", "text")),

    // The trained head graded out-of-sample: the exact integer AUC of
    // the distilled weights on the HELD-OUT fold — the HeadTrainSpec
    // improvement claim as a driver-gated number (oracle = training
    // chain + held-out margins + the quality_ngram_head_auc AUC walk).
    // margins quantize to the hard-sigmoid per-mille grid BEFORE the
    // AUC walk: raw integer margins are unbounded-cardinality at scale,
    // the per-mille grid keeps the score register ≤1001 rows (the
    // rocAuc boundedScoreTable contract) at any corpus size
    "quality_head_auc" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = HeadTrain.train(docs, "doc_id", "text")
      graft.ops.TableProfile.rocAuc(
        HeadTrain.heldOutScores(docs, "doc_id", "text", w)
          .withColumn("_s", expr(
            s"(least(${HeadTrain.ZClamp}L, greatest(${-HeadTrain.ZClamp}L, _z))" +
              s" + ${HeadTrain.ZClamp}L) div 4000")),
        col("_s"), col("_y") === 1)
    }),

    // SOFT-EM ULM (Kudo 2018's actual E-step): one forward-backward
    // expectation round over the word lattice in mantissa/exponent
    // fixed point — expected piece counts in millionths + re-derived
    // costs. The oracle unrolls the identical integer lattice (16
    // forward positions, 16 backward distances, edge posteriors).
    "ulm_train_soft" -> ((s, dir) =>
      Ulm.trainSoft(Tables.documents(s, dir), "text")),

    // Per-anchor recall@k of index-mined vs brute-force hard negatives
    // at the gated (16, nprobe 3) operating point; zero-recall anchors
    // kept via the labeled-anchor left join.
    "ann_hard_negatives_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegativesRecall(emb, emb.filter(col("vec_id") < 50),
        "label", k = MineK, numCentroids = MineCentroids, nprobe = MineProbe)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "quality_head_train" ->
      HeadTrain.trainSqlDuck("documents", "doc_id"),

    "quality_head_auc" ->
      HeadTrain.heldOutAucSqlDuck("documents", "doc_id"),

    "ulm_train_soft" -> Ulm.trainSoftSqlDuck("documents", "text"),

    // the ann_hard_negatives CTEs (brute-force leg) + the
    // ann_hard_negatives_ivf CTEs (index leg) + the recallOverlap join,
    // with the labeled-anchor list keeping zero-recall anchors
    "ann_hard_negatives_recall" -> {
      val quant = Similarity.quantizeSqlDuck
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      s"""WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |  $quant AS qv FROM embeddings WHERE CAST(label AS BIGINT) IS NOT NULL),
         |n AS (SELECT vec_id, label, qv,
         |  ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |fr AS (SELECT qid, cid FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("q.qv", "c.qv"), "q.nrm", "c.nrm")} DESC,
         |      c.vec_id) AS rank
         |  FROM n q, n c WHERE q.vec_id < $MineQueriesBound
         |    AND c.vec_id <> q.vec_id AND c.label <> q.label)
         |  WHERE rank <= $MineK),
         |cents AS (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent FROM
         |  (SELECT vec_id, qv, nrm FROM n
         |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $MineCentroids)),
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
         |  FROM (SELECT * FROM n WHERE vec_id < $MineQueriesBound) nq, cents c)
         |  WHERE crn <= $MineProbe),
         |ir AS (SELECT qid, cid FROM (
         |  SELECT qa.vec_id AS qid, ca.vec_id AS cid,
         |    row_number() OVER (PARTITION BY qa.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("qa.qv", "ca.qv"), "qa.nrm", "ca.nrm")} DESC,
         |      ca.vec_id) AS rank
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id
         |    AND ca.label <> qa.label)
         |  WHERE rank <= $MineK),
         |cm AS (SELECT fr.qid, CAST(count(*) AS BIGINT) AS n_common
         |  FROM fr JOIN ir ON fr.qid = ir.qid AND fr.cid = ir.cid
         |  GROUP BY fr.qid)
         |SELECT q.vec_id AS qid,
         |  CAST(coalesce(cm.n_common, 0) AS BIGINT) AS n_common,
         |  CAST(coalesce(cm.n_common, 0) * 1000 // $MineK AS BIGINT)
         |    AS recall_permille
         |FROM (SELECT vec_id FROM embeddings
         |  WHERE vec_id < $MineQueriesBound
         |    AND CAST(label AS BIGINT) IS NOT NULL) q
         |LEFT JOIN cm ON q.vec_id = cm.qid""".stripMargin.replace("\n", " ")
    }
  )
}
