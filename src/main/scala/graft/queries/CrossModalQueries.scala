package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Multimodal, Similarity}

/** Cross-modal retrieval gates (round-16 verdict #4): text queries
  * against an image corpus in ONE shared embedding space — the
  * CLIP-style leg of a multimodal curation pipeline — through the SAME
  * IVF path and recall-audit shape every other ANN tier ships
  * ([[graft.llm.Similarity.ivfTopK]]/[[graft.llm.Similarity.ivfRecall]]).
  * The two towers are [[graft.llm.Multimodal.imageTower]]/`textTower` —
  * closed-form codegen'd expressions a DuckDB oracle reproduces exactly;
  * the mapPartitions encoder seam ([[graft.llm.Multimodal.extractFeatures]])
  * is spec-pinned to the same output contract.
  */
object CrossModalQueries {

  private val Cents = 16
  private val Probe = 3
  private val K = 5
  private val NQueries = 50

  private def img(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageTower(Tables.documents(s, dir), "doc_id", "text")
  private def txt(s: SparkSession, dir: String): DataFrame =
    Multimodal.textTower(Tables.documents(s, dir), "doc_id", "text")
      .filter(col("vec_id") < NQueries)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // text → image top-k through the gated IVF operating point
    "multimodal_crossmodal_topk" -> ((s, dir) =>
      Similarity.ivfTopK(img(s, dir), txt(s, dir), Cents, Probe, K)
        .select("qid", "cid", "rank", "cos_sim")),

    // recall@k of the IVF cross-modal search vs brute force — the same
    // audit-before-trust discipline as ann_ivf_recall, zero-recall
    // queries kept
    "multimodal_crossmodal_recall" -> ((s, dir) =>
      Similarity.ivfRecall(img(s, dir), txt(s, dir), Cents, Probe, K))
  )

  // ------------------------------------------------------------- oracle

  private def cos(dot: String, n1: String, n2: String) =
    s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
  private def quant(e: String) =
    s"list_transform($e, x -> CAST(round(CAST(x AS DOUBLE) * ${Similarity.Scale}, 0) AS BIGINT))"

  /** Shared CTE head: both towers, quantized + normed, queries cut to
    * the gate's query set. `cn`/`qn` are MATERIALIZED — they fan out to
    * the brute reference, the centroid sample, and both assignment legs
    * (DuckDB inlines CTEs by default, which would re-expand the 128-term
    * tower expressions multiplicatively).
    */
  private def headCtes: String =
    s"""raw_img AS (SELECT doc_id + ${Multimodal.ImgIdOffset} AS vec_id,
       |  ${Multimodal.imageTowerSqlDuck} AS embedding
       |  FROM documents WHERE length(text) > 0),
       |raw_txt AS (SELECT doc_id AS vec_id,
       |  ${Multimodal.textTowerSqlDuck} AS embedding
       |  FROM documents WHERE length(text) > 0),
       |cn AS MATERIALIZED (SELECT vec_id, qv,
       |    ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm
       |  FROM (SELECT vec_id, ${quant("embedding")} AS qv FROM raw_img)),
       |qn AS MATERIALIZED (SELECT vec_id, qv,
       |    ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm
       |  FROM (SELECT vec_id, ${quant("embedding")} AS qv FROM raw_txt
       |        WHERE vec_id < $NQueries)),
       |cents AS MATERIALIZED (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent
       |  FROM (SELECT vec_id, qv, nrm FROM cn
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $Cents)),
       |ca AS MATERIALIZED (SELECT vec_id, qv, nrm, cent_id AS cell FROM (
       |  SELECT cn.vec_id, cn.qv, cn.nrm, c.cent_id,
       |    row_number() OVER (PARTITION BY cn.vec_id ORDER BY
       |      ${cos(Similarity.dotQSqlDuck("cn.qv", "c.centv"), "cn.nrm", "c.ncent")} DESC,
       |      c.cent_id) AS crn
       |  FROM cn, cents c) WHERE crn = 1),
       |qa AS MATERIALIZED (SELECT vec_id, qv, nrm, cent_id AS cell FROM (
       |  SELECT qn.vec_id, qn.qv, qn.nrm, c.cent_id,
       |    row_number() OVER (PARTITION BY qn.vec_id ORDER BY
       |      ${cos(Similarity.dotQSqlDuck("qn.qv", "c.centv"), "qn.nrm", "c.ncent")} DESC,
       |      c.cent_id) AS crn
       |  FROM qn, cents c) WHERE crn <= $Probe),
       |ir AS MATERIALIZED (SELECT qid, cid, rank, cos_sim FROM (
       |  SELECT qa.vec_id AS qid, ca.vec_id AS cid,
       |    ${cos(Similarity.dotQSqlDuck("qa.qv", "ca.qv"), "qa.nrm", "ca.nrm")} AS cos_sim,
       |    row_number() OVER (PARTITION BY qa.vec_id ORDER BY
       |      ${cos(Similarity.dotQSqlDuck("qa.qv", "ca.qv"), "qa.nrm", "ca.nrm")} DESC,
       |      ca.vec_id) AS rank
       |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id)
       |  WHERE rank <= $K)""".stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "multimodal_crossmodal_topk" ->
      s"""WITH $headCtes
         |SELECT qid, cid, rank, cos_sim FROM ir""".stripMargin.replace("\n", " "),

    "multimodal_crossmodal_recall" ->
      s"""WITH $headCtes,
         |fr AS (SELECT qid, cid FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("q.qv", "c.qv"), "q.nrm", "c.nrm")} DESC,
         |      c.vec_id) AS rank
         |  FROM qn q, cn c WHERE c.vec_id <> q.vec_id)
         |  WHERE rank <= $K),
         |cm AS (SELECT fr.qid, CAST(count(*) AS BIGINT) AS n_common
         |  FROM fr JOIN ir ON fr.qid = ir.qid AND fr.cid = ir.cid
         |  GROUP BY fr.qid)
         |SELECT q.vec_id AS qid,
         |  CAST(coalesce(cm.n_common, 0) AS BIGINT) AS n_common,
         |  CAST(coalesce(cm.n_common, 0) * 1000 // $K AS BIGINT) AS recall_permille
         |FROM qn q LEFT JOIN cm ON q.vec_id = cm.qid"""
        .stripMargin.replace("\n", " ")
  )
}
