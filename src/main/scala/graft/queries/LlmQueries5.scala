package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Multimodal, Retrieval, Similarity}

/** Fifth tranche: the round-9 additions — the cross-encoder rerank seam
  * scoring a real (deterministic) model function over embedding payloads,
  * and perceptual-hash image dedup over the sampled video frames. Same
  * oracle discipline as the earlier tranches: integer-exact arithmetic
  * and shared-constant SQL rendering wherever a constant appears on both
  * sides.
  */
object LlmQueries5 {

  private val RerankCand = 20 // coarse Hamming candidates per query
  private val RerankK = 5     // reranked results kept per query

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two-stage retrieve→rerank stack with the scoring INSIDE the
    // mapPartitions model seam: stage 1 is the 32-bit Hamming coarse
    // scan (codes only — 64× less bandwidth than vectors), stage 2
    // ships each (query, candidate) payload pair through
    // Retrieval.rerankBatched where the per-partition "model" computes
    // the exact-int64 cosine. Q·20 pairs ever reach the scorer.
    "rerank_cross_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val payload = emb.select(col("vec_id"),
        array_join(transform(Similarity.quantize(col("embedding")),
          _.cast("string")), ",").as("payload"))
      val cand = Similarity
        .hammingCandidates(emb, emb.filter(col("vec_id") < 50), c = RerankCand)
        .select(col("qid").as("query_id"), col("cid").as("doc_id"))
      Retrieval.rerankBatched(s, cand,
        payload.filter(col("vec_id") < 50), payload,
        "vec_id", "payload", k = RerankK, Retrieval.intCosineScore)
    }),

    // Perceptual-hash (average-hash) dedup over the sampled video
    // frames: 16-bit integer aHash per frame, cross-doc near-dup pairs
    // at Hamming ≤ 2 via pigeonhole chunk blocking — the image-dedup
    // pass of a multimodal training pipeline, closed-form in both engines.
    "multimodal_phash_dedup" -> ((s, dir) =>
      Multimodal.phashNearDupPairs(
        Multimodal.frameAHash(Tables.documents(s, dir), "doc_id", "text",
          stride = 5),
        maxHd = 2))
  )

  val oracleSql: Map[String, String] = Map(
    "rerank_cross_topk" -> {
      val quant = Similarity.quantizeSqlDuck
      val code = Similarity.bucketSql("qv", spark = false, nPlanes = 32)
      s"""WITH v AS (SELECT vec_id, $quant AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm,
         |    $code AS code FROM v),
         |q AS (SELECT * FROM n WHERE vec_id < 50),
         |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY bit_count(xor(q.code, c.code)), c.vec_id) AS hrank
         |  FROM q, n c WHERE c.vec_id <> q.vec_id),
         |cl AS (SELECT query_id, doc_id FROM cand WHERE hrank <= $RerankCand),
         |p AS (SELECT cl.query_id, cl.doc_id,
         |    CAST(${Similarity.dotQSqlDuck("qn.qv", "cn.qv")} AS DOUBLE)
         |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(cn.nrm AS DOUBLE))) AS score
         |  FROM cl JOIN n qn ON cl.query_id = qn.vec_id
         |    JOIN n cn ON cl.doc_id = cn.vec_id),
         |r AS (SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rnk FROM p)
         |SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= $RerankK"""
        .stripMargin.replace("\n", " ")
    },

    "multimodal_phash_dedup" -> {
      val hash = Multimodal.aHashSqlDuck("text", "u.i", "n_px")
      s"""WITH meta AS (SELECT doc_id, text, length(text) AS n_px,
         |    length(text) % 30 + 1 AS n_frames
         |  FROM documents WHERE length(text) % 3 = 2),
         |fr AS (SELECT doc_id * 64 + u.i AS fkey, $hash AS phash
         |  FROM meta, UNNEST(range(0, n_frames, 5)) u(i)),
         |bl AS (SELECT fkey, phash, 0 AS ci, phash % 32 AS cv FROM fr
         |  UNION ALL SELECT fkey, phash, 1, (phash // 32) % 32 FROM fr
         |  UNION ALL SELECT fkey, phash, 2, phash // 1024 FROM fr),
         |pr AS (SELECT DISTINCT a.fkey AS frame_a, a.phash AS pa,
         |    b.fkey AS frame_b, b.phash AS pb
         |  FROM bl a JOIN bl b ON a.ci = b.ci AND a.cv = b.cv
         |    AND a.fkey < b.fkey
         |  WHERE a.fkey // 64 <> b.fkey // 64)
         |SELECT frame_a, frame_b, bit_count(xor(pa, pb)) AS hd
         |FROM pr WHERE bit_count(xor(pa, pb)) <= 2""".stripMargin.replace("\n", " ")
    }
  )
}
