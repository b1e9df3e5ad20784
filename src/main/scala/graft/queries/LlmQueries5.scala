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

    // Per-span surgical decontamination (the island/gap upgrade over
    // decontam_trim's hull): only the contaminated islands are cut, so
    // clean text BETWEEN two quoted eval snippets survives. Same eval
    // split/cap as decontam_trim for comparability.
    "decontam_trim_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.llm.Decontam.trimContaminatedSpans(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3, maxGramEvalDf = 20)
        .select("doc_id", "source", "text")
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

    // gaps-and-islands over hit starts: break when the next window
    // starts more than n (=3, mergeGap 0) past the previous start; the
    // kept text is the ordered tokens outside every island span
    "decontam_trim_spans" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, source, i AS start, array_to_string(t[i:i+2], ' ') AS w
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i) WHERE len(t) >= 3),
        |wh AS (SELECT doc_id, source, start,
        |  CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) AS h FROM w),
        |evg AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM wh WHERE source = 'src0')
        |  GROUP BY h HAVING count(*) <= 20),
        |hit AS (SELECT doc_id, start FROM wh
        |  WHERE source <> 'src0' AND h IN (SELECT h FROM evg)),
        |brk AS (SELECT doc_id, start,
        |  CASE WHEN lag(start) OVER (PARTITION BY doc_id ORDER BY start) IS NULL
        |    OR start > lag(start) OVER (PARTITION BY doc_id ORDER BY start) + 3
        |    THEN 1 ELSE 0 END AS b FROM hit),
        |isl AS (SELECT doc_id, start, sum(b) OVER (PARTITION BY doc_id
        |  ORDER BY start ROWS UNBOUNDED PRECEDING) AS g FROM brk),
        |spans AS (SELECT doc_id, g, min(start) AS s, max(start) + 2 AS e
        |  FROM isl GROUP BY doc_id, g),
        |tp AS (SELECT doc_id, source, p, t[p] AS tok
        |  FROM toks, UNNEST(range(1, len(t) + 1)) AS r(p) WHERE source <> 'src0'),
        |kept AS (SELECT tp.doc_id, array_to_string(list(tp.tok ORDER BY tp.p), ' ') AS text
        |  FROM tp WHERE NOT EXISTS (SELECT 1 FROM spans sp
        |    WHERE sp.doc_id = tp.doc_id AND tp.p BETWEEN sp.s AND sp.e)
        |  GROUP BY tp.doc_id),
        |sd AS (SELECT DISTINCT doc_id FROM spans)
        |SELECT d.doc_id, d.source,
        |  CASE WHEN sd.doc_id IS NULL THEN d.text ELSE k.text END AS text
        |FROM documents d
        |LEFT JOIN sd ON d.doc_id = sd.doc_id
        |LEFT JOIN kept k ON d.doc_id = k.doc_id
        |WHERE d.source <> 'src0'
        |  AND (sd.doc_id IS NULL OR (k.text IS NOT NULL AND len(k.text) > 0))"""
        .stripMargin.replace("\n", " "),

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
