package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Decontam, Packing, Sampling, TextAnalysis}

/** Second tranche of LLM-training-data pipeline gates: train/eval
  * decontamination, corpus mixing weights, and sequence packing.
  * Same oracle discipline as [[LlmQueries]]: integer-exact arithmetic
  * shared constant-for-constant with the DuckDB SQL.
  */
object LlmQueries2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decontamination: docs from the training split (source <> src0)
    // sharing any word-3-gram with the held-out split (source = src0);
    // eval-side grams present in >20 eval docs dropped as boilerplate
    "decontam_overlap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Decontam.overlapReport(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3, maxGramEvalDf = 20)
    }),

    // mixing: cap every source at 800 tokens → per-source keep rates
    // (sources run ~1.3k tokens at sf0.01, so the cap genuinely binds)
    "mix_token_weights" -> ((s, dir) =>
      Sampling.mixWeights(Tables.documents(s, dir), "source",
        TextAnalysis.tokenCount(col("text")), tokenBudget = 800L)),

    // packing: greedy first-fit into 128-token bins per source, id order
    "pack_sequences" -> ((s, dir) =>
      Packing.packGreedy(Tables.documents(s, dir), "doc_id", "source",
        TextAnalysis.tokenCount(col("text")), tokenBudget = 128L)
        .select(col("doc_id"), col("grp").as("source"),
          col("n_tokens"), col("bin_idx")))
  )

  val oracleSql: Map[String, String] = Map(
    "decontam_overlap" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |shh AS (SELECT DISTINCT doc_id, source,
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM sh),
        |corp AS (SELECT doc_id, h FROM shh WHERE source <> 'src0'),
        |ev AS (SELECT doc_id AS eval_id, h FROM shh WHERE source = 'src0'),
        |evk AS (SELECT eval_id, h FROM ev WHERE h IN
        |  (SELECT h FROM ev GROUP BY h HAVING count(*) <= 20)),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id),
        |hits AS (SELECT c.doc_id, count(DISTINCT c.h) AS n_hits,
        |    count(DISTINCT e.eval_id) AS n_eval_docs
        |  FROM corp c JOIN evk e ON c.h = e.h GROUP BY c.doc_id)
        |SELECT h.doc_id, n_hits, n_eval_docs, s.n_grams,
        |  n_hits * 1000 // s.n_grams AS hit_permille
        |FROM hits h JOIN sizes s ON h.doc_id = s.doc_id"""
        .stripMargin.replace("\n", " "),

    "mix_token_weights" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  least(CAST(1000 AS BIGINT),
        |    800 * 1000 // CAST(sum(len(string_split(text, ' '))) AS BIGINT)) AS rate_permille
        |FROM documents GROUP BY source""".stripMargin.replace("\n", " "),

    // the sequential first-fit fold, replayed row-by-row per source via
    // a recursive CTE stepping rn -> rn+1 carrying (bin, fill)
    "pack_sequences" ->
      """WITH RECURSIVE toks AS (SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS n_tokens FROM documents),
        |t AS (SELECT source, doc_id, n_tokens, row_number() OVER (
        |    PARTITION BY source ORDER BY doc_id) AS rn FROM toks),
        |p(source, rn, doc_id, n_tokens, bin_idx, fill) AS (
        |  SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT),
        |    CAST(n_tokens AS BIGINT) FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.source, t.rn, t.doc_id, t.n_tokens,
        |    CASE WHEN p.fill + t.n_tokens <= 128 THEN p.bin_idx ELSE p.bin_idx + 1 END,
        |    CASE WHEN p.fill + t.n_tokens <= 128 THEN p.fill + t.n_tokens
        |         ELSE CAST(t.n_tokens AS BIGINT) END
        |  FROM t JOIN p ON t.source = p.source AND t.rn = p.rn + 1)
        |SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens, bin_idx
        |FROM p""".stripMargin.replace("\n", " ")
  )
}
