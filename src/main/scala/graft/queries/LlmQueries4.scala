package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Curation, QualityRules, Sampling}

/** Fourth tranche of LLM-training-data pipeline gates: the published
  * quality-filter rulesets (Gopher document rules, C4 line rules),
  * temperature-scaled mixing, and the incremental-ingest snapshot delta.
  * Same oracle discipline as the earlier tranches — integer-exact
  * arithmetic generated constant-for-constant with the DuckDB SQL
  * (the Gopher/C4 oracles are RENDERED from the same Scala constants as
  * the Spark plans, so a threshold can't drift one-sided).
  *
  * The fixture corpus is single-line punctuation-free text, so the
  * line-level C4 gate builds its multi-line documents IN-QUERY from
  * neighboring docs' texts with deterministic punctuation suffixes —
  * the identical construction in both engines (the `pii_scrub` splice
  * pattern); the operator under test sees genuine multi-line docs with
  * genuinely varying line verdicts.
  */
object LlmQueries4 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher document-level quality rules (Rae et al. 2021 §A1.1)
    "quality_gopher" -> ((s, dir) =>
      QualityRules.gopherQuality(Tables.documents(s, dir), "doc_id", "text")),

    // temperature-α=½ mixing: per-source sqrt-flattened budget shares
    "mix_temperature" -> ((s, dir) =>
      Sampling.temperatureMixWeights(Tables.documents(s, dir), "source",
        graft.llm.TextAnalysis.tokenCount(col("text")), tokenBudget = 20000L)),

    // incremental-ingest delta between two synthetic snapshots: old =
    // ids ∤ 7, new = ids ∤ 5 with every 11th text uppercased (changed)
    "corpus_delta" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, upper(col("text")))
            .otherwise(col("text")))
      Curation.snapshotDelta(oldSnap, newSnap, "doc_id", "text")
    }))

  val oracleSql: Map[String, String] = Map(
    "quality_gopher" -> QualityRules.gopherSqlDuck("documents"),

    "mix_temperature" -> {
      val isq = Sampling.isqrtSqlDuck("n_tokens")
      """WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_docs, n_tokens, ISQ AS w_sqrt FROM per),
        |t AS (SELECT CAST(sum(w_sqrt) AS BIGINT) AS w_total FROM w)
        |SELECT source, n_docs, n_tokens, w_sqrt,
        |  CAST(w_sqrt * 1000 // w_total AS BIGINT) AS mix_permille,
        |  CAST(least(1000, (20000 * w_sqrt // w_total) * 1000 // n_tokens) AS BIGINT)
        |    AS rate_permille
        |FROM w, t""".stripMargin.replace("\n", " ").replace("ISQ", isq)
    },

    "corpus_delta" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_hash
        |    FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END) AS new_hash
        |    FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash <> new_hash THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id"""
        .stripMargin.replace("\n", " "))
}
