package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Published quality-filter rulesets for training-data curation, as
  * codegen'd integer expression pipelines (no UDFs, no floats):
  *
  *   - [[gopherQuality]] — the Gopher document-level rules
  *     (Rae et al. 2021, "Scaling Language Models: ... Gopher",
  *     arXiv:2112.11446 §A1.1).
  *   - [[c4LineFilter]] — the C4 line-level rules (Raffel et al. 2020,
  *     "Exploring the Limits of Transfer Learning with a Unified
  *     Text-to-Text Transformer", arXiv:1910.10683 §2.2).
  *
  * Every feature is an exact integer (ratios in per-mille via integer
  * division) so the DuckDB oracle reproduces the rule outcomes
  * bit-for-bit. Both operators are pure per-row map stages over the text
  * column — embarrassingly parallel at any corpus size — except C4's
  * line reassembly, which shuffles once on the doc key.
  */
object QualityRules {

  /** Gopher's stopword-presence set (Rae et al. 2021 §A1.1: "contains at
    * least 2 of the following English words").
    */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-level quality features + rule verdicts. Thresholds
    * are the paper's (word count 50..100k, mean word length 3..10 chars,
    * ≥80% words with an alphabetic character, symbol-to-word ratio ≤0.1
    * applied to EACH symbol ('#', '...') separately — Rae et al. §A1.1
    * states the ratio per symbol, not over their sum — ≤90%
    * bullet-starting lines, ≤30% ellipsis-ending lines, ≥2 distinct
    * stopwords), expressed in integer per-mille / ×100 fixed point.
    *
    * Feature extraction avoids interpreted higher-order lambdas on the
    * hot path: token counts come from one `split`, the alphabetic-word
    * count from a single anchored regexp scan (every token in
    * `' ' || text` is preceded by exactly one space, so the pattern
    * consumes token-by-token without overlap), symbol/bullet/ellipsis
    * counts from `regexp_extract_all` sizes, and stopword presence from
    * `array_contains` per stopword — all codegen'd.
    */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String,
      stopWords: Seq[String] = GopherStopWords): DataFrame = {
    require(stopWords.nonEmpty, "stopWords must be non-empty")
    val toks = col("_toks")
    val nStopDistinct = stopWords
      .map(s => array_contains(toks, lit(s)).cast("long"))
      .reduce(_ + _)
    docs
      .select(
        col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("n_chars"),
        split(col(textCol), " ").as("_toks"),
        // tokens containing >=1 ASCII letter, counted by one regex scan
        size(regexp_extract_all(concat(lit(" "), col(textCol)),
          lit(" [^ ]*[a-zA-Z][^ ]*"), lit(0))).cast("long").as("n_alpha_words"),
        // Gopher's symbol set: hash marks and ellipses, counted per
        // symbol (the ≤0.1 ratio applies to each independently)
        size(regexp_extract_all(col(textCol), lit("#"), lit(0)))
          .cast("long").as("n_hash"),
        size(regexp_extract_all(col(textCol), lit("\\.\\.\\."), lit(0)))
          .cast("long").as("n_ellipsis_sym"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"),
        size(regexp_extract_all(concat(lit("\n"), col(textCol)),
          lit("\n[\\-\\*•]"), lit(0))).cast("long").as("n_bullet_lines"),
        size(regexp_extract_all(concat(col(textCol), lit("\n")),
          lit("\\.\\.\\.\n"), lit(0))).cast("long").as("n_ellipsis_lines"))
      .select(
        col("doc_id"), col("n_chars"),
        size(toks).cast("long").as("n_words"),
        col("n_alpha_words"), col("n_hash"), col("n_ellipsis_sym"),
        col("n_lines"), col("n_bullet_lines"), col("n_ellipsis_lines"),
        nStopDistinct.as("n_stop_distinct"))
      .withColumn("avg_word_len_x100",
        expr("(n_chars - (n_words - 1)) * 100 div n_words"))
      .withColumn("alpha_permille", expr("n_alpha_words * 1000 div n_words"))
      .withColumn("hash_permille", expr("n_hash * 1000 div n_words"))
      .withColumn("ellipsis_sym_permille", expr("n_ellipsis_sym * 1000 div n_words"))
      .withColumn("bullet_permille", expr("n_bullet_lines * 1000 div n_lines"))
      .withColumn("ellipsis_permille", expr("n_ellipsis_lines * 1000 div n_lines"))
      .withColumn("r_word_count", col("n_words").between(50L, 100000L))
      .withColumn("r_word_len", col("avg_word_len_x100").between(300L, 1000L))
      .withColumn("r_alpha", col("alpha_permille") >= 800L)
      .withColumn("r_symbol",
        col("hash_permille") <= 100L && col("ellipsis_sym_permille") <= 100L)
      .withColumn("r_bullet", col("bullet_permille") <= 900L)
      .withColumn("r_ellipsis", col("ellipsis_permille") <= 300L)
      .withColumn("r_stop", col("n_stop_distinct") >= 2L)
      .withColumn("passes_gopher",
        col("r_word_count") && col("r_word_len") && col("r_alpha") &&
          col("r_symbol") && col("r_bullet") && col("r_ellipsis") && col("r_stop"))
  }

  /** The matching DuckDB SQL for [[gopherQuality]] over a relation
    * exposing (doc_id, text) as `src` — generated from the same constants
    * so thresholds can never drift between engines.
    */
  /** The f-stage feature SELECT shared by [[gopherSqlDuck]] and
    * [[gopherPassSqlDuck]] — one definition so the full gate and the
    * composable pass filter cannot drift.
    */
  private def gopherFeatureSelect(src: String, stopWords: Seq[String]): String = {
    val stopSum = stopWords
      .map(s => s"CAST(list_contains(string_split(text, ' '), '$s') AS BIGINT)")
      .mkString(" + ")
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |  CAST(len(regexp_extract_all(' ' || text, ' [^ ]*[a-zA-Z][^ ]*')) AS BIGINT) AS n_alpha_words,
       |  CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS n_hash,
       |  CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_ellipsis_sym,
       |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
       |  CAST(len(regexp_extract_all(chr(10) || text, chr(10) || '[\\-\\*' || chr(8226) || ']')) AS BIGINT) AS n_bullet_lines,
       |  CAST(len(regexp_extract_all(text || chr(10), '\\.\\.\\.' || chr(10))) AS BIGINT) AS n_ellipsis_lines,
       |  CAST($stopSum AS BIGINT) AS n_stop_distinct
       |  FROM $src""".stripMargin.replace("\n", " ")
  }

  /** Composable pass filter: `SELECT doc_id FROM (...)` of documents
    * passing ALL Gopher rules — usable inside a larger WITH chain (no
    * nested WITH in DuckDB).
    */
  def gopherPassSqlDuck(src: String,
      stopWords: Seq[String] = GopherStopWords): String =
    s"""SELECT doc_id FROM (${gopherFeatureSelect(src, stopWords)}) gf
       |WHERE n_words BETWEEN 50 AND 100000
       |  AND (n_chars - (n_words - 1)) * 100 // n_words BETWEEN 300 AND 1000
       |  AND n_alpha_words * 1000 // n_words >= 800
       |  AND n_hash * 1000 // n_words <= 100
       |  AND n_ellipsis_sym * 1000 // n_words <= 100
       |  AND n_bullet_lines * 1000 // n_lines <= 900
       |  AND n_ellipsis_lines * 1000 // n_lines <= 300
       |  AND n_stop_distinct >= 2""".stripMargin.replace("\n", " ")

  def gopherSqlDuck(src: String,
      stopWords: Seq[String] = GopherStopWords): String = {
    s"""WITH f AS (${gopherFeatureSelect(src, stopWords)}),
       |g AS (SELECT *,
       |  (n_chars - (n_words - 1)) * 100 // n_words AS avg_word_len_x100,
       |  n_alpha_words * 1000 // n_words AS alpha_permille,
       |  n_hash * 1000 // n_words AS hash_permille,
       |  n_ellipsis_sym * 1000 // n_words AS ellipsis_sym_permille,
       |  n_bullet_lines * 1000 // n_lines AS bullet_permille,
       |  n_ellipsis_lines * 1000 // n_lines AS ellipsis_permille
       |  FROM f)
       |SELECT doc_id, n_chars, n_words, n_alpha_words, n_hash, n_ellipsis_sym,
       |  n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_distinct,
       |  avg_word_len_x100, alpha_permille, hash_permille, ellipsis_sym_permille,
       |  bullet_permille, ellipsis_permille,
       |  n_words BETWEEN 50 AND 100000 AS r_word_count,
       |  avg_word_len_x100 BETWEEN 300 AND 1000 AS r_word_len,
       |  alpha_permille >= 800 AS r_alpha,
       |  hash_permille <= 100 AND ellipsis_sym_permille <= 100 AS r_symbol,
       |  bullet_permille <= 900 AS r_bullet,
       |  ellipsis_permille <= 300 AS r_ellipsis,
       |  n_stop_distinct >= 2 AS r_stop,
       |  (n_words BETWEEN 50 AND 100000) AND (avg_word_len_x100 BETWEEN 300 AND 1000)
       |    AND alpha_permille >= 800
       |    AND hash_permille <= 100 AND ellipsis_sym_permille <= 100
       |    AND bullet_permille <= 900 AND ellipsis_permille <= 300
       |    AND n_stop_distinct >= 2 AS passes_gopher
       |FROM g""".stripMargin.replace("\n", " ")
  }

  /** C4 line-level filtering (Raffel et al. 2020 §2.2): keep a line iff
    * it ends in terminal punctuation, has ≥ `minWords` words, and does
    * not mention "javascript" (the paper's only line-level kill); drop
    * the whole document if any line contains "lorem ipsum" OR a curly
    * brace (both are PAGE kills in §2.2 — '{' flags source code). Kept
    * lines are reassembled in original order; documents with zero
    * surviving lines disappear (C4 additionally drops <3-sentence docs —
    * that is the caller's threshold on `n_kept`).
    *
    * Scale shape: one `posexplode` map stage (a line's verdict depends
    * only on itself), one doc-keyed shuffle for reassembly with partial
    * aggregation on the counts; `collect_list` skips the NULL entries of
    * dropped lines so only kept lines travel, and `array_sort` on
    * (line_no, line) structs restores order without a global sort.
    */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5): DataFrame = {
    val keep = col("line").rlike("[.!?\"]$") &&
      size(split(col("line"), " ")) >= minWords &&
      !col("line").contains("javascript")
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("keep", keep)
      // '{' kills the PAGE (Raffel §2.2 — code marker), like 'lorem
      // ipsum'; only the 'javascript' rule is line-level
      .withColumn("bad_doc",
        col("line").contains("lorem ipsum") || col("line").contains("{"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("n_kept"),
        max(col("bad_doc")).as("_bad"),
        array_join(
          expr("transform(array_sort(collect_list(CASE WHEN keep THEN " +
            "struct(line_no, line) END)), x -> x.line)"),
          "\n").as("text_kept"))
      .filter(!col("_bad") && col("n_kept") >= 1L)
      .drop("_bad")
  }

  /** DuckDB SQL for [[c4LineFilter]] over a relation exposing
    * (doc_id, text) as `src`, generated from the same `minWords`.
    * `withCtes` lets the caller prepend fixture-construction CTEs
    * (DuckDB has no nested WITH).
    */
  def c4SqlDuck(src: String, minWords: Int = 5, withCtes: String = ""): String =
    s"""WITH ${withCtes}ln AS (SELECT doc_id,
       |    generate_subscripts(string_split(text, chr(10)), 1) AS line_no,
       |    unnest(string_split(text, chr(10))) AS line
       |  FROM $src),
       |v AS (SELECT doc_id, line_no, line,
       |    regexp_matches(line, '[.!?"]$$')
       |      AND len(string_split(line, ' ')) >= $minWords
       |      AND NOT contains(line, 'javascript') AS keep,
       |    contains(line, 'lorem ipsum') OR contains(line, '{') AS bad_doc
       |  FROM ln),
       |agg AS (SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_lines,
       |    CAST(coalesce(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept,
       |    bool_or(bad_doc) AS bad,
       |    string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY line_no) AS text_kept
       |  FROM v GROUP BY doc_id)
       |SELECT doc_id, n_lines, n_kept, text_kept
       |FROM agg WHERE NOT bad AND n_kept >= 1""".stripMargin.replace("\n", " ")

  final case class ClassifierScore(doc_id: Long, score_permille: Option[Long])

  /** Model-scored quality classifier seam — the LEARNED tier above the
    * closed-form rulesets: production pipelines (FineWeb-Edu's
    * educational-value classifier, DCLM's fastText filter) score every
    * document with a trained model and threshold/sample on the score.
    * The model itself is external (no closed form); what the engine owns
    * — the [[graft.llm.Retrieval.rerankBatched]] seam discipline — is
    * the distributed plumbing: docs flow through `mapPartitions` so ONE
    * model session per PARTITION amortizes across its documents (never
    * per-row init), the scorer is a caller-supplied `String => Long`
    * permille function, and a NULL text scores NULL rather than
    * silently dropping the row. Pure map stage — embarrassingly
    * parallel at any corpus size; calibrate the stub (or a real model)
    * with [[graft.ops.TableProfile.rocAuc]] against ground truth.
    */
  def classifierScores(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, idCol: String, textCol: String,
      scoreOne: String => Long = stubEduScore): DataFrame =
    classifierScoresInit(spark, docs, idCol, textCol, () => scoreOne)

  /** The seam's FACTORY form — for scorers with real per-partition
    * state (a weight table fetched from a broadcast, a model session,
    * a native handle): `mkScorer` runs EXACTLY ONCE per partition,
    * inside the executor task, and the scorer it returns is applied to
    * every document of that partition ([[graft.llm.NgramHead]] is the
    * shipped example; the seam spec counts the inits). [[classifierScores]]
    * is this with a stateless closure.
    */
  def classifierScoresInit(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, idCol: String, textCol: String,
      mkScorer: () => String => Long): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("_txt"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        // per-partition model init amortizes here (the seam contract)
        val scoreOne = mkScorer()
        rows.map { case (id, t) =>
          ClassifierScore(id, Option(t).map(scoreOne))
        }
      }
      .toDF()
  }

  /** Deterministic stub classifier: mean of the lexical-diversity ratio
    * (distinct/total tokens) and the long-word ratio (≥6 code points),
    * integer per-mille — a monotone "informational density" proxy the
    * specs and the DuckDB oracle ([[stubEduScoreSqlDuck]]) reproduce
    * bit-for-bit. Code points (not UTF-16 units) so the length rule
    * matches DuckDB's len() beyond the BMP.
    */
  def stubEduScore(text: String): Long = {
    val toks = text.split(" ", -1) // keep trailing empties: string_split does
    val n = toks.length.toLong
    val uniq = toks.distinct.length.toLong
    val long6 = toks.count(t => t.codePointCount(0, t.length) >= 6).toLong
    (uniq * 1000 / n + long6 * 1000 / n) / 2
  }

  /** The stub scorer as a DuckDB expression over a `text` column. */
  val stubEduScoreSqlDuck: String =
    """(len(list_distinct(string_split(text, ' '))) * 1000
      |  // len(string_split(text, ' '))
      | + len(list_filter(string_split(text, ' '), x -> len(x) >= 6)) * 1000
      |  // len(string_split(text, ' '))) // 2""".stripMargin.replace("\n", " ")
}
