package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units", arXiv:1508.07909
  * §3.2) — the tokenizer-training step of an LLM data pipeline: count
  * adjacent symbol pairs over the corpus, merge the most frequent pair,
  * repeat.
  *
  * Why this shape at 100 TB: the corpus is scanned ONCE, collapsing to a
  * word-frequency table (map-side-combined groupBy — vocabulary-sized,
  * not corpus-sized). Every merge round then operates on that bounded
  * table: one partial-agg shuffle for the pair counts, a 1-row top-1, and
  * a broadcast join applying the merge — so k rounds cost k small-table
  * passes, never k corpus scans. This is exactly the word-dict shortcut
  * every production BPE trainer (subword-nmt, SentencePiece in BPE mode)
  * uses; the distribution point is that the initial dict build is the
  * only petabyte-touching stage.
  *
  * Representation: a word's current segmentation is a paren-wrapped
  * symbol string `"(h)(e)(l)(l)(o)"`. Applying merge (l, r) is
  * `replace(form, "(l)(r)", "(lr)")` — non-overlapping left-to-right in
  * both Spark and DuckDB (verified: `"(a)(a)(a)(a)"` → `"(aa)(aa)"`),
  * which IS greedy BPE application, and because every token is fully
  * parenthesized adjacent matches never share a delimiter (the flaw of
  * the classic space-separated encoding). Symbols stay paren-free
  * because [[wordFreqs]] admits only `^[a-z]+$` words.
  *
  * The k merge rounds are inherently sequential, so like
  * [[Retrieval.mmrRerank]] they are UNROLLED into the plan with
  * per-round materialization (each round reads the previous forms table
  * once for the counts and once for the apply — lazy lineage would
  * double per round). [[mergesSqlDuck]] renders the identical rounds for
  * the DuckDB oracle from the SAME k, so the two engines cannot drift.
  */
object Bpe {

  /** Corpus → (word, freq) over lowercase-alpha words. The ONLY
    * corpus-sized scan in BPE training; partial aggregation collapses
    * each task to ≤|vocab| rows before the exchange.
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** (word, freq) → (word, freq, form) with every char paren-wrapped. */
  def initialForms(wf: DataFrame): DataFrame =
    wf.withColumn("form", regexp_replace(col("word"), "(.)", "($1)"))

  /** Adjacent-pair counts over the current forms: (lhs, rhs, cnt),
    * every occurrence weighted by word freq (a pair repeated inside one
    * word counts each time, per the paper's count).
    */
  def pairCounts(forms: DataFrame): DataFrame = {
    val toks = split(expr("substring(form, 2, length(form) - 2)"), "\\)\\(")
    forms
      .select(col("freq"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      // sequence() on start > stop counts DOWN, so the size guard above
      // is load-bearing, not cosmetic
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS lhs, t[i+1] AS rhs))"))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("freq").as("cnt"))
  }

  /** Learn `k` merges. Returns (merges, forms): merges is
    * (round, lhs, rhs, cnt) — round 1..k in learn order — and forms is
    * the final (word, freq, form) segmentation table. Ties break to the
    * lexicographically smallest (lhs, rhs). If the vocabulary runs out
    * of pairs before round k the remaining rounds are no-ops (left join,
    * not cross join, so forms survive an empty top-1).
    */
  def learnMerges(docs: DataFrame, textCol: String, k: Int)
      : (DataFrame, DataFrame) = {
    val (merges, rounds) = learnMergesWithRounds(docs, textCol, k)
    (merges, rounds.last)
  }

  /** [[learnMerges]] over a caller-supplied (word, freq) table. */
  def learnMergesFromWf(wf: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val (merges, rounds) = learnMergesWithRoundsFromWf(wf, k)
    (merges, rounds.last)
  }

  /** [[learnMerges]] plus every intermediate: the forms table AFTER each
    * round 0..k (index 0 = character-split initial forms). The per-round
    * tables back the compression-curve audit ([[mergeCurve]]) without a
    * second training run; each is already materialized by the loop.
    */
  def learnMergesWithRounds(docs: DataFrame, textCol: String, k: Int)
      : (DataFrame, Vector[DataFrame]) =
    learnMergesWithRoundsFromWf(wordFreqs(docs, textCol), k)

  /** [[learnMergesWithRounds]] over a CALLER-SUPPLIED (word, freq)
    * table — the seam that lets an alternate tokenization feed the same
    * training loop (the unicode tier's `\p{L}`-run + CJK-per-char word
    * stream, [[Unicode.wordFreqs]]). Tie-breaks stay engine-portable on
    * any vocabulary: Spark compares strings in binary UTF-8 order and
    * DuckDB's default collation is binary UTF-8, so (cnt DESC, lhs,
    * rhs) ranks identically for non-ASCII merges too.
    */
  def learnMergesWithRoundsFromWf(wf: DataFrame, k: Int)
      : (DataFrame, Vector[DataFrame]) = {
    require(k >= 1, s"k must be >= 1, got $k")
    var forms = graft.util.Materialize.stable(initialForms(wf))
    var rounds = Vector(forms)
    var merges: DataFrame = null
    for (r <- 1 to k) {
      val top1 = pairCounts(forms)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1)
      val roundMerge = graft.util.Materialize.stable(
        top1.withColumn("round", lit(r)))
      merges =
        if (merges == null) roundMerge else merges.unionByName(roundMerge)
      forms = graft.util.Materialize.stable(
        forms
          .join(broadcast(roundMerge.select("lhs", "rhs")), lit(true), "left")
          .withColumn("form",
            when(col("lhs").isNull, col("form")).otherwise(
              expr("replace(form, concat('(', lhs, ')(', rhs, ')'), " +
                "concat('(', lhs, rhs, ')'))")))
          .select("word", "freq", "form"))
      rounds :+= forms
    }
    (merges.select("round", "lhs", "rhs", "cnt"), rounds)
  }

  /** Tokenizer compression curve: total corpus tokens (Σ freq·n_tokens
    * over the vocab dict) after each merge round 0..k — the artifact a
    * tokenizer training run is sized by (where the curve flattens is
    * where more merges stop paying). Each round's total is a 1-row
    * aggregate over the vocab-sized dict; the corpus is scanned once,
    * by the shared training loop. Output: (round, total_tokens).
    */
  def mergeCurve(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val (_, rounds) = learnMergesWithRounds(docs, textCol, k)
    rounds.zipWithIndex.map { case (f, r) =>
      segmented(f).agg(sum(expr("freq * n_tokens")).as("total_tokens"))
        .select(lit(r).as("round"), col("total_tokens"))
    }.reduce(_ unionByName _)
  }

  /** Final segmentation view: (word, freq, form, n_tokens). */
  def segmented(forms: DataFrame): DataFrame = {
    val toks = split(expr("substring(form, 2, length(form) - 2)"), "\\)\\(")
    forms.withColumn("n_tokens", size(toks).cast("long"))
  }

  /** Encode the corpus under the learned merges: per-doc BPE token
    * accounting — the number every packing/budget decision downstream of
    * tokenizer training uses. The dict (word → n_tokens) is vocab-sized
    * and BROADCASTS back onto the corpus word stream, so encoding is one
    * corpus scan + a map-side join; only dictionary words ([a-z]+, the
    * training vocabulary) are counted — the same admission rule
    * [[wordFreqs]] trained under. Output: (id, n_words, n_bpe_tokens).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val (_, forms) = learnMerges(docs, textCol, k)
    val dict = segmented(forms).select("word", "n_tokens")
    docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .join(broadcast(dict), Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("n_tokens").as("n_bpe_tokens"))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTE prefix `f0 AS (word, freq, form)` — the initial forms
    * over `table`.`textCol`. Shared by both oracle renderings.
    */
  private def initCtesDuck(table: String, textCol: String): String =
    s"""wf AS (SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split_regex(lower($textCol), '\\s+')) AS word
       |    FROM $table) WHERE regexp_matches(word, '^[a-z]+$$')
       |  GROUP BY word),
       |f0 AS (SELECT word, freq,
       |  regexp_replace(word, '(.)', '(\\1)', 'g') AS form FROM wf)"""
      .stripMargin.replace("\n", " ")

  /** DuckDB per-round pair-count CTE body over forms CTE `f`. */
  private def pairsDuck(f: String): String =
    s"""SELECT t[i] AS lhs, t[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq,
       |    string_split(form[2:length(form)-1], ')(') AS t FROM $f),
       |  UNNEST(range(1, len(t))) u(i) WHERE len(t) >= 2
       |  GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  /** `WITH`-prefix containing wf, f0 and the k round CTEs p1..pk,
    * m1..mk, f1..fk — shared by both oracle renderings.
    */
  private def roundChainDuck(table: String, textCol: String, k: Int)
      : String = roundChainDuckFrom(initCtesDuck(table, textCol), k)

  /** The round chain over a CALLER-SUPPLIED init prefix (must define
    * `wf(word, freq)` and `f0(word, freq, form)`) — the oracle twin of
    * [[learnMergesWithRoundsFromWf]].
    */
  def roundChainDuckFrom(initCtes: String, k: Int): String = {
    val rounds = (1 to k).map { r =>
      val prev = s"f${r - 1}"
      s"""p$r AS (${pairsDuck(prev)}),
         |m$r AS (SELECT lhs, rhs, cnt, $r AS round FROM p$r
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |f$r AS (SELECT w.word, w.freq,
         |  CASE WHEN m.lhs IS NULL THEN w.form ELSE
         |    replace(w.form, '(' || m.lhs || ')(' || m.rhs || ')',
         |      '(' || m.lhs || m.rhs || ')') END AS form
         |  FROM $prev w LEFT JOIN m$r m ON true)"""
        .stripMargin.replace("\n", " ")
    }.mkString(", ")
    s"WITH $initCtes, $rounds"
  }

  /** [[mergesSqlDuck]] / [[segmentedSqlDuck]] over a caller init. */
  def mergesSqlDuckFrom(initCtes: String, k: Int): String = {
    val sel = (1 to k).map(r =>
      s"SELECT round, lhs, rhs, cnt FROM m$r").mkString(" UNION ALL ")
    s"${roundChainDuckFrom(initCtes, k)} $sel"
  }
  def segmentedSqlDuckFrom(initCtes: String, k: Int): String =
    s"""${roundChainDuckFrom(initCtes, k)}
       |SELECT word, freq, form,
       |  len(string_split(form[2:length(form)-1], ')(')) AS n_tokens
       |  FROM f$k""".stripMargin.replace("\n", " ")

  /** The oracle for [[pairCounts]] over the initial forms, ranked
    * (cnt DESC, lhs, rhs) and capped at `topN`.
    */
  def pairCountsSqlDuck(table: String, textCol: String, topN: Int): String =
    s"""WITH ${initCtesDuck(table, textCol)},
       |p AS (${pairsDuck("f0")}),
       |r AS (SELECT lhs, rhs, cnt, row_number() OVER
       |  (ORDER BY cnt DESC, lhs, rhs) AS rnk FROM p)
       |SELECT lhs, rhs, cnt, rnk FROM r WHERE rnk <= $topN"""
      .stripMargin.replace("\n", " ")

  /** The oracle for [[learnMerges]]'s merges output: k unrolled rounds
    * generated from the same k.
    */
  def mergesSqlDuck(table: String, textCol: String, k: Int): String = {
    val sel = (1 to k).map(r =>
      s"SELECT round, lhs, rhs, cnt FROM m$r").mkString(" UNION ALL ")
    s"${roundChainDuck(table, textCol, k)} $sel"
  }

  /** The oracle for [[segmented]] over the final round-k forms. */
  def segmentedSqlDuck(table: String, textCol: String, k: Int): String =
    s"""${roundChainDuck(table, textCol, k)}
       |SELECT word, freq, form,
       |  len(string_split(form[2:length(form)-1], ')(')) AS n_tokens
       |  FROM f$k""".stripMargin.replace("\n", " ")

  /** The oracle for [[mergeCurve]]: per-round totals over the same
    * unrolled round chain.
    */
  def mergeCurveSqlDuck(table: String, textCol: String, k: Int): String = {
    val sel = (0 to k).map { r =>
      s"""SELECT $r AS round, CAST(sum(freq *
         |  len(string_split(form[2:length(form)-1], ')('))) AS BIGINT)
         |  AS total_tokens FROM f$r""".stripMargin.replace("\n", " ")
    }.mkString(" UNION ALL ")
    s"${roundChainDuck(table, textCol, k)} $sel"
  }

  /** The oracle for [[encodeCorpus]]: round-k dict joined back onto the
    * corpus word stream.
    */
  def encodeCorpusSqlDuck(table: String, idCol: String, textCol: String,
      k: Int): String =
    s"""${roundChainDuck(table, textCol, k)},
       |dict AS (SELECT word,
       |  CAST(len(string_split(form[2:length(form)-1], ')(')) AS BIGINT)
       |    AS n_tokens FROM f$k),
       |ws AS (SELECT $idCol, unnest(string_split_regex(lower($textCol),
       |  '\\s+')) AS word FROM $table)
       |SELECT ws.$idCol, count(*) AS n_words,
       |  CAST(sum(d.n_tokens) AS BIGINT) AS n_bpe_tokens
       |FROM ws JOIN dict d ON ws.word = d.word GROUP BY ws.$idCol"""
      .stripMargin.replace("\n", " ")
}
