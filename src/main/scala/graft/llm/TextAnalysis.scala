package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality features, heuristic language ID. All integer-exact expression
  * arithmetic (no floats, no UDFs) — portable to the DuckDB oracle and
  * fully codegen'd per row, so throughput is scan-bound at any SF.
  */
object TextAnalysis {

  /** English-ish stopword markers for the heuristic language scorer. */
  val StopWords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  def tokens(textCol: Column): Column = split(textCol, " ")

  /** Native one-pass token count ([[graft.functions.TokenCount]]) —
    * bit-identical to `size(split(s, ' '))` on non-null input (and on
    * NULL under the ANSI `size` contract this engine runs with), without
    * materializing the token array. Call sites that also need the array
    * keep using [[tokens]].
    */
  def tokenCount(textCol: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(graft.functions.TokenCount(expression(textCol)))
  }

  /** BPE-style pre-tokenization pattern (the GPT-2 family's split shape:
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs, residual whitespace) — restricted to constructs
    * RE2 also supports (no lookahead) so the DuckDB oracle applies the
    * IDENTICAL pattern. Token count under this split approximates BPE
    * pre-merge sequence length, the usual training-data budget unit.
    */
  val BpeishPattern: String =
    """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  def bpeishTokens(textCol: Column): Column =
    regexp_extract_all(textCol, lit(BpeishPattern), lit(0))

  def bpeishTokenCount(textCol: Column): Column = size(bpeishTokens(textCol))

  /** Quality features, all exact ints:
    * n_chars, n_tokens, n_unique tokens, stopword count, avg token length
    * ×100 (integer division; token chars = n_chars − (n_tokens−1) spaces).
    *
    * The token array is bound to `_toks` ONCE and every feature derives
    * from it; the stopword count is Σ_s (size − size(array_remove(·, s)))
    * — occurrence semantics identical to the oracle's list_filter-IN, but
    * built entirely from codegen'd collection expressions instead of an
    * interpreted higher-order `filter` lambda (the measured 4.7× cost).
    */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = col("_toks")
    val nStop = StopWords
      .map(s => size(toks) - size(array_remove(toks, lit(s))))
      .reduce(_ + _)
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      tokens(col(textCol)).as("_toks"))
      .select(
        col("doc_id"),
        col("n_chars"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_unique"),
        nStop.as("n_stop"))
      .withColumn("avg_token_len_x100",
        expr("(n_chars - (n_tokens - 1)) * 100 div n_tokens"))
  }

  /** Repetition profile — the Gopher-style repetitiousness signals
    * (Rae et al. 2021 §A1.1: duplicate-token and top-n-gram fractions)
    * that gate machine-generated / boilerplate text out of training sets.
    * Counts are exact integers (fractions are a trivial post-division;
    * integers keep the oracle compare exact):
    *   n_tokens, n_distinct, top_tok_n (count of the most frequent
    *   token), top_bigram_n (count of the most frequent bigram; 0 when
    *   the doc has <2 tokens).
    *
    * Scale shape: two partial-aggregated shuffles (token counts, bigram
    * counts) keyed by doc id + one join on doc id — no per-doc state
    * beyond a count row, no skew risk beyond a degenerate single doc
    * (bounded by max doc length, not corpus size).
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the tokenized frame feeds BOTH aggregate branches of the join —
    // materialize once or the scan + split run twice
    val base = graft.util.Materialize.stable(
      docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks")))
    val tokStats = base
      .select(col("doc_id"), explode(col("_toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_tok_n"))
    val bigrams = expr(
      "transform(sequence(1, size(_toks) - 1), i -> concat_ws(' ', slice(_toks, i, 2)))")
    val bigramStats = base
      .filter(size(col("_toks")) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bigram_n"))
    tokStats.join(bigramStats, Seq("doc_id"), "left")
      .withColumn("top_bigram_n", coalesce(col("top_bigram_n"), lit(0L)))
  }

  /** Token-window chunking — context-window packing for training: split
    * each document into windows of `size` tokens advancing by
    * `size - overlap`, keeping the partial tail window (a short doc
    * yields exactly one chunk of itself). Pure per-row explode — the
    * chunk set of a doc depends on nothing else, so the operator is a
    * map stage at any corpus size; downstream packing/shuffling is the
    * consumer's choice.
    *
    * Start positions (1-based): 1, 1+stride, …, up to
    * `max(1, n_tokens − size + stride)` — the last start that still
    * contributes ≥1 new token. Identical arithmetic in the DuckDB
    * oracle, so chunk strings match byte-for-byte.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < size, got size=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        explode(expr(
          s"sequence(1, greatest(1, size(_toks) - $chunkSize + $stride), $stride)"))
          .as("_start"))
      .select(
        col("doc_id"),
        ((col("_start") - 1) / stride).cast("int").as("chunk_idx"),
        expr(s"slice(_toks, _start, $chunkSize)").as("_chunk"))
      .select(
        col("doc_id"), col("chunk_idx"),
        size(col("_chunk")).as("chunk_tokens"),
        concat_ws(" ", col("_chunk")).as("chunk_text"))
  }

  /** Composite keep/drop filter — the decision layer over the quality
    * signals, mirroring the published filter stacks (C4, Gopher rules):
    * each doc gets a verdict and the FIRST failing rule as its reason
    * (rule order = the documented precedence, so drop attribution is
    * deterministic). All thresholds integer, reusing
    * [[repetitionProfile]]'s exact counts — the filter adds zero plan
    * cost beyond the profile itself (a codegen'd CASE over its output).
    * Output: (doc_id, n_tokens, uniq_permille, top_tok_permille, reason,
    * keep).
    */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long, maxTokens: Long, minUniqPermille: Long,
      maxTopTokPermille: Long): DataFrame =
    // the token-count branch of [[repetitionProfile]] only — the filter
    // rules need no bigram stats, so skip that branch's explode + join
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_tok_n"))
      .withColumn("uniq_permille", expr("n_distinct * 1000 div n_tokens"))
      .withColumn("top_tok_permille", expr("top_tok_n * 1000 div n_tokens"))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, lit("too_short"))
          .when(col("n_tokens") > maxTokens, lit("too_long"))
          .when(col("uniq_permille") < minUniqPermille, lit("low_diversity"))
          .when(col("top_tok_permille") > maxTopTokPermille, lit("repetitive"))
          .otherwise(lit("keep")))
      .withColumn("keep", col("reason") === "keep")
      .select("doc_id", "n_tokens", "uniq_permille", "top_tok_permille",
        "reason", "keep")

  /** Heuristic language ID: stopword-density score in per-mille; 'en'
    * when density ≥ threshold else 'und'. (An n-gram-profile classifier
    * reduces to the same shape: per-marker-set counts → argmax; kept to
    * one set here so the oracle stays a single CASE.)
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String,
      thresholdPerMille: Int = 50): DataFrame =
    qualityFeatures(docs, idCol, textCol)
      .withColumn("stop_per_mille", expr("n_stop * 1000 div n_tokens"))
      .withColumn("predicted_lang",
        when(col("stop_per_mille") >= thresholdPerMille, lit("en")).otherwise(lit("und")))
      .select("doc_id", "stop_per_mille", "predicted_lang")

  /** Tokenizer fertility per predicted language: BPE-ish tokens per
    * 1000 whitespace words (`fertility_permille`) and chars per token
    * ×100 — the standard "how expensive is this language under my
    * tokenizer" audit (fertility drives per-language training cost and
    * context-window reach; tokenizer-parity studies report exactly this
    * ratio). Language is the engine's own [[languageId]] verdict,
    * inlined so the whole audit is ONE map pass over the corpus into a
    * languages-sized partial agg — no join, no second scan, no state.
    *
    * All-integer and overflow-safe by construction at 100 TB: the
    * summed terms are per-doc counts (int64 holds 9.2·10¹⁸; a 100 TB
    * corpus is ~10¹⁴ chars) and the ×1000/×100 numerators stay three
    * orders below the bound.
    */
  def tokenizerFertility(docs: DataFrame, idCol: String, textCol: String,
      thresholdPerMille: Int = 50): DataFrame = {
    val toks = col("_toks")
    val nStop = StopWords
      .map(s => size(toks) - size(array_remove(toks, lit(s))))
      .reduce(_ + _)
    docs
      .withColumn("_toks", split(col(textCol), " "))
      .select(
        size(col("_toks")).cast("long").as("n_words"),
        nStop.cast("long").as("n_stop"),
        bpeishTokenCount(col(textCol)).cast("long").as("n_bpe"),
        length(col(textCol)).cast("long").as("n_chars"))
      .withColumn("predicted_lang",
        when(expr("n_stop * 1000 div n_words") >= thresholdPerMille,
          lit("en")).otherwise(lit("und")))
      .groupBy("predicted_lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_bpe").as("n_bpe_tokens"), sum("n_chars").as("n_chars"))
      .withColumn("fertility_permille", expr("1000 * n_bpe_tokens div n_words"))
      .withColumn("chars_per_token_x100", expr("100 * n_chars div n_bpe_tokens"))
  }

  /** Canonical text normalization — the standard pre-stage that makes
    * near-dup detection robust to case/punctuation variance (every
    * published dedup pipeline normalizes before shingling): lowercase,
    * non-alphanumerics to spaces, whitespace runs collapsed, trimmed.
    * Pure per-row codegen'd expressions — no shuffle, no state; both
    * regexes are RE2-safe and render identically in the oracle (DuckDB
    * needs the explicit 'g' flag where Spark replaces globally).
    * An all-punctuation doc normalizes to "" (one empty token under the
    * whitespace convention, like every tokenizer entry point here).
    */
  def normalize(textCol: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(textCol), "[^a-z0-9 ]", " "), " +", " "))

  /** Normalization as a frame op: (doc_id, norm_text, n_tokens). */
  def normalized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      normalize(col(textCol)).as("norm_text"))
      .withColumn("n_tokens", tokenCount(col("norm_text")))

  /** One row per bigram occurrence: (doc_id, prefix hash, bigram hash).
    * Hashes are [[Dedup.tokenHash]], so every downstream exchange moves
    * fixed-width int64 keys, never strings.
    */
  private def bigramHashes(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.llm.Dedup.widen(
      docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks")))
      .select(col("doc_id"), explode(when(size(col("_toks")) >= 2,
        expr("transform(sequence(1, size(_toks) - 1), " +
             "i -> struct(element_at(_toks, i) AS w1, " +
             "concat_ws(' ', slice(_toks, i, 2)) AS w12))"))
        .otherwise(array())).as("g"))
      .select(col("doc_id"),
        // tokenHashNN: w1/w12 come from element_at/concat_ws over split()
        // output — never null; both hashes are equi-join keys downstream,
        // so nullable output would double-evaluate both md5 chains per
        // bigram under the inferred isnotnull filters
        graft.llm.Dedup.tokenHashNN(col("g.w1")).as("h1"),
        graft.llm.Dedup.tokenHashNN(col("g.w12")).as("h12"))

  /** Bigram language-model fluency score — the KenLM-perplexity-filter
    * shape (CCNet, Wenzek et al. 2020): train bigram statistics on a
    * clean REFERENCE corpus (CCNet uses Wikipedia; pass the curated /
    * held-out split), then score each corpus doc by the mean conditional
    * probability of its transitions under that model. Gibberish scores
    * ~0 (its transitions never occur in the reference); fluent text
    * tracking the reference's transition structure scores high. The
    * reference must be a SEPARATE held-out corpus: self-training makes
    * every hapax transition deterministic (p=1), rewarding exactly the
    * junk the filter exists to drop.
    *
    * All-integer: per-bigram `p_permille = c(w₁w₂)·1000 div (c(w₁·)+1)`
    * — reference counts, add-one in the denominator so unseen-prefix
    * transitions are 0, not a division error — and doc score =
    * Σ p_permille div n_bigrams. Engine-exact, so oracle-gateable, where
    * a float log-perplexity is not.
    *
    * Scale shape: all shuffles move int64 hashes — (1)/(2) the reference
    * bigram/prefix count partial-aggs (vocab-bounded outputs), (3)/(4)
    * LEFT equi-joins re-attaching them to the corpus bigram stream
    * (never broadcast — a 100 TB corpus's vocab is not driver-sized),
    * (5) the per-doc sum. Hash collisions merge count cells identically
    * in both engines (documented, same trade as the shingle family).
    *
    * Output: one row per corpus doc with ≥ 1 bigram — (doc_id,
    * n_bigrams, score_permille); single-token and empty docs have no
    * transitions to judge and are left to the length gates of
    * [[qualityFilter]].
    */
  /** The trained bigram statistics behind [[lmFluency]] — vocab-bounded
    * count tables keyed on int64 hashes. Build once with [[lmModel]] and
    * reuse across many scoring calls (a streaming pipeline scores every
    * micro-batch against the same static reference).
    */
  final case class LmStats(bigrams: DataFrame, prefixes: DataFrame)

  /** Train the reference bigram/prefix counts, each materialized so
    * repeated scoring (per-batch, per-split) reuses them instead of
    * re-aggregating the reference.
    */
  def lmModel(reference: DataFrame, idCol: String, textCol: String): LmStats = {
    val ref = bigramHashes(reference, idCol, textCol)
    LmStats(
      graft.util.Materialize.stable(
        ref.groupBy("h12").agg(count(lit(1)).as("c12"))),
      graft.util.Materialize.stable(
        ref.groupBy("h1").agg(count(lit(1)).as("c1"))))
  }

  /** Score a corpus against an already-trained [[LmStats]] — the
    * per-batch half of [[lmFluency]], same output contract.
    */
  def scoreFluency(corpus: DataFrame, model: LmStats, idCol: String,
      textCol: String): DataFrame =
    bigramHashes(corpus, idCol, textCol)
      .join(model.bigrams, Seq("h12"), "left")
      .join(model.prefixes, Seq("h1"), "left")
      .withColumn("p_permille",
        expr("coalesce(c12, 0L) * 1000 div (coalesce(c1, 0L) + 1)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p_permille").as("_s"))
      .withColumn("score_permille", expr("_s div n_bigrams"))
      .select("doc_id", "n_bigrams", "score_permille")

  def lmFluency(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String): DataFrame =
    scoreFluency(corpus, lmModel(reference, idCol, textCol), idCol, textCol)

  /** Spelling-variant candidate pairs over the corpus VOCABULARY —
    * typo/variant mining (the SymSpell-style cleanup pass): distinct
    * word pairs within `maxDist` edits. The join runs over the
    * vocabulary, not the corpus (|V| is sub-linear in corpus size, so
    * the op is corpus-scale-independent after the one word-count scan),
    * and blocks on LENGTH — an edit-distance-≤d pair can differ by at
    * most d characters of length, so the longer word explodes to the
    * d+1 candidate lengths and the join is a plain equi-join, never
    * vocab × vocab. levenshtein() is unit-cost in both engines.
    */
  def vocabEditPairs(docs: DataFrame, textCol: String, maxDist: Int,
      minFreq: Long): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val vocab = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
    val a = vocab.select(col("word").as("word_a"), col("freq").as("freq_a"),
      length(col("word")).as("len_a"),
      explode(expr(s"sequence(length(word) - $maxDist, length(word))"))
        .as("blk"))
    val b = vocab.select(col("word").as("word_b"), col("freq").as("freq_b"),
      length(col("word")).as("len_b"))
    a.join(b, col("blk") === col("len_b"))
      // each unordered pair exactly once: the longer word owns the pair,
      // ties broken lexicographically
      .filter(col("len_a") > col("len_b") ||
        (col("len_a") === col("len_b") && col("word_a") < col("word_b")))
      .withColumn("dist", levenshtein(col("word_a"), col("word_b")))
      .filter(col("dist") <= maxDist)
      .select("word_a", "word_b", "freq_a", "freq_b", "dist")
  }

  /** CCNet-style per-language fluency terciles (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets" §4.4: split
    * each language's corpus into head/middle/tail by LM score, then
    * sample mostly from the head). `scores` is [[lmFluency]] output;
    * `langs` maps doc → language. The tercile test is exact integer rank
    * arithmetic (rnk·3 ≤ n → head, ≤ 2n → middle, else tail) per
    * language partition — no float quantile, no global sort; the window
    * partitions by language so every task is one language's ranking.
    * Output: one row per (lang, bucket) with population stats — the
    * table CCNet's per-bucket sampling rates are set from.
    */
  def fluencyBuckets(scores: DataFrame, langs: DataFrame, idCol: String,
      langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(langCol)
      .orderBy(col("score_permille").desc, col(idCol))
    val cw = Window.partitionBy(langCol)
    scores.join(langs.select(col(idCol), col(langCol)), Seq(idCol))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(cw))
      .withColumn("bucket",
        when(col("rnk") * 3 <= col("n_lang"), lit("head"))
          .when(col("rnk") * 3 <= col("n_lang") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col(langCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min("score_permille").as("min_score"),
        max("score_permille").as("max_score"))
  }

  /** Per-source distribution-drift audit: a scaled χ²-style distance
    * between each source's token distribution and the whole corpus —
    * the "did this feed change character" check run before admitting a
    * new crawl batch into the mix. For every token the SOURCE uses
    * (present-token χ²; absent tokens contribute nothing, documented),
    * expected count `e = corpus_count · source_tokens div corpus_total`
    * and term `(o − e)² · 1000 div (e + 1)` — all integer (order-
    * independent sums, oracle-exact; the +1 makes rare-token terms
    * finite instead of a division by a floored-to-zero expectation).
    *
    * Arithmetic width — built for the operator's own target regime (a
    * 100 TB corpus is ~2·10¹³ tokens, far past the 3·10⁹-token bound
    * int64 products would impose): the `c·st` and `(o−e)²` products are
    * computed in DECIMAL(38,0) (exact to 10³⁸, room for a 10¹⁹-token
    * corpus), and each div quotient provably fits int64 — `e ≤ st` and
    * `term < 1000·corpus_total` (case e=0: o² ≤ c·st < tt; case e≥1:
    * e+1 > c·st/tt bounds the quotient by 1000·tt) — so only the
    * per-source SUM of terms can exceed int64; it is summed in
    * DECIMAL(38,0) and cast to BIGINT at the end, where ANSI mode fails
    * LOUDLY instead of wrapping (overflow-regime unit test in
    * QualityRulesSpec).
    *
    * Scale shape: token counts partial-agg per (source, hash); the
    * vocab-sized corpus table joins back by hash (honest equi-join —
    * at web scale the vocab is still ≪ the corpus); the 1-row corpus
    * total broadcasts. Output: (source, n_tokens, n_distinct,
    * chi2_scaled).
    */
  def sourceDriftChi2(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame =
    driftChi2FromCounts(graft.util.Materialize.stable(
      docs.select(col(srcCol).as("source"),
          explode(tokens(col(textCol))).as("_t"))
        .select(col("source"), Dedup.tokenHashNN(col("_t")).as("h"))
        .groupBy("source", "h").agg(count(lit(1)).as("o"))))

  /** The χ² core over a pre-aggregated (source, h, o) count table —
    * split out so the overflow regime (counts whose products exceed
    * int64) is unit-testable without materializing 10⁹ rows, and so a
    * pipeline that already holds token counts skips the tokenize pass.
    * Arithmetic discipline documented at [[sourceDriftChi2]].
    */
  def driftChi2FromCounts(tok: DataFrame): DataFrame = {
    val corpus = tok.groupBy("h").agg(sum("o").as("c"))
    val srcTotals = tok.groupBy("source").agg(sum("o").as("st"),
      count(lit(1)).as("n_distinct"))
    val total = tok.agg(sum("o").as("tt"))
    tok.join(corpus, "h")
      .join(broadcast(srcTotals), "source")
      .crossJoin(broadcast(total))
      // DECIMAL(38,0) products; int64 quotients (bounds proven in doc)
      .withColumn("e",
        expr("(CAST(c AS DECIMAL(38,0)) * st) div tt"))
      .withColumn("term",
        expr("(CAST(o - e AS DECIMAL(38,0)) * (o - e) * 1000) div (e + 1)"))
      .groupBy("source")
      .agg(max("st").as("n_tokens"), max("n_distinct").as("n_distinct"),
        sum(col("term").cast("decimal(38,0)")).as("_chi2"))
      // ANSI: an int64-overflowing total fails loudly, never wraps
      .withColumn("chi2_scaled", col("_chi2").cast("long"))
      .drop("_chi2")
  }

  /** FILL-IN-THE-MIDDLE span extraction (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle",
    * arXiv:2207.14255): split each document into (prefix, middle,
    * suffix) at token positions drawn DETERMINISTICALLY from the doc id
    * (the engine-wide md5-prefix convention with per-draw salts), so
    * the FIM transform is reproducible run-over-run and
    * oracle-bit-exact — the training-data transform behind
    * infilling-capable code models, as a corpus operator.
    *
    * Draws: span start `a = h(id, ":a") mod n`, span end
    * `b = a + 1 + h(id, ":b") mod (n − a)` over the n whitespace
    * tokens — every doc with ≥ `minTokens` tokens yields exactly one
    * span with 1 ≤ b − a ≤ n − a; shorter docs are excluded (nothing
    * to infill). Segments are emitted as md5 fingerprints plus token
    * counts — hash-stable, and the downstream assembler reconstructs
    * the text it needs from (doc, a, b) without this operator shipping
    * corpus-sized triplicate strings.
    *
    * Scale shape: a PURE MAP — per-row hashing, token slicing and
    * digesting, no exchange anywhere, embarrassingly parallel at any
    * corpus size. Output: (doc_id, n_tokens, a, b, prefix_tokens,
    * middle_tokens, suffix_tokens, prefix_md5, middle_md5, suffix_md5).
    */
  def fimSpans(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 2): DataFrame = {
    require(minTokens >= 2,
      s"a FIM doc needs >= 2 tokens (one to infill, one context), got $minTokens")
    def draw(salt: String): Column =
      pmod(Dedup.tokenHash(concat(col(idCol).cast("string"), lit(salt))),
        col("n_tokens"))
    def seg(from: Column, len: Column) =
      concat_ws(" ", slice(split(col(textCol), " ", -1), from, len))
    docs
      .filter(col(textCol).isNotNull)
      .withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("a", draw(":a"))
      .withColumn("b", col("a") + 1 +
        pmod(Dedup.tokenHash(concat(col(idCol).cast("string"), lit(":b"))),
          col("n_tokens") - col("a")))
      .select(col(idCol), col("n_tokens"), col("a"), col("b"),
        col("a").as("prefix_tokens"),
        (col("b") - col("a")).as("middle_tokens"),
        (col("n_tokens") - col("b")).as("suffix_tokens"),
        md5(seg(lit(1), col("a"))).as("prefix_md5"),
        md5(seg(col("a") + 1, col("b") - col("a"))).as("middle_md5"),
        md5(seg(col("b") + 1, col("n_tokens") - col("b"))).as("suffix_md5"))
  }

  /** TOKENIZER FERTILITY panel: per source, words (whitespace tokens),
    * BPE-ish pre-tokens ([[bpeishTokens]]), and the fertility ratio
    * `pre-tokens · 1000 div words` — the standard tokenizer-efficiency
    * metric (a feed whose fertility runs hot costs proportionally more
    * training compute per word; multilingual pipelines read this panel
    * per language/source before picking a tokenizer budget). One
    * partial-agg pass keyed by source; NULL texts excluded. Output:
    * (source, n_docs, n_words, n_pretokens, fertility_x1000).
    */
  def tokenFertilityBySource(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(srcCol).as("source"),
        tokenCount(col(textCol)).cast("long").as("_w"),
        size(bpeishTokens(col(textCol))).cast("long").as("_p"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_w").as("n_words"),
        sum("_p").as("n_pretokens"))
      .withColumn("fertility_x1000",
        expr("n_pretokens * 1000 div n_words"))
}
