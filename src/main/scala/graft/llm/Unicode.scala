package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multilingual / UTF-8 text operators (round-16 verdict #2): every
  * other text operator in the engine rides ASCII conventions
  * (single-space tokenization, `^[a-z]+$` dicts, lowercase/punct-class
  * normalization); this module is the unicode tier — NFC normalization
  * ([[graft.functions.NfcNormalize]]), codepoint-class segmentation
  * that handles no-space CJK runs, script profiling, and
  * normalization-aware exact dedup — with every regex written in the
  * syntax subset Java regex and RE2 (DuckDB) share (`\p{L}`-classes and
  * `\x{...}` codepoint ranges; never `\p{IsHan}`/`&&` intersections,
  * which only one engine parses).
  *
  * FIXTURE DERIVATION: the driver's parquet fixtures are ASCII-only, so
  * the unicode gates derive a deterministic multilingual column from
  * `documents.doc_id` and the [[Snippets]] literal table — the SAME
  * literal array is injected into the DuckDB oracle SQL, so both
  * engines construct byte-identical input (and the construction is
  * seed/SF-independent by design: it depends only on doc_id). The
  * snippets deliberately include decomposed/precomposed NFC pairs
  * (e + U+0301 vs é, jamo vs Hangul syllables, U+212B Å vs U+00C5),
  * no-space CJK runs, combining marks, RTL Arabic, Devanagari conjuncts,
  * and astral-plane emoji.
  */
object Unicode {

  /** The multilingual literal table. Indices matter: (0,1), (5,6) and
    * (13,14) are byte-DISTINCT, NFC-EQUAL pairs — normalization must
    * merge them; everything else is NFC-stable. No quotes/backslashes:
    * entries are injected into oracle SQL as single-quoted literals.
    */
  val Snippets: Seq[String] = Seq(
    /* 0 */ "café résumé naïve",
    /* 1 */ "cafe\u0301 re\u0301sume\u0301 nai\u0308ve", // NFC == 0
    /* 2 */ "中文数据处理管道质量",
    /* 3 */ "日本語のテキスト処理",
    /* 4 */ "한국어 텍스트 처리",
    /* 5 */ "\u1112\u1161\u11ab\u1100\u1173\u11af \uc870\ud569 \ud14c\uc2a4\ud2b8", // jamo; NFC == 6
    /* 6 */ "한글 조합 테스트",
    /* 7 */ "مرحبا بالعالم العربي",
    /* 8 */ "नमस्ते दुनिया क्या हाल",
    /* 9 */ "emoji 🦀 🚀 ✨ mix",
    /* 10 */ "Zürich Straße Gänsefüßchen",
    /* 11 */ "ελληνικά κείμενα εδώ",
    /* 12 */ "русский текст обработка",
    /* 13 */ "\u212bngstro\u0308m unit test", // ANGSTROM SIGN + combining; NFC == 14
    /* 14 */ "Ångström unit test",
    /* 15 */ "mixed 中文 English こんにちは text")

  private val K = Snippets.size // 16

  // ---------------------------------------------------------- regexes
  // Shared Java-regex/RE2 syntax ONLY (see scaladoc). Codepoint ranges,
  // not script names: Java says \p{IsHan}, RE2 says \p{Han} — ranges
  // spell identically in both.

  /** No-space scripts, tokenized one char at a time (the standard LM
    * preprocessing convention): kana + CJK ext-A + unified ideographs.
    * Hangul is NOT here — Korean is space-delimited.
    */
  val CjkCharPat = "[\\x{3040}-\\x{30ff}\\x{3400}-\\x{4dbf}\\x{4e00}-\\x{9fff}]"
  /** A run token: letters, combining marks, digits — any script. */
  val RunTokenPat = "[\\p{L}\\p{M}\\p{N}]+"
  val LatinPat = "[A-Za-z\\x{c0}-\\x{24f}]"
  val CyrillicPat = "[\\x{400}-\\x{4ff}]"
  val ArabicPat = "[\\x{600}-\\x{6ff}]"
  val DevanagariPat = "[\\x{900}-\\x{97f}]"
  val HanPat = "[\\x{3400}-\\x{4dbf}\\x{4e00}-\\x{9fff}]"
  val KanaPat = "[\\x{3040}-\\x{30ff}]"
  val HangulPat = "[\\x{1100}-\\x{11ff}\\x{ac00}-\\x{d7af}]"
  val EmojiPat = "[\\x{2600}-\\x{27bf}\\x{1f300}-\\x{1faff}]"
  val CombiningPat = "[\\x{300}-\\x{36f}]"
  val AsciiPrintPat = "[\\x{20}-\\x{7e}]"

  // ------------------------------------------------- fixture derivation

  /** documents + a deterministic multilingual `utext` column:
    * `Snippets[doc_id % 16] ++ " " ++ Snippets[(doc_id div 16) % 16]` —
    * pure doc_id arithmetic, so identical at every SF and fixture seed.
    */
  def withUtext(docs: DataFrame): DataFrame = {
    val arr = array(Snippets.map(lit): _*)
    docs.withColumn("utext", concat(
      element_at(arr, (pmod(col("doc_id"), lit(K)) + 1).cast("int")),
      lit(" "),
      element_at(arr, (pmod(expr(s"doc_id div $K"), lit(K)) + 1).cast("int"))))
  }

  /** The oracle-side twin of [[withUtext]] as a DuckDB CTE body: same
    * literal array, same arithmetic (`//` == `div` for non-negative
    * doc_id), 1-based list indexing on both sides.
    */
  def utextCteDuck: String = {
    val lits = Snippets.map(s => "'" + s.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"""ud AS (SELECT doc_id, $lits[CAST(doc_id % $K AS INT) + 1] || ' ' ||
       |  $lits[CAST((doc_id // $K) % $K AS INT) + 1] AS utext
       |  FROM documents)""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------------ the operators

  /** NFC normalization surface: the normalized text, whether
    * normalization changed anything, and the codepoint count after —
    * both engines count CODEPOINTS for `length` (Spark numChars, DuckDB
    * length), which is what makes this a parity gate and not a
    * byte-convention accident.
    */
  def normalizeProfile(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.TextFns.register(docs.sparkSession)
    docs
      .withColumn("norm_text", expr(s"nfc_normalize($textCol)"))
      .select(col("doc_id"),
        (col("norm_text") =!= col(textCol)).as("changed"),
        length(col("norm_text")).as("n_cp"),
        col("norm_text"))
  }

  /** Codepoint-class segmentation over NFC text: no-space CJK chars are
    * one token each (isolated by a pre-splitting space injection — the
    * `$0`/`\0` whole-match backreference is the only replacement the
    * two engines spell differently, so the PATTERN stays shared and the
    * replacement template is per-engine); every other script tokenizes
    * as maximal letter/mark/digit runs. One projection, no explode —
    * per-row bounded work at any corpus size.
    */
  def tokenProfile(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.TextFns.register(docs.sparkSession)
    docs
      .withColumn("_nfc", expr(s"nfc_normalize($textCol)"))
      .withColumn("_pre", regexp_replace(col("_nfc"), CjkCharPat, " $0 "))
      // Column-API regexp calls, never expr(): the SQL parser processes
      // backslash escapes inside string literals, which would corrupt
      // the \p{...} patterns
      .select(col("doc_id"),
        size(regexp_extract_all(col("_pre"), lit(RunTokenPat), lit(0))).as("n_tokens"),
        size(regexp_extract_all(col("_nfc"), lit(CjkCharPat), lit(0))).as("n_cjk"))
  }

  /** Per-doc script mix: codepoint counts per script-range class over
    * the RAW text (pre-NFC, so combining marks are visible) — the
    * unicode analog of the ASCII language-ID heuristic.
    */
  def scriptProfile(docs: DataFrame, textCol: String): DataFrame = {
    def cnt(pat: String) = // Column API: see tokenProfile's parser note
      size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
    docs.select(col("doc_id"),
      cnt(LatinPat).as("n_latin"), cnt(CyrillicPat).as("n_cyrillic"),
      cnt(ArabicPat).as("n_arabic"), cnt(DevanagariPat).as("n_devanagari"),
      cnt(HanPat).as("n_han"), cnt(KanaPat).as("n_kana"),
      cnt(HangulPat).as("n_hangul"), cnt(EmojiPat).as("n_emoji"),
      cnt(CombiningPat).as("n_marks"))
  }

  /** Normalization-aware exact dedup: cluster on md5(NFC(text)), so
    * byte-distinct spellings of the same text (decomposed vs
    * precomposed) land in ONE cluster — `n_raw_variants > 1` is the
    * proof normalization did semantic work the byte-level hash misses.
    * One map-side-combined aggregate; the min-id keeper is the exact
    * dedup family's keeper rule.
    */
  def nfcDedupClusters(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.TextFns.register(docs.sparkSession)
    docs
      .withColumn("norm_h", md5(expr(s"nfc_normalize($textCol)")))
      .groupBy("norm_h")
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col(textCol)).as("n_raw_variants"))
  }

  /** Unicode (word, freq) table — the [[graft.llm.Bpe.wordFreqs]]
    * admission rule lifted off ASCII: NFC-normalize, isolate no-space
    * CJK chars, then every `[\p{L}\p{M}\p{N}]+` run is a word (isolated
    * CJK chars match as 1-char runs). CASE-SENSITIVE on purpose: JVM
    * and ICU `lower()` diverge on locale-sensitive mappings (dotless I,
    * final sigma), so the unicode vocabulary never lowercases — the
    * engines' binary UTF-8 string order then ranks merges identically.
    * Feeds [[graft.llm.Bpe.learnMergesFromWf]] unchanged.
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.TextFns.register(docs.sparkSession)
    docs
      .withColumn("_nfc", expr(s"nfc_normalize($textCol)"))
      .withColumn("_pre", regexp_replace(col("_nfc"), CjkCharPat, " $0 "))
      .select(explode(
        regexp_extract_all(col("_pre"), lit(RunTokenPat), lit(0))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
  }

  /** Oracle twin of [[wordFreqs]] + BPE initial forms, as the
    * `wf`/`f0` init prefix [[graft.llm.Bpe.roundChainDuckFrom]] expects;
    * prepend [[utextCteDuck]] (the word source is `ud.utext`).
    */
  def bpeInitCtesDuck: String =
    s"""${utextCteDuck},
       |wf AS (SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(regexp_extract_all(
       |      regexp_replace(nfc_normalize(utext), '$CjkCharPat', ' \\0 ', 'g'),
       |      '$RunTokenPat')) AS word
       |    FROM ud) GROUP BY word),
       |f0 AS (SELECT word, freq,
       |  regexp_replace(word, '(.)', '(\\1)', 'g') AS form FROM wf)"""
      .stripMargin.replace("\n", " ")

  /** The STREAM register behind [[nfcDedupClusters]]: one row per
    * (norm_h, raw_h) variant with its doc count and min-id keeper.
    * This is the merge identity an ingest stream maintains —
    * `clusters(A ∪ B) == clusters(mergeRegisters(reg(A), reg(B)))`:
    * keeper min-merges, n_copies sum-merges, and n_raw_variants is the
    * register's own row count per norm_h, so per-batch registers fold
    * into state without re-reading the corpus (state size = distinct
    * raw texts, exactly what exact dedup already keeps).
    */
  def nfcDedupRegisters(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.TextFns.register(docs.sparkSession)
    docs
      .withColumn("norm_h", md5(expr(s"nfc_normalize($textCol)")))
      .withColumn("raw_h", md5(col(textCol)))
      .groupBy("norm_h", "raw_h")
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))
  }

  /** Fold two register tables (sum-merge counts, min-merge keepers). */
  def mergeNfcRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("norm_h", "raw_h")
      .agg(min(col("keeper_doc_id")).as("keeper_doc_id"),
        sum(col("n_copies")).as("n_copies"))

  /** Final cluster table off the register — bit-identical output
    * contract to [[nfcDedupClusters]].
    */
  def clustersFromRegisters(regs: DataFrame): DataFrame =
    regs.groupBy("norm_h")
      .agg(min(col("keeper_doc_id")).as("keeper_doc_id"),
        sum(col("n_copies")).as("n_copies"),
        count(lit(1)).as("n_raw_variants"))

  /** Codepoint vs byte width stats: chars (codepoints), UTF-8 bytes,
    * printable-ASCII codepoints — pins the char/byte parity contract
    * between the engines on multi-byte and astral-plane input.
    */
  def widthStats(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"),
      length(col(textCol)).as("n_chars"),
      octet_length(col(textCol)).as("n_bytes"),
      size(regexp_extract_all(col(textCol), lit(AsciiPrintPat), lit(0))).as("n_ascii"))
}
