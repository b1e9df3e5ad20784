package graft

import org.apache.spark.sql.functions._

import graft.llm.Unicode

/** The multilingual text tier: NFC expression semantics, no-space CJK
  * segmentation, normalization-aware dedup, and the snippet-table
  * invariants the oracle derivation rests on.
  */
class UnicodeSpec extends SparkSpecBase {
  import spark.implicits._

  private def nfcOf(s: String): String = {
    graft.functions.TextFns.register(spark)
    Seq(s).toDF("t").select(expr("nfc_normalize(t)")).as[String].head()
  }

  test("nfc_normalize: canonical composition, ASCII passthrough, null") {
    graft.functions.TextFns.register(spark)
    assert(nfcOf("café") == "café", "e + U+0301 must compose")
    assert(nfcOf("한") == "한", "jamo must compose to the syllable")
    assert(nfcOf("Å") == "Å", "ANGSTROM SIGN is canonically U+00C5")
    assert(nfcOf("plain ascii 123") == "plain ascii 123")
    assert(nfcOf("café") == "café", "already-NFC text is untouched")
    val n = Seq[Option[String]](None).toDF("t")
      .select(expr("nfc_normalize(t)")).as[Option[String]].head()
    assert(n.isEmpty, "null in, null out")
  }

  test("snippet table invariants: the three NFC pairs are byte-distinct " +
    "and NFC-equal; everything else is NFC-stable") {
    val s = Unicode.Snippets
    for ((a, b) <- Seq((0, 1), (6, 5), (14, 13))) {
      assert(s(a) != s(b), s"pair ($a,$b) must be byte-distinct")
      assert(nfcOf(s(b)) == s(a), s"NFC of $b must be exactly snippet $a")
    }
    for (i <- Seq(2, 3, 4, 7, 8, 9, 10, 11, 12, 15))
      assert(nfcOf(s(i)) == s(i), s"snippet $i must be NFC-stable")
  }

  test("tokenProfile: CJK one-per-char, runs elsewhere, marks stay in " +
    "tokens, emoji are not tokens") {
    val docs = Seq(
      (1L, "abc中def"),          // latin run + Han char + latin run
      (2L, "中文"),           // two Han chars → two tokens
      (3L, "café naive"),       // combining mark inside the run
      (4L, "🦀 🚀"), // emoji only → zero tokens
      (5L, "こんにちは"), // 5 hiragana → 5 tokens
      (6L, "123 abc")
    ).toDF("doc_id", "utext")
    val r = Unicode.tokenProfile(docs, "utext")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(r.toSeq === Seq(
      (1L, 3, 1), (2L, 2, 2), (3L, 2, 0), (4L, 0, 0), (5L, 5, 5), (6L, 2, 0)))
  }

  test("nfcDedupClusters: byte-distinct spellings of one text form ONE " +
    "cluster with n_raw_variants = 2 and the min-id keeper") {
    val docs = Seq(
      (10L, "café bar"),
      (11L, "café bar"),   // NFC-equal to doc 10
      (12L, "other text")
    ).toDF("doc_id", "utext")
    val r = Unicode.nfcDedupClusters(docs, "utext")
      .select("keeper_doc_id", "n_copies", "n_raw_variants")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq === Seq((10L, 2L, 2L), (12L, 1L, 1L)))
  }

  test("scriptProfile and widthStats: astral-plane emoji count as one " +
    "codepoint; bytes > chars on multi-byte text") {
    val docs = Seq((1L, "a中🦀é")).toDF("doc_id", "utext")
    val sp = Unicode.scriptProfile(docs, "utext").collect().head
    assert(sp.getAs[Int]("n_latin") == 2)
    assert(sp.getAs[Int]("n_han") == 1)
    assert(sp.getAs[Int]("n_emoji") == 1)
    assert(sp.getAs[Int]("n_marks") == 1)
    val ws = Unicode.widthStats(docs, "utext").collect().head
    // a(1) + 中(1) + crab(1) + e(1) + U+0301(1) = 5 codepoints
    assert(ws.getAs[Int]("n_chars") == 5)
    // 1 + 3 + 4 + 1 + 2 = 11 UTF-8 bytes
    assert(ws.getAs[Int]("n_bytes") == 11)
    assert(ws.getAs[Int]("n_ascii") == 2)
  }

  test("NFC dedup register identity: per-batch registers folded through " +
    "the merge land on the batch clusters — raw variants split across " +
    "batches included") {
    // doc 10 (precomposed) lands in leg-even, doc 11 (decomposed, same
    // NFC class) in leg-odd — the cross-batch case the fold must get right
    val docs = Seq(
      (10L, "caf\u00e9 bar"), (11L, "cafe\u0301 bar"),
      (12L, "caf\u00e9 bar"), (13L, "other"), (15L, "other")
    ).toDF("doc_id", "utext")
    val batch = Unicode.nfcDedupClusters(docs, "utext")
      .orderBy("keeper_doc_id").collect().toSeq
    val folded = Unicode.clustersFromRegisters(Unicode.mergeNfcRegisters(
        Unicode.nfcDedupRegisters(docs.filter($"doc_id" % 2 === 0), "utext"),
        Unicode.nfcDedupRegisters(docs.filter($"doc_id" % 2 === 1), "utext")))
      .orderBy("keeper_doc_id").collect().toSeq
    assert(folded == batch, s"fold=$folded batch=$batch")
    val c = Unicode.clustersFromRegisters(Unicode.mergeNfcRegisters(
        Unicode.nfcDedupRegisters(docs.filter($"doc_id" % 2 === 0), "utext"),
        Unicode.nfcDedupRegisters(docs.filter($"doc_id" % 2 === 1), "utext")))
      .filter($"keeper_doc_id" === 10L)
      .select("n_copies", "n_raw_variants").as[(Long, Long)].head()
    assert(c == ((3L, 2L)), "the café class: 3 docs, 2 raw spellings")
  }

  test("unicode wordFreqs: CJK chars are 1-char words, case preserved, " +
    "NFC applied before counting; BPE learns a non-ASCII merge") {
    val docs = Seq(
      (1L, "Wort Wort 中文"),
      (2L, "wort cafe\u0301"), // decomposed — must count with precomposed café
      (3L, "caf\u00e9 \u4e2d Wort")
    ).toDF("doc_id", "utext")
    val wf = Unicode.wordFreqs(docs, "utext")
      .as[(String, Long)].collect().toMap
    assert(wf("Wort") == 3L && wf("wort") == 1L, "case must be preserved")
    assert(wf("中") == 2L && wf("文") == 1L, "CJK: one word per char")
    assert(wf("caf\u00e9") == 2L && !wf.contains("cafe\u0301"),
      "NFC must merge the spellings before counting")
    // k=2 on a Wort-heavy vocab: the first merges glue Wort's chars —
    // and the machinery round-trips non-ASCII forms losslessly
    val (merges, forms) = graft.llm.Bpe.learnMergesFromWf(
      Unicode.wordFreqs(docs, "utext"), 2)
    assert(merges.count() == 2L)
    val seg = graft.llm.Bpe.segmented(forms)
      .filter($"word" === "café").select("n_tokens")
      .as[Long].head()
    assert(seg >= 1L && seg <= 4L, s"café segments into 1..4 pieces: $seg")
  }

  test("utext derivation is pure doc_id arithmetic (SF/seed independent)") {
    val a = Unicode.withUtext(Seq((17L, "x"), (33L, "y")).toDF("doc_id", "text"))
      .select("doc_id", "utext").as[(Long, String)].collect().toMap
    // 17 % 16 = 1, 17 div 16 % 16 = 1 → decomposed café twice
    assert(a(17L) == Unicode.Snippets(1) + " " + Unicode.Snippets(1))
    assert(a(33L) == Unicode.Snippets(1) + " " + Unicode.Snippets(2))
  }
}
