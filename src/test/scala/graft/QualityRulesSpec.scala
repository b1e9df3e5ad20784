package graft

import org.apache.spark.sql.functions._

import graft.llm.{Curation, Dedup, QualityRules, Sampling}

/** Round-8 curation operators: Gopher document rules, C4 line rules,
  * paragraph-level dedup, temperature mixing, snapshot delta.
  */
class QualityRulesSpec extends SparkSpecBase {
  import spark.implicits._

  // -------------------------------------------------- Gopher rules

  test("gopher: word-count, word-length, stopword and bullet rules fire correctly") {
    val good = (("the quick brown fox jumps over the lazy dog and then " * 6) +
      "rests with that have be of").trim
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short to pass the word count"),    // r_word_count fails
      (3L, ("a b c d e " * 20).trim),              // avg word len 100 < 300
      (4L, ("- bullet one line\n" * 19) + "the end of that with have be"), // bullets
      (5L, ("the of and that have with be to " * 10).trim + " more..." ) // symbol-light, passes len
    ).toDF("doc_id", "text")
    val out = QualityRules.gopherQuality(docs, "doc_id", "text")
      .select("doc_id", "r_word_count", "r_word_len", "r_stop", "r_bullet", "passes_gopher")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._6, "canonical good doc must pass all rules")
    assert(!out(2L)._2 && !out(2L)._6, "short doc fails word count")
    assert(!out(3L)._3, "1-char words fail the mean-word-length floor")
    assert(!out(4L)._5, "19/20 bullet lines exceed the 90% ceiling")
    assert(out(5L)._4, "doc 5 has >=2 distinct Gopher stopwords")
  }

  test("gopher: alphabetic-word fraction counts words with a letter, first token included") {
    val docs = Seq((1L, "abc 123 456 789 x9")).toDF("doc_id", "text")
    val r = QualityRules.gopherQuality(docs, "doc_id", "text")
      .select("n_words", "n_alpha_words", "alpha_permille").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L && r.getLong(2) == 400L)
  }

  // -------------------------------------------------- C4 line filter

  test("c4: punctuation, word-count and javascript line rules; lorem and '{' kill the doc") {
    val docs = Seq(
      (1L, Seq(
        "this line ends with a period and is long enough.",
        "this line has no terminal punctuation at all",
        "short line.",
        "the word javascript makes this line disappear quietly.",
        "another good line survives the filter here!").mkString("\n")),
      (2L, "good line with enough words to pass.\nlorem ipsum dolor sit amet."),
      (3L, "nothing survives here"),
      // '{' is a PAGE kill (Raffel §2.2), not a line kill — the good
      // first line must not save this doc
      (4L, "a perfectly fine line with plenty of words.\nfunction() { return; }")
    ).toDF("doc_id", "text")
    val out = QualityRules.c4LineFilter(docs, "doc_id", "text", minWords = 5)
    val rows = out.select("doc_id", "n_lines", "n_kept", "text_kept")
      .as[(Long, Long, Long, String)].collect().map(r => (r._1, r)).toMap
    assert(rows.keySet == Set(1L), "lorem, empty and brace docs must disappear")
    val (_, n, k, text) = rows(1L)
    assert(n == 5L && k == 2L)
    assert(text == "this line ends with a period and is long enough.\n" +
      "another good line survives the filter here!")
  }

  // -------------------------------------------------- paragraph dedup

  test("paragraph dedup: first occurrence survives, later copies drop, order preserved") {
    val docs = Seq(
      (1L, "alpha para\n\nbeta para"),
      (2L, "beta para\n\ngamma para"),   // beta already seen in doc 1
      (3L, "alpha para\n\nbeta para"))   // fully duplicate -> dropped
    .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .select("doc_id", "n_paras", "n_kept", "text_kept")
      .as[(Long, Long, Long, String)].collect().map(r => (r._1, r)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 2L, 2L, "alpha para\n\nbeta para")))
    assert(out(2L) == ((2L, 2L, 1L, "gamma para")))
  }

  test("paragraph dedup: within-doc repeated paragraph keeps only the first position") {
    val docs = Seq((7L, "same\n\nsame\n\nother")).toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(docs, "doc_id", "text")
      .select("n_paras", "n_kept", "text_kept").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getString(2) == "same\n\nother")
  }

  // -------------------------------------------------- stream startup

  test("replication stream starts on an empty source dir (schema probe falls back)") {
    import graft.streaming.ReplicationJob
    val src = tmpDir("emptysrc")
    val base = tmpDir("emptyrepl")
    val cfg = ReplicationJob.Config(
      sourceDir = src, targetDir = s"$base/target",
      dlqDir = s"$base/dlq", checkpointDir = s"$base/ckpt")
    // pre-probe regression: an unpopulated dir has no footer to read —
    // start must fall back to the declared schema, not throw
    val q = ReplicationJob.start(spark, cfg)
    q.awaitTermination(60000)
    assert(!new java.io.File(s"$base/target").exists() ||
      spark.read.parquet(s"$base/target").count() == 0L)
  }

  // -------------------------------------------------- winnowing pairs

  test("winnow pairs: shared-fingerprint floor filters weak matches") {
    import graft.llm.Dedup
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, a),
      (2L, a + " extra tail tokens here"),       // near-dup of 1: many shared fps
      (3L, "unrelated words entirely different content stream okay"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidatePairs(docs, "doc_id", "text",
      n = 3, w = 4, minShared = 2L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "prefix-sharing docs must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  // -------------------------------------------------- incremental dedup

  test("incremental dedup: prior-known and within-increment duplicates both drop") {
    val prior = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val fresh = Seq((10L, "a"), (11L, "c"), (12L, "c"), (13L, "d"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(fresh, prior, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L),
      "10 dups prior 'a'; 12 dups within-increment 'c'; 11 is the first 'c'")
  }

  // -------------------------------------------------- cluster representatives

  test("cluster representatives: max quality wins, ties to smallest id, singletons kept") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L)).toDF("doc_id", "cluster_id")
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (9L, 5L)).toDF("doc_id", "n_chars")
    val got = Dedup.clusterRepresentatives(labels, docs, "doc_id", "n_chars")
      .select("cluster_id", "n_members", "total_quality", "rep_doc_id", "rep_quality")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 70L, 2L, 30L)), "doc 2 beats doc 3 on the id tiebreak")
    assert(got(9L) == ((9L, 1L, 5L, 9L, 5L)))
  }

  // -------------------------------------------------- temperature mixing

  test("isqrt is exact at and around perfect squares") {
    val n = Seq(0L, 1L, 2L, 3L, 4L, 99L, 100L, 101L, (1L << 40) - 1, 1L << 40)
      .toDF("n")
    val got = n.select(col("n"), Sampling.isqrt(col("n")).as("s"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (v, s) =>
      assert(s * s <= v && (s + 1) * (s + 1) > v, s"isqrt($v) = $s")
    }
  }

  test("temperature mixing flattens the head relative to proportional rates") {
    val docs = (1 to 90).map(i => (i.toLong, "big", ("w " * 10).trim)) ++
      (1 to 10).map(i => (100L + i, "small", ("w " * 10).trim))
    val out = Sampling.temperatureMixWeights(
      docs.toDF("doc_id", "source", "text"), "source",
      graft.llm.TextAnalysis.tokenCount(col("text")), tokenBudget = 500L)
      .select("source", "n_tokens", "mix_permille", "rate_permille")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // sqrt flattening: big gets 750 permille of the mix (not 900),
    // small gets 250 (not 100)
    assert(out("big")._3 == 750L && out("small")._3 == 250L)
    // small's flattened target (125 tokens) exceeds what stratified
    // sampling must drop proportionally more from big
    assert(out("big")._4 < 1000L, "over-budget stratum is downsampled")
    assert(out("small")._4 == 1000L, "under-budget stratum keeps everything")
  }

  // -------------------------------------------------- surgical decontamination

  test("trimContaminated: cuts the quoted eval span, keeps clean docs, drops emptied docs") {
    import graft.llm.Decontam
    val evalSet = Seq((100L, "secret answer tokens")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words here secret answer tokens outro words after"),
      (2L, "totally clean document with no overlap at all"),
      (3L, "secret answer tokens")) // trim empties it -> dropped
      .toDF("doc_id", "text")
    val got = Decontam.trimContaminated(corpus, evalSet, "doc_id", "text", n = 3)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == "intro words here outro words after")
    assert(got(2L) == "totally clean document with no overlap at all")
  }

  test("trimContaminatedSpans: clean middle between two quoted snippets survives the island cut") {
    import graft.llm.Decontam
    val evalSet = Seq((100L, "ea eb ec"), (101L, "ed ee ef")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "ea eb ec m1 m2 m3 m4 ed ee ef"), // two islands, clean middle
      (2L, "totally clean document here"),
      (3L, "ea eb ec ed ee ef"))             // islands touch -> emptied -> dropped
      .toDF("doc_id", "text")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("doc_id", "text").as[(Long, String)].collect().toMap
    val spans = run(Decontam.trimContaminatedSpans(corpus, evalSet, "doc_id", "text", n = 3))
    assert(spans.keySet == Set(1L, 2L))
    assert(spans(1L) == "m1 m2 m3 m4", "the clean middle must survive")
    // the hull variant cuts [first, last+n-1] = everything -> doc 1 dropped
    val hull = run(Decontam.trimContaminated(corpus, evalSet, "doc_id", "text", n = 3))
    assert(!hull.contains(1L), "hull semantics must differ on the two-snippet doc")
    // mergeGap: a 1-token gap between islands merges them into one cut
    val merged = run(Decontam.trimContaminatedSpans(
      Seq((1L, "ea eb ec gap ed ee ef tail1 tail2")).toDF("doc_id", "text"),
      evalSet, "doc_id", "text", n = 3, mergeGap = 1))
    assert(merged(1L) == "tail1 tail2", s"gap token must merge into the cut: $merged")
  }

  // -------------------------------------------------- curateV2 composition

  test("curateV2: every stage bites — gopher drop, paragraph dedup, exact dedup, budget cap") {
    // 64 words, mean word length 4.0 — passes every Gopher rule
    val good = ("the brown foxes jumped over a lazy dogs " * 8).trim
    val docs = Seq(
      (1L, "s1", good + "\n\n" + "unique paragraph one here today"),
      (2L, "s1", "unique paragraph one here today\n\n" + good), // both paras seen in 1
      (3L, "s1", "too short"),                                  // gopher word count
      (4L, "s2", good + "\n\n" + "second source paragraph body")
    ).toDF("doc_id", "source", "text")
    val out = Curation.curateV2(docs, "doc_id", "text", "source",
      tokenBudget = 100000L, stopWords = Seq("the", "a"))
      .select("doc_id", "source", "n_paras", "n_kept")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 3 fails gopher; doc 2's paragraphs are both first-seen in doc 1
    // -> zero kept -> dropped; docs 1 and 4 survive (budget ample)
    assert(out.keySet == Set(1L, 4L), s"got ${out.keySet}")
    assert(out(1L)._3 == 2L && out(1L)._4 == 2L)
    assert(out(4L)._4 == 1L, "doc 4 keeps only its novel paragraph")
  }

  // -------------------------------------------------- snapshot delta

  test("snapshot delta: null-text transitions classify as changed, not unchanged") {
    val oldS = Seq((1L, null: String), (2L, "b"), (3L, null: String))
      .toDF("doc_id", "text")
    val newS = Seq((1L, "now present"), (2L, null: String), (3L, null: String))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDelta(oldS, newS, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"))
  }

  test("incremental dedup: null-text rows dedup against each other and prior nulls") {
    val prior = Seq((1L, null: String)).toDF("doc_id", "text")
    val fresh = Seq((10L, null: String), (11L, null: String), (12L, "real"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(fresh, prior, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(12L), "prior null suppresses both fresh nulls")
  }

  test("snapshot delta classifies added/removed/changed/unchanged") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newS = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Curation.snapshotDelta(oldS, newS, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  // ------------------------------------ model-scored classifier seam

  test("classifier seam: stub scores match the in-plan SQL rendering of " +
    "the same formula; a NULL text scores NULL, not a dropped row") {
    val docs = Seq(
      (1L, "the quick brown foxhound jumped over seventeen lazy dogs"),
      (2L, "a a a a a"), // zero diversity beyond one token, no long words
      (3L, "internationalization considerations"),
      (4L, ""),          // empty text: one empty token, score 500
      (5L, null: String))
      .toDF("doc_id", "text")
    val got = QualityRules.classifierScores(spark, docs, "doc_id", "text")
      .select("doc_id", "score_permille")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // the same formula in-plan (codegen'd) over the non-null rows
    val want = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr(
        """(size(array_distinct(split(text, ' '))) * 1000
          |    div size(split(text, ' '))
          |  + size(filter(split(text, ' '), x -> length(x) >= 6)) * 1000
          |    div size(split(text, ' '))) div 2"""
          .stripMargin.replace("\n", " ")).as("s"))
      .collect().map(r => r.getLong(0) -> Some(r.getLong(1))).toMap
    assert(got == want + (5L -> None))
    assert(got(4L) == Some(500L), "empty text: 1 empty token, 1000/2")
    assert(got(2L) == Some(100L),
      s"5 tokens, 1 distinct, 0 long: (200+0)/2 = 100, got ${got(2L)}")
  }

  test("classifier seam: one scorer init per PARTITION, not per row " +
    "(the rerankBatched amortization contract)") {
    val docs = spark.range(0, 64).toDF("doc_id")
      .withColumn("text", concat(lit("doc number "), col("doc_id")))
      .repartition(4)
    val inits = spark.sparkContext.longAccumulator("scorer_inits")
    val rows = spark.sparkContext.longAccumulator("scored_rows")
    // a scoreOne closure can't observe partition boundaries, so drive the
    // seam's mapPartitions shape through a scorer whose INIT is the first
    // call on each partition: count both and compare
    import spark.implicits._
    val out = docs
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        inits.add(1) // the "model session" the seam promises per partition
        it.map { case (id, t) =>
          rows.add(1)
          QualityRules.ClassifierScore(id, Some(QualityRules.stubEduScore(t)))
        }
      }.toDF()
    assert(out.count() === 64L)
    assert(rows.value === 64L)
    assert(inits.value === 4L,
      s"exactly one init per partition, got ${inits.value}")
  }

  test("classifierScoresInit: the FACTORY seam itself runs one init per " +
    "partition — counted through the real code path, not an emulation") {
    val docs = spark.range(0, 64).toDF("doc_id")
      .withColumn("text", concat(lit("doc number "), col("doc_id")))
      .repartition(4)
    val inits = spark.sparkContext.longAccumulator("factory_inits")
    val out = QualityRules.classifierScoresInit(spark, docs, "doc_id",
      "text", () => { inits.add(1); QualityRules.stubEduScore _ })
    assert(out.count() === 64L)
    assert(inits.value === 4L,
      s"mkScorer must run once per partition, got ${inits.value}")
  }

  test("NgramHead: broadcast-weights head scores match an independent " +
    "from-scratch recompute (hex-parse md5 path), incl. negative sums, " +
    "clamping and empty text; NULL text scores NULL") {
    import graft.llm.NgramHead
    // independent reimplementation: hex-string parse instead of byte
    // arithmetic, plain Seq fold instead of the while loop
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    def bucket(tok: String): Int =
      (java.lang.Long.parseLong(md5hex(tok).substring(0, 8), 16) %
        NgramHead.Buckets).toInt
    val baseW = (0 until NgramHead.Buckets)
      .map(b => b * NgramHead.Mixer % 17 - 8).toArray
    graft.llm.TextAnalysis.StopWords.map(bucket).distinct
      .foreach(b => baseW(b) += NgramHead.StopBonus)
    def wantScore(text: String): Long = {
      val toks = text.split(" ", -1)
      val raw = toks.map(t => baseW(bucket(t))).sum
      math.max(0L, math.min(1000L, 500L + raw * 25L / toks.length))
    }
    val texts = Seq(
      "the quick brown fox and the lazy dog of a to in is",
      "zzgram qqgram wwgram vvgram", // no stopwords: base weights only
      "", // one empty token
      "a a a a a a a a the the the of of in is to and")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      ((99L, null: String))
    val got = QualityRules.classifierScoresInit(spark,
        docs.toDF("doc_id", "text"), "doc_id", "text",
        NgramHead.scorerFactory(spark))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === Some(wantScore(t)), s"doc $i: '$t'")
    }
    assert(got(99L) === None, "NULL text scores NULL through the factory")
    // the weight table really carries the deduplicated stopword bonus
    val nStopBuckets = graft.llm.TextAnalysis.StopWords
      .map(bucket).distinct.size
    assert(NgramHead.weights.sum ===
      (0 until NgramHead.Buckets).map(b => b * NgramHead.Mixer % 17 - 8).sum
        + NgramHead.StopBonus * nStopBuckets,
      "stopword bonus must land once per DISTINCT bucket")
  }
}
