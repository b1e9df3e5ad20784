package graft

import org.apache.spark.sql.functions._

import graft.llm.{PiiScrub, Retrieval, Shuffling, TextAnalysis}

/** TF-IDF/BM25 retrieval, deterministic corpus shuffling, the composite
  * quality filter, and PII scrubbing.
  */
class RetrievalShufflingSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),   // tf(apple)=2 — df(apple)=2
    (2L, "apple cherry"),         //
    (3L, "banana banana durian")  // df(banana)=2, df(cherry)=1, df(durian)=1
  ).toDF("doc_id", "text")

  test("tfidfTopK: hand-computed integer scores, rank order, tiebreak") {
    val queries = Seq((100L, "apple durian")).toDF("doc_id", "text")
    // N=3; idf‰: apple = 3000/2 = 1500, durian = 3000/1 = 3000
    // doc1: 2*1500 = 3000; doc2: 1*1500 = 1500; doc3: 1*3000 = 3000
    // tie 3000: doc 1 before doc 3
    val r = Retrieval.tfidfTopK(corpus, queries, "doc_id", "text", k = 3)
      .orderBy("rnk").as[(Long, Long, Long, Int)].collect()
    assert(r.toSeq === Seq((100L, 1L, 3000L, 1), (100L, 3L, 3000L, 2),
      (100L, 2L, 1500L, 3)))
  }

  test("tfidfTopK: k truncates; maxDf drops corpus-wide terms") {
    val queries = Seq((100L, "apple durian")).toDF("doc_id", "text")
    assert(Retrieval.tfidfTopK(corpus, queries, "doc_id", "text", k = 1)
      .count() === 1)
    // maxDf=1 kills apple (df=2); only durian scores → doc3 alone
    val r = Retrieval.tfidfTopK(corpus, queries, "doc_id", "text", k = 3,
      maxDf = 1).as[(Long, Long, Long, Int)].collect()
    assert(r.toSeq === Seq((100L, 3L, 3000L, 1)))
  }

  test("bm25TopK: matches an independent in-memory fold") {
    val queries = Seq((100L, "apple durian"), (200L, "banana")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", k = 3)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2, r._3)).toSeq.sortBy(t => (t._1, t._2))

    // reference fold, same formula, plain Scala
    val docs = Map(1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("apple", "cherry"), 3L -> Seq("banana", "banana", "durian"))
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum / n
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    def idf(t: String) = math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
    def score(q: Seq[String], d: Seq[String]) = {
      val tfm = d.groupBy(identity).view.mapValues(_.size).toMap
      q.distinct.filter(tfm.contains).map { t =>
        val tf = tfm(t).toDouble
        idf(t) * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * d.size / avgdl))
      }.sum
    }
    val want = (for {
      (qid, q) <- Seq(100L -> Seq("apple", "durian"), 200L -> Seq("banana"))
      (did, d) <- docs if score(q, d) > 0
    } yield (qid, did, score(q, d))).sortBy(t => (t._1, t._2))
    assert(got.map(t => (t._1, t._2)) === want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) =>
      assert(math.abs(g - w) < 1e-9, s"score $g vs $w")
    }
  }

  test("bm25iTopK: matches an independent integer fold") {
    val queries = Seq((100L, "apple durian"), (200L, "banana")).toDF("doc_id", "text")
    val got = Retrieval.bm25iTopK(corpus, queries, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2, r._3)).toSeq.sortBy(t => (t._1, t._2))

    // reference fold, same per-mille arithmetic, plain Scala longs
    val docs = Map(1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("apple", "cherry"), 3L -> Seq("banana", "banana", "durian"))
    val n = docs.size.toLong
    val t = docs.values.map(_.size.toLong).sum
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    def score(q: Seq[String], d: Seq[String]): Long = {
      val tfm = d.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val dlr = d.size.toLong * n * 1000L / t
      q.distinct.filter(tfm.contains).map { term =>
        val tf = tfm(term)
        val idfPm = n * 1000L / dfm(term)
        val satPm = tf * 2200L * 1000L /
          (tf * 1000L + 1200L * (250L + 750L * dlr / 1000L) / 1000L)
        idfPm * satPm
      }.sum
    }
    val want = (for {
      (qid, q) <- Seq(100L -> Seq("apple", "durian"), 200L -> Seq("banana"))
      (did, d) <- docs if score(q, d) > 0
    } yield (qid, did, score(q, d))).sortBy(t => (t._1, t._2))
    assert(got === want)
  }

  test("selfRetrievalAudit: unique-vocab docs self-retrieve at rank 1; " +
    "a query whose self misses top-k still counts in the mean") {
    // three docs with disjoint vocab: every doc's own prefix retrieves
    // ONLY itself -> hits_at_1 = n_queries, MRR = 1e6
    val distinct = Seq((1L, "aa bb cc"), (2L, "dd ee ff"),
      (3L, "gg hh ii")).toDF("doc_id", "text")
    val perfect = Retrieval.selfRetrievalAudit(distinct, distinct,
      "doc_id", "text", queryTokens = 2, k = 2).collect().head
    assert(perfect.getAs[Long]("n_queries") === 3L)
    assert(perfect.getAs[Long]("hits_at_1") === 3L)
    assert(perfect.getAs[Long]("hits_at_k") === 3L)
    assert(perfect.getAs[Long]("mrr_x1e6") === 1000000L)
    // doc 9's single query term appears in every doc; with k = 1 only
    // the BM25-best doc survives, and doc 9 (longest, so lowest
    // saturation score) misses its own top-1 -> it still divides the
    // mean
    val shared = Seq((7L, "zz"), (8L, "zz yy"),
      (9L, "zz xx ww vv uu tt ss rr qq pp")).toDF("doc_id", "text")
    val partial = Retrieval.selfRetrievalAudit(shared,
      shared.filter(col("doc_id") === 9L), "doc_id", "text",
      queryTokens = 1, k = 1).collect().head
    assert(partial.getAs[Long]("n_queries") === 1L)
    assert(partial.getAs[Long]("hits_at_k") === 0L)
    assert(partial.getAs[Long]("mrr_x1e6") === 0L)
  }

  test("windowDupProfile: cross-doc windows only, positions, clean docs null") {
    val docs = Seq(
      (1L, "a b c d"),   // windows: "a b c"@1, "b c d"@2 — first is shared
      (2L, "x a b c"),   // windows: "x a b"@1, "a b c"@2
      (3L, "p q r s"),   // clean
      (4L, "y z")        // < n tokens → no windows, absent
    ).toDF("doc_id", "text")
    val r = graft.llm.Dedup.windowDupProfile(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Int], Option[Int], Long)].collect()
    assert(r.toSeq === Seq(
      (1L, 2L, 1L, Some(1), Some(1), 500L),
      (2L, 2L, 1L, Some(2), Some(2), 500L),
      (3L, 2L, 0L, None, None, 0L)))
  }

  test("windowDupProfile: within-doc repetition alone is not cross-doc dup") {
    val docs = Seq((1L, "a b c a b c"), (2L, "z z z z")).toDF("doc_id", "text")
    val r = graft.llm.Dedup.windowDupProfile(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Option[Int], Option[Int], Long)].collect()
    assert(r.forall(_._3 === 0L), s"no window crosses docs: ${r.toSeq}")
  }

  test("trimDupSpans: cuts the dup range, passes clean/short docs, drops emptied docs") {
    val docs = Seq(
      (1L, "a b c d"),  // "a b c"@1 dup → keep suffix "d"
      (2L, "x a b c"),  // "a b c"@2 dup → keep prefix "x"
      (3L, "p q r s"),  // clean → unchanged
      (5L, "a b c"),    // fully duplicated → trimmed empty → dropped
      (6L, "a b c"),
      (7L, "y z"),      // shorter than n → passthrough
      (8L, "")          // already empty, never trimmed → passthrough
    ).toDF("doc_id", "text")
    val r = graft.llm.Dedup.trimDupSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(r.toSeq === Seq((1L, "d"), (2L, "x"), (3L, "p q r s"),
      (7L, "y z"), (8L, "")))
  }

  test("maxDupSpans: one long duplicate yields ONE span with exact " +
    "boundaries, not n overlapping window hits (Lee et al. 2022)") {
    // a 6-token block "c1 c2 c3 c4 c5 c6" shared between docs 1 and 2,
    // embedded at different offsets inside otherwise-unique text
    val docs = Seq(
      (1L, "u1 u2 c1 c2 c3 c4 c5 c6 u3 u4"), // block at tokens 3..8
      (2L, "c1 c2 c3 c4 c5 c6 v1 v2 v3"),    // block at tokens 1..6
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8")        // clean → no span row
    ).toDF("doc_id", "text")
    // n=3: doc 1's duplicated window starts are 3,4,5,6 (consecutive) —
    // the profile reports 4 hits; the span operator must report ONE
    // span covering exactly the block: [3, 8]
    val r = graft.llm.Dedup.maxDupSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(r.toSeq === Seq((1L, 3, 8, 2L), (2L, 1, 6, 2L)))
  }

  test("maxDupSpans: two separated duplicated blocks in one doc yield " +
    "two spans; within-doc repetition alone yields none") {
    val docs = Seq(
      (1L, "a1 a2 a3 u1 u2 u3 u4 b1 b2 b3"), // two blocks, gap between
      (2L, "a1 a2 a3 z1 z2"),
      (3L, "z8 z9 b1 b2 b3"),
      (4L, "r r r r r r")                    // self-repetition only
    ).toDF("doc_id", "text")
    val r = graft.llm.Dedup.maxDupSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, Int, Int, Long)].collect().sortBy(x => (x._1, x._2))
    assert(r.filter(_._1 == 1L).toSeq === Seq((1L, 1, 3, 2L), (1L, 8, 10, 2L)),
      s"doc 1 must carry two exact-boundary spans: ${r.toSeq}")
    assert(!r.exists(_._1 == 4L), "within-doc repetition is not cross-doc dup")
  }

  test("trimMaxSpans: every maximal span cut exactly, clean text BETWEEN " +
    "spans survives (the contiguous rule deletes it); passthrough and " +
    "drop edges match trimDupSpans") {
    val docs = Seq(
      (1L, "a1 a2 a3 u1 u2 u3 b1 b2 b3"), // two blocks, clean middle
      (2L, "a1 a2 a3 z1 z2"),
      (3L, "z8 z9 b1 b2 b3"),
      (4L, "p q r s"),                    // clean → byte-identical passthrough
      (5L, "c1 c2 c3"), (6L, "c1 c2 c3"), // fully duplicated → dropped
      (7L, "x y")                         // shorter than n → passthrough
    ).toDF("doc_id", "text")
    val r = graft.llm.Dedup.trimMaxSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(r.toSeq === Seq(
      (1L, "u1 u2 u3"),   // precise surgery keeps the clean middle
      (2L, "z1 z2"), (3L, "z8 z9"), (4L, "p q r s"), (7L, "x y")))
    // the contiguous-range trimmer on doc 1 cuts 1..9 — middle lost
    assert(graft.llm.Dedup.trimDupSpans(docs, "doc_id", "text", n = 3)
      .filter($"doc_id" === 1L).isEmpty,
      "contrast: the conservative rule drops doc 1 entirely")
  }

  test("vocabulary: global counts, doc frequencies, tiebreak, k cut") {
    val docs = Seq((1L, "b b a"), (2L, "a c")).toDF("doc_id", "text")
    val r = Retrieval.vocabulary(docs, "doc_id", "text", k = 2)
      .as[(String, Long, Long)].collect()
    // a and b both occur twice; term tiebreak puts a first; c cut by k
    assert(r.toSeq === Seq(("a", 2L, 2L), ("b", 2L, 1L)))
  }

  test("deterministicShuffle: exact 0..N-1 permutation, partitioning-invariant, balanced shards") {
    val df = (1L to 97L).toDF("doc_id")
    val a = Shuffling.deterministicShuffle(df, "doc_id", numShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // dense permutation
    assert(a.map(_._2).sorted.toSeq === (0L until 97L))
    // shard = pos mod 8, balanced to ±1
    assert(a.forall { case (_, pos, sh) => sh == pos % 8 })
    val sizes = a.groupBy(_._3).values.map(_.size)
    assert(sizes.max - sizes.min <= 1)
    // identical result from different input partitioning + partition count
    val b = Shuffling.deterministicShuffle(df.repartition(7), "doc_id",
      numShards = 8, partitions = 3).as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // and it matches the definitional sort
    val byHash = spark.range(1, 98).select(col("id").as("doc_id"),
      Shuffling.hash64(col("id")).as("h")).as[(Long, Long)].collect()
      .sortBy(t => (t._2, t._1)).map(_._1).zipWithIndex
    assert(a.map(r => (r._1, r._2)).toSeq ===
      byHash.map { case (id, i) => (id, i.toLong) }.sortBy(_._1).toSeq)
  }

  test("deterministicShuffle/writeShards: non-long-castable id fails loudly, never drops") {
    // a NULL-ing cast used to silently drop the row from every shard.
    // Under ANSI (the session default) the cast itself throws; with ANSI
    // off the raise_error guard fires — loud either way, on both paths.
    def loud(t: Throwable): Boolean = {
      val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" ")
      msgs.contains("long-castable") || msgs.contains("CAST_INVALID_INPUT")
    }
    val bad = Seq(("1", "a"), ("not-a-number", "b")).toDF("doc_id", "text")
    assert(loud(intercept[Exception] {
      Shuffling.deterministicShuffle(bad, "doc_id", numShards = 2).collect()
    }))
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    assert(loud(intercept[Exception] {
      Shuffling.writeShards(bad, "doc_id", numShards = 2, out)
    }))
    withSQLConf("spark.sql.ansi.enabled" -> "false") {
      assert(loud(intercept[Exception] {
        Shuffling.deterministicShuffle(bad, "doc_id", numShards = 2).collect()
      }))
    }
    // string ids that ARE long-castable still work end to end
    val ok = Seq(("1", "a"), ("2", "b"), ("3", "c")).toDF("doc_id", "text")
    assert(Shuffling.deterministicShuffle(ok, "doc_id", numShards = 2)
      .count() === 3L)
  }

  test("qualityFilter: first failing rule wins, in documented order") {
    val docs = Seq(
      (1L, "one two three"),                                 // too_short (3 < 4)
      (2L, Seq.fill(30)("w").mkString(" ")),                 // too_long fires before low_diversity
      (3L, "a a a a b b c d"),                               // 8 toks, 4 uniq = 500‰ < 600 → low_diversity
      (4L, "a a a b c d e f g h"),                           // 10 toks, 8 uniq=800‰ ok; top 3=300‰ > 250 → repetitive
      (5L, "a b c d e f g h i j")                            // keep
    ).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFilter(docs, "doc_id", "text",
      minTokens = 4, maxTokens = 20, minUniqPermille = 600,
      maxTopTokPermille = 250)
      .select("doc_id", "reason", "keep").as[(Long, String, Boolean)]
      .collect().sortBy(_._1)
    assert(r.toSeq === Seq((1L, "too_short", false), (2L, "too_long", false),
      (3L, "low_diversity", false), (4L, "repetitive", false),
      (5L, "keep", true)))
  }

  test("pii: report counts per class and scrub replaces with placeholders") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@example.co.uk or 192.168.0.1 thanks"),
      (2L, "ssn 123-45-6789 phone +1 (555) 123-4567 done"),
      (3L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val rep = PiiScrub.piiReport(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_email", "n_ipv4", "n_ssn", "n_phone", "n_pii")
      .as[(Int, Int, Int, Int, Int)].collect()
    assert(rep(0) === ((1, 1, 0, 0, 2)))
    assert(rep(1) === ((0, 0, 1, 1, 2)))
    assert(rep(2) === ((0, 0, 0, 0, 0)))
    val s = PiiScrub.scrubbed(docs, "text").orderBy("doc_id")
      .as[(Long, String)].collect().map(_._2)
    assert(s(0) === "mail me at [EMAIL] or [IPV4] thanks")
    assert(s(1) === "ssn [SSN] phone [PHONE] done")
    assert(s(2) === "clean text with no identifiers at all")
  }

  test("pii: email local parts are consumed whole, not half-eaten as phones") {
    val docs = Seq((1L, "x 12345678901@example.com y")).toDF("doc_id", "text")
    assert(PiiScrub.scrubbed(docs, "text").as[(Long, String)].collect()
      .head._2 === "x [EMAIL] y")
  }

  test("pii: dates and grouped figures are NOT phones (min 10 digits)") {
    val docs = Seq(
      (1L, "released on 2026-08-13 at a cost of 1 000 000 dollars"),
      (2L, "call 555-867-5309 x22"), // 10 digits -> phone
      (3L, "port 8080 and pin 1234 stay")).toDF("doc_id", "text")
    val s = PiiScrub.scrubbed(docs, "text").orderBy("doc_id")
      .as[(Long, String)].collect().map(_._2)
    assert(s(0) === "released on 2026-08-13 at a cost of 1 000 000 dollars")
    assert(s(1) === "call [PHONE] x22")
    assert(s(2) === "port 8080 and pin 1234 stay")
  }

  test("normalize: case, punctuation, whitespace runs; all-punct docs -> empty") {
    val docs = Seq(
      (1L, "Hello,   World! It's 2026."),
      (2L, "!!! ???"),
      (3L, "already clean text")).toDF("doc_id", "text")
    val got = TextAnalysis.normalized(docs, "doc_id", "text")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "hello world it s 2026", 5),
      (2L, "", 1), // empty string = one empty token, the house convention
      (3L, "already clean text", 3)))
  }

  test("rrfFuse: hand-computed fusion, absent docs contribute zero, id tiebreak") {
    // list A ranks docs 1,2,3; list B ranks 2,1,9 — doc 2 wins the
    // fusion (1e6/62 + 1e6/61 = 16129+16393=32522 over doc 1's
    // 1e6/61 + 1e6/62 = same... so tie → doc 1 first by id), doc 9 only
    // in B (1e6/63 = 15873), doc 3 only in A (15873, ties 9 → 3 first)
    val a = Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((7L, 2L, 1), (7L, 1L, 2), (7L, 9L, 3)).toDF("query_id", "doc_id", "rnk")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 4)
      .orderBy("rnk").as[(Long, Long, Long, Int)].collect().toSeq
    val s12 = 1000000L / 61 + 1000000L / 62
    val s3 = 1000000L / 63
    assert(got === Seq((7L, 1L, s12, 1), (7L, 2L, s12, 2),
      (7L, 3L, s3, 3), (7L, 9L, s3, 4)))
  }

  test("rerankBatched: the full retrieve -> fuse -> rerank stack with a deterministic scorer") {
    val corpusDocs = Seq(
      (1L, "apple banana apple pear"),
      (2L, "apple cherry plum"),
      (3L, "banana banana durian kiwi")).toDF("doc_id", "text")
    val probes = Seq((100L, "apple durian pear")).toDF("doc_id", "text")
    val lex = Retrieval.tfidfTopK(corpusDocs, probes, "doc_id", "text", k = 3)
      .select("query_id", "doc_id", "rnk")
    val fused = Retrieval.rrfFuse(Seq(lex), k = 3)
    val r = Retrieval.rerankBatched(spark, fused, probes, corpusDocs,
      "doc_id", "text", k = 3)
      .orderBy("rnk").as[(Long, Long, Double, Int)].collect().toSeq
    // stub scorer = |q ∩ d| / |q| with q = {apple, durian, pear}:
    // doc1 {apple,banana,pear} -> 2/3; doc2 {apple,cherry,plum} -> 1/3;
    // doc3 {banana,durian,kiwi} -> 1/3 (tie -> doc 2 first by id)
    assert(r.map(t => (t._2, t._4)) === Seq((1L, 1), (2L, 2), (3L, 3)))
    assert(math.abs(r.head._3 - 2.0 / 3) < 1e-12)
    // the model only ever sees the candidate pairs: Q x k, never the corpus
    assert(r.length === 3)
  }

  test("rerankBatched: empty query text scores zero, k truncates") {
    val corpusDocs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val probes = Seq((9L, "")).toDF("doc_id", "text")
    val cand = Seq((9L, 1L, 1), (9L, 2L, 2)).toDF("query_id", "doc_id", "rnk")
    val r = Retrieval.rerankBatched(spark, cand, probes, corpusDocs,
      "doc_id", "text", k = 1).as[(Long, Long, Double, Int)].collect()
    assert(r.toSeq === Seq((9L, 1L, 0.0, 1)))
  }

  /** The engine's md5 bucket arithmetic, replayed in plain JVM code. */
  private def bucketOf(feature: String, numBuckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(feature.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % numBuckets
  }

  private def featuresOf(text: String): Seq[String] = {
    val t = text.split(" ", -1).toSeq
    t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  test("importanceWeights: matches an independent in-memory DSIR fold") {
    import graft.llm.Sampling
    val corpus = Seq(
      (1L, "cats purr and cats nap"),
      (2L, "dogs bark at dogs"),
      (3L, "cats nap on mats"),
      (4L, "stock prices fell again today")).toDF("doc_id", "text")
    val target = Seq((10L, "cats nap"), (11L, "cats purr")).toDF("doc_id", "text")
    val b = 64
    val got = Sampling.importanceWeights(corpus, target, "doc_id", "text",
      numBuckets = b).as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // plain-Scala replay of the same counts and integer ratio
    val corpusTexts = Map(1L -> "cats purr and cats nap",
      2L -> "dogs bark at dogs", 3L -> "cats nap on mats",
      4L -> "stock prices fell again today")
    val pc = corpusTexts.values.toSeq.flatMap(featuresOf)
      .groupBy(bucketOf(_, b)).view.mapValues(_.size.toLong).toMap
    val qc = Seq("cats nap", "cats purr").flatMap(featuresOf)
      .groupBy(bucketOf(_, b)).view.mapValues(_.size.toLong).toMap
    def r(bk: Long) = (qc.getOrElse(bk, 0L) + 1) * 1000000L / (pc(bk) + 1)
    val want = corpusTexts.map { case (id, tx) =>
      val bs = featuresOf(tx).map(bucketOf(_, b))
      val w = bs.map(r).sum
      id -> ((bs.size.toLong, w, w / bs.size))
    }
    assert(got === want)
    // the selection signal: per-feature means rank target-like docs over
    // off-distribution ones regardless of length
    assert(got(1L)._3 > got(4L)._3 && got(3L)._3 > got(4L)._3)
  }

  test("importanceWeights is partitioning-invariant") {
    import graft.llm.Sampling
    val corpus = Seq((1L, "a b c"), (2L, "c d e"), (3L, "a a a")).toDF("doc_id", "text")
    val target = Seq((9L, "a b")).toDF("doc_id", "text")
    val base = Sampling.importanceWeights(corpus, target, "doc_id", "text", 32)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val rep = Sampling.importanceWeights(corpus.repartition(7), target.coalesce(1),
      "doc_id", "text", 32).as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(base === rep)
  }

  test("lmFluency: hand-computed conditional per-milles; short docs absent") {
    val ref = Seq(
      (10L, "a b"),     // reference counts: c(a b)=2, c(a c)=1, c(a·)=3
      (11L, "a b"),
      (12L, "a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),      // p = 2000 div (3+1) = 500
      (2L, "a c"),      // p = 1000 div 4 = 250
      (3L, "a z"),      // unseen bigram, seen prefix: 0
      (4L, "q r"),      // unseen prefix: 0 div (0+1) = 0
      (5L, "solo")      // no bigram — not in the output
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmFluency(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 1L, 500L), (2L, 1L, 250L), (3L, 1L, 0L),
      (4L, 1L, 0L)))
  }

  test("lmFluency: gibberish scores at ~0, reference-tracking text high") {
    val ref = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "the cat sat on the rug")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zq xv the pw cat qqn sat mat on zz")).toDF("doc_id", "text")
    val s = TextAnalysis.lmFluency(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(s(1L) > 300, s"fluent doc should score high, got ${s(1L)}")
    assert(s(2L) === 0, s"gibberish should score 0, got ${s(2L)}")
  }

  test("MMR: redundant runner-up deferred in favor of a diverse candidate") {
    // cid 1 (rel .9) and cid 2 (rel .89) are near-duplicates (sim .95);
    // cid 3 (rel .5) is orthogonal to both. λ=0.7:
    //   pick 1 = cid 1 (pure relevance)
    //   pick 2: cid 2 scores .7*.89-.3*.95 = .338 < cid 3's .7*.5-0 = .35
    val cands = Seq((1L, 1L, 0.9), (1L, 2L, 0.89), (1L, 3L, 0.5))
      .toDF("qid", "cid", "rel")
    val sims = Seq(
      (1L, 1L, 2L, 0.95), (1L, 2L, 1L, 0.95),
      (1L, 1L, 3L, 0.0), (1L, 3L, 1L, 0.0),
      (1L, 2L, 3L, 0.0), (1L, 3L, 2L, 0.0))
      .toDF("qid", "cid_a", "cid_b", "sim")
    val got = Retrieval.mmrRerank(cands, sims, k = 3, lambdaPermille = 700)
      .orderBy("pick").select("cid").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 2L), s"expected diversity-first order, got $got")
  }

  test("MMR: candidate missing from pairSims is treated as maximally diverse, not dropped") {
    val cands = Seq((1L, 1L, 0.9), (1L, 2L, 0.8), (1L, 3L, 0.7))
      .toDF("qid", "cid", "rel")
    // only the 1<->2 similarity is known; cid 3 has no rows at all
    val sims = Seq((1L, 1L, 2L, 0.99), (1L, 2L, 1L, 0.99))
      .toDF("qid", "cid_a", "cid_b", "sim")
    val got = Retrieval.mmrRerank(cands, sims, k = 2, lambdaPermille = 700)
      .orderBy("pick").select("cid").as[Long].collect().toSeq
    // pick 2: cid 2 scores .7*.8-.3*.99=.263; cid 3 scores .7*.7-0=.49
    assert(got == Seq(1L, 3L), s"unknown-sim candidate must win round 2, got $got")
  }

  test("MMR: λ=1000 degenerates to pure relevance ranking") {
    val cands = Seq((1L, 1L, 0.9), (1L, 2L, 0.8), (1L, 3L, 0.7))
      .toDF("qid", "cid", "rel")
    val sims = Seq((1L, 1L, 2L, 0.99), (1L, 2L, 1L, 0.99),
      (1L, 1L, 3L, 0.99), (1L, 3L, 1L, 0.99),
      (1L, 2L, 3L, 0.99), (1L, 3L, 2L, 0.99))
      .toDF("qid", "cid_a", "cid_b", "sim")
    val got = Retrieval.mmrRerank(cands, sims, k = 3, lambdaPermille = 1000)
      .orderBy("pick").select("cid").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("shardManifest: count + content sum catch drop, duplicate, and corruption") {
    import spark.implicits._
    import graft.llm.Shuffling
    val docs = (1L to 40L).map(i => (i, s"doc body number $i"))
      .toDF("doc_id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Shuffling.shardManifest(df, "doc_id", col("text"), numShards = 4)
        .select("shard", "n_docs", "content_sum")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val base = manifest(docs)
    assert(base.keySet === Set(0L, 1L, 2L, 3L))
    assert(base.values.map(_._1).sum === 40L)
    // corrupting ONE row's content moves exactly its shard's content_sum
    // (count unchanged — the case a pure row count would miss)
    val corrupted = manifest(docs.withColumn("text",
      when(col("doc_id") === 17L, lit("flipped bits")).otherwise(col("text"))))
    val moved = base.keys.filter(k => base(k) != corrupted(k)).toSeq
    assert(moved.size === 1, s"exactly one shard must move: $moved")
    assert(base(moved.head)._1 === corrupted(moved.head)._1,
      "the count alone does NOT catch corruption — the content sum does")
    // dropping a row moves its shard's count (and sum)
    val dropped = manifest(docs.filter(col("doc_id") =!= 17L))
    assert(dropped.values.map(_._1).sum === 39L)
    assert(base !== dropped)
  }

  test("contextPack: longest rank-order prefix under the token budget; " +
    "an oversized top hit yields an empty context; NULL-text docs are " +
    "skipped, never packed free") {
    import spark.implicits._
    // one query matching four docs at strictly decreasing BM25 score
    // (term 'q' tf 4/3/2/1); doc lengths chosen so the budget cuts after
    // the second hit: 5 + 4 = 9 ≤ 10, + next (3) = 12 > 10
    val corpus = Seq(
      (1L, Option("q q q q x")),        // 5 tokens, rank 1
      (2L, Option("q q q x")),          // 4 tokens, rank 2 → cum 9
      (3L, Option("q q x")),            // 3 tokens, rank 3 → cum 12: cut
      (4L, Option("q x")),              // 2 tokens, rank 4 (would fit if
                                        // skipping were allowed — prefix
                                        // semantics says no)
      (5L, Option.empty[String])        // NULL text: never packable
    ).toDF("doc_id", "text")
    val queries = Seq((100L, "q")).toDF("doc_id", "text")
    val got = Retrieval.contextPack(corpus, queries, "doc_id", "text",
      k = 10, tokenBudget = 10L)
      .orderBy("rnk")
      .select("doc_id", "rnk", "doc_tokens", "cum_tokens")
      .as[(Long, Int, Int, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L),
      "the context is the rank-1..2 prefix: rank 3 overflows and rank 4 " +
        "must NOT be pulled past it")
    assert(got.map(_._4).toSeq === Seq(5L, 9L))
    // a budget smaller than the top hit → empty context for that query
    assert(Retrieval.contextPack(corpus, queries, "doc_id", "text",
      k = 10, tokenBudget = 4L).count() === 0L)
    // NULL-text doc never appears even with unlimited budget (a windowed
    // sum would otherwise pack it at zero cost)
    val wide = Retrieval.contextPack(corpus, queries, "doc_id", "text",
      k = 10, tokenBudget = 1000L)
    assert(!wide.select("doc_id").as[Long].collect().contains(5L))
  }
}
