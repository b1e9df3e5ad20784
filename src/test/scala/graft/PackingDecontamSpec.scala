package graft

import org.apache.spark.sql.functions._

import graft.llm.{Decontam, Packing, Sampling, TextAnalysis}

/** Sequence packing, train/eval decontamination, and mixing weights. */
class PackingDecontamSpec extends SparkSpecBase {
  import spark.implicits._

  private def packOf(rows: Seq[(String, Long, Int)], budget: Long) =
    Packing.packGreedy(
      rows.toDF("src", "id", "n"), "id", "src", col("n"), budget)
      .select("doc_id", "bin_idx").as[(Long, Long)].collect().sortBy(_._1)

  test("packGreedy: greedy first-fit fold incl. oversized docs") {
    val rows = Seq(4, 5, 2, 10, 1, 11, 3).zipWithIndex
      .map { case (n, i) => ("g", (i + 1).toLong, n) }
    // fill: 4,9 | 2 | 10 | 1 | 11(oversized own bin) | 3
    assert(packOf(rows, 10).map(_._2).toSeq === Seq(0L, 0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("packGreedyDecreasing: length-descending order uses fewer bins than arrival order") {
    // budget 10, lengths by id: 4,7,6. Arrival order folds (4),(7),(6)
    // = 3 bins; decreasing order 7,6,4 folds (7),(6+4) = 2 bins.
    val rows = Seq(("g", 1L, 4), ("g", 2L, 7), ("g", 3L, 6))
    val arrival = packOf(rows, 10).map(_._2).max + 1
    val nfd = Packing.packGreedyDecreasing(
      rows.toDF("src", "id", "n"), "id", "src", col("n"), 10L)
      .select("doc_id", "bin_idx").as[(Long, Long)].collect()
    assert(arrival === 3L)
    assert(nfd.map(_._2).max + 1 === 2L, "7 then 6+4 packs into two bins")
    // and the assignment is the decreasing-order fold: 2->bin0, 3->bin1, 1->bin1
    assert(nfd.sortBy(_._1).toSeq === Seq((1L, 1L), (2L, 0L), (3L, 1L)))
  }

  test("packGreedy: null group key resets state like any other group") {
    // regression: the fold's initial sentinel is null, so a null group's
    // FIRST doc must still trigger the group-start reset — an oversized
    // first doc gets bin 0, not bin 1
    val rows = Seq((null.asInstanceOf[String], 1L, 11),
      (null.asInstanceOf[String], 2L, 3), ("g", 3L, 4))
    val out = Packing.packGreedy(rows.toDF("src", "id", "n"), "id", "src",
      col("n"), 10).select("doc_id", "bin_idx").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 0L), (2L, 1L), (3L, 0L)))
  }

  test("packGreedy: exact fit stays in the bin") {
    val rows = Seq(("g", 1L, 5), ("g", 2L, 5), ("g", 3L, 5))
    assert(packOf(rows, 10).map(_._2).toSeq === Seq(0L, 0L, 1L))
  }

  test("packGreedy: groups pack independently; output invariant to input partitioning") {
    val rows = (1L to 40L).map(i => (s"g${i % 3}", i, (i % 7).toInt + 1))
    val df1 = rows.toDF("src", "id", "n")
    val df7 = df1.repartition(7)
    val a = Packing.packGreedy(df1, "id", "src", col("n"), 9)
      .as[(String, Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    val b = Packing.packGreedy(df7, "id", "src", col("n"), 9)
      .as[(String, Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq === b.toSeq)
    // cross-check against a sequential reference fold per group
    val ref = rows.groupBy(_._1).flatMap { case (g, docs) =>
      var bin = 0L; var fill = 0L; var first = true
      docs.sortBy(_._2).map { case (_, id, n) =>
        if (first) { first = false; fill = n }
        else if (fill + n <= 9) fill += n
        else { bin += 1; fill = n }
        (g, id, bin)
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(a.map(r => (r._1, r._2, r._4)).toSeq === ref)
  }

  test("binStats: fill and pad per bin") {
    val packed = Packing.packGreedy(
      Seq(("g", 1L, 4), ("g", 2L, 5), ("g", 3L, 2)).toDF("src", "id", "n"),
      "id", "src", col("n"), 10)
    val stats = Packing.binStats(packed, 10)
      .orderBy("bin_idx").as[(String, Long, Long, Long, Long)].collect()
    assert(stats.toSeq === Seq(("g", 0L, 2L, 9L, 1L), ("g", 1L, 1L, 2L, 8L)))
  }

  test("decontam: overlap counts and containment permille") {
    val corpus = Seq(
      (1L, "x y a b c z"), // grams: "x y a","y a b","a b c","b c z" — 1 hit
      (2L, "p q r s")      // no overlap
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val rep = Decontam.overlapReport(corpus, eval, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rep.toSeq === Seq((1L, 1L, 1L, 4L, 250L)))
  }

  test("decontam: eval-side report — leakage per benchmark doc") {
    val corpus = Seq(
      (1L, "x y a b c z"),   // carries eval gram "a b c"
      (2L, "m a b c d n"),   // carries "a b c", "a b c d"-adjacent grams
      (3L, "p q r s")        // clean
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "a b c d"),     // grams "a b c","b c d": "a b c" in docs 1,2; "b c d" in doc 2
      (101L, "u v w x")      // untouched — absent from the report
    ).toDF("doc_id", "text")
    val rep = Decontam.evalContaminationReport(corpus, eval, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    // eval 100: both grams leak (n_leaked=2 of n_grams=2 → 1000‰),
    // carried by train docs 1 and 2
    assert(rep.toSeq === Seq((100L, 2L, 2L, 2L, 1000L)))
  }

  test("decontam: eval-side hot-gram cap drops boilerplate grams") {
    val corpus = Seq((1L, "a b c z")).toDF("doc_id", "text")
    // the gram "a b c" appears in 3 eval docs — over a cap of 2
    val eval = Seq((100L, "a b c"), (101L, "a b c"), (102L, "a b c"))
      .toDF("doc_id", "text")
    assert(Decontam.overlapReport(corpus, eval, "doc_id", "text", n = 3,
      maxGramEvalDf = 2).count() === 0)
    assert(Decontam.overlapReport(corpus, eval, "doc_id", "text", n = 3,
      maxGramEvalDf = 3).count() === 1)
  }

  test("decontaminate: drops flagged docs, keeps the clean rest") {
    val corpus = Seq((1L, "x y a b c z"), (2L, "p q r s")).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val clean = Decontam.decontaminate(corpus, eval, "doc_id", "text",
      n = 3, minHitPermille = 200)
    assert(clean.select("doc_id").as[Long].collect().toSeq === Seq(2L))
    // threshold above the doc's 250‰ containment keeps everything
    val lax = Decontam.decontaminate(corpus, eval, "doc_id", "text",
      n = 3, minHitPermille = 300)
    assert(lax.count() === 2)
  }

  test("mixWeights: rate caps at the token budget, never above 1000") {
    val docs = Seq(
      ("a", 1L, "w w w"), ("a", 2L, "w w w w"), // 7 tokens
      ("b", 3L, "w w")                          // 2 tokens, under budget
    ).toDF("src", "id", "text")
    val w = Sampling.mixWeights(docs, "src",
        TextAnalysis.tokenCount(col("text")), tokenBudget = 5L)
      .orderBy("src").as[(String, Long, Long, Long)].collect()
    assert(w.toSeq === Seq(("a", 2L, 7L, 714L), ("b", 1L, 2L, 1000L)))
  }

  test("lengthHistogram: exact power-of-two edges, cap bucket, token mass") {
    import graft.llm.Packing
    val docs = Seq(
      (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L),   // edges: 2 and 4 are exact
      (5L, 5L), (6L, 64L), (7L, 65L),
      (8L, (1L << 21))                            // beyond the cap
    ).toDF("doc_id", "n")
    val got = Packing.lengthHistogram(docs, "doc_id", col("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 1L, 1L), (2L, 1L, 2L), (4L, 2L, 7L), (8L, 1L, 5L),
      (64L, 1L, 64L), (128L, 1L, 65L),
      ((1L << 20), 1L, (1L << 21))))
  }

  test("overlapMatrix: per-suite rows agree with single-suite overlapReport") {
    val corpus = Seq(
      (1L, "x y a b c z"),  // hits suite A's "a b c"
      (2L, "u v d e f w"),  // hits suite B's "d e f"
      (3L, "p q r s"))      // clean
      .toDF("doc_id", "text")
    val evals = Seq(
      (100L, "a b c d", "suiteA"),
      (200L, "c d e f g", "suiteB"))
      .toDF("doc_id", "text", "suite")
    val m = Decontam.overlapMatrix(corpus, evals, "doc_id", "text",
      "suite", n = 3)
      .orderBy("doc_id", "eval_set")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(m === Seq(
      (1L, "suiteA", 1L, 4L, 250L),
      (2L, "suiteB", 1L, 4L, 250L)))
    // single-suite consistency: matrix restricted to suiteA == the
    // overlapReport numerator over that suite alone
    val single = Decontam.overlapReport(corpus,
      evals.filter($"suite" === "suiteA"), "doc_id", "text", n = 3)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toSeq
    assert(single === Seq((1L, 1L)))
  }

  test("overlapMatrix: per-suite boilerplate cap is independent per suite") {
    // the same gram is ubiquitous in suite A (2 eval docs > cap 1) but
    // rare in suite B (1 doc ≤ cap) — it must be dropped ONLY for A
    val corpus = Seq((1L, "x a b c y")).toDF("doc_id", "text")
    val evals = Seq(
      (100L, "a b c d", "suiteA"), (101L, "e a b c", "suiteA"),
      (200L, "a b c f", "suiteB"))
      .toDF("doc_id", "text", "suite")
    val m = Decontam.overlapMatrix(corpus, evals, "doc_id", "text",
      "suite", n = 3, maxGramEvalDf = 1)
      .select("doc_id", "eval_set").as[(Long, String)].collect().toSeq
    assert(m === Seq((1L, "suiteB")))
  }
}
