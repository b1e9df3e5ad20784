package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Packing, TextAnalysis}

/** Hot-key degradation audit (the least-exercised scale axis until
  * round 9): inject deliberately pathological keys — a boilerplate
  * paragraph in 10% of docs, a high-degree hub vertex, a stratum holding
  * most of the corpus — and assert the operators stay EXACT and their
  * plans keep the shape that degrades gracefully (map-side combine /
  * AQE-splittable joins / O(1)-per-row folds), not a shape that
  * serializes the hot key into one task. Wall-clock straggler ratios at
  * sf0.1 are measured by `graft.SkewAudit` (bench notes), not here.
  */
class SkewAuditSpec extends SparkSpecBase {

  private val Boiler = "COMMON LICENSE HEADER PARAGRAPH"

  private def skewedDocs = Tables.documents(spark, sfDir)
    .select(col("doc_id"),
      when(col("doc_id") % 10 === 0, concat(lit(Boiler), lit("\n\n"), col("text")))
        .otherwise(col("text")).as("text"))

  test("paragraph dedup, 10%-hot boilerplate: verdicts exact, keep-first partial-aggregated") {
    val out = Dedup.paragraphDedup(skewedDocs, "doc_id", "text")
    // the boilerplate survives exactly ONCE corpus-wide — in the doc
    // holding its minimal (doc_id, para_no)
    val keepers = out.filter(col("text_kept").contains(Boiler))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val firstBoilerDoc = skewedDocs.filter(col("text").startsWith(Boiler))
      .agg(min("doc_id")).head().getLong(0)
    assert(keepers == Seq(firstBoilerDoc),
      s"boilerplate must survive only in doc $firstBoilerDoc, got $keepers")
    // every injected doc still counts the boilerplate paragraph
    val injected = out.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "n_paras", "n_kept").collect()
    assert(injected.forall(r => r.getLong(1) >= 2L))
    assert(injected.filter(_.getLong(0) != firstBoilerDoc)
      .forall(r => r.getLong(2) == r.getLong(1) - 1),
      "non-first injected docs keep everything except the boilerplate")
    // plan shape: the hot md5 key must combine map-side, never window-sort
    val p = Dedup.paragraphDedup(skewedDocs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_min") && !p.contains("Window"))
  }

  test("connected components, high-degree hub: stars and min-label agree exactly") {
    import spark.implicits._
    // hub 0 touches 300 vertices; plus disjoint chains 1000..1004, 2000..2001
    val hub = (1L to 300L).map(v => (0L, v))
    val chains = Seq((1000L, 1001L), (1001L, 1002L), (1002L, 1003L),
      (1003L, 1004L), (2000L, 2001L))
    val pairs = (hub ++ chains).toDF("doc_a", "doc_b")
    def labelSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stars = labelSet(
      Dedup.connectedComponentsStars(pairs, "doc_a", "doc_b", localThreshold = 0L))
    val minLabel = labelSet(Dedup.connectedComponents(pairs, "doc_a", "doc_b"))
    assert(stars == minLabel, "hub graph: star contraction diverged from min-label")
    assert(stars.count(_._2 == 0L) == 301, "hub component must label all 301 vertices 0")
    // (the per-round plans materialize behind iteration barriers, so the
    // final frame shows only a Scan; the skew-tolerant shape — min()
    // aggregates that combine map-side + AQE-splittable equi-joins — is
    // the per-round construction in Dedup.connectedComponents*, and the
    // wall-clock straggler ratio is measured by graft.SkewAudit at sf0.1)
  }

  test("pack greedy, hot stratum: fills stay exact when one group holds most docs") {
    val hot = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 5 =!= 0, lit("srcHOT")).otherwise(col("source"))
          .as("source"),
        col("text"))
    val packed = Packing.packGreedy(hot, "doc_id", "source",
      TextAnalysis.tokenCount(col("text")), tokenBudget = 128L)
    val stats = Packing.binStats(packed, tokenBudget = 128L).collect()
    assert(stats.nonEmpty)
    // every bin respects the budget (single-doc overflows excepted, as
    // packInOrder documents) and the hot group actually packed
    val bad = stats.filter(r => r.getAs[Long]("fill_tokens") > 128L &&
      r.getAs[Long]("n_docs") > 1L)
    assert(bad.isEmpty, s"over-budget multi-doc bins: ${bad.mkString(",")}")
    assert(stats.count(_.getAs[String]("grp") == "srcHOT") > 1,
      "hot stratum must span multiple bins")
    // degradation boundary is LINEAR by construction: the per-group fold
    // is O(1) per row inside mapPartitions — no sort amplification, no
    // per-key state beyond (bin, fill)
  }

  test("interval join, one hot user: counts stay exact; expansion bounded by the window") {
    import spark.implicits._
    // user 1: 2000 clicks over 2000 s + 50 purchases; window 10 s → each
    // purchase matches ≈10 clicks, never the full click history. The
    // quadratic blow-up an unwindowed per-user join would produce (2000 ×
    // 50 = 100k pairs) is cut to ~500 by the range predicate.
    val clicks = (0 until 2000).map(i =>
      (1L, 10000L + i, i.toLong * 1000000L)).toDF("user_id", "event_id", "ts_us")
    val purchases = (0 until 50).map(i =>
      (1L, 90000L + i, i.toLong * 40000000L + 500000L)).toDF("user_id", "event_id", "ts_us")
    val out = graft.streaming.StreamOps.clickAttribution(
      clicks, purchases, windowUs = 10000000L).collect()
    assert(out.length === 50)
    // purchase at t=i·40s+0.5s sees clicks in [t−10s, t): 10 of them
    // (ticks every 1 s), except the first purchase (only 0.5 s of history)
    val byId = out.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(90000L) === 1L)
    assert((1 until 50).forall(i => byId(90000L + i) === 10L),
      s"window must bound the per-purchase click fan-in, got ${byId.toSeq.sorted.take(5)}")
    // the pair stream the aggregation consumed is window-bounded: 491
    // pairs, not clicks × purchases
    val pairs = graft.streaming.StreamOps.intervalJoin(
      clicks.select($"user_id", $"event_id".as("click_id"), $"ts_us".as("click_ts_us")),
      purchases.select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_ts_us")),
      "user_id", "click_id", "click_ts_us", "purchase_id", "purchase_ts_us",
      10000000L).count()
    assert(pairs === 491L, s"expected 1 + 49*10 window-bounded pairs, got $pairs")
  }

  test("token budget select, 90%-hot score stratum: selection stays exact") {
    import spark.implicits._
    // 90% of docs share one score — the documented worst case (one
    // stratum = one window partition). The decomposed cumsum must still
    // produce the exact greedy selection, bit-for-bit.
    val rows = (1L to 500L).map { i =>
      val score = if (i % 10 == 0) 900L else 100L + (i % 7) // 90% at 100+k
      (i, score, 5L + i % 4)
    }
    val hot = rows.map { case (i, s, t) => (i, if (s < 900) 100L else 900L, t) }
    val df = hot.toDF("doc_id", "s", "t").repartition(7)
    val got = graft.llm.Sampling
      .tokenBudgetSelect(df, "doc_id", col("s"), col("t"), 600L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    var cum = 0L
    val want = hot.sortBy(r => (-r._2, r._1)).flatMap { case (id, _, t) =>
      cum += t; if (cum <= 600L) Some(id -> cum) else None
    }.toMap
    assert(got === want)
  }

  test("source reputation filter, one source holding 90% of docs: exact and map-side combined") {
    import spark.implicits._
    val docs = (1L to 400L).map { i =>
      val src = if (i <= 360) "mega" else s"s${i % 4}"
      // mega's mean diversity is LOW (repeated token), others high
      val txt = if (src == "mega") "x x x x y" else "p q r s t"
      (i, txt, src)
    }.toDF("doc_id", "text", "source").repartition(8)
    val kept = graft.llm.Sampling.sourceReputationFilter(
      docs, "doc_id", "text", "source", minSrcPermille = 600L)
    // the hot source dies as a unit; the 40 long-tail docs all survive
    assert(kept.count() === 40L)
    assert(!kept.select("source").as[String].collect().contains("mega"))
    val p = kept.queryExecution.executedPlan.toString
    assert(p.contains("partial_"), "per-source mean must combine map-side " +
      "(the hot source reduces inside each task, never in one reducer row)")
  }

  test("pageRank, celebrity out-vertex: exact under a hot src; out-weights partial-agg, never a window") {
    import spark.implicits._
    // vertex 0 owns 5000 out-edges (a celebrity's out-list); a src-
    // partitioned window would land all of them on ONE task that AQE
    // cannot split — the partial-agg + join out-weight derivation
    // combines them map-side and the join key stays skew-splittable
    val hot = (1L to 5000L).map(d => (0L, d, 1L + d % 3))
    val tail = (1L to 200L).flatMap(s => Seq((s, s % 50 + 5000L, 1L)))
    val back = Seq((6000L, 0L, 1L)) // vertex 0 keeps an in-edge
    val edges = (hot ++ tail ++ back).toDF("src", "dst", "w").repartition(8)
    val pw = graft.graph.GraphOps.outWeighted(edges)
      .queryExecution.executedPlan.toString
    assert(!pw.contains("Window"),
      "hot-src out-weights must never serialize into a window partition")
    assert(pw.contains("partial_sum"))
    // exactness under the hot key: distributed == sequential recurrence
    val e = edges.as[(Long, Long, Long)].collect()
    val outW = e.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var mass = outW.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 2) {
      val in = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (s, d, w) =>
        if (mass.contains(s)) in(d) += mass(s) * w / outW(s) }
      mass = outW.keys.map(v => v -> (150000L + 85L * in(v) / 100L)).toMap
    }
    val got = graft.graph.GraphOps.pageRankInt(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === mass, "hot-src graph: distributed PageRank diverged")
  }

  test("bucketed range join, one hot bucket: exact under 90% probe " +
    "concentration; the bucket key is a JOIN key AQE can split") {
    import spark.implicits._
    // 90% of probe rows land in bucket 0 ([0, 10)); intervals overlap it
    val probe = (1 to 1000).map { i =>
      val t = if (i % 10 != 0) (i % 10).toLong else 100L + i
      (i.toLong, t)
    }
    val ivs = Seq((1L, 0L, 9L), (2L, 5L, 14L), (3L, 500L, 700L))
    val got = graft.ops.RangeJoin.bucketed(
      probe.toDF("p_id", "t"), "t",
      ivs.toDF("win_id", "lo", "hi"), "lo", "hi", bucketWidth = 10L)
      .groupBy("win_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ivs.map { case (w, lo, hi) =>
      w -> probe.count { case (_, t) => t >= lo && t <= hi }.toLong
    }.filter(_._2 > 0).toMap
    assert(got === want, "hot-bucket range join diverged from brute force")
    // plan shape: the hot bucket rides a shuffled equi-join (AQE's skew
    // splitting applies to join keys; a nested loop has no key to split)
    val p = graft.ops.RangeJoin.bucketed(
      probe.toDF("p_id", "t"), "t",
      ivs.toDF("win_id", "lo", "hi"), "lo", "hi", bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("exact-dedup first occurrence, corpus-hot duplicate text: exact, " +
    "partial-min combined, and NEVER a text-hash window") {
    // one boilerplate page duplicated into 30% of the corpus — the 100 TB
    // shape where a text-keyed Window.partitionBy(md5(text)) would land
    // the whole copy set on ONE unsplittable task
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(Boiler))
          .otherwise(col("text")).as("text"))
    val out = Dedup.firstOccurrences(docs, "doc_id", "text")
    // exact: one survivor per distinct text, each the min doc_id
    val boilersKept = out.filter(col("text") === Boiler)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val firstBoiler = docs.filter(col("text") === Boiler)
      .agg(min("doc_id")).head().getLong(0)
    assert(boilersKept == Seq(firstBoiler),
      s"hot duplicate must survive once as doc $firstBoiler, got $boilersKept")
    assert(out.count() ===
      docs.select(md5(col("text"))).distinct().count(),
      "one survivor per distinct text")
    // plan shape: partial-min groupBy + composite-key equi-join; a hot
    // hash spreads because the join key includes the per-copy doc_id
    val p = Dedup.firstOccurrences(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "the first-occurrence pick must never be a window over the text hash")
    assert(p.contains("partial_min"),
      "the canonical id must combine map-side inside each task")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }
}
