package graft

import org.apache.spark.sql.functions._
import graft.ops.{RangeJoin, TableProfile}

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- RangeJoin.bucketed --------------------------------------------

  test("bucketed range join: brute-force parity on random data incl. " +
    "negative values and multi-bucket intervals") {
    val rnd = new scala.util.Random(5)
    val probe = (1 to 400).map(i => (i.toLong, rnd.nextLong() % 100L))
    val ivs = (1 to 60).map { j =>
      val lo = rnd.nextLong() % 100L
      (1000L + j, lo, lo + rnd.nextInt(25))
    }
    for (width <- Seq(1L, 3L, 7L, 50L)) {
      val got = RangeJoin.bucketed(
        probe.toDF("p_id", "t"), "t",
        ivs.toDF("win_id", "lo", "hi"), "lo", "hi", bucketWidth = width)
        .select("p_id", "win_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val want = (for {
        (pid, t) <- probe
        (wid, lo, hi) <- ivs
        if t >= lo && t <= hi
      } yield (pid, wid)).sorted
      assert(got === want, s"width $width")
      assert(got.size === got.distinct.size, "each match emitted once")
    }
  }

  test("bucketed range join: inverted interval and over-span intervals " +
    "raise instead of silently descending or exploding") {
    val probe = Seq((1L, 10L)).toDF("p_id", "t")
    val bad = Seq((1L, 20L, 10L)).toDF("win_id", "lo", "hi")
    val e1 = intercept[Exception] {
      RangeJoin.bucketed(probe, "t", bad, "lo", "hi", 2L).collect()
    }
    assert(e1.getMessage.contains("hi < lo"))
    // inversion INSIDE one bucket must also raise (the bucket-level
    // comparison alone would let it silently match nothing)
    val badSameBucket = Seq((1L, 5L, 3L)).toDF("win_id", "lo", "hi")
    val e1b = intercept[Exception] {
      RangeJoin.bucketed(probe, "t", badSameBucket, "lo", "hi", 10L).collect()
    }
    assert(e1b.getMessage.contains("hi < lo"))
    val wide = Seq((1L, 0L, 1000000L)).toDF("win_id", "lo", "hi")
    val e2 = intercept[Exception] {
      RangeJoin.bucketed(probe, "t", wide, "lo", "hi", 2L,
        maxBucketsPerInterval = 100).collect()
    }
    assert(e2.getMessage.contains("spans"))
  }

  test("bucketed range join: negative timestamps bucket with floor " +
    "semantics (no fold-through at zero)") {
    // t = -1 and t = 1 are in DIFFERENT width-5 buckets; an interval
    // covering only [-3, -1] must not match t = 1 and vice versa
    val probe = Seq((1L, -1L), (2L, 1L), (3L, -6L)).toDF("p_id", "t")
    val ivs = Seq((10L, -3L, -1L), (20L, 0L, 2L)).toDF("win_id", "lo", "hi")
    val got = RangeJoin.bucketed(probe, "t", ivs, "lo", "hi", 5L)
      .select("p_id", "win_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }

  test("bucketed range join plans an equi-join, not a nested loop") {
    val probe = spark.range(100).select(col("id").as("t"))
    val ivs = spark.range(10).select((col("id") * 10).as("lo"),
      (col("id") * 10 + 5).as("hi"))
    val p = RangeJoin.bucketed(probe, "t", ivs, "lo", "hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join must decompose to an equi-join:\n$p")
  }

  // ---- TableProfile.rocAuc -------------------------------------------

  test("rocAuc closed forms: perfect separation 1000, reversed 0, " +
    "single tied score 500, empty class NULL") {
    def auc(rows: Seq[(Long, Boolean)]): Option[Long] = {
      val r = TableProfile.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getAs[Long]("auc_permille"))
    }
    assert(auc(Seq((1L, false), (2L, false), (5L, true), (9L, true)))
      === Some(1000L))
    assert(auc(Seq((9L, false), (5L, false), (2L, true), (1L, true)))
      === Some(0L))
    assert(auc(Seq((7L, true), (7L, false), (7L, true), (7L, false)))
      === Some(500L))
    assert(auc(Seq((1L, true), (2L, true))) === None)
    assert(auc(Seq((1L, false))) === None)
  }

  test("rocAuc == brute-force pair counting on random tied data") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(3) == 0))
    val got = TableProfile.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    val pos = rows.collect { case (s, true) => s }
    val neg = rows.collect { case (s, false) => s }
    // 2·Σ_pairs [pos > neg] + Σ_pairs [pos == neg], over 2·P·N
    val num2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val den2 = 2L * pos.size * neg.size
    assert(got.getAs[Long]("n_pos") === pos.size.toLong)
    assert(got.getAs[Long]("n_neg") === neg.size.toLong)
    assert(got.getAs[Long]("auc_permille") === 1000L * num2 / den2)
    assert(got.getAs[Long]("auc_x1e6") === 1000000L * num2 / den2)
  }

  test("rocAuc excludes NULL scores and labels (they have no rank)") {
    val rows = Seq[(java.lang.Long, java.lang.Boolean)](
      (1L, false), (5L, true), (null, true), (3L, null))
      .toDF("s", "y")
    val got = TableProfile.rocAuc(rows, col("s"), col("y")).collect().head
    assert(got.getAs[Long]("n_pos") === 1L)
    assert(got.getAs[Long]("n_neg") === 1L)
    assert(got.getAs[Long]("auc_permille") === 1000L)
  }

  test("grouped rocAuc == ungrouped rocAuc over each group's subset") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 600).map(_ => (s"g${rnd.nextInt(3)}",
      rnd.nextInt(15).toLong, rnd.nextInt(2) == 0))
    val df = rows.toDF("g", "s", "y")
    val grouped = TableProfile.rocAuc(df, col("s"), col("y"), Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
         r.getAs[Long]("auc_permille"), r.getAs[Long]("auc_x1e6"))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = TableProfile.rocAuc(df.filter(col("g") === g),
        col("s"), col("y")).collect().head
      assert(grouped(g) === ((solo.getAs[Long]("n_pos"),
        solo.getAs[Long]("n_neg"), solo.getAs[Long]("auc_permille"),
        solo.getAs[Long]("auc_x1e6"))), s"group $g")
    }
  }

  // ---- TableProfile.operatingPoints ------------------------------------

  test("operatingPoints == brute-force confusion table at every " +
    "observed threshold on random tied data") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(3) == 0))
    val got = TableProfile.operatingPoints(rows.toDF("s", "y"),
      col("s"), col("y"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val p = rows.count(_._2).toLong
    val n = rows.size - p
    val thresholds = rows.map(_._1).distinct
    assert(got.keySet === thresholds.toSet, "one row per observed score")
    for (t <- thresholds) {
      val tp = rows.count { case (s, y) => y && s >= t }.toLong
      val fp = rows.count { case (s, y) => !y && s >= t }.toLong
      val r = got(t)
      assert(r.getAs[Long]("tp") === tp, s"tp@$t")
      assert(r.getAs[Long]("fp") === fp, s"fp@$t")
      assert(r.getAs[Long]("fn") === p - tp, s"fn@$t")
      assert(r.getAs[Long]("tn") === n - fp, s"tn@$t")
      assert(r.getAs[Long]("precision_permille") === tp * 1000 / (tp + fp))
      assert(r.getAs[Long]("recall_permille") === tp * 1000 / p)
      assert(r.getAs[Long]("f1_permille") ===
        2 * tp * 1000 / (2 * tp + fp + (p - tp)), s"f1@$t")
    }
  }

  test("operatingPoints: NULL scores/labels excluded; all-negative " +
    "corpus yields f1 = 0 at every threshold") {
    val rows = Seq[(java.lang.Long, java.lang.Boolean)](
      (5L, false), (3L, false), (null, true), (4L, null))
      .toDF("s", "y")
    val got = TableProfile.operatingPoints(rows, col("s"), col("y"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(5L, 3L))
    assert(got.values.forall(_.getAs[Long]("f1_permille") == 0L))
    assert(got(5L).getAs[Long]("tn") === 1L)
  }

  // ---- Similarity.linearProbeScores --------------------------------------

  test("linear probe: separable classes score AUC 1000; negative-sum " +
    "divisions TRUNCATE toward zero (DuckDB's // semantics — not a " +
    "floor); single class raises") {
    import graft.llm.Similarity
    import graft.ops.TableProfile
    // class true sits at +e1, class false at -e1 (with a small e2 wobble):
    // the mean-difference probe must separate them perfectly
    val emb = Seq(
      (1L, Array(0.4f, 0.1f), true), (2L, Array(0.5f, -0.1f), true),
      (3L, Array(0.3f, 0.05f), true),
      (4L, Array(-0.4f, 0.1f), false), (5L, Array(-0.5f, -0.05f), false),
      (6L, Array(-0.3f, -0.1f), false))
      .toDF("vec_id", "embedding", "lab")
    val scored = Similarity.linearProbeScores(emb, "vec_id", "embedding",
      col("lab"), scoreDiv = 1000L)
    val auc = TableProfile.rocAuc(scored, col("score_pm"), col("y"))
      .collect().head
    assert(auc.getAs[Long]("auc_permille") === 1000L,
      "separable classes must probe to a perfect ranking")
    // division parity: recompute the expected scores in Scala with
    // plain Long division (truncates toward zero — verified to be
    // DuckDB's // semantics too); the negative class sums are exactly
    // where a floor-div formulation would diverge by one
    def q(v: Float) = Math.round(v.toDouble * Similarity.Scale)
    val rows = Seq(
      (1L, Array(0.4f, 0.1f), true), (2L, Array(0.5f, -0.1f), true),
      (3L, Array(0.3f, 0.05f), true),
      (4L, Array(-0.4f, 0.1f), false), (5L, Array(-0.5f, -0.05f), false),
      (6L, Array(-0.3f, -0.1f), false))
    val dims = 0 until 2
    val w = dims.map { i =>
      val sp = rows.filter(_._3).map(r => q(r._2(i))).sum
      val np = rows.count(_._3).toLong
      val sn = rows.filter(!_._3).map(r => q(r._2(i))).sum
      val nn = rows.count(!_._3).toLong
      sp / np - sn / nn
    }
    val want = rows.map { case (id, v, _) =>
      id -> dims.map(i => q(v(i)) * w(i)).sum / 1000L
    }.toMap
    val got = scored.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want, "scores must match the explicit floorDiv form")
    // single class: the guard raises in-path, never a silent direction
    val oneClass = emb.filter(col("lab"))
    val e = intercept[Exception] {
      Similarity.linearProbeScores(oneClass, "vec_id", "embedding",
        col("lab")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("both classes"),
      s"got: ${e.getMessage}")
  }

  test("scoreEcdf: exact per-mille CDF ranks; NULL scores excluded; the " +
    "cardinality bound refuses a raw-logit score") {
    val rows = Seq(Option(10L), Option(10L), Option(20L), Option(30L),
      Option(30L), Option(30L), Option(40L), Option.empty[Long], Option(40L),
      Option(40L))
    val got = graft.ops.TableProfile.scoreEcdf(rows.toDF("s"), col("s"))
      .orderBy("score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // 9 non-NULL rows: 10×2, 20×1, 30×3, 40×3
    assert(got.toSeq === Seq(
      (10L, 2L, 2L, 2L * 1000 / 9), (20L, 1L, 3L, 3L * 1000 / 9),
      (30L, 3L, 6L, 6L * 1000 / 9), (40L, 3L, 9L, 1000L)))
    val e = intercept[IllegalArgumentException] {
      graft.ops.TableProfile.scoreEcdf(
        spark.range(200).select(col("id").as("s")), col("s"),
        maxDistinctScores = 100L)
    }
    assert(e.getMessage.contains("exceed the declared bound"))
  }

  // ---- TableProfile.reliabilityCurve -------------------------------------

  test("reliabilityCurve == brute-force bucket rates; clamps out-of-range " +
    "scores into edge buckets; empty buckets emit n=0 with NULL rate") {
    val rnd = new scala.util.Random(41)
    // scores deliberately escaping [0, 100) on both sides; bucket 3
    // ([30,40)) left deliberately empty
    val rows = (1 to 300).map { _ =>
      val s = rnd.nextInt(140).toLong - 20L
      (if (s >= 30 && s < 40) s + 15 else s, rnd.nextInt(4) == 0)
    }
    val got = TableProfile.reliabilityCurve(rows.toDF("s", "y"),
      col("s"), col("y"), lo = 0L, hi = 100L, buckets = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === (0L to 9L).toSet, "every declared bucket emits")
    def bucketOf(s: Long) = math.min(9L, math.max(0L, s * 10 / 100))
    for (b <- 0L to 9L) {
      val in = rows.filter { case (s, _) => bucketOf(s) == b }
      val r = got(b)
      assert(r.getAs[Long]("n") === in.size.toLong, s"n@$b")
      assert(r.getAs[Long]("n_pos") === in.count(_._2).toLong, s"n_pos@$b")
      if (in.isEmpty) assert(r.isNullAt(r.fieldIndex("pos_permille")),
        s"empty bucket $b must have NULL rate")
      else assert(r.getAs[Long]("pos_permille") ===
        in.count(_._2).toLong * 1000 / in.size, s"rate@$b")
      assert(r.getAs[Long]("lo_v") === b * 10 && r.getAs[Long]("hi_v") === (b + 1) * 10)
    }
    assert(got(3L).getAs[Long]("n") === 0L, "bucket 3 was built empty")
    assert(got(0L).getAs[Long]("n") > 0L && got(9L).getAs[Long]("n") > 0L,
      "out-of-range scores clamp into the edge buckets")
  }

  test("reliabilityCurve + histogram: int64-extreme scores land in the " +
    "correct edge bucket (the multiply is overflow-free by clamping " +
    "the value FIRST)") {
    // Long.MaxValue * buckets wraps int64 in the naive formula,
    // misplacing exactly the out-of-range rows the audits exist to
    // surface; the clamp-before-multiply form must put them at the edges
    val rows = Seq(
      (Long.MaxValue, true), (Long.MinValue, false),
      (500L, true), (999L, false))
    val rel = TableProfile.reliabilityCurve(rows.toDF("s", "y"),
      col("s"), col("y"), lo = 0L, hi = 1000L, buckets = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rel(9L).getAs[Long]("n") === 2L,
      "Long.MaxValue and 999 clamp into the TOP bucket")
    assert(rel(0L).getAs[Long]("n") === 1L,
      "Long.MinValue clamps into the BOTTOM bucket")
    assert(rel(5L).getAs[Long]("n") === 1L)
    val hist = TableProfile.histogram(rows.toDF("s", "y"), col("s"),
      lo = 0L, hi = 1000L, buckets = 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_rows")).toMap
    assert(hist(9L) === 2L && hist(0L) === 1L && hist(5L) === 1L)
    // a full-int64 declared range must also work (bucket edges ride
    // DECIMAL arithmetic); hi - lo here overflows int64 and must raise
    val e = intercept[IllegalArgumentException] {
      TableProfile.histogram(rows.toDF("s", "y"), col("s"),
        lo = Long.MinValue, hi = Long.MaxValue, buckets = 4)
    }
    assert(e.getMessage.contains("fits int64"))
    // the widest SUPPORTED range: [MinValue, -1) — width = 2^63 - 1
    val wide = TableProfile.histogram(rows.toDF("s", "y"), col("s"),
      lo = Long.MinValue, hi = -1L, buckets = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(wide(0L).getAs[Long]("n_rows") === 1L,
      "MinValue lands in bucket 0 of the widest range")
    assert(wide(3L).getAs[Long]("n_rows") === 3L,
      "everything >= -1 clamps into the top bucket")
    assert(wide(0L).getAs[Long]("lo_v") === Long.MinValue)
  }

  test("rocAuc/operatingPoints refuse a non-register-sized score table " +
    "LOUDLY before the cumulative walk is submitted") {
    val df = spark.range(5000).select(col("id").as("s"),
      (col("id") % 2 === 0).as("y"))
    val e1 = intercept[IllegalArgumentException] {
      TableProfile.rocAuc(df, col("s"), col("y"),
        maxDistinctScores = 1000L)
    }
    assert(e1.getMessage.contains("exceed the declared bound"))
    val e2 = intercept[IllegalArgumentException] {
      TableProfile.operatingPoints(df, col("s"), col("y"),
        maxDistinctScores = 1000L)
    }
    assert(e2.getMessage.contains("exceed the declared bound"))
    // at-or-under the bound proceeds, and the result is the same table
    // the unbounded convention produced
    val ok = TableProfile.rocAuc(df, col("s"), col("y"),
      maxDistinctScores = 5000L).collect().head
    assert(ok.getAs[Long]("n_pos") === 2500L)
  }

  // ---- StreamingRangeJoin ----------------------------------------------

  test("StreamingRangeJoin: batch-folded panel == one-pass range-join " +
    "aggregate; replayed batch is a no-op; late-matched interval appears") {
    val rnd = new scala.util.Random(31)
    val probe = (1 to 500).map(i =>
      (i.toLong, rnd.nextInt(200).toLong, rnd.nextInt(1000).toLong))
    val ivs = (1 to 30).map { j =>
      val lo = rnd.nextInt(200).toLong
      (1000L + j, lo, lo + rnd.nextInt(12))
    }
    val ivDf = ivs.toDF("win_id", "lo", "hi")
    val panel = new graft.streaming.StreamingRangeJoin(
      spark, tmpDir("rj_state"), bucketWidth = 5L, keyCols = Seq("win_id"))
    def batch(pred: ((Long, Long, Long)) => Boolean) =
      probe.filter(pred).toDF("eid", "t", "v")
    panel.recordBatch(batch(_._1 % 2 == 0), "t", col("v"), ivDf,
      "lo", "hi", batchId = 0L)
    panel.recordBatch(batch(_._1 % 2 == 1), "t", col("v"), ivDf,
      "lo", "hi", batchId = 1L)
    def snap() = panel.merged().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = snap()
    val want = (for {
      (wid, lo, hi) <- ivs
      hits = probe.filter { case (_, t, _) => t >= lo && t <= hi }
      if hits.nonEmpty
    } yield wid -> ((hits.size.toLong, hits.map(_._3).sum))).toMap
    assert(got === want)
    // replay batch 1: identical partition rewrite, panel unchanged
    panel.recordBatch(batch(_._1 % 2 == 1), "t", col("v"), ivDf,
      "lo", "hi", batchId = 1L)
    assert(snap() === want, "a replayed batch must not change the panel")
  }

  test("StreamingRangeJoin: BOTH sides incremental — late interval " +
    "batches see all probe history; any batch decomposition of either " +
    "side folds to the one-pass panel; replay on either side is a no-op") {
    val rnd = new scala.util.Random(47)
    val probe = (1 to 600).map(i =>
      (i.toLong, rnd.nextInt(250).toLong, rnd.nextInt(1000).toLong))
    val ivs = (1 to 40).map { j =>
      val lo = rnd.nextInt(250).toLong
      (2000L + j, lo, lo + rnd.nextInt(15))
    }
    val panel = new graft.streaming.StreamingRangeJoin(
      spark, tmpDir("rj_state2"), bucketWidth = 4L, keyCols = Seq("win_id"))
    def pBatch(pred: ((Long, Long, Long)) => Boolean) =
      probe.filter(pred).toDF("eid", "t", "v")
    def ivBatch(pred: ((Long, Long, Long)) => Boolean) =
      ivs.filter(pred).toDF("win_id", "lo", "hi")
    def snap() = panel.merged().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = (for {
      (wid, lo, hi) <- ivs
      hits = probe.filter { case (_, t, _) => t >= lo && t <= hi }
      if hits.nonEmpty
    } yield wid -> ((hits.size.toLong, hits.map(_._3).sum))).toMap

    // probes arrive FIRST, in three uneven batches — no intervals yet
    panel.recordProbeBatch(pBatch(_._1 % 3 == 0), "t", col("v"), 0L)
    panel.recordProbeBatch(pBatch(_._1 % 3 == 1), "t", col("v"), 1L)
    panel.recordProbeBatch(pBatch(_._1 % 3 == 2), "t", col("v"), 2L)
    assert(panel.merged().count() === 0L,
      "no interval recorded yet -> empty panel, not an exception")

    // intervals arrive LATE, in two batches: each must see ALL probe
    // history through the digest, never a history re-scan
    panel.recordIntervalBatch(ivBatch(_._1 % 2 == 0), "lo", "hi", 0L)
    panel.recordIntervalBatch(ivBatch(_._1 % 2 == 1), "lo", "hi", 1L)
    assert(snap() === want, "folded panel must equal the one-pass aggregate")

    // replay each side: partition overwritten with identical rows
    panel.recordProbeBatch(pBatch(_._1 % 3 == 1), "t", col("v"), 1L)
    assert(snap() === want, "a replayed probe batch must not change the panel")
    panel.recordIntervalBatch(ivBatch(_._1 % 2 == 1), "lo", "hi", 1L)
    assert(snap() === want, "a replayed interval batch must not change the panel")
  }

  test("StreamingRangeJoin: zero state (no batches at all) reads as an " +
    "empty panel with the declared schema") {
    val panel = new graft.streaming.StreamingRangeJoin(
      spark, tmpDir("rj_state0"), bucketWidth = 4L, keyCols = Seq("win_id"))
    val m = panel.merged()
    assert(m.columns.toSeq === Seq("win_id", "n_events", "sum_value"))
    assert(m.count() === 0L)
  }

  test("StreamingRangeJoin: tQuantum bounds the digest BY CONSTRUCTION — " +
    "second-grained probes fold to one digest row per day cell, the " +
    "day-aligned panel stays exact, and a misaligned interval raises") {
    val Q = 86400L // one day of SECONDS — raw-t cardinality 30·Q, cells 30
    val rnd = new scala.util.Random(53)
    val probe = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(30 * Q.toInt).toLong, rnd.nextInt(100).toLong))
    val ivs = (1 to 10).map { j =>
      val d = rnd.nextInt(25).toLong
      (3000L + j, d * Q, (d + 1 + rnd.nextInt(4)) * Q - 1)
    }
    val dir = tmpDir("rj_quantum")
    val panel = new graft.streaming.StreamingRangeJoin(
      spark, dir, bucketWidth = 2L, keyCols = Seq("win_id"), tQuantum = Q)
    panel.recordProbeBatch(
      probe.filter(_._1 % 2 == 0).toDF("eid", "t", "v"), "t", col("v"), 0L)
    panel.recordProbeBatch(
      probe.filter(_._1 % 2 == 1).toDF("eid", "t", "v"), "t", col("v"), 1L)
    panel.recordIntervalBatch(ivs.toDF("win_id", "lo", "hi"), "lo", "hi", 0L)
    val got = panel.merged().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = (for {
      (wid, lo, hi) <- ivs
      hits = probe.filter { case (_, t, _) => t >= lo && t <= hi }
      if hits.nonEmpty
    } yield wid -> ((hits.size.toLong, hits.map(_._3).sum))).toMap
    assert(got === want, "whole-cell intervals answer exactly off the digest")
    // the boundedness claim itself: state holds CELL rows, not raw-t rows
    val cells = spark.read.parquet(dir + "/probe").select("_t").distinct()
    assert(cells.count() <= 30L,
      "digest must be one row per day cell, never per raw timestamp")
    // a misaligned interval is unanswerable-exactly: loud in-path error
    val e = intercept[Exception] {
      panel.recordIntervalBatch(
        Seq((9000L, Q + 5L, 3 * Q - 1L)).toDF("win_id", "lo", "hi"),
        "lo", "hi", 1L)
    }
    assert(e.getMessage != null && e.getMessage.contains("whole-cell"),
      s"got: ${e.getMessage}")
  }

  test("StreamingRangeJoin: non-integral interval keys and reserved key " +
    "names are refused loudly (the BIGINT zero-state contract)") {
    val panel = new graft.streaming.StreamingRangeJoin(
      spark, tmpDir("rj_keys"), bucketWidth = 4L, keyCols = Seq("campaign"))
    val e = intercept[IllegalArgumentException] {
      panel.recordIntervalBatch(
        Seq(("cmp-a", 0L, 9L)).toDF("campaign", "lo", "hi"), "lo", "hi", 0L)
    }
    assert(e.getMessage.contains("integral"))
    for (bad <- Seq("n_events", "sum_value", "_lo", "_rj_bk")) {
      val e2 = intercept[IllegalArgumentException] {
        new graft.streaming.StreamingRangeJoin(
          spark, tmpDir("rj_bad"), 4L, keyCols = Seq(bad))
      }
      assert(e2.getMessage.contains("avoid"), s"keyCol $bad must be refused")
    }
  }

  // ---- StreamingCalibration ---------------------------------------------

  test("StreamingCalibration: batch-folded registers grade to EXACTLY " +
    "the one-pass rocAuc/operatingPoints; replay is a no-op; zero state " +
    "is the all-NULL panel; the walk's bound still enforces on read") {
    val rnd = new scala.util.Random(61)
    val rows = (1 to 900).map(i =>
      (i.toLong, rnd.nextInt(25).toLong, rnd.nextInt(3) == 0))
    val df = rows.toDF("id", "s", "y")
    val cal = new graft.streaming.StreamingCalibration(
      spark, tmpDir("cal_state"))
    // zero state first: AUC undefined (one NULL row), no exception
    val z = cal.auc().collect()
    assert(z.length === 1 && z.head.isNullAt(2),
      "zero state must read as the undefined-AUC panel")
    for (k <- 0 until 3)
      cal.recordBatch(df.filter(col("id") % 3 === k),
        col("s"), col("y"), k.toLong)
    val want = graft.ops.TableProfile.rocAuc(df, col("s"), col("y"))
      .collect().head
    val got = cal.auc().collect().head
    assert(got.getAs[Long]("n_pos") === want.getAs[Long]("n_pos"))
    assert(got.getAs[Long]("auc_x1e6") === want.getAs[Long]("auc_x1e6"),
      "the live panel must land on the one-pass AUC exactly")
    // operating points: same identity, every threshold row
    val wantOp = graft.ops.TableProfile
      .operatingPoints(df, col("s"), col("y"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val gotOp = cal.operatingPoints()
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(gotOp === wantOp)
    // the FOURTH walk off the same registers: the live ECDF table equals
    // the one-pass scoreEcdf over the union
    val wantEcdf = graft.ops.TableProfile.scoreEcdf(df, col("s"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val gotEcdf = cal.ecdf()
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(gotEcdf === wantEcdf)
    // at-least-once replay overwrites its own registers: panel unchanged
    cal.recordBatch(df.filter(col("id") % 3 === 1), col("s"), col("y"), 1L)
    assert(cal.auc().collect().head.getAs[Long]("auc_x1e6") ===
      want.getAs[Long]("auc_x1e6"))
    // the walk's bound applies to the MERGED registers on read
    val wide = new graft.streaming.StreamingCalibration(
      spark, tmpDir("cal_wide"), maxDistinctScores = 10L)
    wide.recordBatch(spark.range(100).select(col("id").as("s"),
      (col("id") % 2 === 0).as("y")), col("s"), col("y"), 0L)
    val e = intercept[IllegalArgumentException] { wide.auc() }
    assert(e.getMessage.contains("exceed the declared bound"))
  }

  test("StreamingRangeJoin: recordBatch enforces the frozen-geometry " +
    "contract — a DIFFERENT interval table on a later call raises, an " +
    "identical one replays idempotently") {
    val panel = new graft.streaming.StreamingRangeJoin(
      spark, tmpDir("rj_frozen"), bucketWidth = 4L, keyCols = Seq("win_id"))
    val ivA = Seq((1L, 0L, 9L), (2L, 10L, 19L)).toDF("win_id", "lo", "hi")
    val probe = Seq((1L, 5L, 100L), (2L, 12L, 50L)).toDF("eid", "t", "v")
    panel.recordBatch(probe, "t", col("v"), ivA, "lo", "hi", 0L)
    // same geometry, different row order: fingerprint is order-insensitive
    val ivASwapped = Seq((2L, 10L, 19L), (1L, 0L, 9L)).toDF("win_id", "lo", "hi")
    panel.recordBatch(probe, "t", col("v"), ivASwapped, "lo", "hi", 0L)
    assert(panel.merged().count() === 2L)
    val ivB = Seq((1L, 0L, 9L), (3L, 20L, 29L)).toDF("win_id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      panel.recordBatch(probe, "t", col("v"), ivB, "lo", "hi", 1L)
    }
    assert(e.getMessage.contains("recordIntervalBatch"),
      "the error must route the caller to the per-batch API")
  }

  test("StreamingCalibration.reliability: the folded registers re-bucket " +
    "to EXACTLY the one-pass reliabilityCurve (third leg of the register " +
    "identity); zero state is the empty scaffold") {
    val rnd = new scala.util.Random(71)
    // scores escaping [0, 100) on both sides so the edge-clamp path is
    // exercised through the from-counts entry too
    val rows = (1 to 600).map(i =>
      (i.toLong, rnd.nextInt(140).toLong - 20L, rnd.nextInt(3) == 0))
    val df = rows.toDF("id", "s", "y")
    val cal = new graft.streaming.StreamingCalibration(
      spark, tmpDir("cal_rel"))
    // zero state: every declared bucket emits n=0 with the NULL rate
    val z = cal.reliability(0L, 100L, 10).collect()
    assert(z.length === 10 && z.forall(_.getAs[Long]("n") === 0L) &&
      z.forall(_.isNullAt(z.head.fieldIndex("pos_permille"))),
      "zero state must read as the all-empty scaffold")
    for (k <- 0 until 3)
      cal.recordBatch(df.filter(col("id") % 3 === k),
        col("s"), col("y"), k.toLong)
    val want = graft.ops.TableProfile.reliabilityCurve(df,
        col("s"), col("y"), lo = 0L, hi = 100L, buckets = 10)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val got = cal.reliability(0L, 100L, 10)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got === want,
      "the live curve must equal the batch panel bucket-for-bucket")
  }
}
