package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps
import graft.sketch.Sketches

/** Seeded-random property tests for the round-10 families: the
  * distributed sketches and graph iterations must agree with plain-
  * Scala reference implementations on arbitrary inputs — the same
  * discipline as LlmPropertySpec, aimed where hand fixtures can't
  * reach (random multisets, random graphs, random partitionings).
  */
class SketchGraphPropertySpec extends SparkSpecBase {
  import spark.implicits._

  /** The reference 32-bit tokenHash, plain Scala. */
  private def refHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  test("KMV property: random multisets match the sequential estimator exactly") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val k = 4 + rnd.nextInt(12)
      val rows = (1 to (50 + rnd.nextInt(200))).map { _ =>
        (s"g${rnd.nextInt(3)}", s"v${rnd.nextInt(120)}")
      }
      val got = Sketches.kmvCalibration(
        rows.toDF("g", "v").repartition(1 + rnd.nextInt(5)),
        Seq("g"), col("v"), k)
        .select("g", "n_exact", "kmv_k", "kmv_estimate")
        .as[(String, Long, Long, Long)].collect().sortBy(_._1)
      val want = rows.groupBy(_._1).toSeq.map { case (g, vs) =>
        val hs = vs.map(v => refHash(v._2)).distinct.sorted
        val kk = math.min(k, hs.size).toLong
        val est =
          if (kk < k) kk
          else (kk - 1) * Sketches.HashSpace / hs(k - 1)
        (g, hs.size.toLong, kk, est)
      }.sortBy(_._1)
      assert(got.toSeq === want, s"seed=$seed k=$k")
    }
  }

  test("HLL property: random multisets match the sequential register fold exactly") {
    val p = 4; val m = 1 << p; val restBits = 32 - p
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to (50 + rnd.nextInt(300))).map { _ =>
        (s"g${rnd.nextInt(3)}", s"v${rnd.nextInt(400)}")
      }
      val got = Sketches.hllDistinct(
        rows.toDF("g", "v").repartition(1 + rnd.nextInt(5)),
        Seq("g"), col("v"), p = p, alphaMilli = 673L)
        .select("g", "n_exact", "hll_estimate")
        .as[(String, Long, Long)].collect().sortBy(_._1)
      val want = rows.groupBy(_._1).toSeq.map { case (g, vs) =>
        val hs = vs.map(v => refHash(v._2)).distinct
        val regs = Array.fill(m)(0)
        hs.foreach { h =>
          val b = (h % m).toInt
          val rest = h / m
          val rho =
            if (rest == 0) restBits + 1
            else restBits + 1 - java.lang.Long.toBinaryString(rest).length
          regs(b) = math.max(regs(b), rho)
        }
        val denom = regs.map(r => 1073741824L >> r).sum
        val est = 673L * m * m * 1073741824L / (1000L * denom)
        (g, hs.size.toLong, est)
      }.sortBy(_._1)
      assert(got.toSeq === want, s"seed=$seed")
    }
  }

  test("CMS property: estimates match the sequential cell fold; never undercount") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val d = 2 + rnd.nextInt(3); val w = 8 << rnd.nextInt(3)
      val rows = (1 to (80 + rnd.nextInt(200)))
        .map(_ => s"v${rnd.nextInt(25)}")
      val topN = 5 + rnd.nextInt(8)
      val got = Sketches.cmsTopKCalibration(rows.toDF("v"), col("v"),
        d = d, w = w, topN = topN)
        .as[(String, Long, Long)].collect()
        .map { case (key, ex, est) => key -> (ex, est) }.toMap
      // sequential cells
      val cells = Array.fill(d, w)(0L)
      rows.foreach { v =>
        val h = refHash(v)
        for (i <- 0 until d) {
          val b = (((Dedup.MinhashA(i) * h + Dedup.MinhashB(i))
            % Dedup.MinhashP) % w).toInt
          cells(i)(b) += 1
        }
      }
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val wantKeys = exact.toSeq.sortBy { case (k, n) => (-n, k) }.take(topN)
      assert(got.keySet === wantKeys.map(_._1).toSet, s"seed=$seed")
      wantKeys.foreach { case (key, n) =>
        val h = refHash(key)
        val est = (0 until d).map { i =>
          val b = (((Dedup.MinhashA(i) * h + Dedup.MinhashB(i))
            % Dedup.MinhashP) % w).toInt
          cells(i)(b)
        }.min
        assert(got(key) === ((n, est)), s"seed=$seed key=$key")
        assert(est >= n)
      }
    }
  }

  private val Dedup = graft.llm.Dedup

  test("weighted priority sample property: random corpora match the sequential draw") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(5)
      val rows = (1L to (30 + rnd.nextInt(80))).map { i =>
        (i, s"s${rnd.nextInt(3)}", 1L + rnd.nextInt(500))
      }
      val got = graft.llm.Sampling.weightedPrioritySample(
        rows.toDF("id", "st", "wt").repartition(1 + rnd.nextInt(5)),
        "id", "st", col("wt"), k)
        .select("st", "id", "priority", "rk")
        .as[(String, Long, Long, Long)].collect()
        .map { case (s, id, p, r) => (s, r) -> (id, p) }.toMap
      val want = rows.groupBy(_._2).toSeq.flatMap { case (s, rs) =>
        rs.map { case (id, _, w) =>
          (id, w * 4294967296L / (refHash(id.toString) + 1))
        }.sortBy { case (id, p) => (-p, id) }.take(k).zipWithIndex
          .map { case ((id, p), i) => (s, i + 1L) -> (id, p) }
      }.toMap
      assert(got === want, s"seed=$seed k=$k")
    }
  }

  test("weighted priority sample: a weight >= 2^31 fails loudly, not negative") {
    val df = Seq((1L, "a", 10L), (2L, "a", 2147483648L)).toDF("id", "st", "wt")
    val e = intercept[Exception] {
      graft.llm.Sampling.weightedPrioritySample(df, "id", "st", col("wt"), 1)
        .collect()
    }
    assert(e.getMessage.contains("weight must be < 2^31"),
      s"expected the overflow guard, got: ${e.getMessage}")
  }

  test("item similarity property: random logs match the sequential Jaccard fold") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(3)
      val log = (1 to (40 + rnd.nextInt(120))).map { _ =>
        (rnd.nextInt(10).toLong, rnd.nextInt(7).toLong)
      }.distinct
      val got = GraphOps.itemSimilarityTopK(
        log.toDF("user_id", "it").repartition(1 + rnd.nextInt(4)),
        "user_id", col("it"), k, maxUserDegree = 0)
        .as[(Long, Long, Long, Long)].collect().toSet
      val byItem = log.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      val want = byItem.keys.toSeq.flatMap { i =>
        byItem.keys.toSeq.filter(_ != i).flatMap { j =>
          val t = (byItem(i) & byItem(j)).size.toLong
          if (t == 0) None
          else Some((j, t * 1000L / (byItem(i).size + byItem(j).size - t)))
        }.sortBy { case (j, s) => (-s, j) }.take(k).zipWithIndex
          .map { case ((j, s), r) => (i, j, s, r + 1L) }
      }.toSet
      assert(got === want, s"seed=$seed k=$k")
    }
  }

  test("PageRank property: random bipartite logs match the sequential recurrence") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val iters = 1 + rnd.nextInt(4)
      val log = (1 to (60 + rnd.nextInt(150))).map { _ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(9).toLong)
      }
      val edgesDf = GraphOps.covisitEdges(
        log.toDF("user_id", "it")
          .select(col("user_id"), to_json(struct(col("it").as("k"))).as("props"))
          .repartition(1 + rnd.nextInt(5)),
        "user_id", get_json_object(col("props"), "$.k").cast("long"))
      val edges = edgesDf.select("src", "dst", "w")
        .as[(Long, Long, Long)].collect()
      val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      var mass = outW.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val in = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        edges.foreach { case (s, dd, w) => in(dd) += mass(s) * w / outW(s) }
        // every vertex keeps a row (teleport floor) whether or not it
        // received inflow this round — the left-join-onto-verts semantics
        mass = outW.keys.map(v => v -> (150000L + 85L * in(v) / 100L)).toMap
      }
      val got = GraphOps.pageRankInt(edgesDf, iters)
        .as[(Long, Long)].collect().toMap
      assert(got === mass, s"seed=$seed iters=$iters")
      // mass bounds: teleport floor and damped ceiling
      val total = mass.values.sum
      assert(got.values.forall(_ >= 150000L))
      assert(total <= mass.size * 1000000L + 1,
        "flooring only ever LOSES mass vs the stationary total")
    }
  }
}
