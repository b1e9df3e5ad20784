package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Retrieval, Sampling}
import graft.ops.EventAnalytics

/** Seeded-random property tests for the selection/audit tranche: each
  * distributed operator must agree with an independent plain-Scala
  * reference on arbitrary inputs, and the family's monotonicity
  * invariants must hold (growing a budget can only add documents,
  * growing a vocabulary can only shrink OOV, funnel stages only shrink).
  */
class SelectPropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenBudgetSelect property: matches the sequential greedy fold; budgets nest") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to (30 + rnd.nextInt(50))).map { i =>
        (i, rnd.nextInt(6).toLong, 1L + rnd.nextInt(15)) // coarse scores → ties
      }
      val df = rows.toDF("doc_id", "s", "t").repartition(1 + rnd.nextInt(5))
      val budgets = Seq(10L, 60L, 200L)
      val selected = budgets.map { b =>
        val got = Sampling.tokenBudgetSelect(df, "doc_id", col("s"), col("t"), b)
          .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
        // reference: sort (score desc, id), inclusive prefix ≤ b
        var cum = 0L
        val want = rows.sortBy(r => (-r._2, r._1)).flatMap { case (id, _, t) =>
          cum += t
          if (cum <= b) Some(id -> cum) else None
        }.toMap
        assert(got === want, s"seed=$seed budget=$b")
        got.keySet
      }
      // a larger budget's selection must CONTAIN every smaller one's
      assert(selected(0).subsetOf(selected(1)) && selected(1).subsetOf(selected(2)),
        s"seed=$seed: budget growth must only add docs")
    }
  }

  test("oovRate property: matches brute force; larger vocab never raises any doc's OOV") {
    val words = Array("a", "b", "c", "d", "e", "f", "g", "h")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to (10 + rnd.nextInt(20))).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val df = rows.toDF("doc_id", "text").repartition(1 + rnd.nextInt(4))
      val freqs = rows.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, o) => w -> o.length.toLong }
      def wantOov(k: Int): Map[Long, Long] = {
        val vocab = freqs.toSeq.sortBy { case (w, c) => (-c, w) }.take(k).map(_._1).toSet
        rows.map { case (id, t) =>
          id -> t.split(" ").count(w => !vocab(w)).toLong
        }.toMap
      }
      val byK = Seq(2, 4, 8).map { k =>
        val got = Retrieval.oovRate(df, "doc_id", "text", k)
          .select("doc_id", "n_oov").as[(Long, Long)].collect().toMap
        assert(got === wantOov(k), s"seed=$seed k=$k")
        got
      }
      rows.foreach { case (id, _) =>
        assert(byK(0)(id) >= byK(1)(id) && byK(1)(id) >= byK(2)(id),
          s"seed=$seed doc=$id: growing the vocab must never raise OOV")
      }
    }
  }

  test("noveltyProfile property: matches brute-force distinct-shingle diff") {
    val words = Array("a", "b", "c", "d", "e")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      def corpus(n: Int, off: Long) = (1 to n).map { i =>
        (off + i, Seq.fill(3 + rnd.nextInt(8))(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val prior = corpus(5 + rnd.nextInt(5), 100L)
      val inc = corpus(5 + rnd.nextInt(10), 0L)
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val priorSet = prior.flatMap(r => shingles(r._2)).toSet
      val want = inc.flatMap { case (id, t) =>
        val sh = shingles(t)
        if (sh.isEmpty) None
        else Some(id -> ((sh.size.toLong, sh.count(!priorSet(_)).toLong)))
      }.toMap
      val got = Dedup.noveltyProfile(
        inc.toDF("doc_id", "text").repartition(1 + rnd.nextInt(4)),
        prior.toDF("doc_id", "text"), "doc_id", "text", n = 3)
        .select("doc_id", "n_shingles", "n_novel")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("funnel property: stage populations are nested and match brute force") {
    val stages = Seq("s1", "s2", "s3")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val w = 50L
      val ev = (1 to (60 + rnd.nextInt(100))).map { _ =>
        (rnd.nextInt(8).toLong, stages(rnd.nextInt(3)), rnd.nextInt(300).toLong)
      }
      // reference: per user, earliest s1; then earliest s2 in (t1, t1+w]; ...
      def wantCounts: Map[Int, Long] = {
        val byUser = ev.groupBy(_._1)
        val times = byUser.values.map { rows =>
          var t = rows.filter(_._2 == "s1").map(_._3).minOption
          val reached = scala.collection.mutable.ListBuffer.empty[Boolean]
          reached += t.isDefined
          stages.drop(1).foreach { st =>
            t = t.flatMap { prev =>
              rows.filter(r => r._2 == st && r._3 > prev && r._3 <= prev + w)
                .map(_._3).minOption
            }
            reached += t.isDefined
          }
          reached.toList
        }.toList
        stages.indices.map(i => (i + 1) -> times.count(_(i)).toLong).toMap
      }
      val got = EventAnalytics.funnel(
        ev.toDF("user_id", "event_type", "ts_us").repartition(1 + rnd.nextInt(4)),
        "user_id", "event_type", "ts_us", stages, w)
        .select("stage_no", "n_users").as[(Int, Long)].collect().toMap
      assert(got === wantCounts, s"seed=$seed")
      assert(got(1) >= got(2) && got(2) >= got(3),
        s"seed=$seed: funnel must be non-increasing")
    }
  }

  test("retentionCohorts property: matches brute force on random activity") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val period = 10L
      val ev = (1 to (40 + rnd.nextInt(80))).map { _ =>
        (rnd.nextInt(6).toLong, rnd.nextInt(100).toLong)
      }
      val want = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val periods = rows.map(_._2 / period).distinct
        val cohort = periods.min
        periods.map(p => (cohort, p - cohort))
      }.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
      val got = EventAnalytics.retentionCohorts(
        ev.toDF("user_id", "ts_us").repartition(1 + rnd.nextInt(4)),
        "user_id", "ts_us", period)
        .select("cohort_period", "period_offset", "n_users")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === want, s"seed=$seed")
    }
  }
}
