package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Privacy}

/** k-anonymity / l-diversity audits: closed-form class values,
  * summary arithmetic, ladder monotonicity on seeded random data, and
  * the dedup-loss attribution against a sequential reference.
  */
class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  // (zip, age, diagnosis): two classes of 3 and 2 under (zip, ageBand),
  // one singleton; the 3-class is l=1 (homogeneous diagnosis)
  private def clinic = Seq(
    ("02138", 21L, "flu"), ("02138", 23L, "flu"), ("02138", 27L, "flu"),
    ("02139", 34L, "flu"), ("02139", 38L, "cold"),
    ("02141", 51L, "cold")
  ).toDF("zip", "age", "dx")

  private val qi = Seq("zip" -> col("zip"), "age_band" -> expr("age div 10"))

  test("kAnonymityClasses: closed-form sizes, l-diversity, at_risk flags") {
    val got = Privacy.kAnonymityClasses(clinic, qi, col("dx"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("02138", 2L)) === ((3L, 1L, 0L))) // k met, homogeneous
    assert(got(("02139", 3L)) === ((2L, 2L, 1L))) // below k
    assert(got(("02141", 5L)) === ((1L, 1L, 1L))) // singleton
  }

  test("riskSummary: hand-derived one-row totals") {
    val s = Privacy.riskSummary(
      Privacy.equivalenceClasses(clinic, qi, col("dx")), k = 3, lMin = 2)
      .collect()(0)
    assert(s.getLong(0) === 6L) // total_rows
    assert(s.getLong(1) === 3L) // n_classes
    assert(s.getLong(2) === 1L) // min_class_size
    assert(s.getLong(3) === 3L) // at_risk_rows (2 + 1)
    assert(s.getLong(4) === 2L) // at_risk_classes
    assert(s.getLong(5) === 2L) // low_l_classes (the 3-class and singleton)
  }

  test("generalization ladder: at_risk_rows non-increasing when each " +
      "level unions the previous level's classes (seeded random)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, rnd.nextInt(5).toLong)
    }.toDF("region", "code", "sv")
    val ladder = Privacy.generalizationLadder(rows, Seq(
        "fine" -> Seq("region" -> col("region"), "code" -> col("code")),
        "mid" -> Seq("region" -> col("region"),
          "code10" -> expr("code div 10")),
        "coarse" -> Seq("region" -> col("region"))),
      col("sv"), k = 5, lMin = 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(ladder("fine") >= ladder("mid"))
    assert(ladder("mid") >= ladder("coarse"))
    // total_rows identical at every level
    val totals = Privacy.generalizationLadder(rows, Seq(
        "fine" -> Seq("region" -> col("region"), "code" -> col("code")),
        "coarse" -> Seq("region" -> col("region"))),
      col("sv"), k = 5, lMin = 2)
      .collect().map(_.getLong(1)).toSet
    assert(totals === Set(400L))
  }

  test("exactDupLossBySource: closed-form attribution + sequential reference") {
    val docs = Seq(
      (1L, "a", "same text"), (2L, "a", "same text"), (3L, "b", "same text"),
      (4L, "b", "unique b"), (5L, "c", "also unique"), (6L, "c", "also unique")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.exactDupLossBySource(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // canonical of "same text" = 1 (src a); of "also unique" = 5 (src c)
    assert(got("a") === ((2L, 1L, 500L)))
    assert(got("b") === ((2L, 1L, 500L)))
    assert(got("c") === ((2L, 1L, 500L)))

    val rnd = new scala.util.Random(23)
    val rows = (1L to 300L).map { i =>
      (i, s"s${rnd.nextInt(4)}", s"t${rnd.nextInt(60)}")
    }
    val ref = rows.groupBy(_._3).flatMap { case (_, g) =>
      val canon = g.map(_._1).min
      g.filter(_._1 != canon)
    }.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dist = Dedup.exactDupLossBySource(
        rows.toDF("doc_id", "source", "text"), "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.map(_._2).distinct.foreach { s =>
      assert(dist(s) === ref.getOrElse(s, 0L), s"source $s")
    }
  }

  test("tCloseness: a class mirroring the global distribution scores " +
    "EMD 0; a fully-concentrated class scores the hand-computed maximum; " +
    "NULL sensitive values are excluded") {
    // EMD-0 case first: two classes with IDENTICAL bucket proportions —
    // each equals the global, so both score exactly 0
    val mirrored = Seq(
      ("A", 5L), ("A", 15L), ("A", 25L), ("A", 35L),
      ("B", 6L), ("B", 16L), ("B", 26L), ("B", 36L)
    ).toDF("grp", "v")
    assert(Privacy.tCloseness(mirrored, Seq("grp" -> col("grp")), col("v"),
        lo = 0L, hi = 40L, buckets = 4)
      .collect().forall(_.getAs[Long]("emd_x1e6") === 0L),
      "a class distributed exactly like the corpus must score EMD 0")
    // asymmetric case: 4 buckets over [0, 40); class A: 12 values,
    // 3 per bucket (uniform); class B: 4 values all in bucket 0
    // (concentrated) — B deviates from the global far more than A
    val rows = Seq.tabulate(3)(i => Seq(
        ("A", Option(5L + i)), ("A", Option(15L + i)),
        ("A", Option(25L + i)), ("A", Option(35L + i)))).flatten ++ Seq(
      ("B", Option(0L)), ("B", Option(1L)), ("B", Option(2L)),
      ("B", Option(3L)),
      ("B", Option.empty[Long]) // NULL sensitive: excluded
    )
    val got = Privacy.tCloseness(rows.toDF("grp", "v"),
        Seq("grp" -> col("grp")), col("v"), lo = 0L, hi = 40L, buckets = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("A").getAs[Long]("class_size") === 12L)
    assert(got("B").getAs[Long]("class_size") === 4L,
      "the NULL-sensitive row must not count")
    // global counts (7,3,3,3), cum (7,10,13,16); EMD_x1e6 =
    // Σ|cdf_class − cdf_global|·1e6 div 3 (integer div at each step)
    def cdfx(c: Seq[Long], size: Long) =
      c.map(x => x * 1000000L / size)
    val gcdf = cdfx(Seq(7L, 10L, 13L, 16L), 16L)
    def emd(ccdf: Seq[Long]) =
      ccdf.zip(gcdf).map { case (a, b) => math.abs(a - b) }.sum / 3L
    assert(got("A").getAs[Long]("emd_x1e6") ===
      emd(cdfx(Seq(3L, 6L, 9L, 12L), 12L)))
    assert(got("B").getAs[Long]("emd_x1e6") ===
      emd(cdfx(Seq(4L, 4L, 4L, 4L), 4L)),
      "the concentrated class must score the large EMD — the skewness " +
        "leak k/l cannot see")
    assert(got("B").getAs[Long]("emd_x1e6") >
      got("A").getAs[Long]("emd_x1e6"))
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(rows.toDF("grp", "v"), Seq.empty, col("v"),
        0L, 40L, 4)
    }
    // the register identity: per-batch (QI, bucket) counts SUM-MERGE,
    // and the merged registers ride the one-code-path FromCounts walk
    // to the one-pass panel
    val df = rows.toDF("grp", "v")
    def leg(pred: org.apache.spark.sql.Column) =
      Privacy.tClosenessCounts(df.filter(pred),
        Seq("grp" -> col("grp")), col("v"), 0L, 40L, 4)
    val folded = Privacy.tClosenessFromCounts(
      leg(col("v") % 2 === 0).unionByName(leg(col("v") % 2 =!= 0))
        .groupBy("grp", "_b").agg(sum("_n").as("_n")),
      Seq("grp"), buckets = 4)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(folded === got.map { case (k, r) => k -> r.toSeq.drop(1) },
      "batch-folded privacy registers must equal the one-pass panel")
  }

  test("userHistories: most-recent-first, total deterministic order " +
    "(ts desc then id desc), the n cut, and a short user kept whole") {
    import graft.ops.EventAnalytics
    val ev = Seq(
      (1L, 101L, 1000L), (1L, 102L, 2000L), (1L, 103L, 3000L),
      (1L, 104L, 3000L), // tie with 103 on ts: higher id ranks first
      (2L, 201L, 500L)   // short user: history is just itself
    ).toDF("user_id", "event_id", "ts_us")
    val got = EventAnalytics.userHistories(ev, "user_id", "event_id",
        "ts_us", n = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_recent") === 3L)
    assert(got(1L).getAs[String]("history") === "104|103|102",
      "ties break id-desc; the n cut drops the oldest event")
    assert(got(1L).getAs[Long]("first_ts_us") === 2000L &&
      got(1L).getAs[Long]("last_ts_us") === 3000L)
    assert(got(2L).getAs[String]("history") === "201" &&
      got(2L).getAs[Long]("n_recent") === 1L)
  }

  test("userHistories register identity property: per-batch last-n " +
    "survivor sets union-merge to the one-pass histories on random " +
    "event logs with adversarial ts ties") {
    import graft.ops.EventAnalytics
    val rnd = new scala.util.Random(83)
    // heavy tie pressure: 40 users, ts drawn from only 25 values
    val ev = (1L to 2000L).map(i =>
      (rnd.nextInt(40).toLong, i, rnd.nextInt(25).toLong * 100L))
      .toDF("user_id", "event_id", "ts_us")
    val onePass = EventAnalytics.userHistories(ev, "user_id", "event_id",
        "ts_us", n = 5)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    def leg(pred: org.apache.spark.sql.Column) =
      EventAnalytics.recentEvents(ev.filter(pred), "user_id", "event_id",
        "ts_us", n = 5)
    val folded = EventAnalytics.historiesFromRecent(
      leg(col("event_id") % 3 === 0)
        .unionByName(leg(col("event_id") % 3 === 1))
        .unionByName(leg(col("event_id") % 3 === 2)),
      "user_id", "event_id", "ts_us", n = 5)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(folded === onePass,
      "last-n of the unioned per-batch last-ns must equal last-n of all")
  }

  test("bestByKey property: equals the brute-force group argmax on " +
    "random scored corpora with duplicate scores") {
    val rnd = new scala.util.Random(89)
    val rows = (1L to 1500L).map(i =>
      (i, s"text${rnd.nextInt(120)}", rnd.nextInt(8).toLong))
    val df = rows.toDF("doc_id", "text", "score")
    val got = graft.llm.Dedup.bestByKey(df, "doc_id", col("text"),
        col("score"))
      .select("doc_id").as[Long].collect().toSet
    val want = rows.groupBy(_._2).values.map(g =>
      g.maxBy(r => (r._3, -r._1))._1).toSet
    assert(got === want)
    // the register identity: per-batch winners re-reduced through the
    // SAME operator equal the one-pass canonical set
    def leg(pred: org.apache.spark.sql.Column) =
      graft.llm.Dedup.bestByKey(df.filter(pred), "doc_id", col("text"),
        col("score"))
    val folded = graft.llm.Dedup.bestByKey(
        leg(col("doc_id") % 3 === 0)
          .unionByName(leg(col("doc_id") % 3 === 1))
          .unionByName(leg(col("doc_id") % 3 === 2)),
        "doc_id", col("text"), col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(folded === want,
      "best-of of the per-batch bests must equal best-of of everything")
  }

  test("tCloseness property: equals the brute-force integer EMD on " +
    "random classes") {
    val rnd = new scala.util.Random(97)
    val rows = (1 to 1200).map(_ =>
      (s"c${rnd.nextInt(9)}", rnd.nextInt(140).toLong - 20L))
    val buckets = 7; val lo = 0L; val hi = 70L
    def bucketOf(v: Long) =
      ((math.min(hi - 1, math.max(lo, v)) - lo) * buckets / (hi - lo)).toInt
    val all = rows.map { case (_, v) => bucketOf(v) }
    val gcounts = (0 until buckets).map(b => all.count(_ == b).toLong)
    val gcum = gcounts.scanLeft(0L)(_ + _).tail
    val total = all.size.toLong
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val cs = (0 until buckets).map(b =>
        rs.count(r => bucketOf(r._2) == b).toLong)
      val ccum = cs.scanLeft(0L)(_ + _).tail
      val size = rs.size.toLong
      val emd = ccum.zip(gcum).map { case (c, gl) =>
        math.abs(c * 1000000L / size - gl * 1000000L / total) }.sum /
        (buckets - 1)
      g -> (size, emd)
    }
    val got = Privacy.tCloseness(rows.toDF("grp", "v"),
        Seq("grp" -> col("grp")), col("v"), lo, hi, buckets)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("class_size"), r.getAs[Long]("emd_x1e6"))).toMap
    assert(got === want)
  }

  test("emdBetweenCounts property: equals the brute-force side-vs-side " +
    "integer EMD on random registers; one-sided groups get NULL") {
    val rnd = new scala.util.Random(1513)
    val buckets = 8
    def randRegs(groups: Seq[String]) =
      for {
        g <- groups
        b <- 0 until buckets
        n = rnd.nextInt(5).toLong
        if n > 0
      } yield (g, b.toLong, n)
    // gA only on side a, gD only on side b; gB/gC both-sided
    val a = randRegs(Seq("gA", "gB", "gC"))
    val b = randRegs(Seq("gB", "gC", "gD"))
    def emdRef(ra: Seq[(String, Long, Long)], rb: Seq[(String, Long, Long)],
        g: String): Option[Long] = {
      val na = ra.filter(_._1 == g).map(_._3).sum
      val nb = rb.filter(_._1 == g).map(_._3).sum
      if (na == 0 || nb == 0) return None
      def cum(rs: Seq[(String, Long, Long)]) =
        (0 until buckets).map(i =>
          rs.filter(r => r._1 == g && r._2 <= i).map(_._3).sum)
      Some(cum(a).zip(cum(b)).map { case (ca, cb) =>
        math.abs(ca * 1000000L / na - cb * 1000000L / nb) }.sum /
        (buckets - 1))
    }
    val got = Privacy.emdBetweenCounts(
        a.toDF("grp", "_b", "_n"), b.toDF("grp", "_b", "_n"),
        Seq("grp"), buckets)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          if (r.isNullAt(r.fieldIndex("emd_x1e6"))) None
          else Some(r.getAs[Long]("emd_x1e6"))))).toMap
    val groups = (a.map(_._1) ++ b.map(_._1)).distinct
    assert(got.keySet == groups.toSet)
    groups.foreach { g =>
      val (na, nb, emd) = got(g)
      assert(na == a.filter(_._1 == g).map(_._3).sum)
      assert(nb == b.filter(_._1 == g).map(_._3).sum)
      assert(emd == emdRef(a, b, g), s"group $g: got $emd")
    }
    assert(got("gA")._3.isEmpty && got("gD")._3.isEmpty,
      "one-sided groups must report NULL emd")
  }

  test("emdBetweenCounts enforces the register contract: an out-of-range " +
    "_b raises instead of silently deflating the CDF (advisor r15)") {
    import spark.implicits._
    val ok = Seq(("g", 0L, 5L), ("g", 3L, 2L)).toDF("grp", "_b", "_n")
    val bad = Seq(("g", 0L, 5L), ("g", 4L, 1L)).toDF("grp", "_b", "_n")
    // in-range sides: fine (4 buckets cover _b 0..3)
    Privacy.emdBetweenCounts(ok, ok, Seq("grp"), buckets = 4).collect()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // _b = 4 is outside [0, 4) — both the a-side and b-side trip
    val ea = intercept[Exception] {
      Privacy.emdBetweenCounts(bad, ok, Seq("grp"), buckets = 4).collect()
    }
    assert(msgs(ea).exists(_.contains("emdBetweenCounts(a)")), msgs(ea).toString)
    val eb = intercept[Exception] {
      Privacy.emdBetweenCounts(ok, bad, Seq("grp"), buckets = 4).collect()
    }
    assert(msgs(eb).exists(_.contains("emdBetweenCounts(b)")), msgs(eb).toString)
  }
}
