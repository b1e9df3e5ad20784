package graft

import org.apache.spark.sql.functions._

import graft.llm.{Sampling, TextAnalysis}
import graft.ops.TableProfile
import graft.sketch.Sketches

/** Round-11 late-wave audits: CMS join-size estimation, split-leakage
  * measurement, tokenizer fertility — each against a sequential
  * reference of the identical arithmetic.
  */
class AuditSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- cmsJoinSize -------------------------------------------------

  test("cmsJoinSize: exact leg == sequential inner product; est >= exact") {
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(400)(s"k${rnd.nextInt(40)}")
    val b = Seq.fill(300)(s"k${rnd.nextInt(60)}")
    val row = Sketches.cmsJoinSize(
      a.toDF("k"), col("k"), b.toDF("k"), col("k"), d = 4, w = 64)
      .collect().head
    val fa = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = fa.iterator.map { case (k, n) => n * fb.getOrElse(k, 0L) }.sum
    assert(row.getAs[Long]("n_a") === 400L)
    assert(row.getAs[Long]("n_b") === 300L)
    assert(row.getAs[Long]("join_exact") === exact)
    assert(row.getAs[Long]("cms_join_est") >= exact,
      "inner-product estimate must overestimate (collisions only add)")
  }

  test("cmsJoinSize: disjoint key spaces -> exact 0, est still >= 0; " +
    "identical sides -> est tight when w exceeds key count") {
    val a = (0 until 50).map(i => s"a$i")
    val b = (0 until 50).map(i => s"b$i")
    val disjoint = Sketches.cmsJoinSize(
      a.toDF("k"), col("k"), b.toDF("k"), col("k"), d = 4, w = 64)
      .collect().head
    assert(disjoint.getAs[Long]("join_exact") === 0L)
    assert(disjoint.getAs[Long]("cms_join_est") >= 0L)
    // one key per side: some hash row has zero overlapping cells, and
    // the d-row scaffold must let its zero rowsum reach the min — a
    // truly empty join reports 0, never a collision artifact
    val one = Sketches.cmsJoinSize(
      Seq("only_a").toDF("k"), col("k"),
      Seq("only_b").toDF("k"), col("k"), d = 4, w = 64)
      .collect().head
    assert(one.getAs[Long]("join_exact") === 0L)
    assert(one.getAs[Long]("cms_join_est") === 0L,
      "zero-overlap hash rows must scaffold into the min")
    // same side twice: exact = sum f^2 = 50; with w=256 >> 50 keys the
    // min-row estimate should not blow past the collision-free value by
    // much (loose 4x sanity bound, deterministic hashes)
    val self = Sketches.cmsJoinSize(
      a.toDF("k"), col("k"), a.toDF("k"), col("k"), d = 4, w = 256)
      .collect().head
    assert(self.getAs[Long]("join_exact") === 50L)
    assert(self.getAs[Long]("cms_join_est") >= 50L)
    assert(self.getAs[Long]("cms_join_est") <= 200L)
  }

  test("cmsJoinSize: shard-merged cells give the identical estimate " +
    "(cells sum-merge, products distribute over the merged table)") {
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(500)(s"k${rnd.nextInt(30)}")
    val b = Seq.fill(200)(s"k${rnd.nextInt(30)}")
    // one-pass estimate
    val onePass = Sketches.cmsJoinSize(
      a.toDF("k"), col("k"), b.toDF("k"), col("k"), d = 4, w = 32)
      .collect().head.getAs[Long]("cms_join_est")
    // the a-side built from two shards whose cells SUM-merge
    val s1 = Sketches.cmsCells(a.take(250).toDF("k"), col("k"), 4, 32)
    val s2 = Sketches.cmsCells(a.drop(250).toDF("k"), col("k"), 4, 32)
    val merged = s1.unionByName(s2).groupBy("r", "b")
      .agg(sum("c").as("c"))
    val cb = Sketches.cmsCells(b.toDF("k"), col("k"), 4, 32)
    val mergedEst = merged.withColumnRenamed("c", "ca")
      .join(cb.withColumnRenamed("c", "cb"), Seq("r", "b"))
      .groupBy("r")
      .agg(sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("rowsum"))
      .agg(min("rowsum").cast("long").as("est"))
      .collect().head.getAs[Long]("est")
    assert(mergedEst === onePass)
  }

  // ---- splitLeakageAudit -------------------------------------------

  test("splitLeakageAudit: cluster scheme has zero crossings on " +
    "component-consistent labels; doc_hash matches brute force") {
    // pairs form chains 1-2-3 and 10-11; labels = component minima
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (1L, 3L))
      .toDF("doc_a", "doc_b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val rows = Sampling.splitLeakageAudit(pairs, "doc_a", "doc_b",
      labels, "doc_id", "cluster_id", 800, 100)
      .collect().map(r => r.getAs[String]("scheme") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("cross_pairs"))).toMap
    assert(rows("cluster") === (4L, 0L))
    // brute-force the doc_hash scheme with the same md5 per-mille
    def bucket(x: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    def split(x: Long): String = {
      val b = bucket(x)
      if (b < 800) "train" else if (b < 900) "val" else "test"
    }
    val expectCross = Seq((1L, 2L), (2L, 3L), (10L, 11L), (1L, 3L))
      .count { case (x, y) => split(x) != split(y) }
    assert(rows("doc_hash") === (4L, expectCross.toLong))
  }

  test("splitLeakageAudit: permille column = 1000*cross div pairs") {
    val pairs = (1L to 40L).map(i => (i, i + 100L)).toDF("doc_a", "doc_b")
    val labels = (1L to 200L).map(i => (i, i)).toDF("doc_id", "cluster_id")
    val rows = Sampling.splitLeakageAudit(pairs, "doc_a", "doc_b",
      labels, "doc_id", "cluster_id", 500, 200).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("cross_permille") ===
        1000L * r.getAs[Long]("cross_pairs") / r.getAs[Long]("n_pairs"))
    }
    // independent ids with independent hashes: naive scheme must leak
    val naive = rows.find(_.getAs[String]("scheme") == "doc_hash").get
    assert(naive.getAs[Long]("cross_pairs") > 0L)
  }

  // ---- tokenizerFertility ------------------------------------------

  test("tokenizerFertility: closed form on a two-language corpus") {
    // doc1: stopword-free -> und; doc2/3: 'the ... ' -> en
    val docs = Seq(
      (1L, "zebra quagga"),                 // 2 words
      (2L, "the cat sat on the mat"),       // 6 words, 2 stops
      (3L, "the dog and the fox")           // 5 words, 3 stops
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tokenizerFertility(docs, "doc_id", "text")
      .collect().map(r => r.getAs[String]("predicted_lang") -> r).toMap
    assert(rows.keySet === Set("en", "und"))
    val en = rows("en")
    assert(en.getAs[Long]("n_docs") === 2L)
    assert(en.getAs[Long]("n_words") === 11L)
    // closed-form BPE-ish token counts: every word is ' ?letters', so
    // tokens == words for these texts
    assert(en.getAs[Long]("n_bpe_tokens") === 11L)
    assert(en.getAs[Long]("fertility_permille") === 1000L)
    val und = rows("und")
    assert(und.getAs[Long]("n_docs") === 1L)
    assert(und.getAs[Long]("n_words") === 2L)
    val chars = "zebra quagga".length.toLong
    assert(und.getAs[Long]("n_chars") === chars)
    assert(und.getAs[Long]("chars_per_token_x100") === 100L * chars / 2L)
  }

  test("tokenizerFertility: punctuation and digits raise fertility " +
    "above 1000 per-mille (BPE-ish splits beyond whitespace)") {
    val docs = Seq((1L, "it's 2024, v2.0 works!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenizerFertility(docs, "doc_id", "text")
      .collect().head
    // 4 whitespace words, >4 BPE-ish tokens
    assert(r.getAs[Long]("n_words") === 4L)
    assert(r.getAs[Long]("n_bpe_tokens") > 4L)
    assert(r.getAs[Long]("fertility_permille") > 1000L)
  }

  // ---- rollingSumRegisters -------------------------------------------

  test("rollingSumRegisters: brute-force parity incl. day gaps and " +
    "keys silent on a day (scaffold rolls them forward)") {
    // key A: days 1,2,9 (gap); key B: day 2 only
    val regs = Seq((1L, "A", 5L), (2L, "A", 3L), (9L, "A", 7L),
      (2L, "B", 10L)).toDF("day", "k", "cnt")
    val got = Sketches.rollingSumRegisters(regs, "day", Seq("k"), "cnt", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val raw = Map((1L, "A") -> 5L, (2L, "A") -> 3L, (9L, "A") -> 7L,
      (2L, "B") -> 10L)
    val days = Seq(1L, 2L, 9L); val keys = Seq("A", "B")
    val expect = (for {
      d <- days; k <- keys
      s = (d - 2 to d).map(dd => raw.getOrElse((dd, k), 0L)).sum
      if s > 0
    } yield (d, k) -> s).toMap
    assert(got === expect)
    // day 2 rolls day 1's A count in; day 9 sees nothing from day 2
    assert(got((2L, "A")) === 8L)
    assert(got((9L, "A")) === 7L)
    assert(!got.contains((1L, "B")), "B has no mass in day 1's window")
  }

  test("rollingSumRegisters dayRange: a fully-silent day emits its " +
    "window's panel row; the observed-days default omits it") {
    val regs = Seq((1L, "A", 5L), (2L, "A", 3L), (9L, "A", 7L),
      (2L, "B", 10L)).toDF("day", "k", "cnt")
    val byDefault = Sketches.rollingSumRegisters(
      regs, "day", Seq("k"), "cnt", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!byDefault.exists(_._1 == 3L),
      "observed-days default must not invent day 3")
    val ranged = Sketches.rollingSumRegisters(
      regs, "day", Seq("k"), "cnt", 3, dayRange = Some((1L, 9L)))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // day 3 is silent but its window [1..3] holds A:5+3 and B:10
    assert(ranged((3L, "A")) === 8L)
    assert(ranged((3L, "B")) === 10L)
    // day 4's window [2..4] still sees day 2; day 5..8 windows are empty
    assert(ranged((4L, "A")) === 3L)
    assert(ranged((4L, "B")) === 10L)
    assert(!(5L to 8L).exists(d => ranged.contains((d, "A")) ||
      ranged.contains((d, "B"))), "empty windows emit nothing")
    // observed days carry identical values under both scaffolds
    val obs = Sketches.rollingSumRegisters(regs, "day", Seq("k"), "cnt", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    obs.foreach { case (k, v) => assert(ranged(k) === v) }
  }

  test("hllRollingRegisters dayRange: a silent day's registers equal " +
    "the max-merge of its window's earlier days") {
    val daily = Seq((1L, "u1"), (1L, "u2"), (2L, "u3"), (9L, "u4"))
      .toDF("day", "u")
    val regs = Sketches.hllRegisters(daily, Seq("day"), col("u"), p = 4)
    val rolled = Sketches.hllRollingRegisters(regs, "day", windowDays = 3,
      p = 4, dayRange = Some((1L, 9L)))
      .as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // day 3 is silent; its window [1..3] unions days 1-2
    val want = Sketches.hllRegisters(
        daily.filter(col("day") <= 2), Nil, col("u"), p = 4)
      .as[(Long, Long)].collect().toMap
    val day3 = rolled.collect { case ((3L, b), v) => b -> v }.toMap
    assert(day3 === want)
    // days 5..8 have empty windows: no rows
    assert(!(5L to 8L).exists(d => rolled.keys.exists(_._1 == d)))
  }

  test("rolling log-histogram == one-pass histogram over each window " +
    "(sum-merge distributes over the day decomposition)") {
    val rnd = new scala.util.Random(42)
    val vals = (1 to 300).map(_ => (rnd.nextInt(5).toLong + 1L,
      rnd.nextInt(2000).toLong))
    val df = vals.toDF("day", "v")
    val rolled = Sketches.rollingSumRegisters(
      Sketches.logHistogram(df, Seq("day"), col("v")),
      "day", Seq("_bin"), "_cnt", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for (d <- 1L to 5L) {
      val windowVals = vals.filter { case (dd, _) => dd >= d - 2 && dd <= d }
        .map(_._2)
      val onePass = Sketches.logHistogram(
        windowVals.map(Tuple1(_)).toDF("v"), Seq.empty, col("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rolledDay = rolled.collect { case ((dd, b), c) if dd == d => b -> c }
      assert(rolledDay.toMap === onePass, s"day $d window mismatch")
    }
  }

  test("rolling CMS estimate >= exact windowed count for every probe " +
    "(the scaffold preserves the overestimate guarantee across days)") {
    val rnd = new scala.util.Random(3)
    val events = (1 to 600).map(_ =>
      (rnd.nextInt(6).toLong + 1L, s"u${rnd.nextInt(25)}"))
    val df = events.toDF("day", "u")
    val rolled = Sketches.rollingSumRegisters(
      Sketches.cmsCellsBy(df, Seq("day"), col("u"), d = 4, w = 32),
      "day", Seq("r", "b"), "c", 7)
    val probes = (1L to 6L).flatMap(d => (0 until 25).map(u => (d, s"u$u")))
      .toDF("day", "u")
      .withColumn("_h", graft.llm.Dedup.tokenHash(col("u")))
      .select(col("day"), col("u"), explode(array((0 until 4).map(i =>
        struct(lit(i).as("r"),
          Sketches.cmsRowBucket(col("_h"), i, 32).as("b"))): _*)).as("rb"))
      .select(col("day"), col("u"), col("rb.r").as("r"), col("rb.b").as("b"))
    val est = probes.join(rolled, Seq("day", "r", "b"), "left")
      .groupBy("day", "u")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val exact = (for {
      d <- 1L to 6L; u <- 0 until 25
      n = events.count { case (dd, uu) => uu == s"u$u" && dd >= d - 6 && dd <= d }
    } yield (d, s"u$u") -> n.toLong).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"probe $k: est ${est(k)} < exact $n")
    }
  }

  // ---- columnProfile -------------------------------------------------

  test("columnProfile: exact counts/nulls/distincts/minmax per column, " +
    "one row each, nulls excluded from distinct and minmax") {
    val df = Seq(
      (1L, Some("b"), Some(10L)),
      (2L, None, Some(10L)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(30L))
    ).toDF("id", "s", "v")
    val rows = TableProfile.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size === 3)
    rows.values.foreach(r => assert(r.getAs[Long]("n_rows") === 4L))
    assert(rows("id").getAs[Long]("n_nonnull") === 4L)
    assert(rows("id").getAs[Long]("n_distinct") === 4L)
    assert(rows("id").getAs[String]("min_s") === "1")
    assert(rows("id").getAs[String]("max_s") === "4")
    assert(rows("s").getAs[Long]("n_nonnull") === 3L)
    assert(rows("s").getAs[Long]("n_distinct") === 2L)
    assert(rows("s").getAs[String]("min_s") === "a")
    assert(rows("s").getAs[String]("max_s") === "b")
    assert(rows("v").getAs[Long]("n_nonnull") === 3L)
    assert(rows("v").getAs[Long]("n_distinct") === 2L)
    assert(rows("v").getAs[String]("min_s") === "10")
    assert(rows("v").getAs[String]("max_s") === "30")
  }

  test("columnProfile: all-null column profiles to 0 distinct, null minmax") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val r = TableProfile.columnProfile(df, Seq("s")).collect().head
    assert(r.getAs[Long]("n_rows") === 2L)
    assert(r.getAs[Long]("n_nonnull") === 0L)
    assert(r.getAs[Long]("n_distinct") === 0L)
    assert(r.getAs[String]("min_s") === null)
    assert(r.getAs[String]("max_s") === null)
  }

  // ---- pearsonCorr ---------------------------------------------------

  test("pearsonCorr: exact +1/-1 on linear columns, constant -> NULL, " +
    "pairwise null exclusion, sequential parity on random data") {
    val rnd = new scala.util.Random(5)
    val xs = (1 to 200).map(_ => rnd.nextInt(1000).toLong)
    val df = xs.map(x => (x, 2 * x + 7, -3 * x + 50, 42L,
      rnd.nextInt(100).toLong)).toDF("x", "y2", "yneg", "c", "z")
    val rows = TableProfile.pearsonCorr(df,
      Seq("x" -> "y2", "x" -> "yneg", "x" -> "c", "x" -> "z"))
      .collect()
      .map(r => (r.getAs[String]("x_col"), r.getAs[String]("y_col")) -> r)
      .toMap
    assert(rows(("x", "y2")).getAs[Double]("corr") === 1.0)
    assert(rows(("x", "yneg")).getAs[Double]("corr") === -1.0)
    assert(rows(("x", "c")).isNullAt(rows(("x", "c")).fieldIndex("corr")),
      "zero-variance side must yield NULL, not NaN")
    // sequential reference from the same exact-integer formula
    val zs = df.select("z").collect().map(_.getLong(0))
    val n = xs.size.toLong
    def bd(v: BigInt) = v.toDouble
    val (sx, sz) = (BigInt(xs.sum), BigInt(zs.sum))
    val sxz = xs.zip(zs).map { case (a, b) => BigInt(a) * b }.sum
    val sxx = xs.map(a => BigInt(a) * a).sum
    val szz = zs.map(b => BigInt(b) * b).sum
    val expect = bd(n * sxz - sx * sz) /
      math.sqrt(bd(n * sxx - sx * sx) * bd(n * szz - sz * sz))
    assert(rows(("x", "z")).getAs[Double]("corr") === expect)
    assert(rows(("x", "z")).getAs[Long]("n") === n)
  }

  test("pearsonCorr: rows with a NULL on either side drop pairwise") {
    val df = Seq(
      (Some(1L), Some(10L)), (Some(2L), Some(20L)), (Some(3L), None),
      (None, Some(40L)), (Some(5L), Some(50L))
    ).toDF("x", "y")
    val r = TableProfile.pearsonCorr(df, Seq("x" -> "y")).collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("corr") === 1.0)
  }

  // ---- fdAudit -------------------------------------------------------

  test("fdAudit: holding FD -> 0 violations; violated FD counts keys " +
    "and bounds the worst fan-out; NULL rhs is a distinct behavior") {
    val df = Seq(
      (1L, Some("a")), (1L, Some("a")),          // 1 -> {a}: holds
      (2L, Some("a")), (2L, Some("b")), (2L, Some("c")), // 2 -> 3 values
      (3L, Some("x")), (3L, None)                // 3 -> {x, NULL}: violates
    ).toDF("k", "v")
    val r = TableProfile.fdAudit(df, "k", "v").collect().head
    assert(r.getAs[String]("lhs_col") === "k")
    assert(r.getAs[Long]("n_lhs") === 3L)
    assert(r.getAs[Long]("n_violating") === 2L)
    assert(r.getAs[Long]("max_rhs_distinct") === 3L)
    val hold = TableProfile.fdAudit(
      df.filter(col("k") === 1L), "k", "v").collect().head
    assert(hold.getAs[Long]("n_violating") === 0L)
    assert(hold.getAs[Long]("max_rhs_distinct") === 1L)
  }

  // ---- dailyTrend ----------------------------------------------------

  test("dailyTrend: exact num/den on closed-form slopes; day re-base " +
    "per group; daily mean is integer div") {
    // group up: daily means 10,20,30 at days 100,101,102 -> slope 10/1
    // group down: means 9,5,1 at days 7,8,9 -> slope -4/1
    // group flat: single day -> den 0
    val df = Seq(
      ("up", 100L, 10L), ("up", 101L, 20L), ("up", 102L, 30L),
      ("down", 7L, 9L), ("down", 8L, 5L), ("down", 9L, 1L),
      ("flat", 50L, 77L)
    ).toDF("g", "day", "v")
    val rows = TableProfile.dailyTrend(df, Seq("g"), "day", col("v"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // slope = num/den with n=3, t=0,1,2: den = 3*5 - 9 = 6
    val up = rows("up")
    assert(up.getAs[Long]("n_days") === 3L)
    assert(up.getAs[Long]("slope_num") === 60L) // 3*(0+20+60) - 3*60
    assert(up.getAs[Long]("slope_den") === 6L)  // slope 10/day
    val down = rows("down")
    assert(down.getAs[Long]("slope_num") === -24L) // slope -4/day
    assert(down.getAs[Long]("slope_den") === 6L)
    val flat = rows("flat")
    assert(flat.getAs[Long]("n_days") === 1L)
    assert(flat.getAs[Long]("slope_den") === 0L)
    // daily mean is integer div: two rows same day -> (3+4) div 2 = 3
    val m = TableProfile.dailyTrend(
      Seq(("m", 1L, 3L), ("m", 1L, 4L), ("m", 2L, 10L))
        .toDF("g", "day", "v"),
      Seq("g"), "day", col("v")).collect().head
    // means 3,10 at t=0,1: num = 2*10 - 1*13 = 7, den = 2*1 - 1 = 1
    assert(m.getAs[Long]("slope_num") === 7L)
    assert(m.getAs[Long]("slope_den") === 1L)
  }

  // ---- histogram -------------------------------------------------------

  test("histogram: closed-form buckets, edge clamping, empty buckets " +
    "emitted, integer edges, counts sum to row count") {
    // [0, 100) in 4 buckets of width 25; values outside clamp to edges
    val df = Seq(-5L, 0L, 10L, 24L, 25L, 77L, 99L, 100L, 250L).toDF("v")
    val rows = TableProfile.histogram(df, col("v"), 0L, 100L, 4)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("lo_v"), r.getAs[Long]("hi_v"),
          r.getAs[Long]("n_rows"))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L))
    assert(rows(0L) === ((0L, 25L, 4L)))   // -5 (clamped), 0, 10, 24
    assert(rows(1L) === ((25L, 50L, 1L)))  // 25
    assert(rows(2L) === ((50L, 75L, 0L)))  // empty bucket still emitted
    assert(rows(3L) === ((75L, 100L, 4L))) // 77, 99, 100+250 (clamped)
    assert(rows.values.map(_._3).sum === 9L)
  }

  // ---- ivfRecallCurve --------------------------------------------------

  test("ivfRecallCurve: monotone non-decreasing in nprobe; probing " +
    "every cell lands at exactly 1000; matches single-point ivfRecall") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    val q = emb.filter(col("vec_id") < 10)
    val curve = graft.llm.Similarity.ivfRecallCurve(emb, q,
      numCentroids = 4, probes = Seq(1, 2, 4), k = 3)
      .collect().map(r => r.getAs[Long]("nprobe") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("sum_common"),
          r.getAs[Long]("mean_recall_permille"))).toMap
    assert(curve.keySet === Set(1L, 2L, 4L))
    curve.values.foreach { case (nq, _, _) => assert(nq === 10L) }
    assert(curve(1L)._3 <= curve(2L)._3 && curve(2L)._3 <= curve(4L)._3,
      "more probes can only add candidates")
    assert(curve(4L)._3 === 1000L,
      "nprobe = numCentroids scans every cell -> perfect recall")
    // the curve's point at nprobe=2 must equal the aggregated
    // single-point audit at the same operating point
    val single = graft.llm.Similarity.ivfRecall(emb, q,
        numCentroids = 4, nprobe = 2, k = 3)
      .agg(sum("n_common")).collect().head.getLong(0)
    assert(curve(2L)._2 === single)
  }
}
