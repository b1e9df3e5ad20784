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
}
