package graft

import org.apache.spark.sql.functions._

/** Hard gate for [[PlanLint]]: EVERY gate plan on the whole 258-query
  * surface must lint clean — zero unexplained cartesians, nested-loop
  * joins, single-partition exchanges, or unpartitioned windows. A new
  * gate that ships a corpus-sized single-task shape fails the suite,
  * not just a later bench (round-14 verdict #2).
  */
class PlanLintSpec extends SparkSpecBase {
  import spark.implicits._

  test("whole-surface lint: zero unexplained scale-envelope hits") {
    val hits = PlanLint.run(spark, sfDir)
    val bad = hits.filterNot(_.allowed)
    assert(bad.isEmpty, "unexplained plan-lint hits:\n" +
      bad.map(h => s"  ${h.query}: ${h.rule} (${h.node})").mkString("\n"))
    // the lint is not vacuous: the deliberate bounded-broadcast scans
    // (ANN anchors, decontam eval side) must actually trip the rules and
    // be excused via the documented allow-list / structural bounds
    assert(hits.nonEmpty, "expected the bounded-broadcast family to trip " +
      "bnl-join hits — an empty hit list means the walk found nothing, " +
      "which would make this gate meaningless")
    assert(hits.exists(h => h.rule == "bnl-join"),
      "the ANN family's deliberate broadcast scans should appear as " +
      "allowed bnl-join hits")
  }

  test("the rules themselves fire: a synthetic bad plan is flagged") {
    // corpus-sized cartesian: two parquet-backed frames, no key
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val cart = docs.as("a").crossJoin(docs.as("b"))
    val cartHits = PlanLint.lintPlan("synthetic_cartesian",
      cart.queryExecution.sparkPlan)
    assert(cartHits.exists(h =>
      (h.rule == "cartesian" || h.rule == "bnl-join") && !h.allowed),
      s"an unkeyed corpus self-join must flag, got $cartHits")
    // unpartitioned window straight over a scan (no bounding aggregate)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("doc_id")
    val badWin = docs.withColumn("rn", row_number().over(w))
    val winHits = PlanLint.lintPlan("synthetic_global_window",
      badWin.queryExecution.sparkPlan)
    assert(winHits.exists(h =>
      (h.rule == "global-window" || h.rule == "single-exchange") && !h.allowed),
      s"a corpus-sized global window must flag, got $winHits")
    // and the structural allowance: a global agg's single-partition
    // gather is fine because the partial agg bounds what moves
    val okAgg = docs.agg(count(lit(1)).as("n"))
    val aggHits = PlanLint.lintPlan("synthetic_global_agg",
      okAgg.queryExecution.sparkPlan)
    assert(aggHits.forall(_.allowed),
      s"a partial-agged scalar aggregate must auto-allow, got $aggHits")
  }
}
