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

  test("a GROUPED aggregate no longer auto-allows (advisor r15): a " +
    "corpus-cardinality groupBy feeding a global window must flag") {
    // per-doc_id agg: group cardinality == corpus cardinality — exactly
    // the shape the round-14 gate was built to catch
    val perDoc = Tables.documents(spark, sfDir)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val badWin = perDoc.withColumn("rn", row_number().over(w))
    val hits = PlanLint.lintPlan("synthetic_grouped_agg_window",
      badWin.queryExecution.sparkPlan)
    assert(hits.exists(h =>
      (h.rule == "global-window" || h.rule == "single-exchange") && !h.allowed),
      s"a grouped-agg-fed global window must flag unexplained, got $hits")
    // while the GLOBAL-agg-fed equivalent stays auto-allowed: 1 row in
    val one = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n"))
    val okWin = one.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy("n")))
    val okHits = PlanLint.lintPlan("synthetic_global_agg_window",
      okWin.queryExecution.sparkPlan)
    assert(okHits.forall(_.allowed),
      s"a global-agg-fed window is register-sized by construction, got $okHits")
  }

  test("post-AQE executed walk catches a scale-killer inside a scalar " +
    "subquery that the static walk structurally misses (verdict r15 #2)") {
    // a non-equi self-join inside a scalar subquery: the planner emits a
    // BroadcastNestedLoopJoin (or cartesian) INSIDE the subquery plan —
    // plan.collect never descends into subquery expressions, so the
    // static walk sees nothing
    spark.range(2000).toDF("id").createOrReplaceTempView("_pl_sub_t")
    val df = spark.sql(
      """SELECT id, (SELECT count(*) FROM _pl_sub_t a JOIN _pl_sub_t b
        |  ON a.id + b.id >= 0) AS n_pairs
        |FROM _pl_sub_t""".stripMargin)
    val staticHits = PlanLint.lintPlan("synthetic_subquery_cartesian",
      df.queryExecution.sparkPlan)
    assert(!staticHits.exists(h =>
        h.rule == "bnl-join" || h.rule == "cartesian"),
      s"precondition: the static walk must be blind to the subquery join " +
        s"for this proof to mean anything, got $staticHits")
    val execHits = PlanLint.lintExecuted("synthetic_subquery_cartesian", df)
    assert(execHits.exists(h =>
        (h.rule == "bnl-join" || h.rule == "cartesian") && !h.allowed),
      s"the executed walk must flag the subquery's unbounded join, got $execHits")
  }
}
