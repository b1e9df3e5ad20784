package graft

import graft.ops.AsOf

/** AS-OF join contract: inclusive at-or-before match, LWW tie-break among
  * simultaneous right rows, NULL when nothing precedes, and the plan
  * never degenerates to a range join.
  */
class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  private val left = Seq(
    // (event_id, user, ts)
    (100L, 1L, 50L),   // before any right row → NULL
    (101L, 1L, 100L),  // equal ts → inclusive match r1
    (102L, 1L, 250L),  // between r1(100) and r2(300) → r1
    (103L, 1L, 300L),  // equal to the tied pair at 300 → max event_id wins
    (104L, 1L, 999L),  // after everything → latest (the tie winner)
    (200L, 2L, 500L)   // other key: isolated, its own right row
  ).toDF("event_id", "user_id", "ts_us")

  private val right = Seq(
    // (user, ts, tie, value)
    (1L, 100L, 10L, 1.0),
    (1L, 300L, 20L, 2.0),
    (1L, 300L, 21L, 3.0), // simultaneous: event_id 21 must win
    (2L, 400L, 30L, 9.0)
  ).toDF("user_id", "ts_us", "p_id", "p_val")

  private def run() = AsOf.joinAtOrBefore(left, right, Seq("user_id"),
    "ts_us", "ts_us", "p_id", Seq("p_id", "p_val"))
    .collect().map(r => r.getLong(0) ->
      (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)))).toMap

  test("at-or-before semantics with LWW tie-break and null for no-match") {
    val m = run()
    assert(m(100L)._1.isEmpty, "nothing precedes ts=50")
    assert(m(101L)._1.contains(10L), "equal ts matches inclusively")
    assert(m(102L)._1.contains(10L))
    assert(m(103L)._1.contains(21L), "simultaneous right rows: max tie wins")
    assert(m(104L)._1.contains(21L))
  }

  test("keys never cross: user 2 sees only its own rows") {
    val m = run()
    // user 2's left row at 500 is AFTER its right row at 400 → match 30
    assert(m(200L)._1.contains(30L))
  }

  test("a null-tie right row loses to a real tie at the same timestamp") {
    val l = Seq((1L, 1L, 300L)).toDF("event_id", "user_id", "ts_us")
    val r = Seq(
      (1L, 300L, Option(20L), 2.0),
      (1L, 300L, Option.empty[Long], 9.0) // null LWW position must lose
    ).toDF("user_id", "ts_us", "p_id", "p_val")
    val m = AsOf.joinAtOrBefore(l, r, Seq("user_id"),
      "ts_us", "ts_us", "p_id", Seq("p_id", "p_val")).head()
    assert(m.getAs[Long]("asof_p_id") == 20L,
      "null tie must sort first (lose), matching the engine's LWW rule")
  }

  test("NULL keys never match: a null-key left row carries NULL asof_ columns") {
    // SQL equality semantics (p.user_id = c.user_id never matches NULL):
    // a NULL-key right payload must not enrich a NULL-key left row just
    // because Window.partitionBy groups NULLs together
    val l = Seq((1L, null.asInstanceOf[java.lang.Long], 200L),
                (2L, java.lang.Long.valueOf(1L), 200L))
      .toDF("event_id", "user_id", "ts_us")
    val r = Seq((null.asInstanceOf[java.lang.Long], 100L, 1L, 7.0),
                (java.lang.Long.valueOf(1L), 100L, 2L, 8.0))
      .toDF("user_id", "ts_us", "p_id", "p_val")
    val m = AsOf.joinAtOrBefore(l, r, Seq("user_id"),
      "ts_us", "ts_us", "p_id", Seq("p_id", "p_val"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(m(1L).isEmpty, "null-key left row must not be enriched")
    assert(m(2L).contains(2L), "real keys still match")
  }

  test("a NULL-timestamp right row never matches (r.ts <= l.ts is false on NULL)") {
    // a null-_ts right row sorts to the partition head, where the running
    // last() would otherwise carry its payload into every left row that
    // precedes the first real right timestamp
    val l = Seq((1L, 1L, 50L)).toDF("event_id", "user_id", "ts_us")
    val r = Seq(
      (java.lang.Long.valueOf(1L), null: java.lang.Long, 9L, 7.0),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(100L), 2L, 8.0))
      .toDF("user_id", "ts_us", "p_id", "p_val")
    val m = AsOf.joinAtOrBefore(l, r, Seq("user_id"),
      "ts_us", "ts_us", "p_id", Seq("p_id", "p_val"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(m(1L).isEmpty, "no right row at-or-before ts=50 — null ts is not a match")
  }

  test("left row count is preserved exactly (no fan-out, no drops)") {
    val out = AsOf.joinAtOrBefore(left, right, Seq("user_id"),
      "ts_us", "ts_us", "p_id", Seq("p_id"))
    assert(out.count() == left.count())
  }

  test("plan: one keyed exchange, no range join degeneration") {
    val p = SparkEntry.queries("events_asof_purchase")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), "range-join shape leaked in")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"), "the as-of carry must be a window, not a join")
  }
}
