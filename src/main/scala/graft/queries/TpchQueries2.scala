package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H round-9 widening: the decorrelation family — the four classic
  * correlated-subquery shapes, hand-decorrelated into the joins Catalyst
  * would produce from SQL, so the physical plans are auditable
  * (PlanAuditSpec) — plus the remaining classic relational shapes the
  * fixture schema can express:
  *
  *  - Q4: `EXISTS` → LeftSemi join with a non-equi correlated predicate.
  *  - Q17: correlated scalar `avg` → per-key aggregate joined back.
  *  - Q21: nested `EXISTS` + `NOT EXISTS` on the same fact → a LeftSemi
  *    and a LeftAnti chained on one join key.
  *  - Q22: `NOT EXISTS` anti-join + an uncorrelated global scalar
  *    broadcast under every row.
  *  - Q8: CASE-inside-aggregate market-share ratio over a snowflake.
  *  - Q12: conditional two-way classification counts on a non-equi join.
  *  - Q15: scalar max over a derived view, equality-joined back.
  *  - Q19: disjunction of conjunctive branches as the join predicate.
  *
  * The fixture schema is a pruned TPC-H (no l_commitdate/l_receiptdate,
  * p_container, c_phone, o_comment), so the predicates are adapted to
  * the columns that exist — the *decorrelation shape* (semi/anti/scalar
  * subquery) is the thing under test, and each adaptation keeps the
  * original query's selectivity character (probed non-degenerate at
  * sf0.001/0.01/0.1).
  *
  * Numeric parity with the DuckDB oracle follows TpchQueries' strategy:
  * exact DECIMAL sums cast to DOUBLE; correlated averages only over the
  * integer-valued l_quantity (exact in double at any aggregation order);
  * the Q22 threshold is cross-multiplied in DECIMAL (acctbal·n > Σ) so
  * no engine ever divides.
  */
object TpchQueries2 {

  private val Revenue = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"

  /** Scale notes, per query:
    *  - q4: the semi join shuffles both sides once on l_orderkey; the
    *    correlated date predicate rides the join condition (evaluated
    *    during the probe, never materializing the pair). No broadcast —
    *    both sides are fact-sized at scale.
    *  - q17: the brand filter broadcasts into the fact scan, and the
    *    per-part threshold aggregate (one row per qualifying part —
    *    dim-sized) broadcasts back over the same filtered fact, so
    *    lineitem is scanned once, shuffled once (partial agg), joined
    *    without an exchange.
    *  - q21: three passes over lineitem, but all three exchange on the
    *    SAME key (l_orderkey), so the semi and anti probes reuse the
    *    exchange/sort of the base side; top-20 is TakeOrderedAndProject
    *    (per-task heap, never a full sort).
    *  - q22: the global (Σ, n) scalar is a 1-row broadcast nested-loop
    *    (the only sound plan for an uncorrelated scalar); the anti join
    *    shuffles on custkey. Nothing driver-side.
    *  - q8: every dimension (part/customer/nation×2/region/supplier)
    *    broadcasts; the facts shuffle once on the order key; both sums
    *    ride one aggregate.
    *  - q12: equi-key + non-equi lateness predicate on one fact⋈fact
    *    join; counts partial-aggregate map-side.
    *  - q15: the revenue view aggregates once (partial sums), its 1-row
    *    max broadcasts back over the same ALREADY-AGGREGATED view (one
    *    row per supplier) — the fact is scanned once.
    *  - q19: the brand/size conjunct of each branch prunes the part
    *    build side before the broadcast; the quantity residual evaluates
    *    on joined rows only.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q4-shape priority check: orders in a 1-year window with at least
    // one lineitem shipped >60 days after the order date (the fixture's
    // stand-in for commitdate<receiptdate), counted per priority.
    "q4_order_priority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(expr("o_orderdate >= timestamp'1996-01-01'") &&
          expr("o_orderdate < timestamp'1997-01-01'"))
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q17-shape small-quantity revenue: weekly revenue lost to orders
    // below 20% of the part's average quantity, one brand. The
    // correlated `avg(l_quantity)` decorrelates to a per-part aggregate
    // over the SAME brand-filtered fact slice (the correlation key is
    // l_partkey, so pre-filtering by part is semantics-preserving).
    "q17_small_qty_revenue" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#23")
        .select("p_partkey")
      val lp = Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
      // l_quantity is integer-valued 1..50 → double sums are exact at any
      // partial-agg order; 0.2*avg is one IEEE multiply in both engines.
      val th = lp.groupBy("l_partkey")
        .agg((avg("l_quantity") * 0.2).as("qty_threshold"))
        .withColumnRenamed("l_partkey", "t_partkey")
      lp.join(broadcast(th), col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .agg((expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)") / 7.0)
          .as("avg_yearly"))
    }),

    // Q21-shape waiting suppliers: suppliers that returned ('R') a line
    // in a finalized multi-supplier order where NO other supplier
    // returned one — EXISTS(other supplier) + NOT EXISTS(other returner)
    // on the same order key, then count per supplier, top 20.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val l1 = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val oF = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey")
      val l2 = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
      val l3 = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"))
      l1.join(oF, l1("l_orderkey") === oF("o_orderkey"), "left_semi")
        .join(l2,
          col("l_orderkey") === col("l2_orderkey") &&
            col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
        .join(l3,
          col("l_orderkey") === col("l3_orderkey") &&
            col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // Q8-shape national market share: of the revenue a region's
    // customers spent on one part type in 1995-1996, the fraction
    // supplied by one nation, per year — the CASE-inside-aggregate
    // ratio over a snowflake join. Both sums are exact DECIMAL; the
    // final share is ONE double division, identical in both engines.
    "q8_market_share" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_type") === "STANDARD")
        .select("p_partkey")
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .filter(expr("o_orderdate >= timestamp'1995-01-01'") &&
          expr("o_orderdate < timestamp'1997-01-01'"))
      val c = Tables.customer(s, dir)
      val nCust = Tables.nation(s, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val nSupp = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val su = Tables.supplier(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(nCust), c("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(nSupp), su("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate").cast("timestamp")).as("o_year"))
        .agg(
          expr(s"CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN $Revenue " +
            "ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)").as("nation_volume"),
          expr(s"CAST(sum($Revenue) AS DOUBLE)").as("total_volume"))
        .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
    }),

    // Q12-shape late-shipment priority classes: lines shipped >90 days
    // after their order, bucketed into high/low priority counts — the
    // conditional two-way classification aggregate (the fixture lacks
    // l_shipmode/receiptdate; lateness vs o_orderdate is the stand-in
    // predicate, same join + CASE-count shape).
    "q12_late_lines" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      val o = Tables.orders(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(year(col("l_shipdate").cast("timestamp")).as("l_year"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
    }),

    // Q15-shape top supplier: per-supplier quarter revenue, keep the
    // supplier(s) achieving the GLOBAL maximum — the scalar-subquery-
    // over-a-derived-view shape. Revenue is an exact DECIMAL sum cast
    // to DOUBLE, so the equality join against max() is exact; the
    // 1-row max broadcasts under the per-supplier aggregate.
    "q15_top_supplier" -> ((s, dir) => {
      // the view feeds both the max and the equality probe — materialize
      // once or the fact is scanned twice (Materialize discipline)
      val rev = graft.util.Materialize.stable(
        Tables.lineitem(s, dir)
          .filter(expr("l_shipdate >= timestamp'1996-01-01'") &&
            expr("l_shipdate < timestamp'1996-04-01'"))
          .groupBy("l_suppkey")
          .agg(expr(s"CAST(sum($Revenue) AS DOUBLE)").as("total_revenue")))
      val top = rev.agg(max("total_revenue").as("max_revenue"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // Q19-shape disjunctive-predicate join: three OR'd brand/size/
    // quantity branches — the classic planner test that the OR of
    // conjunctions still prunes (the part side filters to the union of
    // brands BEFORE the join; the residual disjunction evaluates on the
    // joined row).
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      val branch1 = col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
      val branch2 = col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
      val branch3 = col("p_brand") === "Brand#34" &&
        col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey") &&
          (branch1 || branch2 || branch3))
        .agg(expr(s"CAST(sum($Revenue) AS DOUBLE)").as("revenue"))
    }),

    // Q22-shape dormant rich customers: positive-balance customers above
    // the global average balance with no URGENT order, per nation. The
    // global scalar stays a (Σ, n) pair and the threshold test is the
    // exact DECIMAL cross-multiplication acctbal·n > Σ — no division, no
    // float aggregation order to disagree on.
    "q22_dormant_customers" -> ((s, dir) => {
      val pos = Tables.customer(s, dir).filter(col("c_acctbal") > 0)
      val glob = pos.agg(
        expr("sum(CAST(c_acctbal AS DECIMAL(18,2)))").as("tot"),
        count(lit(1)).as("cnt"))
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey")
      pos.crossJoin(broadcast(glob))
        .filter(expr("CAST(c_acctbal AS DECIMAL(18,2)) * cnt > tot"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          expr("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)").as("totacctbal"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin.replace("\n", " "),

    "q17_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT avg(l_quantity) * 0.2 FROM lineitem l2
        |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin.replace("\n", " "),

    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin.replace("\n", " "),

    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
        |    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS nation_volume,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS total_volume,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
        |    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY year(o_orderdate)""".stripMargin.replace("\n", " "),

    "q12_late_lines" ->
      """SELECT year(l_shipdate) AS l_year,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY year(l_shipdate)""".stripMargin.replace("\n", " "),

    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"""
        .stripMargin.replace("\n", " "),

    "q19_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin.replace("\n", " "),

    "q22_dormant_customers" ->
      """WITH pos AS (SELECT * FROM customer WHERE c_acctbal > 0),
        |gtot AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot,
        |    count(*) AS cnt FROM pos)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM pos, gtot
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > tot
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = pos.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey""".stripMargin.replace("\n", " ")
  )
}
