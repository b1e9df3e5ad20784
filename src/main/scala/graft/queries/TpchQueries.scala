package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational analytics pack over the TPC-H-ish fixture tables —
  * aggregation, multi-way join, broadcast join, window top-k, rollup,
  * percentile, min_by/max_by (SURVEY.md §2.3-2.5 shapes at scale).
  *
  * Numeric-parity strategy: every floating aggregate is computed as an
  * exact DECIMAL sum (order-independent, so Spark's parallel partial
  * aggregation and DuckDB's sequential scan agree bit-for-bit) and only
  * then cast to DOUBLE; per-row double arithmetic (e.g. price*(1-disc))
  * is written with identical operation order in both engines, so IEEE 754
  * guarantees identical inputs to the decimal cast.
  *
  * Scale notes are per-query below; the common ones: filters sit directly
  * on scans (pushed into parquet), dimension joins are broadcast, fact
  * joins shuffle on the join key once, and AQE is left to re-plan skew.
  */
object TpchQueries {

  private val Revenue = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-shape pricing summary: single scan + hash agg; partial aggs
    // map-side, 6 rows out. Decimal sums → exact at any SF.
    "q1_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(expr("l_shipdate < timestamp'1998-09-01'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_base_price"),
          expr(s"CAST(sum($Revenue) AS DOUBLE)").as("sum_revenue"),
          count(lit(1)).as("count_order"))),

    // Q6-shape forecast revenue: the pure-pushdown query — every
    // predicate reaches the parquet scan, one exchange-free global agg.
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(expr("l_shipdate >= timestamp'1994-01-01'") &&
          expr("l_shipdate < timestamp'1995-01-01'") &&
          expr("l_discount >= 0.05") && expr("l_discount <= 0.07") &&
          expr("l_quantity < 24"))
        .agg(expr(
          "CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)")
          .as("revenue"))),

    // Q3-shape shipping priority: two fact joins; customer is small →
    // broadcast; orders⋈lineitem shuffles once on the order key.
    "q3_shipping_priority" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(expr("o_orderdate < timestamp'1995-03-15'"))
      val l = Tables.lineitem(s, dir).filter(expr("l_shipdate > timestamp'1995-03-15'"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"),
          col("o_orderpriority"))
        .agg(expr(s"CAST(sum($Revenue) AS DOUBLE)").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q5-shape local-supplier volume: snowflake join; all dimensions
    // (region/nation/supplier/customer) broadcast, facts shuffle once.
    "q5_local_supplier" -> ((s, dir) => {
      val r = Tables.region(s, dir)
      val n = Tables.nation(s, dir)
      val su = Tables.supplier(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c),
          o("o_custkey") === c("c_custkey") && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(expr(s"CAST(sum($Revenue) AS DOUBLE)").as("revenue"))
    }),

    // Q10-shape returned-item ranking: the remaining classic plan — two
    // fact joins + broadcast dims + agg + global top-k. The orderBy+limit
    // plans as TakeOrderedAndProject (per-task top-20, never a full
    // sort); customer/nation broadcast; facts shuffle once on orderkey.
    // Q7-shape nation-pair volume: the self-joined-dimension pattern —
    // nation plays two roles (supplier side via lineitem.l_suppkey,
    // customer side via orders.o_custkey), both broadcast; the
    // direction-pair filter keeps both orderings, grouped by year.
    "q7_nation_volume" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(expr("l_shipdate >= timestamp'1995-01-01'") &&
          expr("l_shipdate < timestamp'1997-01-01'"))
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate").cast("timestamp")).as("l_year"))
        .agg(expr(s"CAST(sum($Revenue) AS DOUBLE)").as("revenue"))
    }),

    // Q13-shape customer distribution: LEFT outer join (zero-order
    // customers count in the 0 bucket) + two stacked aggregations — the
    // first shuffles on the customer key, the second on the tiny count
    // domain; count(o_orderkey) skips nulls identically in both engines.
    "q13_custdist" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q14-shape promo revenue: month-bounded fact scan (pushed filter) ⋈
    // broadcast part; both revenue sums exact DECIMAL → DOUBLE (the
    // classic ratio is a trivial client-side division of the two).
    "q14_promo_revenue" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(expr("l_shipdate >= timestamp'1995-09-01'") &&
          expr("l_shipdate < timestamp'1995-10-01'"))
      l.join(broadcast(Tables.part(s, dir)), l("l_partkey") === col("p_partkey"))
        .agg(
          expr(s"CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $Revenue " +
            "ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)").as("promo_revenue"),
          expr(s"CAST(sum($Revenue) AS DOUBLE)").as("total_revenue"))
    }),

    // Q18-shape large-volume orders: the HAVING-on-fact-agg pattern —
    // per-order quantity sums partial-aggregate map-side, the >200
    // filter prunes before the (broadcast) customer enrich, so the join
    // sees only the big-order survivors.
    "q18_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")
          .as("sum_qty"))
        .filter(col("sum_qty") > 200.0)
      val o = Tables.orders(s, dir)
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)),
          o("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"),
          col("o_totalprice"), col("sum_qty"))
    }),

    "q10_returned_items" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val o = Tables.orders(s, dir)
        .filter(expr("o_orderdate >= timestamp'1995-01-01'") &&
          expr("o_orderdate < timestamp'1996-01-01'"))
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(expr(s"CAST(sum($Revenue) AS DOUBLE)").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Broadcast dimension-enrich: part is tiny at every SF relative to
    // lineitem; the explicit broadcast() keeps the fact table unshuffled.
    "join_part_brand_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_lines"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
          expr(s"CAST(sum($Revenue) AS DOUBLE)").as("revenue"))),

    // Window top-k: revenue rank of suppliers within nation. One shuffle
    // for the supplier agg, one tiny window over the 10-row result.
    "window_topk_suppliers" -> ((s, dir) => {
      val perSupp = Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(expr(s"CAST(sum($Revenue) AS DOUBLE)").as("revenue"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("revenue").desc, col("s_suppkey"))
      perSupp.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("s_nationkey", "s_suppkey", "s_name", "revenue", "rank")
    }),

    // Rollup: hierarchical totals (status → priority → grand total).
    "rollup_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_price"))),

    // Explicit GROUPING SETS (the rollup/cube generalization): the
    // (flag, status) detail grid, per-flag subtotals, and the grand
    // total in ONE pass — grouping_id() disambiguates NULL-as-subtotal
    // from NULL-as-value. Same single-shuffle partial-agg shape as
    // rollup; DuckDB's GROUPING() shares Spark's bit order (first
    // grouping column = MSB).
    "grouping_sets_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_lines"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
            .as("sum_price"))),

    // Exact percentiles (reference A7 latency histogram shape):
    // P50/P95/P99 of event value per type. Spark `percentile` and DuckDB
    // `quantile_cont` both do linear interpolation on the sorted set.
    "percentile_event_value" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          expr("round(percentile(value, 0.5), 6)").as("p50"),
          expr("round(percentile(value, 0.95), 6)").as("p95"),
          expr("round(percentile(value, 0.99), 6)").as("p99"))),

    // min_by/max_by (reference U2 oldest-event eviction / O4 latest-job).
    "minmax_by_event" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          max_by(col("event_id"), struct(col("ts_us"), col("event_id"))).as("latest_event_id"),
          min_by(col("event_id"), struct(col("ts_us"), col("event_id"))).as("oldest_event_id"),
          count(lit(1)).as("n")))
  )

  val oracleSql: Map[String, String] = Map(
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)"""
        .stripMargin.replace("\n", " "),

    "q13_custdist" ->
      """WITH pc AS (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count""".stripMargin.replace("\n", " "),

    "q14_promo_revenue" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
        |    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin.replace("\n", " "),

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 200.0)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |  epoch_us(o.o_orderdate) AS orderdate_us, o.o_totalprice, big.sum_qty
        |FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey"""
        .stripMargin.replace("\n", " "),

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_revenue,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "),

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        |AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""
        .stripMargin.replace("\n", " "),

    "q3_shipping_priority" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS orderdate_us, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, epoch_us(o_orderdate), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin.replace("\n", " "),

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin.replace("\n", " "),

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name""".stripMargin.replace("\n", " "),

    "join_part_brand_agg" ->
      """SELECT p_brand, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin.replace("\n", " "),

    "window_topk_suppliers" ->
      """SELECT s_nationkey, s_suppkey, s_name, revenue, rank FROM (
        |  SELECT s_nationkey, s_suppkey, s_name, revenue,
        |    row_number() OVER (PARTITION BY s_nationkey ORDER BY revenue DESC, s_suppkey) AS rank
        |  FROM (
        |    SELECT s_nationkey, s_suppkey, s_name,
        |      CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |    GROUP BY s_nationkey, s_suppkey, s_name))
        |WHERE rank <= 3""".stripMargin.replace("\n", " "),

    "rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin.replace("\n", " "),

    "grouping_sets_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""
        .stripMargin.replace("\n", " "),

    "percentile_event_value" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin.replace("\n", " "),

    "minmax_by_event" ->
      """WITH r AS (SELECT event_type, event_id,
        |  row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts) DESC, event_id DESC) AS rmax,
        |  row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts) ASC, event_id ASC) AS rmin
        |  FROM events)
        |SELECT event_type,
        |  max(CASE WHEN rmax = 1 THEN event_id END) AS latest_event_id,
        |  max(CASE WHEN rmin = 1 THEN event_id END) AS oldest_event_id,
        |  count(*) AS n
        |FROM r GROUP BY event_type""".stripMargin.replace("\n", " ")
  )
}
