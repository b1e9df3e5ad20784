package graft

import org.apache.spark.sql.DataFrame

/** Semantic check for the hand-decorrelated TPC-H family: each
  * DataFrame plan must return exactly what Spark's OWN subquery
  * decorrelation produces for the equivalent correlated SQL — an
  * engine-internal oracle independent of the driver's DuckDB gate
  * (same engine, different planning path).
  */
class TpchDecorrelationSpec extends SparkSpecBase {

  private def registerViews(): Unit =
    for (t <- Seq("orders", "lineitem", "part", "supplier", "customer",
        "nation", "region"))
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)

  private def assertSameRows(df: DataFrame, sql: String, sortCols: Seq[String]): Unit = {
    registerViews()
    val got = df.orderBy(sortCols.head, sortCols.tail: _*).collect().toSeq
    val want = spark.sql(sql).orderBy(sortCols.head, sortCols.tail: _*).collect().toSeq
    assert(want.nonEmpty, "degenerate oracle: correlated SQL returned no rows")
    assert(got == want, s"decorrelated plan diverges from Spark SQL:\n got=$got\nwant=$want")
  }

  test("q4: LeftSemi equals Spark's EXISTS decorrelation") {
    assertSameRows(
      SparkEntry.queries("q4_order_priority")(spark, sfDir),
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= timestamp'1996-01-01'
        |  AND o_orderdate < timestamp'1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY o_orderpriority""".stripMargin,
      Seq("o_orderpriority"))
  }

  test("q17: per-part aggregate equals Spark's correlated scalar subquery") {
    assertSameRows(
      SparkEntry.queries("q17_small_qty_revenue")(spark, sfDir),
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT avg(l_quantity) * 0.2 FROM lineitem l2
        |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin,
      Seq("avg_yearly"))
  }

  test("q21: semi+anti chain equals Spark's nested EXISTS/NOT EXISTS") {
    assertSameRows(
      SparkEntry.queries("q21_waiting_suppliers")(spark, sfDir),
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
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
      Seq("s_name"))
  }

  test("q8: market-share ratio equals Spark SQL's CASE-in-aggregate form") {
    assertSameRows(
      SparkEntry.queries("q8_market_share")(spark, sfDir),
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
        |  AND o_orderdate >= timestamp'1995-01-01'
        |  AND o_orderdate < timestamp'1997-01-01'
        |GROUP BY year(o_orderdate)""".stripMargin,
      Seq("o_year"))
  }

  test("q12: late-line classification equals Spark SQL") {
    assertSameRows(
      SparkEntry.queries("q12_late_lines")(spark, sfDir),
      """SELECT year(l_shipdate) AS l_year,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1L ELSE 0L END) AS high_line_count,
        |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1L ELSE 0L END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAYS
        |GROUP BY year(l_shipdate)""".stripMargin,
      Seq("l_year"))
  }

  test("q15: materialized view + broadcast max equals Spark's scalar subquery") {
    assertSameRows(
      SparkEntry.queries("q15_top_supplier")(spark, sfDir),
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= timestamp'1996-01-01'
        |    AND l_shipdate < timestamp'1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
      Seq("s_suppkey"))
  }

  test("q19: disjunctive join predicate equals Spark SQL's WHERE form") {
    assertSameRows(
      SparkEntry.queries("q19_disjunctive_revenue")(spark, sfDir),
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
      Seq("revenue"))
  }

  test("q22: anti join + scalar broadcast equals Spark's NOT EXISTS + uncorrelated scalar") {
    assertSameRows(
      SparkEntry.queries("q22_dormant_customers")(spark, sfDir),
      """WITH pos AS (SELECT * FROM customer WHERE c_acctbal > 0),
        |glob AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot,
        |    count(*) AS cnt FROM pos)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM pos, glob
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > tot
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = pos.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey""".stripMargin,
      Seq("c_nationkey"))
  }
}
