package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H partsupp family — Q2, Q9, Q11, Q16, Q20, the five classic
  * shapes the fixture set cannot express without a partsupp table. The
  * fixtures don't ship one, so it is DERIVED deterministically from
  * part × supplier-count (the `builtLineDocs` fixture-construction
  * discipline): each part gets 4 suppliers at stride max(⌊S/4⌋, 1)
  * around the supplier-key ring, with integer availqty/supplycost from
  * closed-form arithmetic on the two keys. The IDENTICAL construction
  * runs as a CTE in every oracle ([[psCteDuck]]), so the derived table
  * cannot drift between engines, and it scales with the fixture (S and
  * part count grow with SF).
  *
  * Money discipline: ps_supplycost is integer DOLLARS (1..1000) so the
  * Q9 profit and Q11 stock-value arithmetic stay exact-integer until
  * the final DECIMAL/DOUBLE cast; the lineitem revenue side uses the
  * pack-wide `CAST(... AS DECIMAL(38,6))` convention.
  *
  * Plan shapes at 100 TB: part/supplier/nation/region sides broadcast
  * (dim-sized); partsupp↔lineitem joins exchange on the composite
  * (partkey, suppkey); Q11's global total is a 1-row broadcast scalar;
  * Q16's exclusion is a LeftAnti against a broadcast bad-supplier set;
  * Q20 is the semi-join chain ps⋈qty→supplier. No cartesian anywhere
  * (PlanAuditSpec pins Q9/Q16/Q20).
  */
object TpchQueries3 {

  private val Q2Type = "LARGE"
  private val Q2Region = "EUROPE"
  private val Q9NameSub = "red" // p_name LIKE '%red%'
  private val Q11Nation = "NATION_3"
  private val Q11FracDen = 1000L // keep parts with value*1000 > total
  private val Q16Brand = "Brand#4" // excluded brand
  private val Q16MaxSize = 8 // p_size 1..8 (the IN-list shape)
  private val Q20NamePrefix = "red" // p_name LIKE 'red%'
  private val Q20Year = 1997
  private val Q20Nation = "NATION_9" // non-empty at sf0.01 AND sf0.1

  /** The derived partsupp: (ps_partkey, ps_suppkey, ps_availqty,
    * ps_supplycost), 4 rows per part. All-integer closed forms so the
    * oracle CTE reproduces it bit-exactly.
    */
  def partsupp(s: SparkSession, dir: String): DataFrame = {
    val nsupp = Tables.supplier(s, dir).agg(count(lit(1)).as("n"))
    Tables.part(s, dir).select("p_partkey")
      .crossJoin(broadcast(nsupp))
      .select(col("p_partkey"), col("n"),
        explode(expr("sequence(0, 3)")).as("i"))
      .withColumn("ps_suppkey",
        (col("p_partkey") + col("i") * greatest(expr("n div 4"), lit(1L))) % col("n"))
      .withColumn("ps_availqty",
        (col("p_partkey") * 7 + col("ps_suppkey") * 11) % 9999 + 1)
      .withColumn("ps_supplycost",
        (col("p_partkey") * 13 + col("ps_suppkey") * 17) % 1000 + 1)
      .select(col("p_partkey").as("ps_partkey"), col("ps_suppkey"),
        col("ps_availqty"), col("ps_supplycost"))
  }

  /** DuckDB CTE prefix defining `ps` — the same construction. */
  val psCteDuck: String =
    """ns AS (SELECT count(*) AS n FROM supplier),
      |ps AS (SELECT p_partkey AS ps_partkey,
      |  (p_partkey + u.i * greatest(ns.n // 4, 1)) % ns.n AS ps_suppkey,
      |  (p_partkey * 7 + ((p_partkey + u.i * greatest(ns.n // 4, 1)) % ns.n) * 11) % 9999 + 1 AS ps_availqty,
      |  (p_partkey * 13 + ((p_partkey + u.i * greatest(ns.n // 4, 1)) % ns.n) * 17) % 1000 + 1 AS ps_supplycost
      |  FROM part, ns, UNNEST(range(0, 4)) u(i))"""
      .stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q2 minimum-cost supplier: the correlated MIN subquery decorrelated
    // to a per-part min over the region-restricted partsupp, joined back
    // on (partkey, cost). Dims broadcast; the only fact-sized exchange
    // is the partsupp groupBy.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val ps = partsupp(s, dir)
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir).filter(col("r_name") === Q2Region)
      val eligible = ps
        .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      val minCost = eligible.groupBy(col("ps_partkey").as("m_partkey"))
        .agg(min("ps_supplycost").as("min_cost"))
      val p = Tables.part(s, dir).filter(col("p_type") === Q2Type)
      eligible
        .join(minCost, col("ps_partkey") === col("m_partkey") &&
          col("ps_supplycost") === col("min_cost"))
        .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
          "ps_supplycost")
    }),

    // Q9 product-type profit: revenue (exact DECIMAL) minus integer
    // supply cost, by supplier nation × order year.
    "q9_product_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_name").like(s"%$Q9NameSub%")).select("p_partkey")
      val ps = partsupp(s, dir)
      val l = Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(ps, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(expr(
          """CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
            |  - CAST(ps_supplycost * CAST(l_quantity AS BIGINT) AS DECIMAL(38,6))) AS DOUBLE)"""
            .stripMargin.replace("\n", " ")).as("sum_profit"))
    }),

    // Q11 important stock: per-part stock value in one nation vs a
    // global-fraction threshold — all-integer value arithmetic, the
    // scalar total re-attached as a 1-row broadcast.
    "q11_important_stock" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === Q11Nation)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val ps = partsupp(s, dir)
        .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
        .withColumn("value", col("ps_supplycost") * col("ps_availqty"))
      val perPart = ps.groupBy("ps_partkey").agg(sum("value").as("part_value"))
      val total = perPart.agg(sum("part_value").as("total_value"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_value") * Q11FracDen > col("total_value"))
        .select("ps_partkey", "part_value")
    }),

    // Q16 supplier count by part attributes: the NOT-IN exclusion
    // decorrelates to a LeftAnti against the (data-dependent)
    // negative-balance supplier set; count(DISTINCT) per attribute
    // triple.
    "q16_supplier_parts" -> ((s, dir) => {
      val bad = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val p = Tables.part(s, dir)
        .filter(col("p_brand") =!= Q16Brand && col("p_size") <= Q16MaxSize)
        .select("p_partkey", "p_brand", "p_type", "p_size")
      partsupp(s, dir)
        .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
    }),

    // Q20 excess-stock suppliers: availqty > ½ of the year's shipped
    // quantity for that (part, supplier) — correlated scalar decorrelated
    // to a grouped qty table, integer 2·avail > qty compare, then a
    // semi-join up to the nation-filtered supplier list.
    "q20_excess_stock_suppliers" -> ((s, dir) => {
      val qty = Tables.lineitem(s, dir)
        .filter(expr(s"l_shipdate >= timestamp'$Q20Year-01-01'") &&
          expr(s"l_shipdate < timestamp'${Q20Year + 1}-01-01'"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val redParts = Tables.part(s, dir)
        .filter(col("p_name").like(s"$Q20NamePrefix%")).select("p_partkey")
      val sel = partsupp(s, dir)
        .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"))
        .join(qty, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") * 2 > col("q"))
        .select("ps_suppkey").distinct()
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === Q20Nation)),
          col("s_nationkey") === col("n_nationkey"))
        .join(sel, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      s"""WITH $psCteDuck,
         |el AS (SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
         |  FROM ps JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE r.r_name = '$Q2Region'),
         |mc AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost
         |  FROM el GROUP BY ps_partkey)
         |SELECT el.s_acctbal, el.s_name, el.n_name, p.p_partkey, p.p_brand,
         |  el.ps_supplycost
         |FROM el JOIN mc ON el.ps_partkey = mc.ps_partkey
         |  AND el.ps_supplycost = mc.min_cost
         |JOIN part p ON el.ps_partkey = p.p_partkey
         |WHERE p.p_type = '$Q2Type'""".stripMargin.replace("\n", " "),

    "q9_product_profit" ->
      s"""WITH $psCteDuck
         |SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
         |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
         |    - CAST(ps.ps_supplycost * CAST(l.l_quantity AS BIGINT) AS DECIMAL(38,6))) AS DOUBLE)
         |    AS sum_profit
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%$Q9NameSub%'
         |JOIN ps ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |GROUP BY 1, 2""".stripMargin.replace("\n", " "),

    "q11_important_stock" ->
      s"""WITH $psCteDuck,
         |sup AS (SELECT s_suppkey FROM supplier s JOIN nation n
         |  ON s.s_nationkey = n.n_nationkey WHERE n.n_name = '$Q11Nation'),
         |pp AS (SELECT ps_partkey,
         |    CAST(sum(ps_supplycost * ps_availqty) AS BIGINT) AS part_value
         |  FROM ps JOIN sup ON ps.ps_suppkey = sup.s_suppkey
         |  GROUP BY ps_partkey),
         |t AS (SELECT CAST(sum(part_value) AS BIGINT) AS total_value FROM pp)
         |SELECT ps_partkey, part_value FROM pp, t
         |WHERE part_value * $Q11FracDen > total_value"""
        .stripMargin.replace("\n", " "),

    "q16_supplier_parts" ->
      s"""WITH $psCteDuck
         |SELECT p.p_brand, p.p_type, p.p_size,
         |  count(DISTINCT ps.ps_suppkey) AS supplier_cnt
         |FROM ps JOIN part p ON ps.ps_partkey = p.p_partkey
         |WHERE p.p_brand <> '$Q16Brand' AND p.p_size <= $Q16MaxSize
         |  AND ps.ps_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3""".stripMargin.replace("\n", " "),

    "q20_excess_stock_suppliers" ->
      s"""WITH $psCteDuck,
         |qty AS (SELECT l_partkey, l_suppkey,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '$Q20Year-01-01'
         |    AND l_shipdate < TIMESTAMP '${Q20Year + 1}-01-01'
         |  GROUP BY 1, 2),
         |sel AS (SELECT DISTINCT ps.ps_suppkey
         |  FROM ps JOIN part p ON ps.ps_partkey = p.p_partkey
         |    AND p.p_name LIKE '$Q20NamePrefix%'
         |  JOIN qty ON ps.ps_partkey = qty.l_partkey
         |    AND ps.ps_suppkey = qty.l_suppkey
         |  WHERE ps.ps_availqty * 2 > qty.q)
         |SELECT s.s_suppkey, s.s_name
         |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE n.n_name = '$Q20Nation'
         |  AND s.s_suppkey IN (SELECT ps_suppkey FROM sel)"""
        .stripMargin.replace("\n", " ")
  )
}
