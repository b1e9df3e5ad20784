package graft

import org.apache.spark.sql.functions._

import graft.warehouse.Bucketing

/** The bucketing claims, asserted on planned strings + exact results:
  * pre-bucketing both fact tables on the join key removes the join's
  * exchanges entirely (the one-time-ingest-shuffle trade every 100 TB
  * warehouse makes), and a groupBy on the bucket key runs exchange-free.
  */
class BucketedJoinSpec extends SparkSpecBase {

  // the metastore is in-memory per test JVM but the warehouse DIRECTORY
  // is durable — drop any orphan location a previous JVM left behind
  // before re-creating, and write once per suite
  private def clearOrphan(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = new java.io.File(wh, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(loc)
    }
  }

  private lazy val setupOnce: Unit = {
    clearOrphan("li_bucketed"); clearOrphan("o_bucketed")
    Bucketing.writeBucketed(Tables.lineitem(spark, sfDir), "li_bucketed",
      numBuckets = 8, keys = Seq("l_orderkey"))
    Bucketing.writeBucketed(Tables.orders(spark, sfDir), "o_bucketed",
      numBuckets = 8, keys = Seq("o_orderkey"))
  }
  private def setup(): Unit = setupOnce

  test("bucketed fact-fact join: zero exchange under the join, exact results") {
    setup()
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = Bucketing.cocoJoin(spark, "li_bucketed", "o_bucketed",
          "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      // the ONLY exchange allowed is the 5-row priority aggregate; the
      // join itself must read co-located buckets
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"join must not shuffle bucketed sides:\n$p")
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"))

      // results identical to the plain (shuffling) join
      val want = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      val got = j.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == want)
    }
  }

  test("groupBy on the bucket key: no exchange at all") {
    setup()
    val agg = spark.table("li_bucketed")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("qty"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucket-key aggregation must be exchange-free:\n$p")
    // spot-check one order against the raw table
    val k = Tables.lineitem(spark, sfDir).select("l_orderkey").head().getLong(0)
    val want = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") === k).agg(sum("l_quantity")).head().getDouble(0)
    val got = agg.filter(col("l_orderkey") === k).head().getDouble(1)
    assert(got == want)
  }

  test("path-based save would drop bucket metadata: writer only exposes saveAsTable") {
    // the API shape IS the guard — writeBucketed has no path variant;
    // this pins the catalog round-trip: metadata survives re-read
    setup()
    val cat = spark.catalog
    assert(cat.tableExists("li_bucketed") && cat.tableExists("o_bucketed"))
    val ddl = spark.sql("DESCRIBE EXTENDED li_bucketed").collect()
      .map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(ddl.contains("Num Buckets") && ddl.contains("8"),
      s"bucket spec must persist in the catalog:\n$ddl")
  }
}
