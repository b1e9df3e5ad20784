package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the 100 TB scan-reduction lever
  * for selective fact↔dim joins that are too big to broadcast: the
  * optimizer builds a bloom filter from the FILTERED build side and
  * injects a `might_contain` probe into the fact scan, so most fact
  * rows die before the shuffle. Asserted here so the capability (and
  * the confs that enable it at our data shapes) are pinned: a Spark
  * upgrade or conf drift that silently loses the filter fails the
  * suite, and the filtered plan is proven RESULT-IDENTICAL to the
  * unfiltered one (a bloom filter may only drop non-matching rows).
  */
class RuntimeFilterSpec extends SparkSpecBase {

  private val filterConfs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // sf-fixture-sized thresholds; at 100 TB the defaults (10 MB build /
    // 10 GB probe) already fire — these only scale the demo down
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
    // force the shuffle-join regime the filter exists for
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def urgentRevenue = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(expr("CAST(round(l_quantity * 100, 0) AS BIGINT)")).as("q_cents"))
  }

  test("selective dim filter injects a bloom probe into the fact side") {
    withSQLConf(filterConfs: _*) {
      val p = urgentRevenue.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_agg"),
        "build side must aggregate a bloom filter from the filtered dim")
      assert(p.contains("might_contain"),
        "fact side must probe the bloom filter before the shuffle")
    }
  }

  test("bloom-filtered plan is result-identical to the plain one") {
    val plain = urgentRevenue.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val filtered = withSQLConf(filterConfs: _*) {
      urgentRevenue.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(filtered === plain)
    assert(plain.nonEmpty)
  }
}
