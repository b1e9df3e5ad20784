package graft

import org.apache.spark.sql.functions._

/** AQE skew-join split — the runtime half of the skew story (the
  * operator-level salting/caps live in SkewAuditSpec): when one join
  * key dominates a shuffle partition, AQE must split that partition
  * across multiple tasks (`skew=true` on the join) instead of walling
  * on one straggler, and the split must not change results.
  */
class AqeSkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def skewed = {
    // 95% of left rows share key 0; right is uniform. The md5 pad keeps
    // the hot shuffle partition above the byte threshold — a constant
    // key with sequential ids lz4-compresses below ANY realistic
    // threshold and hides the skew from the size-based detector (a
    // pitfall worth pinning in itself).
    val left = spark.range(0, 200000)
      .select(col("id"), md5(col("id").cast("string")).as("pad"))
      .select(when(col("id") < 190000, 0L).otherwise(col("id") % 64).as("k"),
        col("pad").as("v"))
    val right = spark.range(0, 64).select(col("id").as("k"), (col("id") * 2).as("w"))
    left.join(right, "k")
  }

  private val confs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("a dominant join key is split by AQE (skew=true) with exact results") {
    withSQLConf(confs: _*) {
      // NOTE: the consumer must not require hash distribution on the join
      // key — a groupBy(k) directly above would forbid the split (AQE
      // refuses to break the parent's required distribution). A global
      // aggregate (or write) is the representative consumer.
      val j = skewed.agg(count(lit(1)).as("n"), sum("w").as("sw"))
      val row = j.collect().head // execute THIS frame so its AQE plan finalizes
      val (n, sw) = (row.getLong(0), row.getLong(1))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must split the hot partition; plan:\n${p.take(2000)}")
      assert(n === 200000L, "row count must stay exact through the split")
      // sum(w): hot key 0 contributes 190000*0; keys 1..63 appear
      // (10000/64 ≈) 157 times each except distribution from id%64 —
      // recompute independently
      val expect = (190000L until 200000L).map(id => (id % 64) * 2).sum
      assert(sw === expect, "join result must stay exact through the split")
    }
  }
}
