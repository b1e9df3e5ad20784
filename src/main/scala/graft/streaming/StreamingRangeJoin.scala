package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Incremental interval-join aggregation across micro-batches — the
  * streaming form of [[RangeJoin.bucketed]] + groupBy: a probe stream
  * (events) continuously folds into per-interval aggregates (campaign
  * windows, maintenance windows, validity ranges) without re-joining
  * history. Each batch pays one batch-sized bucketed join against the
  * interval table; COUNT/SUM distribute over the batch decomposition,
  * so the merged panel equals the one-pass range-join aggregate
  * (spec-pinned).
  *
  * The interval table is the caller's fixed dimension (the frozen-
  * geometry contract, like [[StreamingIvf]]'s centroids): changing the
  * windows is a REBUILD of the panel, not maintenance.
  *
  * Replay idempotence (the at-least-once foreachBatch contract): state
  * is the PER-BATCH aggregate table partitioned by `_batch_id` — a
  * replayed batch overwrites only its own partition with identical
  * rows. Counts and sums are duplicate-SENSITIVE, so the partition-
  * overwrite isolation is what makes replay safe (the CMS/quantile
  * register contract, applied to join aggregates).
  *
  * Scale shape: per batch, one bucket-key equi-join (never a nested
  * loop — [[RangeJoin.bucketed]]'s contract) into an intervals-sized
  * partial agg; state is batches × matched-interval rows; the merged
  * read is one SUM over the state table.
  */
final class StreamingRangeJoin(spark: SparkSession, stateDir: String,
    bucketWidth: Long, keyCols: Seq[String]) {
  require(keyCols.nonEmpty, "need at least one interval key column")

  /** Record one micro-batch: bucketed-join the batch against the
    * interval table, aggregate (n_events, sum_value) per interval key,
    * overwrite this batch's state partition.
    */
  def recordBatch(probe: DataFrame, tCol: String, valueCol: Column,
      intervals: DataFrame, loCol: String, hiCol: String,
      batchId: Long): Unit =
    RangeJoin.bucketed(probe.select(col(tCol), valueCol.as("_v")), tCol,
        intervals, loCol, hiCol, bucketWidth)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum("_v").as("sum_value"))
      .withColumn("_batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(stateDir)

  /** The live panel: per-interval aggregates over every recorded batch
    * — identical to the one-pass range-join aggregate over the union
    * of all batches' probe rows (COUNT/SUM distribute over batches; an
    * interval matched by no batch has no row, same as one-pass inner
    * semantics).
    */
  def merged(): DataFrame =
    spark.read.parquet(stateDir)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("n_events").as("n_events"), sum("sum_value").as("sum_value"))
}
