package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental Count-Min maintenance across micro-batches — the
  * streaming form of [[Sketches.cmsCells]], completing the streaming
  * sketch symmetry (HLL register max-merge, Bloom word BIT_OR, quantile
  * register SUM — and now frequency cells): a continuously-fed token /
  * key stream keeps a queryable heavy-hitter frequency panel current in
  * d·w int64 cells without re-scanning history.
  *
  * Replay idempotence (the at-least-once foreachBatch contract,
  * [[graft.llm.StreamingDedup]]'s construction): the state is the
  * PER-BATCH cell table partitioned by `_batch_id` — a batch's cells
  * overwrite only their own partition, so a replayed batch rewrites
  * identical rows and the merged cells are unchanged. CMS counts are
  * duplicate-SENSITIVE (like the quantile registers, unlike HLL/Bloom),
  * so the partition-overwrite isolation is what makes replay safe.
  *
  * Merging happens AT READ TIME by SUM over all batch partitions (CMS
  * cells are sum-mergeable: shard counts added per (r, b) equal the
  * one-pass cells — spec-pinned). State size is batches × ≤ d·w rows;
  * old partitions fold with [[graft.warehouse.Compaction]]-style
  * maintenance — SUM is associative, so any grouping of partitions
  * folds to the same cells.
  */
final class StreamingCms(spark: SparkSession, stateDir: String,
    d: Int, w: Int) {

  /** Record one micro-batch: build its cell table and overwrite this
    * batch's state partition (dynamic partition overwrite — the replay
    * contract).
    */
  def recordBatch(df: DataFrame, valueCol: Column, batchId: Long): Unit =
    Sketches.cmsCells(df, valueCol, d, w)
      .withColumn("_batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(stateDir)

  /** [[recordBatch]] with grouping columns (per day/source/shard) —
    * the state a ROLLING panel reads: a grouped batch's cells land in
    * the same batch partition (replay contract unchanged), and
    * [[mergedCellsBy]] hands `Sketches.rollingSumRegisters` exactly the
    * (groups…, r, b, c) table it windows. Closes the loop from the
    * continuously-fed stream to the sliding-window heavy-hitter panel
    * without ever re-scanning history.
    */
  def recordBatchBy(df: DataFrame, groups: Seq[String], valueCol: Column,
      batchId: Long): Unit =
    Sketches.cmsCellsBy(df, groups, valueCol, d, w)
      .withColumn("_batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(stateDir)

  /** The merged cell table over every recorded batch — identical to
    * the one-pass [[Sketches.cmsCells]] over the union of all batches'
    * rows.
    */
  def mergedCells(): DataFrame =
    spark.read.parquet(stateDir)
      .groupBy("r", "b")
      .agg(sum("c").as("c"))

  /** Merged per-group cells over every recorded batch — identical to
    * one-pass [[Sketches.cmsCellsBy]] over the union (SUM is
    * associative across any batch grouping).
    */
  def mergedCellsBy(groups: Seq[String]): DataFrame =
    spark.read.parquet(stateDir)
      .groupBy(groups.map(col) ++ Seq(col("r"), col("b")): _*)
      .agg(sum("c").as("c"))

  /** Current frequency estimates for a key set (a string column named
    * `key`) — the live heavy-hitter panel: est ≥ true count always
    * (collisions only add).
    */
  def estimates(keys: DataFrame): DataFrame =
    Sketches.cmsEstimate(mergedCells(), keys, d, w)
}
