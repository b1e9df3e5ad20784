package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Incremental interval-join aggregation with BOTH sides streaming —
  * the streaming form of [[RangeJoin.bucketed]] + groupBy: a probe
  * stream (events) and an interval stream (campaign windows,
  * maintenance windows, validity ranges) each fold into state across
  * micro-batches, and the live panel equals the one-pass range-join
  * aggregate over the union of everything seen (spec-pinned over batch
  * decompositions of EITHER side).
  *
  * The construction is the register discipline of the sketch family
  * (HLL register MAX, CMS/quantile SUM) applied to a join: per-interval
  * COUNT/SUM decompose over an exact PER-T DIGEST of the probe stream —
  * `(t, n_events, sum_value)` grouped by the exact probe timestamp —
  * because an interval's aggregate is Σ over t ∈ [lo, hi] of the
  * digest row. The digest is the probe side's sufficient statistic:
  * bounded by the number of DISTINCT t values (the time domain), not
  * probe rows, it is what lets a late-arriving interval batch join
  * against all probe history without the raw stream ever being
  * re-scanned. Digests sum-merge across batches, so probe batches
  * distribute; intervals union, so interval batches distribute.
  *
  * Replay idempotence (the at-least-once foreachBatch contract): both
  * sides' state is partitioned by `_batch_id` — a replayed batch
  * overwrites only its own partition with identical rows. Counts and
  * sums are duplicate-SENSITIVE, so the partition-overwrite isolation
  * is what makes replay safe (the CMS/quantile register contract).
  *
  * Scale shape: per probe batch, one batch-sized partial agg into the
  * t-grained digest; per interval batch, a map-only normalize+write.
  * The merged read pays one bucket-key equi-join (never a nested loop —
  * [[RangeJoin.bucketed]]'s contract) of digest × intervals — both
  * register-sized — into an intervals-sized partial agg.
  *
  * Integer-exact panel discipline: `t` and `valueCol` are cast to
  * BIGINT per row (the gates' cents/permille convention), so the
  * folded panel is hash-oracle-exact.
  */
final class StreamingRangeJoin(spark: SparkSession, stateDir: String,
    bucketWidth: Long, keyCols: Seq[String]) {
  require(keyCols.nonEmpty, "need at least one interval key column")
  require(!keyCols.exists(Set("_t", "_n", "_sum", "_batch_id")),
    s"keyCols must avoid the internal state names _t/_n/_sum/_batch_id")

  private val probeDir = stateDir + "/probe"
  private val intervalDir = stateDir + "/intervals"

  /** Record one probe micro-batch: fold it into the per-t digest and
    * overwrite this batch's probe-state partition.
    */
  def recordProbeBatch(probe: DataFrame, tCol: String, valueCol: Column,
      batchId: Long): Unit =
    probe
      .select(col(tCol).cast("long").as("_t"), valueCol.cast("long").as("_v"))
      .groupBy("_t")
      .agg(count(lit(1)).as("_n"), sum("_v").as("_sum"))
      .withColumn("_batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(probeDir)

  /** Record one interval micro-batch: normalize the window bounds to
    * BIGINT `_lo`/`_hi` and overwrite this batch's interval-state
    * partition. New intervals see all probe history through the digest.
    */
  def recordIntervalBatch(intervals: DataFrame, loCol: String,
      hiCol: String, batchId: Long): Unit =
    intervals
      .select(keyCols.map(col) ++ Seq(col(loCol).cast("long").as("_lo"),
        col(hiCol).cast("long").as("_hi")): _*)
      .withColumn("_batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(intervalDir)

  /** Record a probe batch against a FIXED interval table — the
    * single-side convenience: the interval table lands (idempotently)
    * in interval partition 0, the probe batch in its own partition.
    */
  def recordBatch(probe: DataFrame, tCol: String, valueCol: Column,
      intervals: DataFrame, loCol: String, hiCol: String,
      batchId: Long): Unit = {
    recordIntervalBatch(intervals, loCol, hiCol, batchId = 0L)
    recordProbeBatch(probe, tCol, valueCol, batchId)
  }

  private def mergedDigest(): DataFrame =
    if (StreamingState.hasData(spark, probeDir))
      // sum-merge the per-batch digests so the join input has one row
      // per t (keeps the bucket join's fan-out digest-sized)
      spark.read.parquet(probeDir).groupBy("_t")
        .agg(sum("_n").as("_n"), sum("_sum").as("_sum"))
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("_t", LongType),
          StructField("_n", LongType), StructField("_sum", LongType))))
    }

  /** The live panel: per-interval (n_events, sum_value) over every
    * recorded batch of both sides — identical to the one-pass
    * range-join aggregate over the unions (an interval matched by no
    * probe has no row, same as one-pass inner semantics). Before any
    * interval batch is recorded the panel's natural zero state is the
    * EMPTY table (keys typed BIGINT by the integer-exact convention),
    * not an AnalysisException from an absent state directory.
    */
  def merged(): DataFrame =
    if (StreamingState.hasData(spark, intervalDir)) {
      val iv = spark.read.parquet(intervalDir)
        .select(keyCols.map(col) ++ Seq(col("_lo"), col("_hi")): _*)
      RangeJoin.bucketed(mergedDigest(), "_t", iv, "_lo", "_hi", bucketWidth)
        .groupBy(keyCols.map(col): _*)
        .agg(sum("_n").as("n_events"), sum("_sum").as("sum_value"))
        .select(keyCols.map(col) ++ Seq(col("n_events"),
          col("sum_value")): _*)
    } else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(keyCols.map(StructField(_, LongType)) ++
          Seq(StructField("n_events", LongType),
            StructField("sum_value", LongType))))
    }
}
