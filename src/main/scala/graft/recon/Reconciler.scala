package graft.recon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source↔target reconciliation, re-expressed as set-at-a-time DataFrame
  * jobs instead of the reference's row-at-a-time probe loops.
  *
  * Reference: `src/services/reconciliation_engine.py` — row-count
  * validation (:61-166), checksum validation via sampled per-pk point
  * lookups (:168-312), mismatch taxonomy
  * `src/models/reconciliation_mismatch.py:15-85`.
  *
  * Scale design: the reference probes each sampled pk with an individual
  * point SELECT (N network round-trips); here one full-outer shuffled join
  * replaces all probes, and `MISSING_IN_SOURCE` falls out for free. Counts
  * are computed as distributed aggregations (no collect until the final
  * scalar). At 100 TB both sides shuffle once on the pk; AQE handles skew.
  */
object Reconciler {

  val MissingInTarget = "MISSING_IN_POSTGRES"   // reference enum names kept
  val MissingInSource = "MISSING_IN_CASSANDRA"
  val DataMismatch    = "DATA_MISMATCH"

  /** Row-count validation (A1): one-row DataFrame with counts, mismatch and
    * drift% rounded to 2 decimals (reference quantizes to 0.01,
    * `reconciliation_engine.py:107-113`).
    */
  def rowCountValidation(source: DataFrame, target: DataFrame): DataFrame = {
    val s = source.agg(count(lit(1)).as("source_count"))
    val t = target.agg(count(lit(1)).as("target_count"))
    s.crossJoin(t)
      .withColumn("mismatch_count", abs(col("source_count") - col("target_count")))
      // (long * 100.0) / long — matches the oracle's literal op order so the
      // single double division is bit-identical across engines.
      // Zero-source guard: x/0 is NULL in non-ANSI Spark, and a NULL drift
      // falls through every alertSeverity threshold — a total source
      // outage (the worst data-loss case) would raise no alert. An empty
      // source with surviving target rows is 100% drift by definition.
      .withColumn("drift_percentage",
        when(col("source_count") === 0,
          when(col("mismatch_count") > 0, lit(100.0)).otherwise(lit(0.0)))
          .otherwise(round(col("mismatch_count") * lit(100.0) / col("source_count"), 2)))
  }

  /** Checksum validation (A2/A3 + J2): full-outer join on `key`, classify
    * each key as missing-in-target / missing-in-source / data-mismatch /
    * match by comparing canonical checksums computed over `hashCols`
    * (caller supplies exact-typed columns, same order both sides).
    */
  def checksumMismatches(
      source: DataFrame, target: DataFrame, key: String,
      hashCols: Seq[String]): DataFrame = {
    def withSum(df: DataFrame, as: String): DataFrame =
      df.select(col(key),
        graft.ops.EventOps.canonicalChecksum(hashCols.map(col)).as(as))
    val s = withSum(source, "source_checksum")
    val t = withSum(target, "target_checksum")
    s.join(t, Seq(key), "full_outer")
      .withColumn("mismatch_type",
        when(col("target_checksum").isNull, lit(MissingInTarget))
          .when(col("source_checksum").isNull, lit(MissingInSource))
          .when(col("source_checksum") =!= col("target_checksum"), lit(DataMismatch))
          .otherwise(lit(null).cast("string")))
      .filter(col("mismatch_type").isNotNull)
  }

  /** Mismatch-type breakdown (A3 tail): counts per taxonomy bucket. */
  def mismatchStats(mismatches: DataFrame): DataFrame =
    mismatches.groupBy("mismatch_type").agg(count(lit(1)).as("n"))

  /** Timestamp-range validation: checksum validation restricted to rows in
    * `[fromUs, toUs)` (reference delegates TIMESTAMP_RANGE to checksum over
    * a window, `reconciliation_engine.py:314-378`).
    */
  def timestampRange(source: DataFrame, target: DataFrame, key: String,
      hashCols: Seq[String], tsUsCol: String, fromUs: Long, toUs: Long): DataFrame = {
    def slice(df: DataFrame) =
      df.filter(col(tsUsCol) >= fromUs && col(tsUsCol) < toUs)
    checksumMismatches(slice(source), slice(target), key, hashCols)
  }

  /** Deterministic sample validation: reference samples N rows then probes
    * (`reconciliation_engine.py:380-408`); we take a deterministic modulus
    * sample (stable across engines, unlike `TABLESAMPLE`) and reuse the
    * join-based classification.
    */
  def sampleValidation(source: DataFrame, target: DataFrame, key: String,
      hashCols: Seq[String], modulus: Long): DataFrame = {
    // Loud guards: a non-numeric key casts to NULL under `%` and
    // `modulus = 0` makes `% === 0` NULL — either silently samples ZERO
    // rows and the validation "passes" without comparing anything.
    require(modulus >= 1, s"sample modulus must be >= 1, got $modulus")
    Seq("source" -> source, "target" -> target).foreach { case (side, df) =>
      require(df.schema(key).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"deterministic modulus sampling requires a numeric key; $side key " +
          s"'$key' is ${df.schema(key).dataType.simpleString} — sample on a " +
          "hash of the key or use timestampRange instead")
    }
    checksumMismatches(
      source.filter(col(key) % modulus === 0),
      target.filter(col(key) % modulus === 0),
      key, hashCols)
  }

  /** Job statistics (A5, `reconciliation_repository.py:402-411`):
    * COUNT / AVG / MAX drift, SUM mismatches, alert count — over a jobs
    * DataFrame with (drift_percentage, mismatch_count, alert_fired).
    *
    * `drift_percentage` is quantized to 0.01 upstream (the reference's
    * `Decimal.quantize`), so the average is computed over exact integer
    * basis points: `sum(round(drift*100)) / (count*100)`. A float `avg`
    * is order-dependent in the last ulp (parallel partial sums), which is
    * visible through `round(_, 4)` — integer summation is associative, so
    * the single trailing double division is bit-stable on any partitioning.
    */
  def jobStatistics(jobs: DataFrame): DataFrame =
    jobs.agg(
      count(lit(1)).as("total_jobs"),
      // denominator counts MEASURED jobs (non-null drift): sum() skips
      // nulls, so dividing by count(*) would bias the average low
      // whenever any job lacks a drift value
      round(sum(round(col("drift_percentage") * 100, 0).cast("long")).cast("double") /
        (count(col("drift_percentage")) * 100), 4).as("avg_drift"),
      max("drift_percentage").as("max_drift"),
      sum("mismatch_count").as("total_mismatches"),
      sum(when(col("alert_fired"), 1).otherwise(0)).as("alerts_fired"))

  /** Alert severity per reference thresholds (warn ≥1%, crit ≥5%,
    * `src/services/alert_service.py:24-25,62-67`).
    */
  def alertSeverity(drift: Column): Column =
    when(drift >= 5.0, lit("critical"))
      .when(drift >= 1.0, lit("warning"))
      .otherwise(lit(null).cast("string"))
}
