package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: rate-based
  * stratified sampling and exact-k-per-stratum selection.
  *
  * Everything keys off a CONTENT hash, never `rand()`: the sample is
  * reproducible across runs, clusters, and engines (the DuckDB oracle
  * computes the identical md5 arithmetic), re-running a pipeline stage
  * re-selects the same rows (idempotent restarts), and upstream
  * repartitioning cannot change the sample — the properties a 100 TB
  * curation run actually needs from a sampler. `rand(seed)` gives none of
  * them (it is seeded per-partition, so any change in partitioning
  * reshuffles the sample).
  */
object Sampling {

  /** Deterministic per-mille bucket in [0, 1000) from a key's md5 —
    * the first 8 hex chars as an int64 (the [[Dedup.tokenHash]] idiom),
    * mod 1000. Uniform to ~2⁻³² for any key set.
    */
  def hashPermille(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"), lit(1000L))

  /** Rate-based stratified sample: keep a row iff its key's per-mille
    * bucket falls under its stratum's rate (`rates`, defaulting to
    * `defaultPermille`). A pure codegen'd filter — no shuffle, no state,
    * trivially parallel at any scale; downsampling a stratum never looks
    * at other strata's rows.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashPermille(col(keyCol)) < rate)
  }

  /** Exactly `k` rows per stratum, chosen by hash order (ties broken by
    * the key itself, so selection is total and deterministic). The rank
    * filter compiles to Spark's WindowGroupLimit physical rewrite: each
    * map task pre-limits its partition to k rows per stratum BEFORE the
    * exchange, so the shuffle carries O(strata × k × tasks), not the
    * corpus — the scale path for "give me k exemplars per source".
    */
  def exactKPerStratum(df: DataFrame, keyCol: String, strataCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashPermille(col(keyCol)), col(keyCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Data-mixing weights: per-stratum doc/token totals plus the integer
    * per-mille sampling rate that downsamples each stratum to (at most)
    * `tokenBudget` tokens — the "cap every source/domain at B tokens"
    * step of corpus mixing. The output is a tiny per-stratum table; the
    * rates feed [[stratifiedSample]] directly, so the whole mix pipeline
    * is one map-side-partial aggregation here plus one shuffle-free
    * filter there — no per-row state, no skew exposure beyond the
    * aggregation's own partial combine.
    *
    * All-integer arithmetic (`div`, `least`) so the mix plan is exact,
    * reproducible, and engine-portable. A stratum already under budget
    * gets rate 1000 (keep everything).
    */
  def mixWeights(df: DataFrame, strataCol: String, weight: Column,
      tokenBudget: Long): DataFrame =
    df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(weight.cast("long")).as("n_tokens"))
      .withColumn("rate_permille",
        least(lit(1000L), expr(s"${tokenBudget}L * 1000 div n_tokens")))
}
