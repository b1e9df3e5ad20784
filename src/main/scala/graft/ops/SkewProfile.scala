package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight key-distribution audit for join/aggregation planning: the
  * measurement that decides between a plain equi-join, a broadcast, and
  * the salted two-phase variants ([[graft.ops.Lww.latestPerKeySalted]],
  * AQE skew splits) BEFORE a 100 TB shuffle is committed. The profile
  * is one partial-agg shuffle on the key plus a bounded TakeOrdered —
  * cheap enough to run as a scheduled audit next to the pipeline it
  * protects.
  *
  * Columns per heavy key: `n_rows`, `share_permille` (share of all
  * rows), `hot_factor_permille` (n_rows ÷ the uniform per-key
  * expectation, ×1000 — 1000 = perfectly uniform; a key at 50000 owns
  * 50× its fair share and WILL own the shuffle's straggler task), plus
  * the table-wide `n_keys`/`n_total` context. Products compute in
  * DECIMAL(38,0) (n_rows · n_keys exceeds int64 well inside the design
  * regime — the χ² lesson) with the final ratios back in BIGINT.
  */
object SkewProfile {

  def keySkewProfile(df: DataFrame, keyCol: Column, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be positive, got $topN")
    val counts = graft.util.Materialize.stable(
      df.select(keyCol.as("key")).filter(col("key").isNotNull)
        .groupBy("key").agg(count(lit(1)).as("n_rows")))
    val totals = counts.agg(count(lit(1)).as("n_keys"),
      sum("n_rows").as("n_total"))
    // TakeOrdered top-N (never a global sort); the rank window runs over
    // the already-bounded N rows
    import org.apache.spark.sql.expressions.Window
    counts.orderBy(col("n_rows").desc, col("key")).limit(topN)
      .crossJoin(broadcast(totals))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n_rows").desc, col("key"))).cast("long"))
      .withColumn("share_permille",
        expr("(CAST(n_rows AS DECIMAL(38,0)) * 1000) div n_total"))
      .withColumn("hot_factor_permille",
        expr("(CAST(n_rows AS DECIMAL(38,0)) * n_keys * 1000) div n_total"))
      .select("key", "rank", "n_rows", "share_permille",
        "hot_factor_permille", "n_keys", "n_total")
  }
}
