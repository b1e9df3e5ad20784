package graft.recon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delivery-completeness audits over a monotone sequence column (CDC
  * event id / log offset): the two failure modes an at-least-once
  * pipeline must MEASURE rather than assume away — lost ranges (gaps
  * in the sequence) and duplicate deliveries (the same id applied
  * more than once). Together with [[Integrity]] (cross-table shape)
  * and [[Reconciler]] (row content) this completes the validation
  * stack: content, shape, and transport.
  */
object Completeness {

  /** The largest `topK` gap ranges in a sequence column — "which offset
    * ranges were lost", not just how many. Decomposed so nothing
    * corpus-sized is globally sorted: ids sort WITHIN `bucketSize`-wide
    * buckets (partitioned windows), and only the per-bucket (min, max)
    * summary — one row per non-empty bucket — crosses buckets via an
    * ordered window, which also yields ranges spanning entirely-empty
    * buckets. Size `bucketSize` so the summary table stays small
    * (id-range ÷ bucketSize rows — the documented knob; the summary
    * window is single-partition).
    *
    * Output: (gap_start, gap_end, gap_len), the topK by (len desc,
    * start asc) — a bounded TakeOrdered.
    */
  def gapRanges(df: DataFrame, seqCol: Column, topK: Int,
      bucketSize: Long = 1L << 20): DataFrame = {
    require(topK >= 1, s"topK must be positive, got $topK")
    require(bucketSize >= 2, s"bucketSize must be >= 2, got $bucketSize")
    import org.apache.spark.sql.expressions.Window
    val ids = graft.util.Materialize.stable(
      df.select(seqCol.as("id")).filter(col("id").isNotNull).distinct()
        .withColumn("_b", expr(s"id div ${bucketSize}L")))
    val wIn = Window.partitionBy("_b").orderBy("id")
    val inner = ids.withColumn("_p", lag("id", 1).over(wIn))
      .filter(col("_p").isNotNull && col("id") > col("_p") + 1)
      .select((col("_p") + 1).as("gap_start"), (col("id") - 1).as("gap_end"))
    val summary = ids.groupBy("_b")
      .agg(min("id").as("_mn"), max("id").as("_mx"))
    val wB = Window.orderBy("_b")
    val boundary = summary.withColumn("_pmx", lag("_mx", 1).over(wB))
      .filter(col("_pmx").isNotNull && col("_mn") > col("_pmx") + 1)
      .select((col("_pmx") + 1).as("gap_start"), (col("_mn") - 1).as("gap_end"))
    inner.unionByName(boundary)
      .withColumn("gap_len", col("gap_end") - col("gap_start") + 1)
      .orderBy(col("gap_len").desc, col("gap_start")).limit(topK)
  }

  /** Duplicate-delivery profile per group: how often the same sequence
    * id arrived more than once, and how bad the worst id is — the
    * at-least-once redelivery rate the idempotent-sink contract
    * absorbs. One (group, id) partial-agg pass + one group rollup.
    * Output: (groupCol, n_rows, n_ids, n_dup_ids, n_extra_rows,
    * max_copies, dup_permille = extra rows per-mille of deliveries).
    */
  def duplicateDeliveryAudit(df: DataFrame, seqCol: Column,
      groupCol: String): DataFrame =
    df.select(col(groupCol), seqCol.as("_id"))
      .groupBy(groupCol, "_id").agg(count(lit(1)).as("_c"))
      .groupBy(groupCol)
      .agg(sum("_c").as("n_rows"), count(lit(1)).as("n_ids"),
        sum(when(col("_c") > 1, 1L).otherwise(0L)).as("n_dup_ids"),
        sum(col("_c") - 1).as("n_extra_rows"),
        max("_c").as("max_copies"))
      .withColumn("dup_permille", expr("(1000 * n_extra_rows) div n_rows"))
}
