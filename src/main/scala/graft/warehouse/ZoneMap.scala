package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone maps — per-zone min/max statistics and the predicate pruning
  * they buy: the explicit, auditable version of parquet footer
  * statistics / row-group skipping, and the reason [[ZOrder]] exists
  * (clustering is what makes zone bounds tight). At 100 TB the scan a
  * zone map eliminates is the scan nobody pays for: a manifest of
  * ≤ zones rows decides which files a range predicate can touch before
  * any data is read.
  *
  * [[pruneAudit]] is the honesty instrument: for each predicate it
  * reports zones kept (the manifest decision), rows SCANNED (what the
  * kept zones force you to read) and rows MATCHING (what you actually
  * wanted) — the gap between the two is the clustering quality of the
  * zone key, visible per predicate. A time predicate over time-ordered
  * zones prunes hard; an uncorrelated-column predicate keeps every
  * zone, and the audit SHOWS that, which is the operational signal to
  * re-cluster (Z-order) or add a secondary index.
  *
  * Scale shapes: stats = one zone-keyed partial aggregation; pruning
  * decisions run on the ≤ zones-row stats table; exact counts for all
  * predicates ride ONE pass over the data (a conditional-count
  * aggregate per predicate in a single job).
  */
object ZoneMap {

  /** A closed-range predicate `lo ≤ column ≤ hi` under audit. */
  final case class RangePred(id: String, column: String, lo: Long, hi: Long)

  /** Per-zone statistics: (zone, n_rows, <c>_min, <c>_max per stat
    * column) — the manifest a writer publishes next to its files.
    */
  def zoneStats(df: DataFrame, zone: Column, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one stat column")
    df.groupBy(zone.as("zone"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"))): _*)
  }

  /** The pruning audit: one row per predicate —
    * (pred_id, zones_total, zones_kept, rows_scanned, rows_match).
    * A zone survives `[lo, hi]` iff `max ≥ lo AND min ≤ hi`; kept-zone
    * row counts sum to rows_scanned. No false pruning by construction
    * (a zone containing a match always survives), which the spec
    * asserts as rows_scanned ≥ rows_match.
    */
  def pruneAudit(df: DataFrame, zone: Column,
      preds: Seq[RangePred]): DataFrame = {
    require(preds.nonEmpty, "need at least one predicate")
    val stats = graft.util.Materialize.stable(
      zoneStats(df, zone, preds.map(_.column).distinct))
    // pruning decisions: tiny aggregates over the materialized stats
    val decided = preds.map { p =>
      val keep = col(s"${p.column}_max") >= p.lo && col(s"${p.column}_min") <= p.hi
      stats.agg(
          count(lit(1)).as("zones_total"),
          count(when(keep, 1)).as("zones_kept"),
          coalesce(sum(when(keep, col("n_rows"))), lit(0L)).as("rows_scanned"))
        .select(lit(p.id).as("pred_id"), col("zones_total"),
          col("zones_kept"), col("rows_scanned"))
    }.reduce(_ unionByName _)
    // exact matches for EVERY predicate in one pass, melted to rows
    val exact = df.agg(
        count(when(col(preds.head.column).between(preds.head.lo, preds.head.hi), 1))
          .as("e0"),
        preds.tail.zipWithIndex.map { case (p, i) =>
          count(when(col(p.column).between(p.lo, p.hi), 1)).as(s"e${i + 1}")
        }: _*)
      .select(expr(s"stack(${preds.size}, " +
        preds.zipWithIndex.map { case (p, i) => s"'${p.id}', e$i" }
          .mkString(", ") + ") AS (pred_id, rows_match)"))
    decided.join(broadcast(exact), Seq("pred_id"))
  }
}
