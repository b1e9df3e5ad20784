package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history from a CDC change stream —
  * the warehouse-side materialization every CDC pipeline eventually
  * grows (the reference replicates LATEST state per key; SCD2 is the
  * same stream folded into validity intervals instead of a last-write
  * fold, cf. reference sink semantics at connect/sink.properties:30-38).
  *
  * Each change event becomes one version row valid from its own change
  * time until the key's NEXT change (`lead` over the per-key change
  * order); delete events CLOSE the preceding version's interval but
  * emit no version row themselves — after a delete, the key simply has
  * no current version until a later re-insert opens one.
  *
  * Scale shape: ONE window over (key, changeOrder) — partitioned by the
  * key, so state is bounded by a single key's version count, never a
  * global sort. All interval arithmetic is integer epoch-µs.
  */
object Scd {

  /** Fold a change stream into SCD2 version rows.
    *
    * @param changes     the change stream (one row per change event)
    * @param keyCols     business key columns
    * @param orderCols   total per-key change order (e.g. ts_us, event_id)
    * @param tsUsCol     the change timestamp column (epoch µs) that
    *                    bounds validity intervals
    * @param isDelete    predicate marking delete/tombstone events
    * @param payloadCols version payload columns to carry
    * @return one row per non-delete change: keys, payload,
    *         `valid_from_us`, `valid_to_us` (NULL = open), `is_current`
    */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], tsUsCol: String, isDelete: Column,
      payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    changes
      .withColumn("_del", isDelete)
      .withColumn("valid_to_us", lead(col(tsUsCol), 1).over(w))
      .filter(!col("_del"))
      .select(keyCols.map(col) ++ payloadCols.map(col) ++ Seq(
        col(tsUsCol).as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current")): _*)
  }

  /** Point-in-time (AS OF) lookup against an [[scd2History]] table: the
    * version live at instant `tUs` per key — `valid_from ≤ t < valid_to`
    * with an open interval counting as live. A key deleted before `t`
    * (its last version's interval closed by the delete) yields no row,
    * exactly the reference's read-after-delete semantics. Pure filter —
    * pushes into the history scan, no shuffle of its own.
    */
  def asOf(history: DataFrame, tUs: Long): DataFrame =
    history.filter(col("valid_from_us") <= tUs &&
      (col("valid_to_us").isNull || col("valid_to_us") > tUs))
}
