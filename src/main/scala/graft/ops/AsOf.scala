package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: attach to every left row the single most recent right row
  * for the same key at-or-before the left row's time — the temporal
  * lookup the reconciliation path performs when it matches a target row
  * against the change stream (latest event ≤ the job's cutoff,
  * `reconciliation_engine.py`'s per-row timestamp comparison), and the
  * standard enrichment step of event analytics.
  *
  * Spark has no ASOF JOIN operator, and expressing it as a range join
  * (`l.key = r.key AND r.ts <= l.ts` + a per-row max) degenerates to a
  * BroadcastNestedLoopJoin or an exploding inner join at scale. This is
  * the scalable re-expression: UNION both sides, ONE shuffle on the key,
  * and a running `last(_, ignoreNulls)` window that carries the latest
  * right payload forward into each left row. Cost: one exchange + one
  * per-partition sort — the same shape as any keyed window, with no
  * range-condition join anywhere (PlanAuditSpec asserts the absence).
  *
  * Ordering within a timestamp tie is total and deterministic: right rows
  * sort before left rows at the same ts (at-or-before = inclusive), and
  * among simultaneous right rows the one with the greatest `rightTie`
  * wins (the LWW rule this engine applies everywhere else).
  */
object AsOf {

  /** Left columns pass through; each of `rightVals` arrives as
    * `<prefix><name>`, NULL when the key has no right row at or before
    * the left timestamp.
    */
  def joinAtOrBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightTie: String,
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_ts", "_side", "_tie", "_rv", "_carry")
    require(!leftCols.exists(reserved.contains),
      s"left frame uses a reserved as-of column name (${reserved.mkString(", ")})")
    // one struct column carries the right payload so a single last()
    // tracks all requested values atomically (no per-column windows)
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightVals.map(v => org.apache.spark.sql.types.StructField(
            v, right.schema(v).dataType)))))
    // drop NULL-key right rows: Window.partitionBy groups NULLs as equal,
    // but the operator's SQL contract (and the LATERAL oracle) is
    // equality semantics, where a NULL key matches nothing — a NULL-key
    // left row must carry NULL asof_ columns, never a NULL-key payload.
    // Same for a NULL right TIMESTAMP: `r.ts <= l.ts` is never true in
    // SQL, but asc ordering sorts a null-_ts row to the partition head,
    // where the running last() would carry its payload into every left
    // row before the first real right timestamp.
    val r = right
      .filter((keys.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("_ts"),
          lit(0).as("_side"),
          col(rightTie).cast("long").as("_tie"),
          struct(rightVals.map(col): _*).as("_rv")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    // right-before-left at equal ts (inclusive as-of); max tie last so the
    // running last() resolves simultaneous right rows by LWW. Null ties
    // sort FIRST: a null LWW position loses to any real one everywhere in
    // this engine (the max_by fold, the DLQ rule) — nulls_last would let
    // a null-tie right row WIN the simultaneous tie-break instead
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_carry", last("_rv", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"_carry.$v").as(s"$prefix$v")): _*)
  }
}
