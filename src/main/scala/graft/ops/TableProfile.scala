package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic per-column data profiler — the "what is in this table"
  * pre-flight every warehouse runs before pointing a pipeline at an
  * unfamiliar 100 TB path: row count, null count, exact distinct count
  * and min/max per column, long-format one row per column.
  *
  * Scale shape: ONE scan. All per-column aggregates ride a single
  * `agg(...)`; the multi-`count(distinct)` compiles to Spark's Expand
  * strategy — the scan is read once and expanded ×k in-task (k =
  * profiled columns), each leg partial-aggregating map-side before the
  * single gather. That ×k expansion is the exact-answer price; when an
  * estimate suffices at full scale, [[graft.sketch.Sketches.hllRegisters]]
  * profiles distincts per column in one un-expanded pass — this exact
  * profiler is the calibration reference in the family's
  * estimate-next-to-exact discipline.
  *
  * min/max are cast to string for the uniform long-format schema.
  * Callers profile DOUBLE or TIMESTAMP columns through a deterministic
  * integer derivation (epoch-µs, per-mille), never a raw double→string
  * render — the repo-wide oracle-parity rule.
  */
object TableProfile {

  /** One row per profiled column:
    * (col_name, n_rows, n_nonnull, n_distinct, min_s, max_s).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(cols.forall(c => !c.contains("'") && !c.contains("`")),
      s"column names must not contain quotes: $cols")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"_nn_$c"),
      countDistinct(col(c)).as(s"_nd_$c"),
      min(col(c)).cast("string").as(s"_mn_$c"),
      max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val legs = cols.map(c =>
      s"'$c', _n, _nn_$c, _nd_$c, _mn_$c, _mx_$c").mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $legs) AS " +
      "(col_name, n_rows, n_nonnull, n_distinct, min_s, max_s)")
  }
}
