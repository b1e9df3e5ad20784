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

  /** Pairwise Pearson correlation over INTEGER columns, from exact
    * DECIMAL(38,0) sums — the feature-redundancy pre-flight (two
    * near-perfectly-correlated columns carry one signal; a mixing or
    * quality model should not count it twice). NOT `corr()`: the
    * built-in accumulates in floating point, so its result depends on
    * partitioning/merge order and can never oracle-match — here every
    * Σx, Σy, Σxy, Σx², Σy² is an exact integer, and the only floating
    * step is the final r = cov/√(varx·vary) computed once from those
    * exact sums (cast-to-double of exact integers + IEEE mul/div/sqrt
    * are correctly rounded, so the double is bit-identical cross-engine
    * — the repo's exact-DECIMAL-sums-cast-to-DOUBLE-at-the-end rule).
    *
    * Rows where either side is NULL are excluded pairwise. Callers feed
    * integer derivations (cents, per-mille, epoch-µs), never raw
    * doubles. Scale shape: ONE scan, all pairs ride a single partial
    * agg; output one row per pair. Int64 inputs with |x| up to ~1e18
    * are safe: per-row products land in DECIMAL(38,0) and a 100 TB
    * row count (~1e14) keeps n·Σxy under 10³⁸.
    */
  def pearsonCorr(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "profile at least one column pair")
    require(pairs.forall { case (a, b) =>
      !s"$a$b".contains("'") && !s"$a$b".contains("`") },
      s"column names must not contain quotes: $pairs")
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val both = col(x).isNotNull && col(y).isNotNull
      def dec(c: String) = expr(s"CAST($c AS DECIMAL(38,0))")
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"_n_$i"),
        sum(when(both, dec(x)).otherwise(lit(null))).as(s"_sx_$i"),
        sum(when(both, dec(y)).otherwise(lit(null))).as(s"_sy_$i"),
        sum(when(both, dec(x) * col(y)).otherwise(lit(null))).as(s"_sxy_$i"),
        sum(when(both, dec(x) * col(x)).otherwise(lit(null))).as(s"_sxx_$i"),
        sum(when(both, dec(y) * col(y)).otherwise(lit(null))).as(s"_syy_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val withR = pairs.indices.foldLeft(one) { (acc, i) =>
      acc.withColumn(s"_corr_$i", expr(
        s"""CASE WHEN _n_$i < 2
           |  OR _n_$i * _sxx_$i = _sx_$i * _sx_$i
           |  OR _n_$i * _syy_$i = _sy_$i * _sy_$i THEN NULL
           |ELSE CAST(_n_$i * _sxy_$i - _sx_$i * _sy_$i AS DOUBLE)
           |  / sqrt(CAST(_n_$i * _sxx_$i - _sx_$i * _sx_$i AS DOUBLE)
           |       * CAST(_n_$i * _syy_$i - _sy_$i * _sy_$i AS DOUBLE))
           |END""".stripMargin.replace("\n", " ")))
    }
    val legs = pairs.zipWithIndex.map { case ((x, y), i) =>
      s"'$x', '$y', _n_$i, _corr_$i" }.mkString(", ")
    withR.selectExpr(s"stack(${pairs.size}, $legs) AS " +
      "(x_col, y_col, n, corr)")
  }
}
