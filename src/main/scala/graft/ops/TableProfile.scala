package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Functional-dependency audit: does `lhsCol` determine `rhsCol`?
    * One row: (lhs_col, rhs_col, n_lhs, n_violating, max_rhs_distinct)
    * — n_violating counts lhs values mapping to MORE than one distinct
    * rhs (0 = the FD holds), max_rhs_distinct bounds how badly the
    * worst key fans out. The denormalization/join-safety pre-flight: an
    * FD that holds makes the rhs a lookup (broadcastable dimension); a
    * violated "key" silently duplicates rows through every join that
    * assumes it. NULL rhs counts as a value (a key mapping to {x, NULL}
    * is two behaviors, which IS a violation worth surfacing). The NULL
    * sentinel is the NUL character followed by "null" (written as an
    * escape so this source file stays text) and the oracle renders the
    * byte-identical `chr(0) || 'null'` — a printable rhs value can
    * never collide with it on either engine.
    *
    * Scale shape: one (lhs)-keyed partial-agg pass (count_distinct
    * two-level) folded into a single-row rollup — no corpus-sized
    * output ever.
    */
  def fdAudit(df: DataFrame, lhsCol: String, rhsCol: String): DataFrame =
    df.select(col(lhsCol).as("_l"),
        coalesce(col(rhsCol).cast("string"), lit("\u0000null")).as("_r"))
      .groupBy("_l").agg(countDistinct(col("_r")).as("_nd"))
      .agg(count(lit(1)).as("n_lhs"),
        sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("n_violating"),
        max("_nd").as("max_rhs_distinct"))
      .select(lit(lhsCol).as("lhs_col"), lit(rhsCol).as("rhs_col"),
        col("n_lhs"), col("n_violating"), col("max_rhs_distinct"))

  /** Exact ROC-AUC of an integer score against a boolean label — the
    * Mann-Whitney U statistic with the standard tie correction (tied
    * scores contribute half), computed from per-score counts:
    *   AUC = Σ_s pos_s · (neg_below_s + neg_s/2) / (P·N)
    * evaluated in exact integer arithmetic as
    *   auc_num = Σ_s pos_s · (2·neg_below_s + neg_s),  AUC = num/(2·P·N)
    * and reported as fixed-point per-mille / ×1e6 values (never a
    * rounded float — the repo's oracle-parity rule). The calibration
    * audit for every scoring rule in the quality family: does the
    * score actually RANK the positives above the negatives, not just
    * bucket them ([[graft.llm.QualityRules]]' quantile calibration
    * shows the buckets; this is the single-number ranking summary).
    *
    * Scale shape: the ONLY corpus-sized pass is one partial agg keyed
    * by score; the cumulative walk and its orderBy run over the SCORE
    * table. The contract is a bounded-cardinality integer score
    * (per-mille rates, fixed-point features — a few thousand distinct
    * values), so the global sort is register-sized, never corpus-sized
    * (the log-histogram discipline applied to ranking audits).
    * Products run in DECIMAL(38,0): P·N at 100 TB (~1e14 rows ⇒
    * ~1e28) exceeds int64 a billion-fold. Rows with a NULL score or
    * label are excluded (they have no rank); auc_* are NULL when
    * either class is empty (AUC undefined).
    * Output one row per group (one row total when `groups` is empty):
    * (groups…, n_pos, n_neg, auc_permille, auc_x1e6).
    *
    * Grouped form: pass `groups` to audit the score per segment
    * (per source, per language) — "which feeds does this score rank
    * well on" next to the corpus-wide number. The window partitions by
    * the group columns, so each partition is still score-bounded.
    *
    * The bounded-cardinality contract is ENFORCED, not assumed: the
    * cumulative walk's window sorts the (groups × distinct-scores)
    * table inside single tasks, which is safe only while that table is
    * register-sized. A caller wiring a raw-logit scorer (distinct
    * scores ≈ corpus size) would silently turn the walk into a
    * one-task corpus-sized sort — so [[boundedScoreTable]] counts the
    * score table EAGERLY and refuses loudly past `maxDistinctScores`
    * BEFORE the window job is submitted. The check is one extra
    * partial-agg pass over the input (the score table itself is never
    * materialized, keeping the returned plan — and the seam's
    * MapPartitions stage — intact); that pre-flight pass is the
    * deliberate price of never launching an unbounded sort at 100 TB.
    */
  /** Eagerly asserts the per-score partial-agg table is register-sized
    * (≤ `maxDistinct` rows) before any caller windows over it. Returns
    * the UNTOUCHED lazy frame — the check recomputes the upstream once
    * rather than checkpointing it, so plan shape (and the classifier
    * seam's MapPartitions stage) survives into the final job.
    */
  private def boundedScoreTable(byScore: DataFrame, maxDistinct: Long,
      who: String): DataFrame = {
    require(maxDistinct >= 1, s"$who: maxDistinctScores must be >= 1")
    val n = byScore.count()
    require(n <= maxDistinct,
      s"$who: $n distinct (group, score) rows exceed the declared bound " +
        s"of $maxDistinct — the cumulative walk would sort a " +
        "non-register-sized table inside one task. Quantize the score " +
        "(integer per-mille / fixed-point div) or raise maxDistinctScores " +
        "only if the table provably stays bounded at full scale.")
    byScore
  }

  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column,
      groups: Seq[String] = Seq.empty,
      maxDistinctScores: Long = 100000L): DataFrame =
    rocAucFromCounts(df
      .select(groups.map(col) ++ Seq(scoreCol.cast("long").as("_s"),
        labelCol.cast("boolean").as("_y")): _*)
      .filter(col("_s").isNotNull && col("_y").isNotNull)
      .groupBy(groups.map(col) :+ col("_s"): _*).agg(
        sum(when(col("_y"), 1L).otherwise(0L)).as("_np"),
        sum(when(col("_y"), 0L).otherwise(1L)).as("_nn")),
      groups, maxDistinctScores)

  /** The [[rocAuc]] walk over an ALREADY-AGGREGATED per-score count
    * table `(groups…, _s, _np, _nn)` — the seam that lets a streaming
    * register store ([[graft.streaming.StreamingCalibration]]) sum-merge
    * per-batch score counts and grade the folded table with EXACTLY the
    * walk the batch audit runs (one code path, so the live panel cannot
    * drift from the one-pass number). Same bounded pre-flight; input
    * rows must be unique per (groups, _s) — a duplicate score row would
    * double-count silently, so merge registers BEFORE calling.
    */
  def rocAucFromCounts(byScoreCounts: DataFrame,
      groups: Seq[String] = Seq.empty,
      maxDistinctScores: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groups.map(col)
    val byScore =
      boundedScoreTable(byScoreCounts, maxDistinctScores, "rocAuc")
    val w = Window.partitionBy(g: _*).orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    def auc(scale: String, name: String) = expr(
      s"""CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |ELSE CAST($scale * _num div
         |  (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)
         |END""".stripMargin.replace("\n", " ")).as(name)
    byScore
      .withColumn("_cnb", coalesce(sum("_nn").over(w), lit(0L)))
      .groupBy(g: _*)
      .agg(sum("_np").as("n_pos"), sum("_nn").as("n_neg"),
        sum(expr("CAST(_np AS DECIMAL(38,0)) * (2 * _cnb + _nn)")).as("_num"))
      .select(g ++ Seq(col("n_pos"), col("n_neg"),
        auc("1000", "auc_permille"), auc("1000000", "auc_x1e6")): _*)
  }

  /** Classifier operating-point table — the decision [[rocAuc]] ranks
    * but cannot make: for EVERY candidate threshold s (each distinct
    * score value; predict positive when score ≥ s), the confusion
    * counts and integer per-mille precision / recall / F1. This is how
    * a score becomes a filter (FineWeb-Edu ships "keep score ≥ 3" —
    * that 3 comes from exactly this table), and emitting every
    * operating point instead of one argmax keeps the precision/recall
    * trade visible to the operator choosing it.
    *
    * Scale shape: the [[rocAuc]] discipline — the ONLY corpus-sized
    * pass is one partial agg keyed by score; the cumulative
    * descending-score walk runs over the score-bounded table. All
    * integer: f1 uses the 2·tp div (2·tp + fp + fn) identity so no
    * intermediate ratio rounds twice. Rows with a NULL score or label
    * are excluded; precision is always defined (tp+fp=0 cannot happen
    * since every threshold is an observed score); recall is NULL on an
    * all-negative corpus (p = 0); f1 is 0 when tp = 0.
    * Output one row per distinct score:
    * (threshold, tp, fp, fn, tn, precision_permille, recall_permille,
    * f1_permille).
    *
    * Bounded by construction, not convention: the same eager
    * [[boundedScoreTable]] pre-flight as [[rocAuc]] — a raw-logit
    * scorer fails loudly before the descending walk is submitted.
    */
  def operatingPoints(df: DataFrame, scoreCol: Column,
      labelCol: Column, maxDistinctScores: Long = 100000L): DataFrame =
    operatingPointsFromCounts(df
      .select(scoreCol.cast("long").as("threshold"),
        labelCol.cast("boolean").as("_y"))
      .filter(col("threshold").isNotNull && col("_y").isNotNull)
      .groupBy("threshold").agg(
        sum(when(col("_y"), 1L).otherwise(0L)).as("_np"),
        sum(when(col("_y"), 0L).otherwise(1L)).as("_nn")),
      maxDistinctScores)

  /** The [[operatingPoints]] walk over an already-aggregated
    * `(threshold, _np, _nn)` count table — the [[rocAucFromCounts]]
    * seam for the decision table; same uniqueness and bound contract.
    */
  def operatingPointsFromCounts(byScoreCounts: DataFrame,
      maxDistinctScores: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore =
      boundedScoreTable(byScoreCounts, maxDistinctScores, "operatingPoints")
    // tp/fp at threshold s = positives/negatives with score >= s: a
    // cumulative sum over the DESCENDING score walk (current row incl.)
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    byScore
      .withColumn("_tp", sum("_np").over(w))
      .withColumn("_fp", sum("_nn").over(w))
      .crossJoin(broadcast(byScore.agg(sum("_np").as("_p"), sum("_nn").as("_n"))))
      .select(col("threshold"),
        col("_tp").as("tp"), col("_fp").as("fp"),
        (col("_p") - col("_tp")).as("fn"),
        (col("_n") - col("_fp")).as("tn"),
        expr("_tp * 1000 div (_tp + _fp)").as("precision_permille"),
        // recall is undefined on an all-negative corpus (p = 0) — NULL,
        // stated explicitly because ANSI `div 0` would throw mid-scan
        expr("CASE WHEN _p = 0 THEN NULL ELSE _tp * 1000 div _p END")
          .as("recall_permille"),
        expr("2 * _tp * 1000 div (2 * _tp + (_fp) + (_p - _tp))")
          .as("f1_permille"))
  }

  /** Equi-width histogram of an integer column over a CALLER-DECLARED
    * [lo, hi) range: `bucket = (v−lo)·n div (hi−lo)`, clamped into
    * [0, n), with rows outside the range counted in the edge buckets
    * (an audit that silently drops out-of-range rows hides exactly the
    * outliers it should surface). Declared bounds — not data-derived
    * min/max — so the bucket edges are stable across snapshots and two
    * runs' histograms are comparable bar-for-bar; pair with
    * [[columnProfile]]'s min/max to choose them. All-integer and ONE
    * partial-agg pass; ≤ n output rows. Empty buckets are emitted with
    * count 0 (a gap IS information), via a buckets-sized union scaffold.
    * Output: (bucket, lo_v, hi_v, n_rows).
    */
  def histogram(df: DataFrame, valueCol: Column, lo: Long, hi: Long,
      buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 10000, s"1..10000 buckets, got $buckets")
    require(lo < hi && hi - lo > 0,
      s"need lo < hi with a range that fits int64, got [$lo, $hi)")
    val width = hi - lo
    val counts = df.select(valueCol.cast("long").as("_v"))
      .filter(col("_v").isNotNull)
      .withColumn("bucket", bucketExpr(lo, hi, buckets))
      .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
    val scaffold = df.sparkSession.range(buckets).select(col("id").as("bucket"))
    scaffold.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        bucketEdge(lo, width, buckets, "bucket").as("lo_v"),
        bucketEdge(lo, width, buckets, "(bucket + 1)").as("hi_v"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }

  /** The declared-bounds integer bucket id of `_v`, overflow-free for
    * ANY int64 input: `_v` is clamped into [lo, hi−1] BEFORE the
    * multiply (same final bucket as multiply-then-clamp — below-range
    * lands in 0, at-or-above-range in buckets−1 — but the intermediate
    * `(_v − lo) · buckets` can no longer wrap past int64 for extreme
    * scores, which used to misplace exactly the out-of-range rows the
    * audits exist to surface). The bounded product — ≤ (width−1)·10⁴ ≈
    * 10²³ for a full-int64 width — runs in DECIMAL(38,0), the repo's
    * exact-integer discipline; the final id < buckets casts back to
    * BIGINT losslessly.
    */
  private def bucketExpr(lo: Long, hi: Long, buckets: Int): Column =
    expr(s"""CAST((CAST(least(${longLit(hi - 1)}, greatest(${longLit(lo)},
      | _v)) AS DECIMAL(38,0)) - ${longLit(lo)}) * $buckets
      | div ${longLit(hi - lo)} AS BIGINT)"""
      .stripMargin.replace("\n", " "))

  /** Bucket-edge value `lo + idx·width div buckets` with the product in
    * DECIMAL(38,0) (idx·width overflows int64 for near-full-range
    * widths); the edge itself is within [lo, hi] so the BIGINT cast is
    * exact.
    */
  private def bucketEdge(lo: Long, width: Long, buckets: Int,
      idx: String): Column =
    expr(s"CAST(${longLit(lo)} + CAST($idx AS DECIMAL(38,0)) * " +
      s"${longLit(width)} div $buckets AS BIGINT)")

  /** An int64 literal rendered so the SQL parser accepts ANY value:
    * `Long.MinValue` written as `-9223372036854775808L` fails to parse
    * (the positive literal overflows before unary minus applies), so
    * extremes go through a constant-folded string cast.
    */
  private def longLit(x: Long): String =
    if (x == Long.MinValue) s"CAST('$x' AS BIGINT)" else s"${x}L"

  /** Classifier reliability curve — the third leg of the calibration
    * story ([[rocAuc]] grades the RANKING, [[operatingPoints]] the
    * DECISION, this the PROBABILITY): bucket the score on the
    * [[histogram]]'s declared-bounds integer arithmetic and report each
    * bucket's empirical positive rate. A well-calibrated score's
    * pos_permille rises with the bucket; a flat curve means the score
    * orders but its magnitude is meaningless (use rank-derived
    * thresholds); a non-monotone segment localizes WHERE the score
    * lies. Declared [lo, hi) bounds — not data-derived — so two
    * snapshots' curves compare bar-for-bar; out-of-range scores clamp
    * into the edge buckets (they are exactly the miscalibration to
    * surface). Empty buckets emit n=0 with NULL rate (a gap IS
    * information); NULL scores/labels are excluded.
    *
    * Scale shape: ONE partial-agg pass keyed by the ≤`buckets`-valued
    * bucket id, plus the buckets-sized scaffold join — nothing
    * corpus-sized crosses partitions. Output: (bucket, lo_v, hi_v, n,
    * n_pos, pos_permille).
    */
  def reliabilityCurve(df: DataFrame, scoreCol: Column, labelCol: Column,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 10000, s"1..10000 buckets, got $buckets")
    require(lo < hi && hi - lo > 0,
      s"need lo < hi with a range that fits int64, got [$lo, $hi)")
    val counts = df
      .select(scoreCol.cast("long").as("_v"), labelCol.cast("boolean").as("_y"))
      .filter(col("_v").isNotNull && col("_y").isNotNull)
      .withColumn("bucket", bucketExpr(lo, hi, buckets))
      .groupBy("bucket").agg(count(lit(1)).as("n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos"))
    reliabilityAssemble(counts, lo, hi, buckets)
  }

  /** The [[reliabilityCurve]] panel over an ALREADY-AGGREGATED per-score
    * count table `(_s, _np, _nn)` — the third calibration leg's
    * streaming seam (joining [[rocAucFromCounts]] and
    * [[operatingPointsFromCounts]]): the per-score counts are the
    * sufficient statistic for the bucket rates too, so a register store
    * sum-merges batches and this re-buckets the merged table with the
    * SAME declared-bounds arithmetic and assembly as the batch panel
    * (shared [[reliabilityAssemble]] — the live curve cannot drift).
    * One bucket-keyed partial agg over the score-bounded input; no
    * cardinality pre-flight is needed because nothing here windows —
    * the output is `buckets`-sized regardless of input cardinality.
    * Duplicate `_s` rows would double-count: merge registers first.
    */
  def reliabilityCurveFromCounts(byScoreCounts: DataFrame,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 10000, s"1..10000 buckets, got $buckets")
    require(lo < hi && hi - lo > 0,
      s"need lo < hi with a range that fits int64, got [$lo, $hi)")
    val counts = byScoreCounts
      .select(col("_s").as("_v"), col("_np"), col("_nn"))
      .filter(col("_v").isNotNull)
      .withColumn("bucket", bucketExpr(lo, hi, buckets))
      .groupBy("bucket").agg(sum(expr("_np + _nn")).as("n"),
        sum("_np").as("n_pos"))
    reliabilityAssemble(counts, lo, hi, buckets)
  }

  /** Shared final assembly of the reliability panel from a
    * (bucket, n, n_pos) count table: the buckets-sized scaffold join,
    * edge values, and the empty-bucket NULL-rate contract — ONE code
    * path for the batch and from-counts entries.
    */
  private def reliabilityAssemble(counts: DataFrame, lo: Long, hi: Long,
      buckets: Int): DataFrame = {
    val width = hi - lo
    val scaffold =
      counts.sparkSession.range(buckets).select(col("id").as("bucket"))
    scaffold.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        bucketEdge(lo, width, buckets, "bucket").as("lo_v"),
        bucketEdge(lo, width, buckets, "(bucket + 1)").as("hi_v"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        expr("CASE WHEN n IS NULL THEN NULL ELSE n_pos * 1000 div n END")
          .as("pos_permille"))
  }

  /** SCORE ECDF normalization table: per distinct integer score, the
    * per-mille empirical-CDF rank `(# rows with score ≤ s) · 1000 div
    * total` — the rank-normalizer that makes heterogeneous quality
    * scores mixable (a Gopher pass-rate and a classifier logit live on
    * different scales; their ECDF ranks live on the same [0, 1000]).
    * Join the output back on the score column to re-score a corpus, or
    * read thresholds off it directly (the "keep the top 30 %" cut is
    * the first score with ecdf_permille > 700).
    *
    * Scale shape: the [[rocAuc]] discipline verbatim — ONE corpus-sized
    * partial agg keyed by score, then the cumulative walk over the
    * score-bounded table, with the same eager cardinality pre-flight
    * ([[boundedScoreTable]]) so a raw-logit scorer refuses loudly
    * instead of sorting the corpus in one task. NULL scores are
    * excluded (they have no rank). Output: (score, n, cum_n,
    * ecdf_permille), ascending-complete over observed scores.
    */
  def scoreEcdf(df: DataFrame, scoreCol: Column,
      maxDistinctScores: Long = 100000L): DataFrame =
    scoreEcdfFromCounts(
      df.select(scoreCol.cast("long").as("score"))
        .filter(col("score").isNotNull)
        .groupBy("score").agg(count(lit(1)).as("n")),
      maxDistinctScores)

  /** The [[scoreEcdf]] walk over an ALREADY-AGGREGATED per-score count
    * table `(score, n)` — the fourth walk the streaming calibration
    * registers feed (AUC, operating points, reliability, and now the
    * rank normalizer, all from the ONE sufficient statistic). Same
    * bounded pre-flight, same one-code-path contract: rows must be
    * unique per score (merge registers first).
    */
  def scoreEcdfFromCounts(byScoreCounts: DataFrame,
      maxDistinctScores: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore =
      boundedScoreTable(byScoreCounts, maxDistinctScores, "scoreEcdf")
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("_total", sum("n").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("score"), col("n"), col("cum_n"),
        expr("cum_n * 1000 div _total").as("ecdf_permille"))
  }

  /** Per-group time trend of an integer metric: OLS slope over the
    * DAILY means, reported as the exact integer (numerator,
    * denominator) pair `slope = num/den` — never a rounded division,
    * so the sign and magnitude are oracle-exact and the caller divides
    * at whatever precision it wants. The drift monitor for "is this
    * stream's value/quality moving over time" (a negative num with
    * den > 0 is decay; the χ²/MAD audits say *different*, this says
    * *which way*).
    *
    * Days are re-based to each group's first day before the Σ's, so
    * the integers stay small (t ≤ day span, y = daily mean of the
    * metric). Scale shape: one (group, day) partial-agg pass over the
    * corpus collapses to the daily table (groups × days rows); the
    * re-base min and the five Σ's run on that register-sized table
    * only. Output: (groups…, n_days, slope_num, slope_den).
    */
  def dailyTrend(df: DataFrame, groups: Seq[String], dayCol: String,
      valueCol: Column): DataFrame = {
    require(groups.nonEmpty, "need at least one grouping column")
    val g = groups.map(col)
    val daily = df
      .select(g :+ col(dayCol).cast("long").as("_d") :+
        valueCol.cast("long").as("_v"): _*)
      .groupBy(g :+ col("_d"): _*)
      .agg(expr("sum(_v) div count(1)").as("_y"))
    val based = daily
      .join(daily.groupBy(g: _*).agg(min("_d").as("_d0")), groups)
      .select(g :+ (col("_d") - col("_d0")).as("_t") :+ col("_y"): _*)
    based.groupBy(g: _*)
      .agg(count(lit(1)).as("n_days"),
        sum("_t").as("_st"), sum("_y").as("_sy"),
        sum(expr("_t * _y")).as("_sty"), sum(expr("_t * _t")).as("_stt"))
      .select(g ++ Seq(col("n_days"),
        expr("n_days * _sty - _st * _sy").as("slope_num"),
        expr("n_days * _stt - _st * _st").as("slope_den")): _*)
  }
}
