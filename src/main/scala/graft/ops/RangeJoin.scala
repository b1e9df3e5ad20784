package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join — `probe.t BETWEEN intervals.lo AND intervals.hi`
  * decomposed into an EQUI-join.
  *
  * Why it exists: an inequality join predicate gives Catalyst no
  * shuffle key, so the physical plan degrades to
  * BroadcastNestedLoopJoin (when one side fits in memory) or a
  * cartesian product (when it doesn't) — per-probe-row scans of the
  * whole interval table, the classic 100 TB interval-join trap. The
  * reference's event pipeline only ever joins on equality keys; this
  * operator is the beyond-reference piece that makes window/campaign/
  * validity-interval joins plannable at scale.
  *
  * Decomposition: the time axis is chunked into `bucketWidth`-sized
  * buckets. Each probe row carries its ONE bucket
  * (`⌊t / width⌋`, floor semantics so negative values bucket
  * correctly); each interval explodes to every bucket it overlaps
  * (`⌊lo/width⌋ .. ⌊hi/width⌋`); the join runs on the bucket key; the
  * exact BETWEEN filter then prunes the bucket-collision false
  * positives. A (probe, interval) pair can only meet in the probe's
  * single bucket, so matches are emitted exactly once — no dedup pass.
  *
  * Scale shape: ONE shuffle on the bucket key for each side (both
  * partial-pruned by partition layout when the inputs are
  * time-clustered); the interval side grows by its bucket span
  * (`maxBucketsPerInterval` bounds the blow-up loudly — an interval
  * spanning more buckets than the cap, or an inverted lo > hi
  * interval, raises instead of silently exploding or silently
  * descending). Hot buckets are a JOIN key skew, which AQE's skew-join
  * splitting handles — precisely what it cannot do for a nested loop.
  * Choose `bucketWidth` near the TYPICAL interval length: width ≫
  * interval wastes filter work (many false bucket collisions), width ≪
  * interval multiplies the interval table by span/width.
  *
  * Output: all probe columns + all interval columns (names must be
  * disjoint) for each matching pair.
  */
object RangeJoin {

  def bucketed(probe: DataFrame, tCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    val shared = probe.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"probe and interval column names must be disjoint, shared: $shared")
    // inputs must also avoid the internal working names: withColumn would
    // silently OVERWRITE a same-named input column and drop() would then
    // remove it from the output — wrong results, not an error
    val internal = Seq("_rj_bk", "_rj_lo", "_rj_hi")
    val clash = (probe.columns ++ intervals.columns).toSet.intersect(internal.toSet)
    require(clash.isEmpty,
      s"inputs must not contain internal working columns $internal, found: $clash")
    require(Seq(tCol, loCol, hiCol).forall(c =>
      !c.contains("`") && !c.contains("'")), "no quotes in column names")
    // floor division via pmod: (x - pmod(x, w)) div w is exact int64
    // arithmetic and rounds toward -inf for negative x (plain `div`
    // truncates toward zero, putting -1..-w in bucket 0 with 0..w)
    def bk(c: String) =
      s"(CAST($c AS BIGINT) - pmod(CAST($c AS BIGINT), ${bucketWidth}L))" +
        s" div ${bucketWidth}L"
    val p = probe.withColumn("_rj_bk", expr(bk(tCol)))
    // the span guard rides the sequence's own upper bound so column
    // pruning can never drop it (the weightedPrioritySample idiom)
    val iv = intervals
      .withColumn("_rj_lo", expr(bk(loCol)))
      .withColumn("_rj_hi", expr(
        s"""CASE
           |  WHEN CAST($hiCol AS BIGINT) < CAST($loCol AS BIGINT)
           |    THEN raise_error('bucketedRangeJoin: interval has hi < lo')
           |  WHEN ${bk(hiCol)} - ${bk(loCol)} >= $maxBucketsPerInterval
           |    THEN raise_error(concat('bucketedRangeJoin: interval spans > ',
           |      '$maxBucketsPerInterval buckets - widen bucketWidth or raise ',
           |      'maxBucketsPerInterval'))
           |  ELSE ${bk(hiCol)}
           |END""".stripMargin.replace("\n", " ")))
      .withColumn("_rj_bk", explode(sequence(col("_rj_lo"), col("_rj_hi"))))
      .drop("_rj_lo", "_rj_hi")
    p.join(iv, Seq("_rj_bk"))
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("_rj_bk")
  }
}
