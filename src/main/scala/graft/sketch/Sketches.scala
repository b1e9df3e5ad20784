package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Deterministic streaming sketches — the sublinear-memory summaries a
  * 100 TB profile pass actually runs (exact per-group distincts and
  * full frequency tables don't fit anywhere at that scale): KMV distinct
  * estimation (Bar-Yossef et al. 2002's k-minimum-values), HyperLogLog
  * register tables (Flajolet et al. 2007), and Count-Min frequency
  * estimation (Cormode & Muthukrishnan 2005).
  *
  * Every sketch here is DETERMINISTIC: the "randomness" is the md5-based
  * [[Dedup.tokenHash]] (a fixed 32-bit hash), the estimators are scaled
  * INTEGER arithmetic end-to-end, and each gate emits the exact value
  * next to the estimate — so the oracle reproduces the sketch bit-for-
  * bit AND the gate doubles as a calibration audit (estimate vs truth),
  * the same audit discipline as the ANN recall family.
  *
  * Scale shapes: KMV is a distinct + per-group bounded top-k (the heap
  * any executor keeps is k values per group); HLL registers are a
  * (group, bucket)-keyed MAX — fully partial-aggregated, the canonical
  * mergeable sketch; CMS is a (row, bucket)-keyed SUM of d·w cells that
  * broadcasts back onto the query keys. None of them ever holds a
  * per-group distinct set.
  */
object Sketches {

  /** 2^32 — tokenHash values are uniform in [0, HashSpace). */
  val HashSpace: Long = 4294967296L

  private def groupCols(gs: Seq[String]) = gs.map(col)

  /** The distinct (groups…, hash) universe a distinct-count sketch is
    * built over. `preHashed = true` accepts an already-computed 32-bit
    * [[Dedup.tokenHash]] column (e.g. shingle-hash postings reused from
    * the dedup pipeline) — hashing a hash would be a DIFFERENT sketch.
    * Pre-hashed values MUST lie in [0, 2³²): the estimators divide by
    * the hash as a position in that space, so a wider value silently
    * miscalibrates (it is cast, not validated — validation would cost
    * a pass).
    */
  private def hashedDistinct(df: DataFrame, groups: Seq[String],
      valueCol: Column, preHashed: Boolean): DataFrame =
    df.select(groupCols(groups) :+
        (if (preHashed) valueCol.cast("long")
         else Dedup.tokenHash(valueCol)).as("_h"): _*)
      .distinct()

  /** KMV (k-minimum-values) distinct-count estimate per group, next to
    * the exact distinct for calibration: with the k smallest DISTINCT
    * hash values of a group, the k-th smallest `h_k` estimates
    * `distinct ≈ (k-1) · 2^32 / h_k` (the k-th order statistic of k
    * uniform draws). Groups with < k distinct values report exactly
    * (the sketch holds them all).
    * Output: (group…, n_exact, kmv_k, kmv_estimate).
    */
  /** [[kmvCalibration]] without the exact-count leg — the pure sketch. */
  def kmvDistinct(df: DataFrame, groups: Seq[String], valueCol: Column,
      k: Int, preHashed: Boolean = false): DataFrame =
    kmvOverHashed(hashedDistinct(df, groups, valueCol, preHashed), groups, k)

  private def kmvOverHashed(hashed: DataFrame, groups: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groups.map(col): _*).orderBy(col("_h"))
    hashed
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k) // ≤ k rows per group survive
      .groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("kmv_k"), max("_h").as("_hk"))
      .withColumn("kmv_estimate",
        when(col("kmv_k") < k, col("kmv_k")) // sketch is exhaustive
          .otherwise(expr(s"((kmv_k - 1) * ${HashSpace}L) div _hk")))
      .drop("_hk")
  }

  /** [[kmvDistinct]] plus the exact distinct count per group — the
    * calibration gate shape. The distinct-hash table is computed ONCE
    * and feeds both the sketch and the exact count (it is NOT re-hashed
    * — tokenHash(tokenHash(x)) would be a different sketch).
    */
  def kmvCalibration(df: DataFrame, groups: Seq[String], valueCol: Column,
      k: Int, preHashed: Boolean = false): DataFrame = {
    val hashed = graft.util.Materialize.stable(
      hashedDistinct(df, groups, valueCol, preHashed))
    val exact = hashed.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_exact"))
    kmvOverHashed(hashed, groups, k)
      .join(exact, groups)
      .select(groups.map(col) ++
        Seq(col("n_exact"), col("kmv_k"), col("kmv_estimate")): _*)
  }

  /** HyperLogLog register table + integer-scaled estimate per group.
    * Bucket = hash mod m (m = 2^p registers); rank ρ = leading-zero
    * count of the remaining 32−p bits + 1, computed PORTABLY as
    * `(32 − p + 1) − length(bin(rest))` (both engines' `bin()` renders
    * without leading zeros; rest = 0 ⇒ the max rank). The estimate is
    * the standard α·m²/Σ2^−ρ_j in fixed point: each register
    * contributes `2^30 >> ρ_j` (absent registers contribute `2^30`),
    * `hll_estimate = (α_milli · m² · 2^30) div (1000 · Σ)`.
    * Output: (group…, n_exact, hll_estimate) — exact alongside, same
    * calibration-gate shape as KMV.
    */
  def hllDistinct(df: DataFrame, groups: Seq[String], valueCol: Column,
      p: Int = 4, alphaMilli: Long = 673L,
      preHashed: Boolean = false): DataFrame = {
    // p ≤ 11: the estimator numerator α_milli·m²·2³⁰ must fit int64 —
    // at p = 12 (m = 4096) with the standard α_milli ≈ 721 it is
    // ~1.2·10¹⁹ > Long.MaxValue and would wrap silently negative
    require(p >= 2 && p <= 11, s"p must be in 2..11, got $p")
    val m = 1 << p
    val restBits = 32 - p
    val hashed = graft.util.Materialize.stable(
      hashedDistinct(df, groups, valueCol, preHashed))
    val exact = hashed.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_exact"))
    val regs = hllRegistersOverHashed(hashed, groups, p)
    hllEstimateFromRegisters(regs, groups, p, alphaMilli)
      .join(exact, groups)
      .select(groups.map(col) ++
        Seq(col("n_exact"), col("hll_estimate")): _*)
  }

  /** The fixed-point estimator over a register table (groups…,
    * _bucket, _r) — separated from the register build because registers
    * are the MERGEABLE artifact: shards/deltas max-merge their register
    * tables and estimate once at the end (the incremental gate).
    * Output: (groups…, hll_estimate).
    */
  def hllEstimateFromRegisters(regs: DataFrame, groups: Seq[String],
      p: Int, alphaMilli: Long): DataFrame = {
    require(p >= 2 && p <= 11, s"p must be in 2..11, got $p")
    val m = 1 << p
    // Σ over ALL m registers: present ones contribute 2^30 >> ρ, the
    // (m − present) absent ones contribute 2^30 each
    val denom = regs.groupBy(groups.map(col): _*)
      .agg(sum(expr("1073741824 div shiftleft(1, _r)")).as("_s"),
        count(lit(1)).as("_present"))
      .withColumn("_denom",
        col("_s") + (lit(m.toLong) - col("_present")) * lit(1073741824L))
    // numerator computed HERE in Long arithmetic — as an SQL literal
    // product it would be int×int overflow (1073741824 is an INT literal)
    val numer = alphaMilli * m.toLong * m.toLong * 1073741824L
    require(numer > 0 && numer / (m.toLong * m.toLong) / 1073741824L == alphaMilli,
      s"alphaMilli=$alphaMilli overflows the int64 estimator numerator at p=$p")
    denom
      .withColumn("hll_estimate", expr(s"${numer}L div (1000 * _denom)"))
      .select(groups.map(col) :+ col("hll_estimate"): _*)
  }

  /** The HLL register table (groups…, _bucket, _r) — exposed because
    * register MAX-MERGE is the sketch's 100 TB story: registers built
    * over disjoint partitions of a corpus, max-merged per (group,
    * bucket), equal the registers built over the whole corpus — the
    * property that lets a fleet sketch shards independently and union
    * the results (spec-pinned).
    */
  def hllRegisters(df: DataFrame, groups: Seq[String], valueCol: Column,
      p: Int, preHashed: Boolean = false): DataFrame =
    hllRegistersOverHashed(hashedDistinct(df, groups, valueCol, preHashed),
      groups, p)

  /** Per-row register bucket for a 32-bit hash: `h mod 2^p`. Together
    * with [[hllRho]] this is the whole per-row projection — and it is
    * duplicate-INSENSITIVE under the max-aggregate, so a STREAMING
    * register build needs no distinct pass: project + ONE streaming max
    * aggregate is the entire sketch (spec-pinned against batch).
    */
  def hllBucket(h: Column, p: Int): Column =
    pmod(h, lit((1L << p)))

  /** Per-row register rank ρ = leading-zero count of the non-bucket
    * bits + 1, via the portable `bin()` length (no float log).
    */
  def hllRho(h: Column, p: Int): Column = {
    val m = 1 << p
    val restBits = 32 - p
    val rest = floor(h / lit(m.toLong)).cast("long") // positive: trunc == floor
    when(rest === 0, lit(restBits + 1))
      .otherwise(lit(restBits + 1) - length(bin(rest)))
  }

  private def hllRegistersOverHashed(hashed: DataFrame, groups: Seq[String],
      p: Int): DataFrame =
    hashed
      .withColumn("_bucket", hllBucket(col("_h"), p))
      .withColumn("_rho", hllRho(col("_h"), p))
      .groupBy(groups.map(col) :+ col("_bucket"): _*)
      .agg(max("_rho").as("_r"))

  /** Log₂-histogram register table (groups…, _bin, _cnt) — the
    * mergeable RANK sketch completing the family (KMV/HLL = distinct,
    * CMS = frequency): fixed power-of-two splits over non-negative
    * int64 values, bin 0 = {0}, bin b ≥ 1 = [2^(b−1), 2^b). ≤ 65
    * int64 registers per group, whatever the corpus size — the
    * latency-histogram shape (cf. reference
    * `scripts/benchmark.py:109-120`, whose P50/P95/P99 panel this
    * serves sublinearly), and the fixed-splits analog of a KLL sketch
    * with DETERMINISTIC splits instead of sampled ones (no randomness
    * ⇒ bit-reproducible across engines, the family discipline).
    *
    * Registers are SUM-mergeable: counts built over disjoint shards of
    * a corpus, added per (group, bin), equal the one-pass counts — the
    * property that lets a fleet histogram shards independently
    * (spec-pinned, and the merge gate's oracle IS the one-pass SQL).
    *
    * Scale shape: one partial-aggregated shuffle down to ≤ 65 rows per
    * group; the per-row projection (`length(bin(v))`) is pure codegen.
    * Values must be non-negative; a negative value raises (never a
    * silently wrong two's-complement bin).
    */
  def logHistogram(df: DataFrame, groups: Seq[String],
      valueCol: Column): DataFrame =
    df.select(groupCols(groups) :+ valueCol.cast("long").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .withColumn("_bin",
        when(col("_v") < 0, raise_error(concat(
          lit("logHistogram: negative value "), col("_v").cast("string"))))
          .when(col("_v") === 0, lit(0))
          .otherwise(length(bin(col("_v")))).cast("long"))
      .groupBy(groupCols(groups) :+ col("_bin"): _*)
      .agg(count(lit(1)).as("_cnt"))

  /** Quantile estimates from a [[logHistogram]] register table, next to
    * nothing — the pure estimator (gates add the exact leg). For each
    * `q` ‰: target rank = ⌈q·n/1000⌉ (≥ 1), walk the cumulative counts
    * to the covering bin, then interpolate INTEGER-uniformly within it:
    * `est = lo + (width · (pos − 1)) div cnt` with pos the 1-based rank
    * inside the bin — so the estimate always lands in the same
    * power-of-two bin as the true rank-target value (relative error
    * ≤ 2×, the fixed-splits guarantee; spec-pinned).
    *
    * The cumulative window runs over the REGISTER table (≤ 65 rows per
    * group), not the corpus — sublinear however large the input.
    * Output: (groups…, q_permille, n, est).
    */
  def quantilesFromLogHistogram(regs: DataFrame, groups: Seq[String],
      qsPermille: Seq[Int]): DataFrame = {
    require(qsPermille.nonEmpty && qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be 1..1000 permille, got $qsPermille")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groups.map(col): _*).orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = regs
      .withColumn("_cum_before", coalesce(sum("_cnt").over(w), lit(0L)))
      .withColumn("_n", sum("_cnt").over(
        Window.partitionBy(groups.map(col): _*)))
    cum
      .select(groupCols(groups) ++ Seq(col("_bin"), col("_cnt"),
        col("_cum_before"), col("_n"),
        explode(typedLit(qsPermille.sorted)).as("q_permille")): _*)
      .withColumn("_target",
        greatest(lit(1L), expr("(q_permille * _n + 999) div 1000")))
      .filter(col("_cum_before") < col("_target") &&
        col("_target") <= col("_cum_before") + col("_cnt"))
      .withColumn("_lo",
        when(col("_bin") === 0, lit(0L))
          .otherwise(expr("shiftleft(1L, CAST(_bin - 1 AS INT))")))
      .withColumn("_width",
        when(col("_bin") === 0, lit(1L))
          .otherwise(expr("shiftleft(1L, CAST(_bin - 1 AS INT))")))
      .withColumn("est", expr(
        "_lo + (_width * (_target - _cum_before - 1)) div _cnt"))
      .select(groupCols(groups) ++ Seq(col("q_permille").cast("long"),
        col("_n").as("n"), col("est")): _*)
  }

  /** KMV set-algebra estimates per group against a base key set — the
    * set operation HLL registers cannot serve: INTERSECTION (and
    * Jaccard) between two key universes, from k-bounded sketches only
    * (Beyer et al. 2007, "On synopses for distinct-value estimation
    * under multiset operations"). For each group A and the base set B:
    * the union sketch is the k smallest hashes of sketch(A) ∪ sketch(B)
    * — provably the k smallest of A ∪ B (any of the true k minima of
    * A ∪ B is among its own side's k minima), so
    * `union_est = (k−1)·2³²/θ` with θ the union sketch's max. Every
    * union-sketch member h ≤ θ that lies in A is in sketch(A) (θ ≤ θ_A
    * since the k-th minimum of a superset is no larger), so the
    * membership flags carried by the sketch rows are EXACT and
    * `K∩ = |{h ∈ union sketch : h ∈ A ∧ h ∈ B}|` needs no second look
    * at the data: `inter_est = K∩·union_est/k`, `jaccard ≈ K∩/k_u`.
    * When the union sketch is exhaustive (k_u < k) every estimate
    * collapses to the exact value.
    *
    * Scale shape: each side reduces to ≤ k rows BEFORE any cross-side
    * work — the A side via the per-group bounded window, the base via
    * a partial top-k (`orderBy.limit`, map-side bounded); the merge is
    * sketch-sized (groups × ≤ 2k rows). The exact legs (gate-only
    * calibration, the family discipline) are the one full-width
    * equi-join this audit exists to make unnecessary in production.
    * Output: (groups…, n_a_exact, n_b_exact, inter_exact, union_exact,
    * jacc_pm_exact, kmv_union_est, kmv_inter_est, kmv_jacc_pm_est).
    */
  def kmvSetOps(a: DataFrame, groups: Seq[String], aValue: Column,
      base: DataFrame, baseValue: Column, k: Int,
      preHashed: Boolean = false): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val ah = graft.util.Materialize.stable(
      hashedDistinct(a, groups, aValue, preHashed))
    val bh = graft.util.Materialize.stable(
      hashedDistinct(base, Nil, baseValue, preHashed))
    val wa = Window.partitionBy(groups.map(col): _*).orderBy(col("_h"))
    val aSk = ah.withColumn("_rk", row_number().over(wa))
      .filter(col("_rk") <= k).drop("_rk")
    // partial top-k (TakeOrderedAndProject): the base's k minima without
    // a single-partition global sort
    val bSk = bh.orderBy(col("_h")).limit(k)
    val groupsDf = ah.select(groups.map(col): _*).distinct()
    val merged = aSk.withColumn("_ina", lit(1)).withColumn("_inb", lit(0))
      .unionByName(groupsDf.crossJoin(broadcast(bSk))
        .withColumn("_ina", lit(0)).withColumn("_inb", lit(1)))
      .groupBy(groups.map(col) :+ col("_h"): _*)
      .agg(max("_ina").as("_ina"), max("_inb").as("_inb"))
    val sk = merged.withColumn("_rk", row_number().over(wa))
      .filter(col("_rk") <= k)
      .groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("_ku"), max("_h").as("_theta"),
        sum(when(col("_ina") === 1 && col("_inb") === 1, 1L)
          .otherwise(0L)).as("_kint"))
    val est = sk
      .withColumn("kmv_union_est",
        when(col("_ku") < k, col("_ku"))
          .otherwise(expr(s"((_ku - 1) * ${HashSpace}L) div _theta")))
      .withColumn("kmv_inter_est",
        when(col("_ku") < k, col("_kint"))
          .otherwise(expr(s"(_kint * kmv_union_est) div $k")))
      .withColumn("kmv_jacc_pm_est", expr("(1000 * _kint) div _ku"))
    val na = ah.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_a_exact"))
    val nb = bh.agg(count(lit(1)).as("n_b_exact"))
    val ix = ah.join(bh, "_h")
      .groupBy(groups.map(col): _*).agg(count(lit(1)).as("inter_exact"))
    val exact = na.join(ix, groups, "left")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .crossJoin(broadcast(nb))
      .withColumn("union_exact",
        col("n_a_exact") + col("n_b_exact") - col("inter_exact"))
      .withColumn("jacc_pm_exact", expr("(1000 * inter_exact) div union_exact"))
    est.join(exact, groups)
      .select(groups.map(col) ++ Seq(col("n_a_exact"), col("n_b_exact"),
        col("inter_exact"), col("union_exact"), col("jacc_pm_exact"),
        col("kmv_union_est"), col("kmv_inter_est"),
        col("kmv_jacc_pm_est")): _*)
  }

  /** Panel-day scaffold shared by the rolling register roll-ups:
    * observed register days by default, or — when `dayRange =
    * Some((lo, hi))` — every day in [lo, hi] inclusive, cast to the
    * register table's own day type so the left join and the
    * `rangeBetween` frame see one consistent type. A declared range is
    * how a monitoring panel keeps emitting rows through fully-silent
    * days (the observed-days default omits exactly those). Bounded:
    * the scaffold is a driver-declared day count, never data-sized.
    */
  private def scaffoldDays(regs: DataFrame, dayCol: String,
      dayRange: Option[(Long, Long)]): DataFrame = dayRange match {
    case None => regs.select(col(dayCol)).distinct()
    case Some((lo, hi)) =>
      require(lo <= hi, s"need lo <= hi, got [$lo, $hi]")
      require(hi - lo < 100000L,
        s"day scaffold bounded at 100000 days, got ${hi - lo + 1}")
      // the cast below must be lossless: a non-ANSI bigint→int cast WRAPS
      // silently (scaffold days become wrong values) and bigint→date
      // fails outright, so validate the day type can hold [lo, hi]
      import org.apache.spark.sql.types._
      val bound = regs.schema(dayCol).dataType match {
        case LongType    => Long.MaxValue
        case IntegerType => Int.MaxValue.toLong
        case ShortType   => Short.MaxValue.toLong
        case ByteType    => Byte.MaxValue.toLong
        case dt => throw new IllegalArgumentException(
          s"day column '$dayCol' must be an integral type for a declared " +
            s"dayRange scaffold, got $dt")
      }
      require(lo >= -bound - 1 && hi <= bound,
        s"dayRange [$lo, $hi] exceeds the range of $dayCol's " +
          s"${regs.schema(dayCol).dataType} — the cast would wrap silently")
      regs.sparkSession.range(lo, hi + 1)
        .select(col("id").cast(regs.schema(dayCol).dataType).as(dayCol))
  }

  /** Sliding-window register roll-up over a per-day [[hllRegisters]]
    * table: for each day d, the max-merged registers of days
    * [d−windowDays+1, d] — the rolling-7-day-actives panel from 64
    * ints/day instead of re-scanning the event log once per window
    * (max-merge == one-pass is the HLL contract, so the rolled
    * registers EQUAL the registers of the window's union, spec-pinned).
    *
    * Scale shape: the scaffold and the window run over the REGISTER
    * table (m rows per day), never the events; `rangeBetween` on the
    * day value keeps gap days honest (an absent day contributes
    * nothing, it doesn't stretch the frame). Output: (dayCol, _bucket,
    * _r) — feed [[hllEstimateFromRegisters]].
    *
    * Day scaffold contract: by default panel days are the OBSERVED
    * register days — a day with zero events emits no panel row even
    * when its trailing window is nonempty, which is exactly the
    * anomalous silent day a monitoring panel wants to show. Pass
    * `dayRange = Some((lo, hi))` to scaffold every day in [lo, hi]
    * instead: silent days then emit the max-merge of their window's
    * earlier days (and nothing if the whole window is empty).
    */
  def hllRollingRegisters(regs: DataFrame, dayCol: String,
      windowDays: Int, p: Int,
      dayRange: Option[(Long, Long)] = None): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(p >= 2 && p <= 11, s"p must be in 2..11, got $p")
    val m = 1 << p
    import org.apache.spark.sql.expressions.Window
    // days × all m buckets: a bucket silent on day d still sees the
    // window's earlier days (absent registers must roll forward)
    val scaffold = scaffoldDays(regs, dayCol, dayRange)
      .select(col(dayCol),
        explode(sequence(lit(0L), lit((m - 1).toLong))).as("_bucket"))
    val w = Window.partitionBy("_bucket").orderBy(col(dayCol))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    scaffold.join(regs, Seq(dayCol, "_bucket"), "left")
      .withColumn("_rr", max("_r").over(w)) // max ignores nulls
      .filter(col("_rr").isNotNull)
      .select(col(dayCol), col("_bucket"), col("_rr").as("_r"))
  }

  /** Count-Min frequency sketch: d hash rows × w buckets of int64
    * counters built in ONE partial-agg pass (d·w cells total — 1024
    * BIGINTs at the default 4×256, whatever the corpus size), then the
    * point-query estimate for each of the exact top-`topN` keys:
    * `est = min_i cell[i][h_i(key)]` — an overestimate by construction
    * (collisions only ADD), so the gate asserts `est ≥ exact` row by
    * row and reports the overestimate for calibration.
    * Row hashes are the engine's MinHash family (a_i·h + b_i mod p) mod w.
    * Output: (key, n_exact, cms_estimate).
    */
  def cmsTopKCalibration(df: DataFrame, valueCol: Column, d: Int = 4,
      w: Int = 256, topN: Int = 20): DataFrame = {
    require(d >= 1 && d <= Dedup.MinhashA.size, s"d must be 1..${Dedup.MinhashA.size}")
    require(w >= 2, s"need at least 2 buckets, got $w")
    val hashed = graft.util.Materialize.stable(
      df.select(valueCol.as("key")).withColumn("_h", Dedup.tokenHash(col("key"))))
    def rowBucket(i: Int): Column = cmsRowBucket(col("_h"), i, w)
    // one Expand (d rows per input row) → (row, bucket) partial-agg sum
    val cells = hashed.select(explode(array((0 until d).map(i =>
        struct(lit(i).as("r"), rowBucket(i).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    // exact top-N keys (deterministic tie-break on the key text)
    val top = hashed.groupBy("key", "_h")
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("key"))
      .limit(topN)
    // probe: each top key joins its d cells (broadcast the 1024-cell
    // table), estimate = min over rows
    val probes = top.select(col("key"), col("n_exact"),
      explode(array((0 until d).map(i =>
        struct(lit(i).as("r"), rowBucket(i).as("b"))): _*)).as("rb"))
      .select(col("key"), col("n_exact"),
        col("rb.r").as("r"), col("rb.b").as("b"))
    probes.join(broadcast(cells), Seq("r", "b"))
      .groupBy("key", "n_exact")
      .agg(min("c").as("cms_estimate"))
  }

  /** CMS row hash i of a 32-bit key hash: `((a_i·h + b_i) mod p) mod w`
    * — the engine's MinHash family, shared by the one-pass and the
    * streaming cell builds (they must agree bit-for-bit for the merged
    * cells to be probe-compatible).
    */
  def cmsRowBucket(h: Column, i: Int, w: Int): Column =
    pmod(pmod(lit(Dedup.MinhashA(i)) * h + lit(Dedup.MinhashB(i)),
      lit(Dedup.MinhashP)), lit(w.toLong))

  /** The bare CMS cell table (r, b, c) over `df` — exposed because cell
    * SUM-MERGE is the sketch's incremental story (counts over disjoint
    * shards, added per cell, equal the one-pass cells — the
    * log-histogram discipline applied to frequency): shards/batches
    * build d·w cells each and fold by addition.
    */
  def cmsCells(df: DataFrame, valueCol: Column, d: Int, w: Int): DataFrame =
    cmsCellsBy(df, Seq.empty, valueCol, d, w)

  /** [[cmsCells]] with grouping columns — one d×w cell table per group
    * (per day, per source, per shard): the unit the rolling and
    * incremental maintenance paths merge. Same single partial-agg pass;
    * output (groups…, r, b, c).
    */
  def cmsCellsBy(df: DataFrame, groups: Seq[String], valueCol: Column,
      d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= Dedup.MinhashA.size, s"d must be 1..${Dedup.MinhashA.size}")
    require(w >= 2, s"need at least 2 buckets, got $w")
    df.select(groupCols(groups) :+ Dedup.tokenHash(valueCol).as("_h"): _*)
      .select(groupCols(groups) :+ explode(array((0 until d).map(i =>
        struct(lit(i).as("r"), cmsRowBucket(col("_h"), i, w).as("b"))): _*))
        .as("rb"): _*)
      .groupBy(groupCols(groups) ++ Seq(col("rb.r").as("r"),
        col("rb.b").as("b")): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Sliding-window SUM over a per-day register table — the shared
    * roll-up for every sum-mergeable sketch (CMS cells, log₂-histogram
    * bins): each key's count on day D becomes the sum over
    * [D−windowDays+1, D]. The scaffold (distinct days × distinct key
    * combos) exists because a key silent on day D must still see the
    * window's earlier days — without it the windowed row is simply
    * absent and the estimate silently UNDERCOUNTS, breaking CMS's
    * overestimate guarantee. Both scaffold sides are register-bounded
    * (days × ≤ d·w cells or ≤ 65 bins), so the cross join and the
    * per-key window run on sketch-sized tables, never the corpus —
    * the same discipline as [[hllRollingRegisters]] (whose merge is
    * MAX; this is the SUM twin). Zero-count scaffold rows are dropped
    * on output (a missing cell reads as 0 downstream either way).
    *
    * Day scaffold contract: same as [[hllRollingRegisters]] — observed
    * register days by default (a fully-silent day emits no panel rows);
    * pass `dayRange = Some((lo, hi))` to scaffold every day in
    * [lo, hi] so silent days still window their earlier days.
    */
  def rollingSumRegisters(regs: DataFrame, dayCol: String,
      keyCols: Seq[String], cntCol: String, windowDays: Int,
      dayRange: Option[(Long, Long)] = None): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(keyCols.nonEmpty, "need at least one register key column")
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val scaffold = scaffoldDays(regs, dayCol, dayRange)
      .crossJoin(regs.select(keys: _*).distinct())
    val w = Window.partitionBy(keys: _*).orderBy(col(dayCol))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    scaffold.join(regs, dayCol +: keyCols, "left")
      .withColumn("_rs", sum(coalesce(col(cntCol), lit(0L))).over(w))
      .filter(col("_rs") > 0)
      .select(col(dayCol) +: keys :+ col("_rs").as(cntCol): _*)
  }

  /** Point-query estimates over a [[cmsCells]] table for a key set:
    * `est = min_i cell[i][h_i(key)]` (overestimate by construction —
    * absent cells read 0). `keys` must carry a string column named
    * `key`; output (key, cms_estimate).
    */
  def cmsEstimate(cells: DataFrame, keys: DataFrame, d: Int,
      w: Int): DataFrame = {
    require(d >= 1 && d <= Dedup.MinhashA.size, s"d must be 1..${Dedup.MinhashA.size}")
    keys.select(col("key")).distinct()
      .withColumn("_h", Dedup.tokenHash(col("key")))
      .select(col("key"), explode(array((0 until d).map(i =>
        struct(lit(i).as("r"), cmsRowBucket(col("_h"), i, w).as("b"))): _*)).as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cells), Seq("r", "b"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_estimate"))
  }

  /** Equi-join CARDINALITY estimate from two CMS cell tables — the
    * inner-product estimator (Cormode & Muthukrishnan 2005 §4.2):
    * `|A ⋈_k B| = Σ_k f_A(k)·f_B(k)`, estimated per sketch row as
    * `Σ_b cellA[i][b]·cellB[i][b]` and taken as the MIN over the d
    * rows. Hash collisions only ADD cross terms, so the estimate is an
    * overestimate of the true join size for every row — `min` keeps the
    * tightest — and the calibration output carries the exact legs next
    * to it (the family's estimate-next-to-exact discipline). All d rows
    * reach the min via a scaffold: a row with ZERO overlapping (r,b)
    * cells has inner product 0 and is the row PROVING the join empty —
    * disjoint key sets report the true 0, never a collision artifact.
    *
    * Why it matters at 100 TB: the exact join size needs the full
    * per-key frequency join this estimator exists to avoid — the
    * pre-flight "will this equi-join explode" decision (together with
    * [[graft.ops.SkewProfile]]'s per-key view) reads 2·d·w integers
    * instead. Cross-products and their sums run in DECIMAL(38,0)
    * (join sizes are quadratic in frequency — the χ² lesson); the final
    * cast to BIGINT is ANSI-loud if a true >2⁶³ estimate ever lands.
    *
    * Scale shape: each side collapses to d·w cells via one partial-agg
    * pass ([[cmsCells]]); the product join is cell-table-sized and
    * broadcast. The exact leg is per-key partial-agg counts joined once
    * — gate-only calibration, not the production path.
    * Output single row: (n_a, n_b, join_exact, cms_join_est).
    */
  def cmsJoinSize(a: DataFrame, aValue: Column, b: DataFrame,
      bValue: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= Dedup.MinhashA.size, s"d must be 1..${Dedup.MinhashA.size}")
    require(w >= 2, s"need at least 2 buckets, got $w")
    val dec = "CAST(c AS DECIMAL(38,0))"
    val ca = cmsCells(a, aValue, d, w).withColumn("ca", expr(dec)).drop("c")
    val cb = cmsCells(b, bValue, d, w).withColumn("cb", expr(dec)).drop("c")
    // Scaffold all d rows before the min: a hash row with ZERO
    // overlapping (r,b) cells is dropped by the inner join, and a row
    // whose true inner product is 0 is exactly the one PROVING the join
    // is empty — without the scaffold, disjoint key sets could report
    // whatever the colliding rows happen to sum to.
    val allRows = a.sparkSession.range(d).select(col("id").cast("int").as("r"))
    val rowSums = ca.join(broadcast(cb), Seq("r", "b"))
      .groupBy("r").agg(sum(expr("ca * cb")).as("_ps"))
    val est = allRows.join(rowSums, Seq("r"), "left")
      .agg(min(coalesce(col("_ps"), expr("CAST(0 AS DECIMAL(38,0))")))
        .cast("long").as("cms_join_est"))
    val fa = a.select(aValue.as("k")).groupBy("k").agg(count(lit(1)).as("fa"))
    val fb = b.select(bValue.as("k")).groupBy("k").agg(count(lit(1)).as("fb"))
    val exact = fa.join(fb, "k")
      .agg(coalesce(sum(expr(
        "CAST(fa AS DECIMAL(38,0)) * fb")), lit(0)).cast("long")
        .as("join_exact"))
    val na = a.agg(count(lit(1)).as("n_a"))
    val nb = b.agg(count(lit(1)).as("n_b"))
    na.crossJoin(nb).crossJoin(exact).crossJoin(est)
  }
}
