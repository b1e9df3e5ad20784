package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk audits over structured training data:
  * k-anonymity equivalence classes, l-diversity, and the generalization
  * ladder that shows how coarsening the quasi-identifiers trades
  * utility for risk (Sweeney 2002, "k-anonymity: a model for protecting
  * privacy"; Machanavajjhala et al. 2006, "l-diversity"). This is the
  * STRUCTURED-column counterpart of [[PiiScrub]]'s free-text tier: a
  * training corpus that joins user tables (the reference replicates
  * exactly such tables, cf. reference `config/tables.yaml`) must know,
  * before release, how many rows a quasi-identifier combination pins to
  * fewer than k candidates.
  *
  * Scale shape: one partial-aggregated `groupBy` on the quasi-identifier
  * tuple per audit level (count + count-distinct, both map-side
  * combinable — Spark plans the distinct as a two-phase expand, still
  * fully distributed); the risk summary is a single 1-row global
  * aggregate over the class table. Nothing joins, nothing collects: a
  * 100 TB user table costs one shuffle per ladder level, and the class
  * table it shuffles is bounded by the number of DISTINCT
  * quasi-identifier tuples, not the row count.
  */
object Privacy {

  /** Equivalence classes under the given quasi-identifier columns:
    * one row per distinct QI tuple with `class_size` (rows sharing the
    * tuple) and `l_distinct` (distinct sensitive values within it — the
    * l-diversity statistic; a class with l = 1 is vulnerable to the
    * homogeneity attack even when k is satisfied).
    */
  def equivalenceClasses(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column): DataFrame =
    df.groupBy(quasi.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_distinct"))

  /** Per-class audit rows: [[equivalenceClasses]] plus the integer
    * `at_risk` flag (1 when the class pins its members to fewer than
    * `k` candidates). The release gate a curation pipeline applies is
    * "suppress or generalize every at_risk = 1 class".
    */
  def kAnonymityClasses(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, k: Long): DataFrame = {
    require(k >= 2, s"k-anonymity below 2 is vacuous, got $k")
    equivalenceClasses(df, quasi, sensitive)
      .withColumn("at_risk",
        when(col("class_size") < k, lit(1L)).otherwise(lit(0L)))
  }

  /** One-row risk summary of a class table: total rows, class count,
    * smallest class (the k the data actually achieves), rows/classes
    * below the target k, and classes below the l-diversity floor.
    */
  def riskSummary(classes: DataFrame, k: Long, lMin: Long): DataFrame = {
    require(k >= 2, s"k-anonymity below 2 is vacuous, got $k")
    require(lMin >= 1, s"l-diversity floor must be >= 1, got $lMin")
    classes.agg(
      sum("class_size").as("total_rows"),
      count(lit(1)).as("n_classes"),
      min("class_size").as("min_class_size"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(lit(0L)))
        .as("at_risk_rows"),
      sum(when(col("class_size") < k, lit(1L)).otherwise(lit(0L)))
        .as("at_risk_classes"),
      sum(when(col("l_distinct") < lMin, lit(1L)).otherwise(lit(0L)))
        .as("low_l_classes"))
  }

  /** The generalization ladder: one [[riskSummary]] row per
    * (level-name, quasi-identifier set), unioned with the level as the
    * leading column. Coarsening the QI set can only merge equivalence
    * classes, so `at_risk_rows` is monotonically non-increasing down a
    * ladder where each level's classes are unions of the previous
    * level's (spec-pinned) — the curve an auditor reads to pick the
    * cheapest generalization that reaches the k target.
    */
  def generalizationLadder(df: DataFrame,
      levels: Seq[(String, Seq[(String, Column)])], sensitive: Column,
      k: Long, lMin: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one ladder level")
    levels.map { case (name, quasi) =>
      riskSummary(equivalenceClasses(df, quasi, sensitive), k, lMin)
        .select(lit(name).as("level"), col("*"))
    }.reduce(_ unionByName _)
  }

  /** t-CLOSENESS audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third leg of the release-gate family after k-anonymity (class
    * size) and l-diversity (value count): per equivalence class, the
    * EARTH MOVER'S DISTANCE between the class's distribution of the
    * ordered sensitive attribute and the GLOBAL distribution. A class
    * can satisfy k and l and still leak ("every 30-something in zip
    * 476** has a low salary" — skewness attack); t-closeness bounds how
    * far any class's distribution may sit from the corpus's.
    *
    * The sensitive value is bucketed on DECLARED [lo, hi) integer
    * bounds (the histogram discipline — clamp BEFORE the multiply, so
    * the bucket id is overflow-free and two snapshots compare
    * bar-for-bar), and the ordered-attribute EMD closed form is the
    * mean absolute CDF difference: `emd_x1e6 = Σ_buckets
    * |cum_class·10⁶ div class_size − cum_global·10⁶ div total| div
    * (buckets − 1)` — all integer, oracle-exact.
    *
    * Scale shape: ONE corpus-sized partial agg keyed by (QI…, bucket);
    * everything after runs on bounded tables — the class×bucket
    * scaffold (classes are bounded by distinct QI tuples), class-keyed
    * cumsum windows over `buckets`-sized partitions, and the global
    * distribution as one buckets-sized broadcast. Output: (quasi…,
    * class_size, emd_x1e6), one row per class; read the release gate
    * off it as `emd_x1e6 > t·10⁶ → suppress or generalize`.
    */
  def tCloseness(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, lo: Long, hi: Long, buckets: Int): DataFrame =
    tClosenessFromCounts(
      tClosenessCounts(df, quasi, sensitive, lo, hi, buckets),
      quasi.map(_._1), buckets)

  /** The t-closeness registers: the per-(QI…, bucket) count table `_b,
    * _n` — the SUFFICIENT STATISTIC for the whole EMD panel, and it
    * SUM-MERGES (counts add), so per-batch tables fold by
    * `groupBy(QI…, _b).agg(sum)` and a continuously-ingested release
    * audit stays current without rescanning rows (the calibration
    * register discipline on the privacy panel). One corpus-sized
    * partial-agg pass; declared clamp-first bucketing.
    */
  def tClosenessCounts(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    require(buckets >= 2 && buckets <= 10000, s"2..10000 buckets, got $buckets")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(hi - lo > 0,
      s"[$lo, $hi) must span a width that fits int64 (hi - lo overflowed)")
    val qn = quasi.map(_._1)
    // clamp-first declared-bounds bucket id (TableProfile.histogram's
    // overflow-free arithmetic). Literals go through a constant-folded
    // string cast: a raw `${Long.MinValue}L` token fails to parse (the
    // positive literal overflows before unary minus applies).
    def longLit(x: Long): String = s"CAST('$x' AS BIGINT)"
    val bucket = expr(
      s"""CAST((CAST(least(${longLit(hi - 1)}, greatest(${longLit(lo)}, _sv))
         | AS DECIMAL(38,0)) - ${longLit(lo)}) * $buckets
         | div ${longLit(hi - lo)} AS BIGINT)""".stripMargin.replace("\n", " "))
    df.select(quasi.map { case (n, c) => c.as(n) } :+
        sensitive.cast("long").as("_sv"): _*)
      .filter(col("_sv").isNotNull)
      .withColumn("_b", bucket)
      .groupBy(qn.map(col) :+ col("_b"): _*)
      .agg(count(lit(1)).as("_n"))
  }

  /** The [[tCloseness]] EMD walk over ALREADY-AGGREGATED registers
    * `(QI…, _b, _n)` — one code path with the batch entry (merge
    * registers to one row per (QI…, _b) before calling).
    */
  def tClosenessFromCounts(counts: DataFrame, qn: Seq[String],
      buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qn.nonEmpty, "need at least one quasi-identifier")
    require(buckets >= 2 && buckets <= 10000, s"2..10000 buckets, got $buckets")
    val spark = counts.sparkSession
    val cbS = graft.util.Materialize.stable(counts)
    val classes = cbS.groupBy(qn.map(col): _*).agg(sum("_n").as("class_size"))
    // global CDF: a buckets-sized table, cumsum'd and broadcast
    val gw = Window.orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globalCdf = spark.range(buckets).select(col("id").as("_b"))
      .join(cbS.groupBy("_b").agg(sum("_n").as("_gn")), Seq("_b"), "left")
      .withColumn("_gcum", sum(coalesce(col("_gn"), lit(0L))).over(gw))
      .withColumn("_gtotal", sum(coalesce(col("_gn"), lit(0L))).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("_b"), col("_gcum"), col("_gtotal"))
    // class × bucket scaffold so empty buckets still contribute their
    // CDF gap; class-keyed cumsum windows over buckets-sized partitions
    val scaffold = classes
      .crossJoin(spark.range(buckets).select(col("id").as("_b")))
    val cw = Window.partitionBy(qn.map(col): _*).orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold
      .join(cbS, qn :+ "_b", "left")
      .withColumn("_ccum", sum(coalesce(col("_n"), lit(0L))).over(cw))
      .join(broadcast(globalCdf), Seq("_b"))
      .groupBy(qn.map(col) :+ col("class_size"): _*)
      .agg(sum(abs(expr("_ccum * 1000000 div class_size") -
        expr("_gcum * 1000000 div _gtotal"))).as("_semd"))
      .select(qn.map(col) :+ col("class_size") :+
        expr(s"_semd div ${buckets - 1}L").as("emd_x1e6"): _*)
  }

  /** Integer EMD between TWO register tables `(groups…, _b, _n)` per
    * group — the [[tClosenessFromCounts]] walk generalized from
    * class-vs-global to side-vs-side: the distribution-drift distance
    * between a baseline and a fresh window of the same registers (the
    * [[graft.streaming.TableMonitors]] drift panel). Groups present on
    * only ONE side get NULL emd — a vanished or newborn group IS drift
    * (the [[Similarity.centroidDriftFromSums]] discipline); both-sided
    * groups get the exact mean-|CDF gap| ×1e6. Registers need not be
    * pre-merged — each side is summed to one row per (groups…, _b)
    * here. All bounded: group×buckets scaffold, buckets-sized cumsum
    * windows. Output: (groups…, n_a, n_b, emd_x1e6).
    */
  def emdBetweenCounts(a: DataFrame, b: DataFrame, groups: Seq[String],
      buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groups.nonEmpty, "need at least one group column")
    require(buckets >= 2 && buckets <= 10000, s"2..10000 buckets, got $buckets")
    val spark = a.sparkSession
    val gb = groups :+ "_b"
    // Enforce the register contract IN-PLAN (round-15 advisor): an
    // out-of-range _b would silently deflate the [0,buckets) CDF while
    // still counting toward the totals, inflating emd — and would also
    // diverge from the DuckDB oracle, which derives totals from the
    // grid-joined rows. Callers are contractually clamp-first
    // (tClosenessCounts), so this raise_error is a loud tripwire, not a
    // filter that could mask a broken register upstream.
    def checkedB(df: DataFrame, side: String): DataFrame =
      df.withColumn("_b",
        when(col("_b") >= 0 && col("_b") < buckets, col("_b"))
          .otherwise(raise_error(concat(
            lit(s"emdBetweenCounts($side): _b outside [0, $buckets): "),
            col("_b").cast("string")))))
    val ra = checkedB(a, "a").groupBy(gb.map(col): _*).agg(sum("_n").as("_na"))
    val rb = checkedB(b, "b").groupBy(gb.map(col): _*).agg(sum("_n").as("_nb"))
    val keys = graft.util.Materialize.stable(
      ra.select(groups.map(col): _*)
        .unionByName(rb.select(groups.map(col): _*)).distinct())
    val ta = ra.groupBy(groups.map(col): _*).agg(sum("_na").as("n_a"))
    val tb = rb.groupBy(groups.map(col): _*).agg(sum("_nb").as("n_b"))
    val scaffold = keys
      .crossJoin(spark.range(buckets).select(col("id").as("_b")))
    val w = Window.partitionBy(groups.map(col): _*).orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold
      .join(ra, gb, "left").join(rb, gb, "left")
      .withColumn("_ca", sum(coalesce(col("_na"), lit(0L))).over(w))
      .withColumn("_cb", sum(coalesce(col("_nb"), lit(0L))).over(w))
      .join(ta, groups, "left").join(tb, groups, "left")
      .groupBy(groups.map(col): _*)
      .agg(
        coalesce(max("n_a"), lit(0L)).as("n_a"),
        coalesce(max("n_b"), lit(0L)).as("n_b"),
        when(max("n_a").isNull || max("n_b").isNull,
          lit(null).cast("long"))
          .otherwise(expr(s"sum(abs(_ca * 1000000 div n_a " +
            s"- _cb * 1000000 div n_b)) div ${buckets - 1}L"))
          .as("emd_x1e6"))
  }
}
