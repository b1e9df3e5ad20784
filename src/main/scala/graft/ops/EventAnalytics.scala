package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over the event stream —
  * the two product-analytics aggregates every event warehouse serves
  * (reference scope: the events table's analytic consumers,
  * `specs/001-cass-cdc-pg/spec.md` reporting queries; the operators
  * themselves are the classic shapes, not reference inventions).
  *
  * Scale shape (both): every join and aggregate is keyed on the user
  * column — after the first exchange the per-user frames are
  * co-partitioned, so the stage chain reuses one partitioning (AQE
  * coalesces the tiny per-user sides), and nothing is ever ordered
  * globally. Per-user event counts bound each task's work; a hot user
  * bounds one task at its own event count, never the corpus.
  */
object EventAnalytics {

  /** Per-user RECENT-HISTORY assembly: the last `n` events of each user
    * in most-recent-first order, emitted as one row per user with the
    * ordered event-id string and the recency span — the
    * sequence-assembly step of building behavioral training windows
    * ("the user's last 5 actions") from an event log, and the log-side
    * twin of [[graft.llm.Retrieval.contextPack]]'s context cut.
    *
    * Ordering is total and deterministic: (ts desc, event_id desc) —
    * two events at the same microsecond cannot flip the history string
    * between runs. The joined-string form (ids pipe-joined in rank
    * order) is the hash-oracle-stable representation; a consumer that
    * wants the array splits it.
    *
    * Scale shape: ONE user-keyed exchange; the rank filter is a
    * WindowGroupLimit (top-n per key pushes into the sort — no user's
    * full history materializes past the limit), and the rollup runs on
    * the ≤n-per-user survivor set. A pathological hyper-user still
    * bounds its OUTPUT at n rows; cap its input upstream (the
    * [[graft.graph.GraphOps]] degree-cap discipline) if its raw volume
    * dominates a partition. Output: (user_id, n_recent, first_ts_us,
    * last_ts_us, history).
    */
  def userHistories(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, n: Int): DataFrame =
    historiesFromRecent(
      recentEvents(events, userCol, idCol, tsCol, n),
      userCol, idCol, tsCol, n)

  /** The history's MERGEABLE state: each user's last-`n` event ROWS —
    * last-n is a true register in the top-k sense (the last n of
    * A ∪ B = the last n of (last n of A) ∪ (last n of B)), so
    * per-batch survivor sets union-merge and re-rank over ≤ 2n rows
    * per user, never the raw history. One user-keyed WindowGroupLimit.
    */
  def recentEvents(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"history length must be >= 1, got $n")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    events
      .select(col(userCol), col(idCol), col(tsCol))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** The per-user rollup over a (possibly merged) survivor set — ranks
    * are recomputed HERE, so the input may be any union of per-batch
    * [[recentEvents]] outputs (≤ batches·n rows per user); one code
    * path with the batch entry, the folded panel cannot drift.
    */
  def historiesFromRecent(recent: DataFrame, userCol: String,
      idCol: String, tsCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"history length must be >= 1, got $n")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    recent
      // at-least-once replay can deliver the same survivor row in two
      // batches of the union; without this the duplicate gets two ranks
      // and corrupts the history string (repeated ids, inflated
      // n_recent). Idempotence here is the union-merge contract.
      .dropDuplicates(Seq(userCol, idCol, tsCol))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_recent"),
        min(col(tsCol)).as("first_ts_us"),
        max(col(tsCol)).as("last_ts_us"),
        array_sort(collect_list(struct(col("_rn"), col(idCol).as("_id"))))
          .as("_h"))
      .withColumn("history",
        expr("concat_ws('|', transform(_h, s -> CAST(s._id AS STRING)))"))
      .drop("_h")
  }

  /** Per-user earliest time of each funnel stage, where stage k must
    * occur STRICTLY AFTER the user's stage-(k-1) time and within
    * `windowUs` of it — the ordered conversion funnel with a conversion
    * window (a purchase logged before the first view, or a week after
    * the click, does not count as funnel progress). One (join + min-agg)
    * round per stage beyond the first, all user-keyed. Output: one row
    * per user who completed stage 1, with nullable `t1..tN` epoch-µs
    * columns.
    */
  def stageTimes(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, stages: Seq[String], windowUs: Long): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val ev = events.select(col(userCol).as("_u"), col(typeCol).as("_t"),
      col(tsUsCol).cast("long").as("_ts"))
    var acc = ev.filter(col("_t") === stages.head)
      .groupBy("_u").agg(min("_ts").as("t1"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val k = i + 1
      val nxt = ev.filter(col("_t") === st)
        .join(acc.select(col("_u"), col(s"t$i")), Seq("_u"))
        .filter(col("_ts") > col(s"t$i") &&
          col("_ts") <= col(s"t$i") + windowUs)
        .groupBy("_u").agg(min("_ts").as(s"t$k"))
      acc = acc.join(nxt, Seq("_u"), "left")
    }
    acc.withColumnRenamed("_u", userCol)
  }

  /** Funnel conversion counts: how many users reached each stage (in
    * order, each within the conversion window of the previous stage).
    * Output: (stage_no, stage, n_users), one row per stage — stage
    * populations are nested by construction.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, stages: Seq[String], windowUs: Long): DataFrame = {
    val times = stageTimes(events, userCol, typeCol, tsUsCol, stages, windowUs)
    val counts = times.agg(
      count(lit(1)).as("c1"),
      stages.indices.drop(1).map(i =>
        count(col(s"t${i + 1}")).as(s"c${i + 1}")): _*)
    // one row in, |stages| rows out — a bounded explode of the 1-row agg
    val pairs = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("stage_no"), lit(st).as("stage"),
        col(s"c${i + 1}").as("n_users"))
    }
    counts.select(explode(array(pairs: _*)).as("s"))
      .select(col("s.stage_no"), col("s.stage"), col("s.n_users"))
  }

  /** Per-stage conversion latency: for every stage k ≥ 2, how many users
    * converted and the EXACT lower-median time from stage k−1 — the
    * funnel's "where do users stall" panel. The median is the
    * ⌈n/2⌉-th smallest duration (integer-exact, engine-portable; no
    * interpolated float percentile), computed with a per-stage window
    * over the converting users — each partition is one stage's
    * durations, bounded by that stage's population.
    * Output: (stage_no, stage, n_users, median_gap_us). A stage with
    * ZERO converters emits NO row (there is no duration to take a
    * median of) — consumers needing an explicit n_users=0 panel row
    * should left-join the stage list onto this result.
    */
  def funnelLatency(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, stages: Seq[String], windowUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stages.size >= 2, "need at least two stages for latencies")
    val times = stageTimes(events, userCol, typeCol, tsUsCol, stages, windowUs)
    val gaps = stages.indices.drop(1).map { i =>
      val k = i + 1
      times.filter(col(s"t$k").isNotNull)
        .select(lit(k).as("stage_no"), lit(stages(i)).as("stage"),
          (col(s"t$k") - col(s"t$i")).as("gap_us"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("stage_no").orderBy("gap_us")
    val cw = Window.partitionBy("stage_no")
    gaps
      .withColumn("_rk", row_number().over(w).cast("long"))
      .withColumn("n_users", count(lit(1)).over(cw))
      .filter(col("_rk") === expr("(n_users + 1) div 2"))
      .select(col("stage_no"), col("stage"), col("n_users"),
        col("gap_us").as("median_gap_us"))
  }

  /** Cohort retention triangle: cohort = the user's FIRST active period
    * (`ts div periodUs`, exact integer arithmetic in both engines), and
    * a user is retained at offset `w` iff they have any event in cohort
    * period + w. Output: (cohort_period, period_offset, n_users). Two
    * user-keyed aggregates and one co-partitioned join; the final
    * aggregate is ≤ periods² rows however large the corpus.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsUsCol: String, periodUs: Long): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val periods = events.select(col(userCol).as("_u"),
      expr(s"CAST($tsUsCol AS BIGINT) div ${periodUs}L").as("period"))
      .distinct()
    val first = periods.groupBy("_u").agg(min("period").as("cohort_period"))
    periods.join(first, Seq("_u"))
      .select(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"), col("_u"))
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Robust per-key outlier profile by median absolute deviation — the
    * data-quality triage that survives the outliers it hunts (a mean/
    * stddev rule is dragged by the very points it should flag; the
    * median/MAD pair has a 50% breakdown point). All integer: both
    * medians are the engine's exact lower-median idiom (the
    * ⌈n/2⌉-th smallest, no float percentile), and the flag is the
    * cross-multiplied strict test `|v − median| > k · MAD` — with
    * MAD = 0 (over half the key's values identical) ANY deviation
    * flags, the right degenerate behavior.
    *
    * Scale shape: two key-partitioned windows (value rank, deviation
    * rank) + one key aggregate — state bounded by a single key's rows,
    * never a global sort.
    * Output: (key, n_events, median_v, mad_v, n_anomalies).
    */
  def madOutliers(events: DataFrame, keyCol: String, valueCol: Column,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val base = events.select(col(keyCol).as("_k"), valueCol.as("_v"))
      .filter(col("_v").isNotNull)
    val wv = Window.partitionBy("_k").orderBy(col("_v"))
    val cw = Window.partitionBy("_k")
    val med = base
      .withColumn("_rk", row_number().over(wv).cast("long"))
      .withColumn("_n", count(lit(1)).over(cw))
      .filter(col("_rk") === expr("(_n + 1) div 2"))
      .select(col("_k"), col("_v").as("median_v"))
    val dev = base.join(med, "_k")
      .withColumn("_d", abs(col("_v") - col("median_v")))
    val wd = Window.partitionBy("_k").orderBy(col("_d"))
    val mad = dev
      .withColumn("_rk", row_number().over(wd).cast("long"))
      .withColumn("_n", count(lit(1)).over(cw))
      .filter(col("_rk") === expr("(_n + 1) div 2"))
      .select(col("_k"), col("_d").as("mad_v"))
    dev.join(mad, "_k")
      .groupBy(col("_k").as(keyCol))
      .agg(count(lit(1)).as("n_events"),
        max("median_v").as("median_v"), max("mad_v").as("mad_v"),
        sum(when(col("_d") > lit(k) * col("mad_v"), 1L).otherwise(0L))
          .as("n_anomalies"))
  }

  /** Out-of-order-arrival profile — the measurement a streaming
    * watermark is SIZED by, instead of guessed: within each key's
    * arrival order (`seqCol` — the CDC event id / log offset), how
    * often does event time regress, and by how much? `late_permille`
    * says whether order can be assumed; `max_regression_us` bounds the
    * watermark delay that would have lost nothing;
    * `total_regression_us` is the aggregate disorder budget. The
    * unbounded-lateness LWW path ([[graft.streaming.CrossBatchLww]])
    * exists precisely for the tail this profile quantifies.
    *
    * Scale shape: ONE key-partitioned window (lag — the LWW exchange
    * shape, AQE-skewed keys notwithstanding bounded per-row state) into
    * one partial-agg rollup per `groupCol`; integers end-to-end.
    * Output: (groupCol, n_events, n_pairs, n_late, late_permille,
    * max_regression_us, total_regression_us).
    */
  def latenessProfile(events: DataFrame, keyCol: String, seqCol: String,
      tsUsCol: String, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(seqCol)
    val reg = when(col(tsUsCol) < col("_prev"),
      col("_prev") - col(tsUsCol)).otherwise(lit(0L))
    events.withColumn("_prev", lag(tsUsCol, 1).over(w))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_events"),
        count("_prev").as("n_pairs"),
        sum(when(col(tsUsCol) < col("_prev"), 1L).otherwise(0L)).as("n_late"),
        max(reg).as("max_regression_us"),
        sum(reg).as("total_regression_us"))
      .withColumn("late_permille", when(col("n_pairs") === 0, 0L)
        .otherwise(expr("(1000 * n_late) div n_pairs")))
  }
}
