package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming aggregation/state operators beyond the replication path —
  * the Structured Streaming surface a Spark-first engine exposes
  * (watermarked windows, custom keyed state). The reference itself has no
  * stream windows (SURVEY.md ST3); these serve the monitoring/metrics
  * shapes (ST11-ST13) and the LLM-pipeline streaming ingest.
  */
object StreamOps {

  /** Watermarked tumbling-window counts per event type: the heartbeat /
    * throughput-metrics shape. Works identically on batch DataFrames
    * (window() is a plain grouping expression). Column names are
    * parameters (defaults match the events fixture): `tsCol` is an
    * epoch-µs long, `typeCol` the grouping dimension, `valueCol` the
    * summed measure.
    */
  def windowedCounts(events: DataFrame, watermark: String, windowLen: String,
      tsCol: String = "ts_us", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(col(tsCol)))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_value"))

  final case class SessionEvent(user_id: Long, ts_us: Long, event_type: String)
  final case class SessionState(start_us: Long, last_us: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, duration_us: Long)

  /** Session windows via custom keyed state (`flatMapGroupsWithState`):
    * a session closes after `gapUs` of inactivity. The
    * KeyValueGroupedDataset state shape the brief calls for; state is
    * O(active keys), EVICTED by event-time timeout — an idle key's final
    * session is flushed when the watermark passes `last + gap`, and its
    * state removed; without the timeout an idle session would never
    * close and state would grow with every key ever seen.
    *
    * `watermark` bounds how late an event may arrive and still extend
    * its session (batch execution ignores it; timeouts never fire there,
    * so a batch caller pairs this with [[closeOpenSessions]] as the
    * tests do).
    */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long,
      watermark: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.toDF()
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: the session
            // is definitively closed — emit it and drop the state
            val st = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, st.start_us, st.last_us, st.n, st.last_us - st.start_us))
          } else {
            // Sort within the group: micro-batches are small per key;
            // cross-batch order is handled by the gap rule itself.
            val sorted = rows.toSeq.sortBy(e => (e.ts_us))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(st) if e.ts_us - st.last_us <= gapUs =>
                  // A late event (ts < last_us, e.g. carried over from a prior
                  // batch) must not rewind the session clock — last_us stays
                  // monotone, and an event earlier than the recorded start
                  // extends the session backwards instead.
                  cur = Some(SessionState(math.min(st.start_us, e.ts_us),
                    math.max(st.last_us, e.ts_us), st.n + 1))
                case Some(st) =>
                  out += SessionOut(userId, st.start_us, st.last_us, st.n, st.last_us - st.start_us)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // close the session once the watermark clears its gap
              // window; clamped positive (µs→ms floors tiny fixtures to
              // 0) and past the current watermark (Spark rejects both)
              state.setTimeoutTimestamp(math.max(
                math.max(1L, (st.last_us + gapUs) / 1000L),
                state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  /** Generic-key streaming sessionize: any frame with a long-castable
    * key column (the engine's int64-id convention — [[graft.llm.Shuffling]]
    * enforces the same) and an epoch-µs long timestamp column. Output
    * keeps the caller's key column name: (keyCol, start_us, end_us,
    * n_events, duration_us).
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapUs: Long, watermark: String = "10 seconds"): DataFrame = {
    import events.sparkSession.implicits._
    val typed = events.select(
      col(keyCol).cast("long").as("user_id"),
      col(tsCol).cast("long").as("ts_us"),
      lit("").as("event_type")).as[SessionEvent]
    sessionize(typed, gapUs, watermark).toDF()
      .withColumnRenamed("user_id", keyCol)
  }

  /** Flush any open sessions (batch-mode helper for tests/final drains),
    * key/timestamp columns as parameters.
    */
  def closeOpenSessions(events: DataFrame, keyCol: String, tsCol: String,
      gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    val withGap = events
      .withColumn("_prev_us", lag(tsCol, 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_us").isNull || col(tsCol) - col("_prev_us") > gapUs, 1).otherwise(0))
      .withColumn("_session_id", sum("_new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    withGap.groupBy(col(keyCol), col("_session_id"))
      .agg(min(tsCol).as("start_us"), max(tsCol).as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .select(col(keyCol), col("start_us"), col("end_us"), col("n_events"),
        col("duration_us"))
  }

  /** Typed batch helper over the generic version. */
  def closeOpenSessions(events: Dataset[SessionEvent], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    closeOpenSessions(events.toDF(), "user_id", "ts_us", gapUs).as[SessionOut]
  }

  /** Stream-stream event-time interval join (attribution shape): each
    * `right` row joins the `left` rows with the same key whose timestamp
    * falls in `[right_ts - windowUs, right_ts)` — "clicks in the 24 h
    * before this purchase". On STREAMING inputs both sides get a
    * watermark of `windowUs + lateness` so Spark's stream-stream join can
    * age out left-side state once no future right row can reach it (the
    * interval condition + watermark is what bounds the state store — an
    * unbounded stream-stream join never GCs). On BATCH inputs the same
    * plan is an equi-join on the key with the interval as a join-time
    * filter: the shuffle partitions by key, never a cartesian.
    *
    * Input columns: `left` = (key, left_id, left_ts_us); `right` =
    * (key, right_id, right_ts_us). Output: one row per matched pair,
    * (key, right_id, right_ts_us, left_id, left_ts_us). INNER join —
    * right rows with no partner don't appear (the batch aggregation
    * layer reattaches them; a streaming outer interval join would emit
    * nulls only at watermark expiry).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftIdCol: String, leftTsCol: String, rightIdCol: String,
      rightTsCol: String, windowUs: Long,
      latenessUs: Long = 0L): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val streaming = left.isStreaming || right.isStreaming
    val l0 = left.select(col(keyCol).as("_k"),
      col(leftIdCol).as(leftIdCol), col(leftTsCol).as(leftTsCol),
      timestamp_micros(col(leftTsCol)).as("_l_time"))
    val r0 = right.select(col(keyCol).as("_r_k"),
      col(rightIdCol).as(rightIdCol), col(rightTsCol).as(rightTsCol),
      timestamp_micros(col(rightTsCol)).as("_r_time"))
    val (l, r) =
      if (streaming) {
        val wm = s"${(windowUs + latenessUs) / 1000000L + 1L} seconds"
        (l0.withWatermark("_l_time", wm), r0.withWatermark("_r_time", wm))
      } else (l0, r0)
    l.join(r,
        col("_k") === col("_r_k") &&
          col("_l_time") >= col("_r_time") - expr(s"INTERVAL $windowUs MICROSECOND") &&
          col("_l_time") < col("_r_time"))
      .select(col("_k").as(keyCol), col(rightIdCol), col(rightTsCol),
        col(leftIdCol), col(leftTsCol))
  }

  /** Click→purchase attribution over [[intervalJoin]]: per purchase, the
    * number of same-user clicks in the `windowUs` before it and the
    * latest such click (ties to the larger click id). Purchases with no
    * attributable click keep n_clicks = 0 and null click columns — the
    * left join back onto the purchase set restores them after the inner
    * interval join. Batch shape (the streaming path stops at the
    * per-pair [[intervalJoin]] emission; aggregation over it would need
    * its own watermarked window).
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
      windowUs: Long): DataFrame = {
    val pairs = intervalJoin(
      clicks.select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("click_ts_us")),
      purchases.select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_ts_us")),
      "user_id", "click_id", "click_ts_us", "purchase_id", "purchase_ts_us",
      windowUs)
    val perPurchase = pairs
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_clicks"),
        max(struct(col("click_ts_us"), col("click_id"))).as("_last"))
      .select(col("purchase_id"), col("n_clicks"),
        col("_last.click_id").as("last_click_id"),
        col("_last.click_ts_us").as("last_click_ts_us"))
    purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_ts_us"))
      .join(perPurchase, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts_us"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        col("last_click_id"), col("last_click_ts_us"))
  }
}
