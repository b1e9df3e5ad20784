package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Scd
import graft.streaming.StreamingScd

/** Streaming SCD2 == batch SCD2, across micro-batches and under replay
  * (the at-least-once foreachBatch contract): the incremental
  * bucket-scoped fold must land bit-for-bit on `Scd.scd2History` over
  * the full change log, including the cross-batch interval closure (a
  * key's open interval from batch N closed by its next change in batch
  * N+k) and a replayed batch (same result, no duplicate versions).
  */
class StreamingScdSpec extends SparkSpecBase {

  private def changes: DataFrame =
    Tables.events(spark, sfDir).select(col("user_id"), col("event_id"),
      col("ts_us"), col("event_type"),
      graft.ops.EventOps.cents(col("value")).as("value_cents"))

  private def mkScd(base: String) = new StreamingScd(spark,
    changesDir = s"$base/log", historyDir = s"$base/hist",
    keyCols = Seq("user_id"), tsUsCol = "ts_us", eventIdCol = "event_id",
    isDelete = col("event_type") === "error",
    payloadCols = Seq("event_type", "value_cents"), buckets = 8)

  private def asSet(df: DataFrame) =
    df.select("user_id", "event_type", "value_cents", "valid_from_us",
        "valid_to_us", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5))).toSet

  test("stream of 3 micro-batches + a replay equals the one-shot batch fold") {
    val base = tmpDir("scd_stream")
    val scd = mkScd(base)
    val all = changes
    val (t1, t2) = {
      val q = all.stat.approxQuantile("ts_us", Array(0.33, 0.66), 0.0)
      (q(0).toLong, q(1).toLong)
    }
    val b0 = all.filter(col("ts_us") <= t1)
    val b1 = all.filter(col("ts_us") > t1 && col("ts_us") <= t2)
    val b2 = all.filter(col("ts_us") > t2)
    assert(b0.count() > 0 && b1.count() > 0 && b2.count() > 0)

    scd.processBatch(b0, 0L)
    // cross-batch closure setup: open intervals exist after batch 0 for
    // keys that change again later
    val openAfterB0 = scd.history.filter(col("is_current")).count()
    assert(openAfterB0 > 0)

    scd.processBatch(b1, 1L)
    scd.processBatch(b1, 1L) // replayed batch — at-least-once delivery
    scd.processBatch(b2, 2L)

    val want = asSet(Scd.scd2History(all, Seq("user_id"),
      Seq(col("ts_us"), col("event_id")), "ts_us",
      col("event_type") === "error", Seq("event_type", "value_cents")))
    assert(asSet(scd.history) === want,
      "incremental fold diverged from the one-shot batch fold")
    // exactly one open version per surviving key — no replay duplicates
    val dup = scd.history.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") > 1).count()
    assert(dup === 0L)
  }

  test("a later batch closes the open interval a key carried since an earlier batch") {
    val base = tmpDir("scd_close")
    val scd = mkScd(base)
    import spark.implicits._
    val b0 = Seq((7L, 1L, 1000L, "view", 5L))
      .toDF("user_id", "event_id", "ts_us", "event_type", "value_cents")
    val b1 = Seq((7L, 2L, 2000L, "click", 9L))
      .toDF("user_id", "event_id", "ts_us", "event_type", "value_cents")
    scd.processBatch(b0, 0L)
    val v0 = scd.history.collect()
    assert(v0.length === 1 && v0.head.getAs[Boolean]("is_current"))
    scd.processBatch(b1, 1L)
    val rows = scd.history.orderBy("valid_from_us").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("valid_to_us") === 2000L &&
      !rows(0).getAs[Boolean]("is_current"),
      "the batch-0 open interval must close at the batch-1 change time")
    assert(rows(1).getAs[Boolean]("is_current"))
    // and a delete in a still-later batch closes without a new version
    val b2 = Seq((7L, 3L, 3000L, "error", 0L))
      .toDF("user_id", "event_id", "ts_us", "event_type", "value_cents")
    scd.processBatch(b2, 2L)
    val afterDel = scd.history.orderBy("valid_from_us").collect()
    assert(afterDel.length === 2)
    assert(afterDel(1).getAs[Long]("valid_to_us") === 3000L &&
      !afterDel(1).getAs[Boolean]("is_current"),
      "a delete closes the open interval and emits no version row")
  }
}
