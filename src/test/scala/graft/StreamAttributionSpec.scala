package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Stream-stream interval join: the same [[StreamOps.intervalJoin]] plan
  * must run as a watermarked streaming join and emit exactly the batch
  * rows, and its physical plan must carry the watermark that lets the
  * state store age out (an unwatermarked stream-stream join grows
  * forever — the 100 TB failure mode).
  */
class StreamAttributionSpec extends SparkSpecBase {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val W = 1000000L // 1 s attribution window, µs

  // (user, id, ts_us) triples; clicks and purchases interleaved
  private val clicks = Seq(
    (1L, 101L, 1000000L), (1L, 102L, 1800000L), (1L, 103L, 3000000L),
    (2L, 201L, 500000L), (3L, 301L, 9000000L))
  private val purchases = Seq(
    (1L, 901L, 2000000L), // catches clicks 101 (>=1.0s) and 102
    (2L, 902L, 2000000L), // click 201 too old (0.5s < 1.0s)
    (3L, 903L, 9500000L)) // catches 301

  private def df(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("user_id", "event_id", "ts_us")

  test("streaming interval join emits exactly the batch rows") {
    val batch = StreamOps.intervalJoin(
      df(clicks).select($"user_id", $"event_id".as("click_id"), $"ts_us".as("click_ts_us")),
      df(purchases).select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_ts_us")),
      "user_id", "click_id", "click_ts_us", "purchase_id", "purchase_ts_us", W)
      .collect().toSet

    val cIn = MemoryStream[(Long, Long, Long)]
    val pIn = MemoryStream[(Long, Long, Long)]
    val joined = StreamOps.intervalJoin(
      cIn.toDF().toDF("user_id", "click_id", "click_ts_us"),
      pIn.toDF().toDF("user_id", "purchase_id", "purchase_ts_us"),
      "user_id", "click_id", "click_ts_us", "purchase_id", "purchase_ts_us", W)
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory")
      .queryName("attr_join").outputMode("append").start()
    try {
      // two micro-batches: the early events, then the user-3 tail
      cIn.addData(clicks.filter(_._1 <= 2): _*)
      pIn.addData(purchases.filter(_._1 <= 2): _*)
      q.processAllAvailable()
      cIn.addData(clicks.filter(_._1 == 3): _*)
      pIn.addData(purchases.filter(_._1 == 3): _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_join").collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming plan carries watermarks on both sides") {
    val cIn = MemoryStream[(Long, Long, Long)]
    val pIn = MemoryStream[(Long, Long, Long)]
    val joined = StreamOps.intervalJoin(
      cIn.toDF().toDF("user_id", "click_id", "click_ts_us"),
      pIn.toDF().toDF("user_id", "purchase_id", "purchase_ts_us"),
      "user_id", "click_id", "click_ts_us", "purchase_id", "purchase_ts_us", W)
    val plan = joined.queryExecution.analyzed.toString
    assert("EventTimeWatermark".r.findAllIn(plan).size === 2,
      s"both join inputs must be watermarked for state GC:\n$plan")
  }

  test("clickAttribution batch aggregation: counts, last click, zero-click purchases") {
    val out = StreamOps.clickAttribution(df(clicks), df(purchases), W)
      .orderBy("purchase_id")
      .select("purchase_id", "n_clicks", "last_click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.toSeq === Seq((901L, 2L, 102L), (902L, 0L, -1L), (903L, 1L, 301L)))
  }

  test("dropDuplicatesWithinWatermark dedups replayed ids across micro-batches") {
    val in = MemoryStream[(Long, Long)]
    val deduped = in.toDF().toDF("event_id", "ts_us")
      .withColumn("event_time", timestamp_micros($"ts_us"))
      .withWatermark("event_time", "10 seconds")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory")
      .queryName("dd_wm").outputMode("append").start()
    try {
      in.addData((1L, 1000000L), (2L, 2000000L))
      q.processAllAvailable()
      // replay id 1 within the watermark + a novel id
      in.addData((1L, 2500000L), (3L, 3000000L))
      q.processAllAvailable()
      val ids = spark.table("dd_wm").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
