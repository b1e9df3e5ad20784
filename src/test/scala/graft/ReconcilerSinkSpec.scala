package graft

import org.apache.spark.sql.functions._

import graft.recon.Reconciler
import graft.sink.JdbcUpsertSql
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{SessionEvent, SessionOut}

class ReconcilerSinkSpec extends SparkSpecBase {
  import spark.implicits._

  test("row-count validation computes drift like the reference (quantized 0.01)") {
    val src = (1 to 1000).toDF("id")
    val tgt = (1 to 987).toDF("id")
    val r = Reconciler.rowCountValidation(src, tgt).collect().head
    assert(r.getAs[Long]("source_count") == 1000)
    assert(r.getAs[Long]("mismatch_count") == 13)
    assert(r.getAs[Double]("drift_percentage") == 1.3)
  }

  test("checksum mismatch taxonomy: missing both ways + data mismatch") {
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val tgt = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("id", "v")
    val m = Reconciler.checksumMismatches(src, tgt, "id", Seq("v"))
      .select("id", "mismatch_type").as[(Long, String)].collect().toMap
    assert(m(1L) == Reconciler.MissingInTarget)
    assert(m(3L) == Reconciler.DataMismatch)
    assert(m(4L) == Reconciler.MissingInSource)
    assert(!m.contains(2L))
  }

  test("timestamp-range validation only inspects the window") {
    val src = Seq((1L, "a", 100L), (2L, "b", 200L)).toDF("id", "v", "ts_us")
    val tgt = Seq((1L, "X", 100L), (2L, "Y", 200L)).toDF("id", "v", "ts_us")
    val m = Reconciler.timestampRange(src, tgt, "id", Seq("v"), "ts_us", 150L, 250L)
    assert(m.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("alert severity thresholds match reference (warn ≥1%, crit ≥5%)") {
    val df = Seq(0.5, 1.0, 4.99, 5.0).toDF("drift")
      .select(Reconciler.alertSeverity(col("drift")).as("sev"))
    assert(df.as[String].collect().toSeq == Seq(null, "warning", "warning", "critical"))
  }

  test("upsert SQL carries the reference's conditional LWW clause") {
    val sql = JdbcUpsertSql.upsertSql("cdc_users",
      Seq("id", "name", "_cdc_timestamp_micros", "_last_event_id"), Seq("id"))
    assert(sql.contains("ON CONFLICT (id) DO UPDATE"))
    assert(sql.contains("EXCLUDED._cdc_timestamp_micros > cdc_users._cdc_timestamp_micros"))
    assert(sql.contains("EXCLUDED._last_event_id > cdc_users._last_event_id"))
    assert(!sql.contains("id = EXCLUDED.id"), "pk must not be in the SET list")
  }

  test("auto-create DDL appends CDC metadata columns and pk") {
    val ddl = JdbcUpsertSql.createTableDdl("cdc_users",
      Seq("id" -> "VARCHAR", "age" -> "INTEGER"), Seq("id"))
    assert(ddl.contains("_cdc_deleted BOOLEAN NOT NULL DEFAULT FALSE"))
    assert(ddl.contains("_ttl_expiry_timestamp TIMESTAMPTZ"))
    assert(ddl.contains("PRIMARY KEY (id)"))
  }

  test("sessionize (batch helper): gap splits sessions, counts exact") {
    val evs = Seq(
      SessionEvent(1, 0, "a"), SessionEvent(1, 10, "b"), SessionEvent(1, 1000, "c"),
      SessionEvent(2, 5, "x")).toDS()
    val out = StreamOps.closeOpenSessions(evs, gapUs = 100)
      .collect().sortBy(s => (s.user_id, s.start_us))
    assert(out.length == 3)
    assert(out(0).n_events == 2 && out(0).duration_us == 10)
    assert(out(1).start_us == 1000 && out(1).n_events == 1)
    assert(out(2).user_id == 2)
  }

  test("sessionize/closeOpenSessions: key and ts column names are parameters") {
    val df = Seq((7L, 0L), (7L, 10L), (7L, 1000L), (9L, 5L))
      .toDF("device_id", "t_us")
    val out = StreamOps.closeOpenSessions(df, "device_id", "t_us", gapUs = 100)
      .orderBy("device_id", "start_us")
      .select("device_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((7L, 0L, 10L, 2L), (7L, 1000L, 1000L, 1L),
      (9L, 5L, 5L, 1L)))
    assert(StreamOps.closeOpenSessions(df, "device_id", "t_us", gapUs = 100)
      .columns.head === "device_id")
  }

  test("streaming sessionize: an idle key's session closes by event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    val q = StreamOps.sessionize(input.toDS(), gapUs = 100L, watermark = "0 seconds")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[SessionOut], _: Long) =>
        out.synchronized { out ++= b.collect() }; (): Unit
      }
      .option("checkpointLocation", tmpDir("sessck"))
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      // batch 1: key 1's only events; batch 2: key 2 far in event time —
      // advances the watermark past key 1's gap window, so key 1's
      // session must flush on TIMEOUT, with no further key-1 events.
      // (timestamps start away from epoch 0, which the initial watermark
      // would treat as late)
      val t0 = 1000000000L
      input.addData(SessionEvent(1, t0, "a"), SessionEvent(1, t0 + 10, "b"))
      q.processAllAvailable()
      input.addData(SessionEvent(2, t0 + 100000000L, "x"))
      q.processAllAvailable()
      input.addData(SessionEvent(2, t0 + 200000000L, "y")) // one more watermark advance
      q.processAllAvailable()
      val key1 = out.synchronized(out.filter(_.user_id == 1L).toList)
      assert(key1 == List(SessionOut(1L, t0, t0 + 10L, 2L, 10L)),
        s"idle session must close via timeout: $key1 (all: ${out.toList})")
    } finally q.stop()
  }

  test("windowed counts aggregate the fixture stream (batch mode)") {
    val ev = Tables.events(spark, sfDir)
    val w = StreamOps.windowedCounts(ev, "10 minutes", "1 hour")
    val total = w.agg(sum("n")).as[Long].collect().head
    assert(total == ev.count())
  }

  test("orphan audit: closed-form counts, null child keys are orphans") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L, 3L).toDF("pk") // dup parent keys dedupe
    val got = graft.recon.Integrity.orphanAudit(Seq(
        ("c->p", child, Seq("fk"), parent, Seq("pk")),
        ("self", parent, Seq("pk"), parent, Seq("pk"))))
      .collect().map(r => r.getString(0) -> r).toMap
    val cp = got("c->p")
    assert(cp.getAs[Long]("n_child") === 6L)
    assert(cp.getAs[Long]("n_orphans") === 2L) // 9 and NULL
    assert(cp.getAs[Long]("orphan_permille") === 1000L * 2 / 6)
    val self = got("self")
    assert(self.getAs[Long]("n_orphans") === 0L &&
      self.getAs[Long]("orphan_permille") === 0L)
  }

  test("gap ranges: bucket decomposition equals the naive full-sequence " +
      "scan, including gaps spanning empty buckets") {
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 5000L, 9000L)
    // gaps: 4..9 (6), 12..4999 (4988, spans many empty 16-wide buckets),
    // 5001..8999 (3999)
    def got(bucket: Long) = graft.recon.Completeness.gapRanges(
        ids.toDF("id"), col("id"), topK = 10, bucketSize = bucket)
      .as[(Long, Long, Long)].collect().toList
    val want = List((12L, 4999L, 4988L), (5001L, 8999L, 3999L), (4L, 9L, 6L))
    assert(got(16L) === want, "small buckets (boundary path)")
    assert(got(1L << 20) === want, "one bucket (inner path only)")
    // topK truncation is by (len desc, start asc)
    assert(graft.recon.Completeness.gapRanges(ids.toDF("id"), col("id"),
        topK = 1, bucketSize = 16).as[(Long, Long, Long)].collect().toList
      === want.take(1))
  }

  test("duplicate delivery audit: closed-form redelivery counts") {
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 5L), ("b", 5L), ("b", 6L), ("b", 7L)).toDF("g", "id")
    val got = graft.recon.Completeness.duplicateDeliveryAudit(
        rows, col("id"), "g")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_rows") === 4L && a.getAs[Long]("n_ids") === 2L)
    assert(a.getAs[Long]("n_dup_ids") === 1L &&
      a.getAs[Long]("n_extra_rows") === 2L)
    assert(a.getAs[Long]("max_copies") === 3L &&
      a.getAs[Long]("dup_permille") === 500L)
    val b = got("b")
    assert(b.getAs[Long]("n_dup_ids") === 1L &&
      b.getAs[Long]("max_copies") === 2L)
    assert(b.getAs[Long]("dup_permille") === 250L)
  }

  test("lateness profile: hand-computed regressions per group") {
    val rows = Seq(
      // user 1, type a: arrival ts 10,20,15,30,5 -> 2 late of 4 pairs,
      // regressions 5 and 25
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "a"), (1L, 3L, 15L, "a"),
      (1L, 4L, 30L, "a"), (1L, 5L, 5L, "a"),
      // user 2, type b: perfectly ordered
      (2L, 1L, 100L, "b"), (2L, 2L, 200L, "b"),
      // user 3, type c: a single event has no pair
      (3L, 1L, 7L, "c"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val got = graft.ops.EventAnalytics.latenessProfile(rows,
        "user_id", "event_id", "ts_us", "event_type")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_events") === 5L && a.getAs[Long]("n_pairs") === 4L)
    assert(a.getAs[Long]("n_late") === 2L &&
      a.getAs[Long]("late_permille") === 500L)
    assert(a.getAs[Long]("max_regression_us") === 25L &&
      a.getAs[Long]("total_regression_us") === 30L)
    val b = got("b")
    assert(b.getAs[Long]("n_late") === 0L &&
      b.getAs[Long]("total_regression_us") === 0L)
    val c = got("c")
    assert(c.getAs[Long]("n_pairs") === 0L &&
      c.getAs[Long]("late_permille") === 0L)
  }
}
