package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{EventLogOffset, EventLogSource}

/** The custom DSv2 commit-log source (S1 capture boundary): batch read,
  * rate-limited micro-batch drain, per-segment ordering, and
  * checkpoint-resume picking up only appended segments.
  */
class EventLogSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private val Fmt = classOf[EventLogSource].getName

  private def writeSeg(dir: String, name: String, n: Int, from: Int = 0): Unit =
    Files.writeString(Paths.get(dir, name),
      (from until from + n).map(i => s"""{"event_id":$i}""").mkString("", "\n", "\n"))

  test("batch read returns every line with segment/offset provenance") {
    val dir = tmpDir("evlog")
    writeSeg(dir, "seg-000.log", 7)
    writeSeg(dir, "seg-001.log", 5, from = 7)
    val df = spark.read.format(Fmt).option("path", dir).load()
    assert(df.count() == 12)
    val r = df.filter(col("segment") === "seg-001.log")
      .orderBy("offset").select("value", "offset").collect()
    assert(r.length == 5)
    assert(r.head.getString(0) == """{"event_id":7}""" && r.head.getLong(1) == 0L)
  }

  test("micro-batch drain respects maxRowsPerTrigger and preserves per-segment order") {
    val dir = tmpDir("evlog")
    writeSeg(dir, "seg-000.log", 11)
    writeSeg(dir, "seg-001.log", 6, from = 11)
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream.format(Fmt)
      .option("path", dir).option("maxRowsPerTrigger", 4).load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("segment", "offset").collect()
        sizes.synchronized {
          sizes += rows.length.toLong
          seen ++= rows.map(r => (r.getString(0), r.getLong(1)))
        }
        (): Unit
      }
      .option("checkpointLocation", tmpDir("ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(seen.size == 17, s"all rows delivered, got ${seen.size}")
    assert(sizes.forall(_ <= 4), s"admission control violated: $sizes")
    assert(sizes.count(_ > 0) >= 5, s"expected >=5 rate-limited batches, got $sizes")
    // per-segment offsets arrive in order (commit-log ordering unit)
    Seq("seg-000.log", "seg-001.log").foreach { s =>
      val offs = seen.filter(_._1 == s).map(_._2)
      assert(offs == offs.sorted, s"out-of-order delivery in $s")
    }
  }

  test("checkpoint resume delivers only segments appended after the drain") {
    val dir = tmpDir("evlog")
    val ck = tmpDir("ck")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit = {
      val q = spark.readStream.format(Fmt).option("path", dir).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          out.synchronized { out ++= b.select("value").collect().map(_.getString(0)) }
          (): Unit
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    writeSeg(dir, "seg-000.log", 3)
    drain()
    assert(out.size == 3)
    out.clear()
    writeSeg(dir, "seg-001.log", 2, from = 3) // appended after first drain
    drain()
    assert(out.toSeq == Seq("""{"event_id":3}""", """{"event_id":4}"""),
      s"resume must deliver only the new segment, got $out")
  }

  test("offset json round-trips (incl. legacy pre-name form)") {
    val o = EventLogOffset(3, 41L, "seg-003.log", 1234L)
    assert(EventLogOffset.parse(o.json()) == o)
    assert(EventLogOffset.parse("""{"seg":3,"row":41}""") == EventLogOffset(3, 41L))
  }

  test("retention of consumed segments is safe; a deleted current segment fails loudly") {
    val dir = tmpDir("evlogret")
    val ck = tmpDir("ck")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit = {
      val q = spark.readStream.format(Fmt).option("path", dir).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          out.synchronized { out ++= b.select("value").collect().map(_.getString(0)) }
          (): Unit
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    writeSeg(dir, "seg-000.log", 3)
    writeSeg(dir, "seg-001.log", 2, from = 3)
    drain()
    assert(out.size == 5)
    out.clear()
    // the reference's CDC agent deletes fully-processed segments: indices
    // shift, but name-resolved offsets must keep delivering exactly the
    // new data
    Files.delete(Paths.get(dir, "seg-000.log"))
    writeSeg(dir, "seg-002.log", 2, from = 5)
    drain()
    assert(out.toSeq == Seq("""{"event_id":5}""", """{"event_id":6}"""),
      s"after retention only new rows must arrive, got $out")
    out.clear()
    // deleting the CHECKPOINT-CURRENT segment is unrecoverable data loss:
    // the source must fail loudly, never clamp onto the wrong file
    Files.delete(Paths.get(dir, "seg-002.log"))
    writeSeg(dir, "seg-003.log", 1, from = 7)
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format(Fmt).option("path", dir).load()
        .writeStream.foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => (): Unit }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(boom).exists(_.getMessage != null) &&
      causes(boom).exists(c => Option(c.getMessage).exists(_.contains("no longer exists"))),
      s"expected a loud retention error, got $boom")
  }

  test("an unterminated tail line is not admitted until its newline arrives") {
    val dir = tmpDir("evpart")
    // write a tail segment whose last line has no newline yet
    Files.writeString(Paths.get(dir, "seg-000.log"),
      "{\"event_id\":0}\n{\"event_id\":1")
    val (nTail, byteTail, _) = EventLogSource.scanLines(
      Paths.get(dir, "seg-000.log"), 0L, Long.MaxValue, countUnterminated = false)
    assert(nTail == 1L, "partial line must not count on the growing tail")
    assert(byteTail == 15L, "byte anchor must stop at the last newline")
    // batch semantics unchanged: the same file counts 2 when closed
    val (nClosed, _, _) = EventLogSource.scanLines(
      Paths.get(dir, "seg-000.log"), 0L, Long.MaxValue)
    assert(nClosed == 2L)
    // once the newline lands, the completed line is admitted from the anchor
    Files.writeString(Paths.get(dir, "seg-000.log"),
      "{\"event_id\":0}\n{\"event_id\":1}\n")
    val (nMore, _, _) = EventLogSource.scanLines(
      Paths.get(dir, "seg-000.log"), byteTail, Long.MaxValue,
      countUnterminated = false)
    assert(nMore == 1L, "the completed line arrives whole, not as a fragment")
  }

  test("a legacy checkpoint clamped onto a different segment restarts it at row 0") {
    // pre-name checkpoint {seg:2,row:3}; retention deleted segments so
    // only 2 remain — the clamped segment was NEVER consumed: keeping
    // row=3 would silently skip its first 3 rows
    val dir = tmpDir("evclamp")
    writeSeg(dir, "seg-000.log", 4)
    writeSeg(dir, "seg-001.log", 5, from = 4)
    val stream = new graft.streaming.EventLogMicroBatchStream(dir, 100L)
    val legacy = EventLogOffset(seg = 2, row = 3L) // name-less, out of range
    val end = stream.latestOffset(legacy,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(100L))
      .asInstanceOf[EventLogOffset]
    val parts = stream.planInputPartitions(legacy, end)
    val delivered = parts.map(_.asInstanceOf[graft.streaming.EventLogSlice])
      .map(s => (s.seg, s.from, s.until)).toSeq
    assert(delivered == Seq(("seg-001.log", 0L, 5L)),
      s"clamped segment must be read from row 0, got $delivered")
  }

  test("a lone CR inside a payload is data, not a line break") {
    // scanLines counts only '\n'; a reader splitting on '\r' too would
    // emit extra rows, desync the byte accounting, and drop the slice's
    // tail rows
    val dir = tmpDir("evcr")
    Files.writeString(Paths.get(dir, "seg-000.log"),
      "{\"a\":\"x\ry\"}\n{\"b\":1}\n")
    val df = spark.read.format(Fmt).option("path", dir).load()
    val vals = df.orderBy("offset").select("value")
      .collect().map(_.getString(0)).toSeq
    assert(vals == Seq("{\"a\":\"x\ry\"}", "{\"b\":1}"),
      s"CR must survive inside the payload: ${vals.map(_.replace("\r", "<CR>"))}")
  }

  test("AvailableNow quiescent-tail rule is opt-in; default never admits a partial line") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.streaming.EventLogMicroBatchStream
    val dir = tmpDir("evquiesce")
    val f = Paths.get(dir, "seg-000.log")
    Files.writeString(f, "{\"event_id\":0}\n{\"event_id\":1}") // no trailing \n
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    // OPT-IN (tailQuiesceMs > 0) + long-dead writer: the snapshot must
    // deliver BOTH lines — the batch path counts 2, and an S2 drain over
    // a finished log must not lose the last event
    val stream = new EventLogMicroBatchStream(dir, 100L, tailQuiesceMs = 2000L)
    stream.prepareForTriggerAvailableNow()
    val end = stream.latestOffset(EventLogOffset(0, 0L), ReadLimit.maxRows(100L))
      .asInstanceOf[EventLogOffset]
    assert(end.row == 2L, s"quiescent unterminated tail line must be admitted: $end")

    // DEFAULT (opt-in off): even a long-quiescent partial line is not
    // admitted — mtime cannot prove the writer is done, only stalled —
    // but the exclusion is NOT silent: the snapshot reports exactly how
    // many tail bytes the drain cap left behind
    val streamDefault = new EventLogMicroBatchStream(dir, 100L)
    streamDefault.prepareForTriggerAvailableNow()
    val endD = streamDefault.latestOffset(EventLogOffset(0, 0L), ReadLimit.maxRows(100L))
      .asInstanceOf[EventLogOffset]
    assert(endD.row == 1L, s"default must stay conservative: $endD")
    assert(streamDefault.excludedTailBytes == "{\"event_id\":1}".length.toLong,
      s"the cap's exclusion must be surfaced: ${streamDefault.excludedTailBytes}")
    // and the quiescent-admitting stream excluded nothing
    assert(stream.excludedTailBytes == 0L)

    // opted in but the tail is FRESH (possibly mid-flush): conservative
    val dir2 = tmpDir("evfresh")
    Files.writeString(Paths.get(dir2, "seg-000.log"),
      "{\"event_id\":0}\n{\"event_id\":1}")
    val stream2 = new EventLogMicroBatchStream(dir2, 100L, tailQuiesceMs = 2000L)
    stream2.prepareForTriggerAvailableNow()
    val end2 = stream2.latestOffset(EventLogOffset(0, 0L), ReadLimit.maxRows(100L))
      .asInstanceOf[EventLogOffset]
    assert(end2.row == 1L, s"a fresh partial line must NOT be admitted: $end2")
  }

  test("FR-024 backpressure: breaker state + sink latency shape the next trigger's admission") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.streaming.{AdmissionControl, EventLogMicroBatchStream}
    val dir = tmpDir("evbp")
    writeSeg(dir, "seg-000.log", 100)
    var now = 0L
    val breaker = new graft.util.CircuitBreaker(
      failureThreshold = 2, openMs = 1000L, clock = () => now)
    val ch = "bp-test"
    AdmissionControl.register(ch,
      AdmissionControl.SinkHealth(breaker = Some(breaker), probeRows = 3L))
    try {
      val stream = new EventLogMicroBatchStream(dir, 10L, Some(ch))
      val start = EventLogOffset(0, 0L)
      def admitted(from: EventLogOffset): Long =
        stream.latestOffset(from, ReadLimit.maxRows(10L))
          .asInstanceOf[EventLogOffset].row - from.row

      // healthy: full maxRows admitted
      assert(admitted(start) == 10L)

      // two sink failures trip the breaker → OPEN → the next trigger
      // admits NOTHING (consumption pauses, the FR-024 contract)
      (1 to 2).foreach { _ =>
        intercept[RuntimeException](breaker.call(throw new RuntimeException("sink down")))
      }
      assert(admitted(start) == 0L, "open breaker must pause admission")

      // cool-down elapses → HALF_OPEN → one small probe batch
      now += 1000L
      assert(admitted(start) == 3L, "half-open admits only the probe size")

      // the probe batch succeeds at the sink → CLOSED → full admission
      breaker.call(())
      assert(admitted(start) == 10L, "recovery restores full admission")

      // a slow (but not failing) sink shrinks admission proportionally:
      // 4 s against the 2 s target → half of maxRows
      AdmissionControl.reportLatency(ch, 4.0)
      assert(admitted(start) == 5L)
      // …but never below the probe size, so progress can't stall
      AdmissionControl.reportLatency(ch, 80.0)
      assert(admitted(start) == 3L)
      AdmissionControl.reportLatency(ch, 0.5)
      assert(admitted(start) == 10L, "a recovered sink restores full admission")
    } finally AdmissionControl.clear(ch)
  }

  test("10k-event drain through the source + bucketed store matches the batch fold") {
    import graft.streaming.ReplicationJob
    import graft.ops.{EventOps, Lww}
    val sf01 = "/root/testdata/sf0.01"
    // the commit-log envelope carries ts as a raw-ns long (the wire
    // contract) — rebuild it from ts_us so the fixture's parquet physical
    // timestamp type (ns in early generators, µs now) can't leak into the
    // JSON lines
    val ev = Tables.events(spark, sf01)
      .withColumn("ts", org.apache.spark.sql.functions.expr("ts_us * 1000"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    // serialize the fixture stream into 4 commit-log segments
    val dir = tmpDir("evlogbig")
    val lines = ev.toJSON.collect()
    lines.grouped((lines.length + 3) / 4).zipWithIndex.foreach { case (g, i) =>
      Files.writeString(Paths.get(dir, f"seg-$i%03d.log"), g.mkString("", "\n", "\n"))
    }
    val base = tmpDir("evrepl2")
    val cfg = ReplicationJob.Config(
      sourceDir = dir, targetDir = s"$base/target", dlqDir = s"$base/dlq",
      checkpointDir = s"$base/ckpt", eventLog = Some((dir, 4000L)),
      stateBuckets = Some(16))
    ReplicationJob.start(spark, cfg).awaitTermination(300000)
    // expected: identical validate -> LWW fold, computed in one batch pass
    val err = EventOps.errorType(col("event_type"), col("value"), col("user_id"),
      cfg.validTypes, cfg.maxValue)
    val (valid, invalid) = EventOps.validationSplit(
      ev.withColumn("ts_us", expr("ts div 1000")), err)
    val expected = Lww.latestPerKey(
        valid.select("user_id", "event_id", "ts_us"),
        Seq("user_id"), Seq(col("ts_us"), col("event_id")))
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    val got = ReplicationJob.targetState(spark, cfg)
      .select(col("user_id"), col("_last_event_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected,
      s"state diverged on ${got.toSet.diff(expected.toSet).take(3)}")
    assert(spark.read.parquet(cfg.dlqDir).count() == invalid.count(),
      "every invalid event lands in the DLQ exactly once across batches")
  }

  test("replication job end-to-end over the commit-log source") {
    import graft.streaming.ReplicationJob
    val dir = tmpDir("evlog")
    def ev(id: Long, ts: Long, uid: Long, et: String, v: Double) =
      s"""{"event_id":$id,"ts":${ts * 1000},"user_id":$uid,"event_type":"$et","value":$v}"""
    // user 1: out-of-order arrivals, LWW winner = ts 300 (event 3)
    // user 2: single valid event; event 5 is invalid (bad type) → DLQ
    Files.writeString(Paths.get(dir, "seg-000.log"), Seq(
      ev(1, 300, 1, "purchase", 10.0),
      ev(2, 100, 1, "view", 5.0),
      ev(5, 400, 2, "bogus_type", 1.0)).mkString("", "\n", "\n"))
    Files.writeString(Paths.get(dir, "seg-001.log"), Seq(
      ev(3, 200, 1, "click", 7.0),
      ev(4, 250, 2, "signup", 2.0)).mkString("", "\n", "\n"))
    val base = tmpDir("evrepl")
    val cfg = ReplicationJob.Config(
      sourceDir = dir, targetDir = s"$base/target", dlqDir = s"$base/dlq",
      checkpointDir = s"$base/ckpt", eventLog = Some((dir, 2L)))
    ReplicationJob.start(spark, cfg).awaitTermination(120000)
    val state = ReplicationJob.targetState(spark, cfg)
      .select("user_id", "_last_event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == Map(1L -> 1L, 2L -> 4L),
      s"LWW winners wrong: $state") // user 1: ts 300 = event 1; user 2: event 4
    val dlq = spark.read.parquet(s"$base/dlq").select("event_id").collect().map(_.getLong(0))
    assert(dlq.toSeq == Seq(5L), s"invalid event must route to DLQ, got ${dlq.toSeq}")
  }
}
