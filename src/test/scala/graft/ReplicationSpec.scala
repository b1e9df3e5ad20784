package graft

import org.apache.spark.sql.functions._

import graft.ops.{EventOps, Lww}
import graft.streaming.ReplicationJob
import graft.streaming.ReplicationJob.Config

/** End-to-end replication path over the sf0.001 fixture stream:
  * stream → validate/split → compact → upsert, then replay for
  * exactly-once semantics (reference test_kafka_to_postgres +
  * test_checkpoint_resume semantics).
  */
class ReplicationSpec extends SparkSpecBase {

  private def freshCfg(): Config = {
    val base = tmpDir("repl")
    Config(
      sourceDir = s"$sfDir",                 // events.parquet lives here
      targetDir = s"$base/target",
      dlqDir = s"$base/dlq",
      checkpointDir = s"$base/ckpt")
  }

  // The file-source stream needs a directory of event files; point at a
  // dir containing only events.parquet.
  private def eventSourceDir(): String = {
    val d = tmpDir("src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  private def expectedState() = {
    val ev = Tables.events(spark, sfDir)
    val err = EventOps.errorType(col("event_type"), col("value"), col("user_id"),
      Seq("signup", "purchase", "view", "click", "error"), 150.0)
    val valid = EventOps.validationSplit(ev, err)._1
    Lww.latestPerKey(
      valid.withColumn("_cdc_timestamp_micros", col("ts_us"))
        .withColumn("_last_event_id", col("event_id")),
      Seq("user_id"), Seq(col("_cdc_timestamp_micros"), col("_last_event_id")))
  }

  test("poison batch: all-null malformed rows route to DLQ without crashing") {
    import spark.implicits._
    val cfg = freshCfg()
    // a fully-malformed envelope decodes to all-null columns (null ts_us
    // included) — the batch must land in the DLQ, not NPE the stream
    val poison = Seq((null: java.lang.Long, null: java.lang.Long, null: java.lang.Long,
        null: String, null: java.lang.Double, null: String))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
    ReplicationJob.processBatch(spark, poison, cfg, batchId = 7L)
    val dlq = spark.read.parquet(cfg.dlqDir)
    assert(dlq.count() == 1L)
    assert(dlq.select("failed_at_us").head().getLong(0) == 0L)
  }

  test("stream end-to-end: target equals LWW fold of valid events; invalid → DLQ") {
    val cfg = freshCfg().copy(sourceDir = eventSourceDir())
    val q = ReplicationJob.start(spark, cfg)
    q.awaitTermination(120000)

    val target = ReplicationJob.targetState(spark, cfg)
    val expected = expectedState()

    assert(target.count() == expected.count())
    val mism = target.select("user_id", "_cdc_timestamp_micros", "_last_event_id")
      .exceptAll(expected.select("user_id", "_cdc_timestamp_micros", "_last_event_id"))
    assert(mism.isEmpty, "target state diverges from LWW fold")

    val ev = Tables.events(spark, sfDir)
    val err = EventOps.errorType(col("event_type"), col("value"), col("user_id"),
      cfg.validTypes, cfg.maxValue)
    val invalidCount = EventOps.validationSplit(ev, err)._2.count()
    val dlqCount = spark.read.parquet(cfg.dlqDir).count()
    assert(dlqCount == invalidCount)
    assert(dlqCount > 0, "fixture should produce some DLQ rows")
  }

  test("replay idempotence: reprocessing the same batch leaves state unchanged") {
    val src = eventSourceDir()
    val cfg = freshCfg().copy(sourceDir = src)
    ReplicationJob.start(spark, cfg).awaitTermination(120000)
    val first = ReplicationJob.targetState(spark, cfg)
      .select("user_id", "_cdc_timestamp_micros", "_last_event_id").collect().toSet

    // new checkpoint → the stream replays from scratch against existing target
    val cfg2 = cfg.copy(checkpointDir = tmpDir("ckpt2"))
    ReplicationJob.start(spark, cfg2).awaitTermination(120000)
    val second = ReplicationJob.targetState(spark, cfg)
      .select("user_id", "_cdc_timestamp_micros", "_last_event_id").collect().toSet

    assert(first == second, "replayed batches must not change LWW state")
  }

  test("streaming path executes the LWW sink against a live JDBC target") {
    import graft.sink.JdbcLwwExecutor
    val url = "jdbc:derby:memory:repljdbc;create=true"
    val cols = Seq("user_id", "event_type", "value",
      "_cdc_deleted", "_cdc_timestamp_micros", "_last_event_id")
    JdbcLwwExecutor.ensureTable(url,
      """CREATE TABLE cdc_events_t (
        |  "user_id" BIGINT NOT NULL,
        |  "event_type" VARCHAR(32),
        |  "value" DOUBLE,
        |  "_cdc_deleted" BOOLEAN,
        |  "_cdc_timestamp_micros" BIGINT,
        |  "_last_event_id" BIGINT,
        |  PRIMARY KEY ("user_id"))""".stripMargin)
    val t = JdbcLwwExecutor.Target(url, "cdc_events_t", cols, pk = Seq("user_id"))
    val cfg = freshCfg().copy(sourceDir = eventSourceDir(), jdbcTarget = Some(t))
    ReplicationJob.start(spark, cfg).awaitTermination(120000)

    // S7: live JDBC target scan through the Spark JDBC source
    val target = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "cdc_events_t").load()
    val expected = expectedState()
    assert(target.count() == expected.count())
    val mism = target.select("user_id", "_cdc_timestamp_micros", "_last_event_id")
      .exceptAll(expected.select("user_id", "_cdc_timestamp_micros", "_last_event_id"))
    assert(mism.isEmpty, "JDBC target state diverges from LWW fold")
  }

  test("DLQ full loop: poison -> DLQ -> replay produce -> reprocess -> state") {
    import spark.implicits._
    import graft.ops.DlqService
    import graft.streaming.KafkaCdc
    val cfg = freshCfg()
    // batch 0: one good row, one poison row (unknown event type)
    val b0 = Seq(
      (1L, 1000000L, 1L, "view", 1.0, null: String),
      (2L, 2000000L, 2L, "bogus", 2.0, null: String))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts_us", expr("ts div 1000"))
    ReplicationJob.processBatch(spark, b0, cfg, batchId = 0L)
    assert(ReplicationJob.targetState(spark, cfg).count() == 1L)
    val dlq = spark.read.parquet(cfg.dlqDir)
    assert(dlq.select("event_id").as[Long].collect().toSeq == Seq(2L))

    // operator replays id 2: produce to the wire, fix upstream, re-consume
    val (outbound, updatedDlq) = DlqService.replay(dlq, Seq(2L), nowUs = 999L)
    val reframed = outbound.select(
      col("key").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      lit("cdc-events-users").as("topic"), lit(0).as("partition"),
      lit(0L).as("offset"), current_timestamp().as("timestamp"),
      lit(0).as("timestampType"))
    val reconsumed = KafkaCdc.decode(reframed, spark.read.parquet(cfg.dlqDir).schema)
      .withColumn("event_type", lit("purchase")) // the upstream fix
      .select("event_id", "ts", "user_id", "event_type", "value", "props", "ts_us")
    ReplicationJob.processBatch(spark, reconsumed, cfg, batchId = 1L)

    // the fixed event reaches target state; the DLQ row is resolved
    val state = ReplicationJob.targetState(spark, cfg)
      .select("user_id", "_last_event_id").as[(Long, Long)].collect().toMap
    assert(state == Map(1L -> 1L, 2L -> 2L), s"replayed event must land in state: $state")
    val resolved = updatedDlq.filter(col("event_id") === 2L)
      .select("resolution_status", "resolved_at_us").head()
    assert(resolved.getString(0) == "MANUAL_RESOLVED" && resolved.getLong(1) == 999L)
  }

  test("SC-007 crash recovery: mid-stream stop + resume loses nothing") {
    import java.nio.file.{Files, Paths}
    // 10 events (one invalid) over 2 commit-log segments, 2 rows/trigger
    // → 5 micro-batches; the stream is stopped while running (possibly
    // mid-batch) and resumed from the checkpoint. Zero loss/dup is the
    // checkpoint + idempotent-LWW construction (reference
    // test_crash_recovery.py:343, SC-007 "≤30s, zero events lost").
    val dir = tmpDir("crashlog")
    def ev(id: Long, ts: Long, uid: Long, et: String, v: Double) =
      s"""{"event_id":$id,"ts":${ts * 1000},"user_id":$uid,"event_type":"$et","value":$v}"""
    Files.writeString(Paths.get(dir, "seg-000.log"),
      (1L to 5L).map(i => ev(i, i * 100, i, "view", 1.0)).mkString("", "\n", "\n"))
    Files.writeString(Paths.get(dir, "seg-001.log"),
      ((6L to 9L).map(i => ev(i, i * 100, i, "click", 2.0)) :+
        ev(10, 1000, 10, "bogus_type", 3.0)).mkString("", "\n", "\n"))
    val base = tmpDir("crashrepl")
    val cfg = freshCfg().copy(
      sourceDir = dir, targetDir = s"$base/target", dlqDir = s"$base/dlq",
      checkpointDir = s"$base/ckpt", eventLog = Some((dir, 2L)))

    val q = ReplicationJob.start(spark, cfg, continuous = true)
    // let at least one batch commit, then "crash"
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (!Files.exists(Paths.get(cfg.targetDir, "_SUCCESS")) &&
        System.nanoTime() < deadline) Thread.sleep(100)
    assert(Files.exists(Paths.get(cfg.targetDir, "_SUCCESS")),
      "stream never committed a batch")
    q.stop()

    // resume from the same checkpoint: drain whatever remains — CLOCKED
    // (r17 verdict #2: SC-007's "≤30 s" half was proven for zero-loss
    // but never timed; graft.RecoveryBench measures it at sf0.1, this
    // spec pins the same bound at fixture scale)
    val tResume0 = System.nanoTime()
    ReplicationJob.start(spark, cfg).awaitTermination(120000)
    val recoverySec = (System.nanoTime() - tResume0) / 1e9
    assert(recoverySec <= 30.0,
      f"SC-007 recovery took $recoverySec%.1f s (bound 30 s)")
    val state = ReplicationJob.targetState(spark, cfg)
      .select("user_id", "_last_event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == (1L to 9L).map(i => i -> i).toMap,
      s"every valid event must survive the crash exactly once: $state")
    val dlq = spark.read.parquet(cfg.dlqDir).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(dlq == Seq(10L), s"the invalid event must be in the DLQ exactly once: $dlq")
  }

  test("soft-deleted rows are flagged, not dropped") {
    val cfg = freshCfg().copy(sourceDir = eventSourceDir())
    ReplicationJob.start(spark, cfg).awaitTermination(120000)
    val t = ReplicationJob.targetState(spark, cfg)
    val live = ReplicationJob.targetState(spark, cfg, includeDeleted = false)
    assert(t.filter(col("_cdc_deleted")).count() + live.count() == t.count())
  }
}
