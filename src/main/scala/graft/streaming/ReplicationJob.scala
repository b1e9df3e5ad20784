package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.{EventOps, Lww}
import graft.sink.ParquetStateStore

/** The always-on replication path (reference lifecycle SURVEY.md §3.1):
  *
  *   readStream → normalize → validate/split → per-key LWW compaction →
  *   foreachBatch { DLQ append; LWW upsert into target state }
  *
  * with `checkpointLocation` for resume. Exactly-once delivery is the
  * checkpoint + idempotent-upsert construction (ST4/ST5): foreachBatch is
  * at-least-once, but the LWW merge is a commutative/idempotent fold, so
  * replayed batches converge to the same state — the same argument the
  * reference makes for Kafka-offset replays against its ON CONFLICT sink.
  *
  * Unbounded lateness (ST2): deliberately NO watermark/dropDuplicates —
  * the reference accepts arbitrarily late events and rejects them
  * individually against persisted target state. State lives in the target
  * table, not in Spark's state store, so streaming state stays O(batch).
  *
  * Scale: the only shuffle per micro-batch is the per-key compaction
  * (map-side partial max_by first); DLQ and upsert writes are
  * append/merge. Kafka sources swap in for the file source unchanged
  * (`readStream.format("kafka")` + the same transform chain).
  */
object ReplicationJob {

  /** Dedicated daemon pool for the per-batch concurrent sink write (see
    * processBatch): a cached pool so an idle stream holds no threads,
    * daemon so it never blocks JVM exit.
    */
  private lazy val sinkEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-sink-upsert")
        t.setDaemon(true)
        t
      }))

  /** Fixture event-stream schema (TESTDATA `events`, ns timestamps read
    * as long per Tables' convention).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  final case class Config(
      sourceDir: String,
      targetDir: String,
      dlqDir: String,
      checkpointDir: String,
      validTypes: Seq[String] = Seq("signup", "purchase", "view", "click", "error"),
      maxValue: Double = 150.0,
      deleteType: String = "error",
      /** Per-table replication identity (the reference runs one pipeline
        * per table, each with its own pk + schema from config —
        * `docker/connectors/cassandra-source.json:12-13` table list,
        * `specs/001-cass-cdc-pg/data-model.md:396-421` replication rules).
        * Defaults reproduce the TESTDATA `events` fixture. The normalized
        * envelope columns `event_id` (long), `event_type` and the derived
        * `ts_us` are engine-wide convention (every reference table's
        * events carry event_id / operation / timestamp_micros too); the
        * per-table part is `schema` (the flat event shape), `pk`, the
        * source ts column/unit, and the optional constrained value column.
        */
      table: String = "events",
      schema: StructType = ReplicationJob.eventSchema,
      pk: Seq[String] = Seq("user_id"),
      /** Source timestamp column and its unit→µs divisor (fixture `ts` is
        * ns → 1000; a reference `timestamp_micros` envelope is µs → 1).
        */
      tsCol: String = "ts",
      tsDivisorToMicros: Long = 1000L,
      /** The range-constrained numeric column ([[graft.ops.EventOps
        * .errorTypeFor]]'s null/range checks); None = table has no such
        * constraint and only pk/operation validity applies.
        */
      valueCol: Option[String] = Some("value"),
      /** When set, ingest from Kafka (`readStream.format("kafka")` +
        * envelope decode) instead of the parquet directory — the S1/S3
        * production boundary; the file source is its offline double.
        */
      kafka: Option[KafkaCdc.KafkaConfig] = None,
      /** When set, ingest from the custom DSv2 commit-log source
        * ([[EventLogSource]]: JSON-envelope segment files, rate-limited
        * micro-batches) — the S1 capture boundary as a first-class
        * source; value = (log dir, maxRowsPerTrigger).
        */
      eventLog: Option[(String, Long)] = None,
      /** When set, the sink executes the LWW upsert against a live JDBC
        * target (per-partition connections, statement batching, retry +
        * breaker — S9/S10) instead of the parquet state store.
        */
      jdbcTarget: Option[graft.sink.JdbcLwwExecutor.Target] = None,
      /** When set, the parquet state store is hash-bucketed with this many
        * buckets and each micro-batch rewrites only the buckets it
        * touches (the 100 TB state shape); None = the simple whole-table
        * store.
        */
      stateBuckets: Option[Int] = None,
      /** Opt-in RED metrics (ST11/heartbeat + /metrics surface): when set,
        * each batch records events/errors/latency into the registry. Off
        * by default — recording adds two small per-batch aggregations.
        */
      metrics: Option[graft.ops.Metrics.Registry] = None,
      /** FR-024 dynamic backpressure: when set, the sink reports batch
        * wall time (and shares its registered circuit breaker) through
        * this [[AdmissionControl]] channel, and the event-log source
        * shrinks — or pauses — the NEXT trigger's admission while the
        * sink is degraded. Register the channel (with the breaker) before
        * starting the job; one channel per table.
        */
      backpressureChannel: Option[String] = None,
      /** Event type carrying TRUNCATE semantics (reference
        * `change_event.py:30-36`, op validation `validators.py:76-78`):
        * a table-wide clear at the event's timestamp. Must be listed in
        * `validTypes` to take effect; LWW-ordered — rows whose
        * (ts, event_id) is newer than the truncate survive it.
        */
      truncateType: String = "truncate",
      /** auto.evolve (`postgres-sink.json:13-14`, SC-011/012): when the
        * declared target columns run ahead of the live table (the
        * registry evolved after the table was created), ALTER the missing
        * ones in — additive, nullable — before the batch upsert, inside
        * the same micro-batch: propagation ≤ one trigger, no restart.
        * Opt-in here (the reference connector defaults it on) because it
        * adds a catalog-metadata read per micro-batch.
        */
      autoEvolveTarget: Boolean = false,
      /** Unit-sanity guard for the derived ts_us: the source's physical
        * timestamp type is probed ONCE at stream start, so a producer
        * flipping ns↔µs MID-stream would silently mis-derive every later
        * batch's position by ×1000 with no error. When set, each batch
        * asserts its valid rows' ts_us within [lo, hi] (epoch µs) and
        * fails the stream loudly instead. Off by default — direct batch
        * tests use tiny synthetic positions.
        */
      tsSanityBoundsUs: Option[(Long, Long)] = None,
      /** Opt-in per-table stream monitors ([[TableMonitors]]): each
        * micro-batch folds its VALID rows into the monitor's
        * replay-idempotent registers (privacy / drift panels riding the
        * CDC stream — the path the reference's alerting rides). Off by
        * default: each monitor adds one batch-sized partial agg + a
        * register write per trigger.
        */
      monitors: Seq[TableMonitors.TableMonitor] = Nil)

  /** One micro-batch of the sink side: validation split → DLQ append →
    * LWW compaction → idempotent upsert. Exposed for batch tests and
    * reused verbatim by the stream.
    *
    * `batchId` keys the DLQ write's partition overwrite — identical ids
    * overwrite (that IS the streaming replay idempotence). Direct batch
    * callers processing multiple batches MUST pass distinct ids or
    * earlier batches' DLQ rows are replaced.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, cfg: Config,
      batchId: Long = 0L): Unit = {
    val batchT0 = System.nanoTime()
    val baseErr = EventOps.errorTypeFor(col("event_type"), cfg.pk.map(col),
      cfg.valueCol.map(col), cfg.validTypes, cfg.maxValue)
    // (ts_us, event_id) is the LWW position — EVERY event needs one
    // (reference validators.py requires timestamp_micros + event_id):
    //  - a data row with a null position would fold divergently across
    //    sinks (the JDBC conditional-update WHERE is NULL for a stored
    //    null-ts row → permanently un-updatable; the parquet max_by
    //    treats null as smallest) — malformed, DLQ;
    //  - a truncate with a null position can't be applied — and a null
    //    event_id reaching the watermark Row would NPE the stream on
    //    every replay (poison pill) — malformed, DLQ.
    val nullPosition = col("ts_us").isNull || col("event_id").isNull
    // A TRUNCATE carries no before/after image (`change_event.py:14,
    // 115-117`): when the truncate type is enabled, its events are exempt
    // from the row-image checks (user_id/value) and validated only on
    // having an LWW position.
    val general = when(baseErr.isNotNull, baseErr)
      .when(nullPosition, lit("SCHEMA_MISMATCH"))
      .otherwise(lit(null).cast("string"))
    val err =
      if (cfg.validTypes.contains(cfg.truncateType))
        when(col("event_type") === cfg.truncateType,
          when(nullPosition, lit("SCHEMA_MISMATCH")).otherwise(lit(null).cast("string")))
          .otherwise(general)
      else general
    val isTruncate = col("event_type") === cfg.truncateType && col("ts_us").isNotNull
    // Materialize the tagged micro-batch ONCE: the batch feeds up to four
    // consumers (control aggregates, LWW upsert, DLQ write, metrics), and
    // without a barrier each action re-reads the source — for a Kafka
    // micro-batch that is a broker re-fetch per consumer. Batch size is
    // bounded by admission control (maxRowsPerTrigger/maxFilesPerTrigger),
    // so this caches O(batch), never O(stream).
    //
    // NOT an `observe` on the upsert job: Spark's Observation does not
    // deliver metrics when the CollectMetrics node feeds a union with
    // existing state (the steady-state upsert plan) — `obs.get` blocks
    // forever from the second micro-batch on. Measured here; the explicit
    // tiny aggregate on the cached frame is deterministic instead.
    val tagged = graft.util.Materialize.stable(
      batch.withColumn("error_type", err).withColumn("_is_truncate", isTruncate))
    // visible to the finally block: if anything on the main thread throws
    // while the concurrent upsert is still running, the cached batch must
    // not be unpersisted out from under the in-flight job — drain first
    var pendingUpsert: scala.concurrent.Future[Unit] = null
    try {
    // Batch-level control aggregates: DLQ count + failed_at watermark,
    // TRUNCATE count + (ts, event_id) watermark. One job over cached rows.
    def ctlRow() = tagged.agg(
      count(when(col("error_type").isNotNull, 1)).as("dlq_n"),
      // coalesce: a batch whose DLQ rows ALL have null ts_us (fully
      // malformed envelopes — the case the DLQ exists for) must get a
      // deterministic failed_at_us = 0, not a null.
      coalesce(max(when(col("error_type").isNotNull, col("ts_us"))), lit(0L))
        .as("dlq_max_ts"),
      count(when(col("error_type").isNull && col("_is_truncate"), 1)).as("trunc_n"),
      max(when(col("error_type").isNull && col("_is_truncate"),
        struct(col("ts_us"), col("event_id")))).as("trunc_max"),
      min(when(col("error_type").isNull, col("ts_us"))).as("ts_min"),
      max(when(col("error_type").isNull, col("ts_us"))).as("ts_max")).head()
    val valid = tagged.filter(col("error_type").isNull).drop("error_type", "_is_truncate")
    val dlq = tagged.filter(col("error_type").isNotNull).drop("_is_truncate")
    // Truncate events are table-wide control operations, not rows: they
    // carry no key state, so they are excluded from the LWW fold and
    // applied to the target after the upsert (below).
    val enriched = valid.filter(!isTruncate)
      .withColumn("_cdc_deleted", col("event_type") === cfg.deleteType)
      .withColumn("_cdc_timestamp_micros", col("ts_us"))
      .withColumn("_last_event_id", col("event_id"))
    val compacted = Lww.latestPerKey(enriched, cfg.pk,
      Seq(col("_cdc_timestamp_micros"), col("_last_event_id")))
    def runUpsert(): Unit = cfg.jdbcTarget match {
      case Some(t) =>
        if (cfg.autoEvolveTarget) {
          val dialect = graft.types.TypeMapper.dialectOf(t.url)
          val wanted = t.cols.map(c =>
            c -> graft.types.TypeMapper.sqlFor(compacted.schema(c).dataType, dialect))
          val conn = graft.sink.JdbcLwwExecutor.connect(t.url)
          try graft.sink.JdbcLwwExecutor.evolveTable(conn, t.table, wanted)
          finally conn.close()
        }
        // the channel's breaker (when registered) persists across batches,
        // so consecutive sink failures actually trip it — a per-call
        // default breaker would reset every trigger
        cfg.backpressureChannel.flatMap(AdmissionControl.breakerOf) match {
          case Some(b) => graft.sink.JdbcLwwExecutor.writeBatch(
            compacted.select(t.cols.map(col).toIndexedSeq: _*), t, breaker = b)
          case None => graft.sink.JdbcLwwExecutor.writeBatch(
            compacted.select(t.cols.map(col).toIndexedSeq: _*), t)
        }
      case None => cfg.stateBuckets match {
        case Some(nb) =>
          new graft.sink.BucketedParquetStateStore(spark, cfg.targetDir, cfg.pk,
            "_cdc_timestamp_micros", "_last_event_id", nb).upsert(compacted)
        case None =>
          new ParquetStateStore(spark, cfg.targetDir, cfg.pk,
            "_cdc_timestamp_micros", "_last_event_id").upsert(compacted)
      }
    }
    // The three per-batch actions up to the truncate barrier — control
    // aggregate, LWW upsert, DLQ write — are INDEPENDENT jobs over the
    // same cached batch (the upsert consumes the valid/compacted frames,
    // the control row feeds only the DLQ/truncate branches), so the
    // upsert runs CONCURRENTLY with the control-agg + DLQ pair instead
    // of serializing three scheduler round-trips: per-trigger fixed cost
    // is the floor under the end-to-end latency SLO (spec.md:212's P95
    // ≤ 2 s — Bench's latency leg measures it), and overlapping the
    // independent jobs removes ~a third of it. Replay semantics are
    // unchanged: all actions complete (or the batch throws) before the
    // truncate/monitor/metrics tail, and a failed batch replays into the
    // same idempotent writes regardless of which action failed first.
    // EXCEPTION: when the ts-sanity guard is configured, the control row
    // must be inspected BEFORE any write starts — the guard exists to
    // stop a mis-derived batch from reaching the target — so the jobs
    // serialize exactly as before.
    val (ctl, upsertFut) = cfg.tsSanityBoundsUs match {
      case Some((lo, hi)) =>
        val c = ctlRow()
        if (!c.isNullAt(c.fieldIndex("ts_min"))) {
          val (mn, mx) = (c.getAs[Long]("ts_min"), c.getAs[Long]("ts_max"))
          if (mn < lo || mx > hi) throw new IllegalStateException(
            s"batch $batchId ts_us range [$mn, $mx] outside sane [$lo, $hi] — " +
              "source timestamp unit likely flipped mid-stream (re-probe the footer)")
        }
        pendingUpsert = scala.concurrent.Future(runUpsert())(ReplicationJob.sinkEc)
        (c, pendingUpsert)
      case None =>
        pendingUpsert = scala.concurrent.Future(runUpsert())(ReplicationJob.sinkEc)
        (ctlRow(), pendingUpsert)
    }
    // DLQ write must be idempotent under at-least-once foreachBatch: a
    // replayed micro-batch overwrites its own `_batch_id` partition rather
    // than blind-appending (which would duplicate DLQ rows and break the
    // dlqCount == invalidCount invariant). `failed_at_us` is derived from
    // batch content (max event ts), not wall clock, so a replay writes
    // byte-identical rows.
    var dlqErr: Throwable = null
    if (ctl.getAs[Long]("dlq_n") > 0) {
      // a DLQ failure must not leak a still-running upsert job past the
      // finally-block unpersist: record it, await the upsert, then throw
      try dlq.withColumn("failed_at_us", lit(ctl.getAs[Long]("dlq_max_ts")))
        .withColumn("resolution_status", lit("PENDING"))
        .withColumn("resolved_at_us", lit(null).cast("long"))
        .withColumn("_batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(cfg.dlqDir)
      catch { case t: Throwable => dlqErr = t }
    }
    scala.concurrent.Await.result(upsertFut,
      scala.concurrent.duration.Duration.Inf)
    if (dlqErr != null) throw dlqErr
    // Apply the batch's TRUNCATE watermark (max (ts, event_id) among its
    // truncate events) AFTER the upsert: only rows that LOSE the LWW
    // ordering against the watermark are cleared, so same-batch or
    // already-stored rows newer than the truncate survive, and a replayed
    // batch re-applies the same filter — idempotent by construction.
    if (ctl.getAs[Long]("trunc_n") > 0) {
      val w = ctl.getAs[org.apache.spark.sql.Row]("trunc_max")
      val (tTs, tTie) = (w.getLong(0), w.getLong(1))
      cfg.jdbcTarget match {
        case Some(t) =>
          val conn = graft.sink.JdbcLwwExecutor.connect(t.url)
          try graft.sink.JdbcLwwExecutor.truncateTable(conn, t, tTs, tTie)
          finally conn.close()
        case None => cfg.stateBuckets match {
          case Some(nb) =>
            new graft.sink.BucketedParquetStateStore(spark, cfg.targetDir, cfg.pk,
              "_cdc_timestamp_micros", "_last_event_id", nb).truncate(tTs, tTie)
          case None =>
            new ParquetStateStore(spark, cfg.targetDir, cfg.pk,
              "_cdc_timestamp_micros", "_last_event_id").truncate(tTs, tTie)
        }
      }
    }
    // Per-table monitors fold the batch's valid rows into their register
    // stores — per-_batch_id dynamic overwrite inside, so a replayed
    // micro-batch replaces its own counts (same idempotence as the DLQ
    // write above). Alert evaluation is the CALLER's read (panel() /
    // alerts()) — the fold itself must never fail the replication batch
    // on a panel-side bound.
    cfg.monitors.foreach(_.recordBatch(valid, batchId))
    cfg.metrics.foreach { r =>
      val byOp = valid.groupBy("event_type").count()
        .collect().map(x => x.getString(0) -> x.getLong(1)).toSeq
      val byErr = dlq.groupBy("error_type").count()
        .collect().map(x => x.getString(0) -> x.getLong(1)).toSeq
      graft.ops.Metrics.recordBatch(r, cfg.table, byOp, byErr,
        (System.nanoTime() - batchT0) / 1e9, backlog = 0L)
    }
    cfg.backpressureChannel.foreach(
      AdmissionControl.reportLatency(_, (System.nanoTime() - batchT0) / 1e9))
    // release the per-trigger materialization: in `persist` mode the cache
    // entry lives until explicit unpersist, and a long-running stream must
    // not accumulate one cached batch per trigger
    } finally {
      if (pendingUpsert != null && !pendingUpsert.isCompleted)
        scala.util.Try(scala.concurrent.Await.ready(pendingUpsert,
          scala.concurrent.duration.Duration.Inf))
      graft.util.Materialize.release(tagged)
    }
  }

  /** Start the streaming replication job over a parquet directory source
    * (`Trigger.AvailableNow` drains what's there and stops — the
    * snapshot-then-stream S2 shape; pass `continuous = true` for an
    * always-on micro-batch trigger).
    */
  def start(spark: SparkSession, cfg: Config, continuous: Boolean = false): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer division pins truncation semantics for negative/odd ts the
    // same way the fixture's `ts div 1000` always did
    val tsUs = expr(s"${cfg.tsCol} div ${cfg.tsDivisorToMicros}")
    val stream = (cfg.kafka, cfg.eventLog) match {
      case (Some(k), _) =>
        KafkaCdc.readStream(spark, k, cfg.schema, cfg.tsCol, cfg.tsDivisorToMicros)
      case (None, Some((dir, maxRows))) =>
        // commit-log DSv2 source: decode the raw envelope line exactly as
        // the Kafka wire path does (value → from_json → typed columns)
        cfg.backpressureChannel.foldLeft(
            spark.readStream.format(classOf[EventLogSource].getName)
              .option("path", dir).option("maxRowsPerTrigger", maxRows)) {
            (r, ch) => r.option("admissionChannel", ch)
          }.load()
          .select(from_json(col("value"), cfg.schema).as("e"),
            col("segment").as("_segment"), col("offset").as("_offset"))
          .select(col("e.*"), col("_segment"), col("_offset"))
          .withColumn("ts_us", tsUs)
      case (None, None) =>
        // The parquet-dir source declares its schema up front (a streaming
        // requirement) — but the files' PHYSICAL timestamp type is the
        // producer's choice (the fixture generator has shipped both raw-ns
        // int64 and µs parquet timestamps). Probe the directory's footer
        // once at start and adopt the file's type for any column where it
        // differs, deriving ts_us by the matching rule: integer `div` for
        // a raw long (divisor = source unit → µs), `unix_micros` for a
        // timestamp. A declared LongType over a µs-timestamp file would
        // otherwise silently read raw µs int64 and mis-divide by the ns
        // divisor — a unit bug, not a crash. An EMPTY/not-yet-written dir
        // can't be probed (no footer to read) — fall back to the declared
        // schema so the always-on deployment order (start stream, then
        // start producer) keeps working as it always did.
        val probed = scala.util.Try(spark.read.parquet(cfg.sourceDir).schema)
          .getOrElse(cfg.schema)
        val fileSchema = StructType(cfg.schema.map(f =>
          probed.find(_.name == f.name).getOrElse(f)))
        val tsUsFile = fileSchema(cfg.tsCol).dataType match {
          case LongType => tsUs
          case _ => unix_micros(col(cfg.tsCol).cast("timestamp"))
        }
        spark.readStream
          .schema(fileSchema)
          .option("maxFilesPerTrigger", 1) // bounded batches ≈ ST6 backpressure
          .parquet(cfg.sourceDir)
          .withColumn("ts_us", tsUsFile)
    }
    val writer = stream.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, cfg, batchId)
      }
    (if (continuous) writer.trigger(Trigger.ProcessingTime("1 second"))
     else writer.trigger(Trigger.AvailableNow())).start()
  }

  /** Read current target state, optionally hiding soft-deleted rows (the
    * reference's `_cdc_deleted` filter views).
    */
  def targetState(spark: SparkSession, cfg: Config, includeDeleted: Boolean = true): DataFrame = {
    val raw = spark.read.parquet(cfg.targetDir)
    val df = if (raw.columns.contains("_bucket")) raw.drop("_bucket") else raw
    if (includeDeleted) df else df.filter(!col("_cdc_deleted"))
  }
}
