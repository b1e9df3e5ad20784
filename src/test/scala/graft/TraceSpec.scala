package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.api.{ApiServer, Gdpr}
import graft.ops.{DlqService, Metrics}
import graft.streaming.{KafkaCdc, ReplicationJob}

/** trace_id propagation end-to-end (reference `data-model.md` ChangeEvent
  * trace_id, headers contract `kafka-topics.md:71-75`,
  * `src/middleware/request_id.py`): wire header → decoded column →
  * DLQ row → replay produce header, and the API's X-Request-ID echo.
  */
class TraceSpec extends SparkSpecBase {
  import spark.implicits._

  private def kafkaFrame(rows: Seq[(String, String, String)]) = // key, value, trace
    rows.toDF("k", "v", "t")
      .select(
        col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        lit("cdc-events-users").as("topic"),
        lit(0).as("partition"),
        monotonically_increasing_id().as("offset"),
        current_timestamp().as("timestamp"),
        lit(0).as("timestampType"),
        when(col("t").isNotNull,
          array(struct(lit("trace_id").as("key"), col("t").cast("binary").as("value"))))
          .as("headers"))

  test("kafka header trace_id surfaces as a column; headerless frames get null") {
    val wire = kafkaFrame(Seq(
      ("7", """{"event_id":1,"ts":1000000,"user_id":7,"event_type":"view","value":1.0,"props":null}""",
        "trace-abc"),
      ("8", """{"event_id":2,"ts":2000000,"user_id":8,"event_type":"click","value":2.0,"props":null}""",
        null)))
    val decoded = KafkaCdc.decode(wire, ReplicationJob.eventSchema).orderBy("event_id")
    val traces = decoded.select("trace_id").collect().map(_.getString(0)).toSeq
    assert(traces == Seq("trace-abc", null))
    // a frame without a headers column (includeHeaders off) still decodes
    val bare = KafkaCdc.decode(wire.drop("headers"), ReplicationJob.eventSchema)
    assert(bare.select("trace_id").collect().forall(_.isNullAt(0)))
  }

  test("a poisoned event's trace_id is queryable in the DLQ and survives replay") {
    val base = tmpDir("trace")
    val cfg = ReplicationJob.Config(
      sourceDir = base, targetDir = s"$base/target", dlqDir = s"$base/dlq",
      checkpointDir = s"$base/ckpt")
    // decode a wire batch where the poison row (bad event type) carries a
    // trace header, then run the standard micro-batch
    val wire = kafkaFrame(Seq(
      ("1", """{"event_id":1,"ts":1000000,"user_id":1,"event_type":"view","value":1.0,"props":null}""",
        "trace-good"),
      ("2", """{"event_id":2,"ts":2000000,"user_id":2,"event_type":"bogus","value":2.0,"props":null}""",
        "trace-poison")))
    val batch = KafkaCdc.decode(wire, ReplicationJob.eventSchema)
    ReplicationJob.processBatch(spark, batch, cfg, batchId = 0L)
    // DLQ row is queryable BY trace_id (the debugging path the reference
    // keeps trace_id for)
    val dlq = spark.read.parquet(cfg.dlqDir)
    val row = dlq.filter(col("trace_id") === "trace-poison").collect()
    assert(row.length == 1 && row.head.getAs[Long]("event_id") == 2L,
      "poisoned event must be findable by trace_id in the DLQ")
    // replay: the outbound produce re-emits trace_id as a kafka HEADER and
    // keeps it out of the value payload (kafka-topics.md:71-75)
    val (outbound, _) = DlqService.replay(dlq, Seq(2L), nowUs = 999L)
    val produced = KafkaCdc.encode(
      KafkaCdc.decode(
        outbound.select(
          col("key").cast("binary").as("key"),
          col("value").cast("binary").as("value"),
          lit("cdc-events-users").as("topic"), lit(0).as("partition"),
          lit(0L).as("offset"), current_timestamp().as("timestamp"),
          lit(0).as("timestampType")),
        spark.read.parquet(cfg.dlqDir).schema), // replayed value carries the full DLQ row
      keyCol = "event_id")
    assert(produced.columns.contains("headers"))
    val hdr = produced.select(
      element_at(col("headers"), 1).getField("value").cast("string")).head().getString(0)
    assert(hdr == "trace-poison", s"replayed produce must re-emit the trace header, got $hdr")
    // the DLQ JSON value itself also retains the trace (queryable post-hoc)
    assert(outbound.select("value").as[String].head().contains("trace-poison"))
  }

  test("API echoes X-Request-ID and mints one when absent") {
    val api = new ApiServer(
      registry = new Metrics.Registry,
      health = () => Map("spark" -> true),
      dlqStatsJson = () => "{}",
      reconTrigger = _ => (),
      gdprDelete = (_, _) => Left("n/a"))
    val port = api.start()
    val http = HttpClient.newHttpClient()
    try {
      val echoed = http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/health"))
          .header("X-Request-ID", "req-42").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(echoed.headers().firstValue("X-Request-ID").orElse("") == "req-42")
      val minted = http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val rid = minted.headers().firstValue("X-Request-ID").orElse("")
      assert(rid.matches("[0-9a-f-]{36}"), s"expected minted UUID, got '$rid'")
      // the error path carries the id too (request_id.py adds it in finally)
      val err = http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/gdpr/users/1"))
          .header("X-Request-ID", "req-err").DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(err.headers().firstValue("X-Request-ID").orElse("") == "req-err")
    } finally api.stop()
  }
}
