package graft

import org.apache.spark.sql.functions._

import graft.streaming.{KafkaCdc, ReplicationJob}

/** The Kafka ingest/produce seam without a broker: option maps match the
  * reference's consumer/producer contract, and the wire codec
  * (decode/encode) round-trips typed events through the exact frame shape
  * `format("kafka")` produces — so the streaming plan only differs from
  * production in the `load()` source node.
  */
class KafkaSeamSpec extends SparkSpecBase {
  import spark.implicits._

  test("source options encode the reference consumer contract") {
    val k = KafkaCdc.KafkaConfig(bootstrapServers = "broker:9092")
    val o = KafkaCdc.sourceOptions(k)
    assert(o("kafka.bootstrap.servers") == "broker:9092")
    assert(o("subscribePattern") == "cdc-events-.*")       // kafka-topics.md:268-276
    assert(o("startingOffsets") == "earliest")
    assert(o("maxOffsetsPerTrigger") == "2048")            // cassandra-source.json:26
    assert(o("failOnDataLoss") == "false")
    val s = KafkaCdc.sinkOptions("broker:9092", "cdc-events-users")
    assert(s("topic") == "cdc-events-users")
  }

  test("wire decode parses the kafka frame into typed events with ts_us") {
    // A batch frame with exactly the kafka source's column shape.
    val wire = Seq(
      ("7", """{"event_id":1,"ts":1700000000000000000,"user_id":7,"event_type":"view","value":1.5,"props":"{}"}"""),
      ("8", """{"event_id":2,"ts":1700000001000000000,"user_id":8,"event_type":"click","value":2.0,"props":"{}"}"""))
      .toDF("k", "v")
      .select(
        col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        lit("cdc-events-users").as("topic"),
        lit(0).as("partition"),
        monotonically_increasing_id().as("offset"),
        current_timestamp().as("timestamp"),
        lit(0).as("timestampType"))
    val decoded = KafkaCdc.decode(wire, ReplicationJob.eventSchema)
      .orderBy("event_id").collect()
    assert(decoded.length == 2)
    val r = decoded.head
    assert(r.getAs[Long]("event_id") == 1L)
    assert(r.getAs[Long]("user_id") == 7L)
    assert(r.getAs[String]("event_type") == "view")
    assert(r.getAs[Long]("ts_us") == 1700000000000000L) // ns → µs
    assert(r.getAs[String]("_kafka_key") == "7")
    assert(r.getAs[String]("_topic") == "cdc-events-users")
  }

  test("encode → decode round-trips events (DLQ replay produce shape)") {
    val events = Seq(
      (1L, 1700000000000000000L, 7L, "view", 1.5, "{}"),
      (2L, 1700000001000000000L, 8L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val encoded = KafkaCdc.encode(events, keyCol = "user_id")
    assert(encoded.columns.toSeq == Seq("key", "value"))
    // re-frame as a kafka source row and decode back
    val reframed = encoded.select(
      col("key").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      lit("cdc-events-users").as("topic"), lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      current_timestamp().as("timestamp"), lit(0).as("timestampType"))
    val back = KafkaCdc.decode(reframed, ReplicationJob.eventSchema)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSet
    assert(back == Set(
      (1L, 1700000000000000000L, 7L, "view", 1.5, "{}"),
      (2L, 1700000001000000000L, 8L, "click", 2.0, "{}")))
    // the key carries the partition key for per-key ordering
    assert(encoded.select("key").as[String].collect().toSet == Set("7", "8"))
  }
}
