package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The Kafka ingest/produce boundary (reference S1/S3/S14): the consumer
  * contract of `specs/001-cass-cdc-pg/contracts/kafka-topics.md:49-66,
  * 268-276` (subscribe `cdc-events-.*`, key = partition key for per-key
  * ordering) and the DLQ replay produce of `src/services/dlq_service.py:
  * 222-243` (serialize event back to its source topic, keyed).
  *
  * Structure: option-building and wire (de)serialization are pure
  * functions over DataFrames, so the whole codec layer is unit-testable
  * on batch frames shaped like Kafka's source output (key/value binary +
  * topic/partition/offset) without a broker; [[readStream]]/[[writeTo]]
  * glue them onto `format("kafka")`, which activates when the Kafka
  * connector jar is on the classpath and a broker is configured. The
  * parquet file source ([[ReplicationJob.start]]'s default) is the
  * offline test double running the SAME decode→validate→compact→sink
  * chain.
  */
object KafkaCdc {

  final case class KafkaConfig(
      bootstrapServers: String,
      subscribePattern: String = "cdc-events-.*",
      startingOffsets: String = "earliest",
      /** ST6 backpressure: bounded micro-batches, the analog of the
        * reference's source `max.batch.size=2048`
        * (`cassandra-source.json:26`). */
      maxOffsetsPerTrigger: Long = 2048,
      failOnDataLoss: Boolean = false)

  /** Reader options for `spark.readStream.format("kafka")`.
    * `includeHeaders`: the contract's message headers (`kafka-topics.md:
    * 71-75` — schema_version, trace_id, source_timestamp_micros) ride in
    * the frame's `headers` column for [[decode]] to surface.
    */
  def sourceOptions(k: KafkaConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> k.bootstrapServers,
    "subscribePattern" -> k.subscribePattern,
    "startingOffsets" -> k.startingOffsets,
    "maxOffsetsPerTrigger" -> k.maxOffsetsPerTrigger.toString,
    "failOnDataLoss" -> k.failOnDataLoss.toString,
    "includeHeaders" -> "true")

  /** Writer options for `df.write.format("kafka")` (DLQ replay produce —
    * the replayed event returns to its original `cdc-events-{table}`
    * topic, `dlq_service.py:222-243`).
    */
  def sinkOptions(bootstrapServers: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "topic" -> topic)

  /** Decode the Kafka wire frame (key/value binary, topic/partition/
    * offset metadata) into typed event rows: `from_json(value)` against
    * the envelope schema + `ts_us` normalization — the
    * ExtractNewRecordState-side of the chain. Works identically on a
    * streaming kafka frame and a batch test frame.
    */
  def decode(raw: DataFrame, schema: StructType,
      tsCol: String = "ts", tsDivisorToMicros: Long = 1000L): DataFrame = {
    // trace_id rides as a message header (`kafka-topics.md:71-75`,
    // reference `data-model.md` ChangeEvent.trace_id): surface it as a
    // column so it follows the event through validation → DLQ → replay.
    // Tolerant of frames without `headers` (includeHeaders off / test
    // doubles): trace_id is null there.
    val traceId =
      if (raw.columns.contains("headers"))
        element_at(filter(col("headers"),
          h => h.getField("key") === "trace_id"), 1)
          .getField("value").cast("string")
      else lit(null).cast("string")
    val expanded = raw.select(
        col("key").cast("string").as("_kafka_key"),
        col("topic").as("_topic"),
        col("partition").as("_partition"),
        col("offset").as("_offset"),
        traceId.as("_hdr_trace_id"),
        from_json(col("value").cast("string"), schema).as("e"))
      .select(col("e.*"), col("_kafka_key"), col("_topic"), col("_partition"),
        col("_offset"), col("_hdr_trace_id"))
    // a replayed DLQ value embeds the row's trace_id in the payload
    // (dlq_service.py:222-243 serializes the whole record); the live
    // header wins, the payload's fills in when no header arrived
    val merged =
      if (schema.fieldNames.contains("trace_id"))
        expanded.withColumn("trace_id",
          coalesce(col("_hdr_trace_id"), col("trace_id")))
      else expanded.withColumn("trace_id", col("_hdr_trace_id"))
    merged.drop("_hdr_trace_id")
      .withColumn("ts_us", expr(s"$tsCol div $tsDivisorToMicros"))
  }

  /** Encode event rows to the wire frame: key = stringified partition key
    * (per-key ordering contract, `kafka-topics.md:63-66`), value =
    * `to_json(struct(*))` of the data columns.
    */
  def encode(df: DataFrame, keyCol: String): DataFrame = {
    // strip ALL of decode's provenance columns, not just _kafka_key —
    // leaking _topic/_partition/_offset into the produced value would make
    // a replayed record differ from the original producer's payload.
    // trace_id is provenance too: per the contract it travels as a message
    // HEADER (`kafka-topics.md:71-75`), re-emitted below, so a replayed
    // event keeps its correlation id end-to-end.
    // ts_us is decode-DERIVED (not producer data) and _segment rides in
    // from the event-log source: both would otherwise embed into the
    // replayed value and make it differ from the original producer's
    // payload — compounding on every decode→encode cycle
    val provenance =
      Set("_kafka_key", "_topic", "_partition", "_offset", "trace_id", "ts_us", "_segment")
    val dataCols = df.columns.filterNot(provenance.contains)
    val frame = df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(dataCols.map(col).toIndexedSeq: _*)).as("value"),
      (if (df.columns.contains("trace_id")) col("trace_id")
       else lit(null).cast("string")).as("_t"))
    frame.select(col("key"), col("value"),
      when(col("_t").isNotNull,
        array(struct(lit("trace_id").as("key"), col("_t").cast("binary").as("value"))))
        .as("headers"))
  }

  /** Per-table topic name — the contract's `cdc-events-{table}` rule
    * (`kafka-topics.md:49-66`).
    */
  def topicFor(table: String, prefix: String = "cdc-events-"): String =
    s"$prefix$table"

  /** A table's wire identity for [[routeByTopic]]: its event schema and
    * ts normalization (the same knobs [[ReplicationJob.Config]] carries).
    */
  final case class TableWire(schema: StructType,
      tsCol: String = "ts", tsDivisorToMicros: Long = 1000L)

  /** Route a multi-topic wire frame — the `subscribePattern` fan-in of
    * S3 (`kafka-topics.md:268-276`: one consumer subscribes
    * `cdc-events-.*`) — to per-table typed frames: each table's rows are
    * selected by its contract topic and decoded with ITS schema and ts
    * rule. Works identically on a streaming kafka frame and a batch test
    * frame; in the one-query-per-table deployment each query's topic
    * filter prunes the source to its own topic.
    */
  def routeByTopic(raw: DataFrame, tables: Map[String, TableWire],
      topicPrefix: String = "cdc-events-"): Map[String, DataFrame] =
    tables.map { case (t, w) =>
      t -> decode(raw.filter(col("topic") === topicFor(t, topicPrefix)),
        w.schema, w.tsCol, w.tsDivisorToMicros)
    }

  /** Streaming Kafka source → decoded events (requires the
    * spark-sql-kafka connector on the classpath at runtime).
    */
  def readStream(spark: SparkSession, k: KafkaConfig, schema: StructType,
      tsCol: String = "ts", tsDivisorToMicros: Long = 1000L): DataFrame =
    decode(
      sourceOptions(k).foldLeft(spark.readStream.format("kafka")) {
        case (r, (key, v)) => r.option(key, v)
      }.load(),
      schema, tsCol, tsDivisorToMicros)

  /** Batch produce of encoded rows (DLQ replay S14). */
  def writeTo(encoded: DataFrame, bootstrapServers: String, topic: String): Unit =
    sinkOptions(bootstrapServers, topic).foldLeft(encoded.write.format("kafka")) {
      case (w, (key, v)) => w.option(key, v)
    }.save()
}
