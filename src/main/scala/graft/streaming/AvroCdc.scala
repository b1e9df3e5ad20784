package graft.streaming

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

import org.apache.spark.sql.{DataFrame, Dataset}

/** The binary Avro wire codec for the Kafka boundary — the reference's
  * message format (`specs/001-cass-cdc-pg/contracts/kafka-topics.md:66-160`:
  * key = Avro `ChangeEventKey`, value = Avro `ChangeEvent` with the
  * null|string|long|double|boolean union maps for before/after images).
  *
  * Core-avro `GenericDatumWriter`/`GenericDatumReader` over raw binary
  * encoding (no schema-registry framing; the registry id travels in the
  * `schema_version` header per the contract). The Spark seam is
  * `mapPartitions` — the one legitimate imperative boundary: a codec over
  * opaque bytes that Catalyst cannot express — with writer/reader and
  * encoder/decoder instances reused across each partition's rows, so the
  * per-row cost is the encode itself, not allocation.
  *
  * Decoded rows surface the SAME envelope columns as the JSON path
  * ([[graft.types.CdcSchemas.envelope]]), so everything downstream
  * (validation, unwrap, typed cast, LWW) is codec-agnostic.
  */
object AvroCdc {

  /** `ChangeEventKey` (kafka-topics.md:77-90). */
  val KeySchemaJson: String =
    """{"type":"record","name":"ChangeEventKey","namespace":"com.cdc.kafka",
      | "fields":[{"name":"partition_key","type":"string"}]}""".stripMargin

  /** `ChangeEvent` value schema (kafka-topics.md:96-160, verbatim
    * structure: source record, operation enum, union-typed image maps).
    */
  val ValueSchemaJson: String =
    """{"type":"record","name":"ChangeEvent","namespace":"com.cdc.kafka",
      | "fields":[
      |  {"name":"event_id","type":"string"},
      |  {"name":"source","type":{"type":"record","name":"Source","fields":[
      |    {"name":"keyspace","type":"string"},
      |    {"name":"table","type":"string"},
      |    {"name":"cluster","type":["null","string"],"default":null}]}},
      |  {"name":"operation","type":{"type":"enum","name":"Operation",
      |    "symbols":["CREATE","UPDATE","DELETE","TRUNCATE"]}},
      |  {"name":"timestamp_micros","type":"long"},
      |  {"name":"before","type":["null",{"type":"map",
      |    "values":["null","string","long","double","boolean"]}],"default":null},
      |  {"name":"after","type":["null",{"type":"map",
      |    "values":["null","string","long","double","boolean"]}],"default":null},
      |  {"name":"schema_version","type":"int"},
      |  {"name":"ttl_seconds","type":["null","int"],"default":null}]}""".stripMargin

  // Schema is not serializable; parse lazily per JVM (driver and each
  // executor parse once — the vals live in this object, not in closures).
  @transient lazy val keySchema: Schema = new Schema.Parser().parse(KeySchemaJson)
  @transient lazy val valueSchema: Schema = new Schema.Parser().parse(ValueSchemaJson)
  @transient private lazy val sourceSchema: Schema =
    valueSchema.getField("source").schema()
  @transient private lazy val operationSchema: Schema =
    valueSchema.getField("operation").schema()

  /** Envelope row in the engine's canonical shape
    * ([[graft.types.CdcSchemas.envelope]] + source keyspace provenance).
    * `before`/`after` values are stringified — the same permissive-map
    * trick the JSON path uses, so additive source-schema changes never
    * break the decode; `castRow` re-types per table downstream.
    */
  final case class Envelope(
      event_id: String,
      source_keyspace: String,
      source_cluster: Option[String],
      source_table: String,
      operation_type: String,
      timestamp_micros: Long,
      before: Option[Map[String, String]],
      after: Option[Map[String, String]],
      schema_version: Int,
      ttl_seconds: Option[Int],
      is_tombstone: Boolean)

  private def stringify(v: AnyRef): String = v match {
    case null => null
    case s: org.apache.avro.util.Utf8 => s.toString
    case other => other.toString
  }

  private def imageToMap(v: AnyRef): Option[Map[String, String]] = v match {
    case null => None
    case m: java.util.Map[_, _] =>
      Some(m.asScala.map { case (k, vv) =>
        k.toString -> stringify(vv.asInstanceOf[AnyRef])
      }.toMap)
  }

  /** GenericRecord → envelope row. `is_tombstone` is derived exactly as
    * the reference does for Cassandra tombstones (`change_event.py:
    * 105-113`): a DELETE with no before image.
    */
  def toEnvelope(r: GenericRecord): Envelope = {
    val src = r.get("source").asInstanceOf[GenericRecord]
    val op = r.get("operation").toString
    val before = imageToMap(r.get("before"))
    Envelope(
      event_id = stringify(r.get("event_id")),
      source_keyspace = stringify(src.get("keyspace")),
      source_cluster = Option(src.get("cluster")).map(c => stringify(c.asInstanceOf[AnyRef])),
      source_table = stringify(src.get("table")),
      operation_type = op,
      timestamp_micros = r.get("timestamp_micros").asInstanceOf[Long],
      before = before,
      after = imageToMap(r.get("after")),
      schema_version = r.get("schema_version").asInstanceOf[Int],
      ttl_seconds = Option(r.get("ttl_seconds")).map(_.asInstanceOf[Int]),
      is_tombstone = op == "DELETE" && before.isEmpty)
  }

  /** Envelope row → GenericRecord (the produce / DLQ-replay direction,
    * `dlq_service.py:222-243`). String-branch map values — identical to
    * what [[toEnvelope]] yields, so envelope → bytes → envelope is exact.
    */
  def toRecord(e: Envelope): GenericRecord = {
    val src = new GenericData.Record(sourceSchema)
    src.put("keyspace", e.source_keyspace)
    src.put("table", e.source_table)
    // cluster round-trips: dropping it would make a replayed record
    // differ from the original producer's payload
    src.put("cluster", e.source_cluster.orNull)
    val r = new GenericData.Record(valueSchema)
    r.put("event_id", e.event_id)
    r.put("source", src)
    r.put("operation", new GenericData.EnumSymbol(operationSchema, e.operation_type))
    r.put("timestamp_micros", e.timestamp_micros)
    r.put("before", e.before.map(_.asJava).orNull)
    r.put("after", e.after.map(_.asJava).orNull)
    r.put("schema_version", e.schema_version)
    r.put("ttl_seconds", e.ttl_seconds.map(Int.box).orNull)
    r
  }

  /** One record → raw binary Avro bytes (no container/framing). */
  def recordBytes(r: GenericRecord, schema: Schema): Array[Byte] = {
    val writer = new GenericDatumWriter[GenericRecord](schema)
    val baos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get.binaryEncoder(baos, null)
    writer.write(r, enc)
    enc.flush()
    baos.toByteArray
  }

  /** Raw binary bytes → record. */
  def parseRecord(bytes: Array[Byte], schema: Schema): GenericRecord =
    new GenericDatumReader[GenericRecord](schema)
      .read(null, DecoderFactory.get.binaryDecoder(bytes, null))

  /** Kafka frame (binary `value` column) → envelope rows. Reader, record
    * buffer, and decoder are allocated once per partition and reused.
    */
  def decodeFrame(raw: DataFrame): Dataset[Envelope] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select("value").as[Array[Byte]].mapPartitions { it =>
      val reader = new GenericDatumReader[GenericRecord](valueSchema)
      var decoder: BinaryDecoder = null
      it.map { bytes =>
        decoder = DecoderFactory.get.binaryDecoder(bytes, decoder)
        toEnvelope(reader.read(null, decoder))
      }
    }
  }

  /** Envelope rows → Kafka frame: Avro `ChangeEventKey` key (partition
    * key = source_table + event pk carrier per kafka-topics.md:63-66 —
    * here the caller-chosen key string) and Avro `ChangeEvent` value.
    */
  def encodeFrame(env: Dataset[Envelope], partitionKey: Envelope => String)
      : DataFrame = {
    val spark = env.sparkSession
    import spark.implicits._
    env.mapPartitions { it =>
      val valueWriter = new GenericDatumWriter[GenericRecord](valueSchema)
      val keyWriter = new GenericDatumWriter[GenericRecord](keySchema)
      val baos = new ByteArrayOutputStream()
      var enc: BinaryEncoder = null
      def write(w: GenericDatumWriter[GenericRecord], r: GenericRecord): Array[Byte] = {
        baos.reset()
        enc = EncoderFactory.get.binaryEncoder(baos, enc)
        w.write(r, enc)
        enc.flush()
        baos.toByteArray
      }
      it.map { e =>
        val k = new GenericData.Record(keySchema)
        k.put("partition_key", partitionKey(e))
        (write(keyWriter, k), write(valueWriter, toRecord(e)))
      }
    }.toDF("key", "value")
  }
}
