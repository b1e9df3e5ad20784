package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType

import graft.schema.{Evolution, SchemaRegistry}

/** The `schema-changes` topic wire contract — the reference's schema-
  * evolution AUDIT LOG (`specs/001-cass-cdc-pg/contracts/kafka-topics.md:
  * 429-560`: single partition for ordered history, 365-day retention,
  * key = `keyspace.table`, value = Avro `SchemaChange`).
  *
  * [[SchemaRegistry]] covers the evolution SEMANTICS as a control table;
  * this codec is the registry-protocol WIRE form: every registration can
  * be published as a SchemaChange record, and a consumer can rebuild the
  * registry by replaying the topic ([[applyTo]]) — which is exactly what
  * the long retention exists for. The `avro_schema` field carries this
  * engine's canonical schema serialization (Catalyst StructType JSON,
  * [[Evolution.serialize]]) the way the reference's carries its Avro
  * JSON.
  */
object SchemaChangeWire {

  /** `SchemaChange` value schema (kafka-topics.md:448-539, verbatim
    * structure: change-type/compatibility/detection enums, detail map).
    */
  val ValueSchemaJson: String =
    """{"type":"record","name":"SchemaChange","namespace":"com.cdc.kafka",
      | "fields":[
      |  {"name":"schema_id","type":"string"},
      |  {"name":"keyspace","type":"string"},
      |  {"name":"table","type":"string"},
      |  {"name":"version","type":"int"},
      |  {"name":"change_type","type":{"type":"enum","name":"ChangeType",
      |    "symbols":["TABLE_CREATED","TABLE_DROPPED","COLUMN_ADDED",
      |      "COLUMN_DROPPED","COLUMN_RENAMED","TYPE_CHANGED",
      |      "INDEX_ADDED","INDEX_DROPPED"]}},
      |  {"name":"change_details","type":{"type":"map","values":"string"}},
      |  {"name":"avro_schema","type":"string"},
      |  {"name":"avro_schema_id","type":["null","int"],"default":null},
      |  {"name":"compatibility_mode","type":{"type":"enum",
      |    "name":"CompatibilityMode",
      |    "symbols":["BACKWARD","FORWARD","FULL","NONE"]}},
      |  {"name":"effective_from","type":{"type":"long",
      |    "logicalType":"timestamp-millis"}},
      |  {"name":"detected_by","type":{"type":"enum","name":"DetectionSource",
      |    "symbols":["DEBEZIUM_CONNECTOR","SCHEMA_MONITOR","MANUAL"]}}]}"""
      .stripMargin

  @transient lazy val valueSchema: Schema = new Schema.Parser().parse(ValueSchemaJson)
  @transient private lazy val changeTypeSchema: Schema =
    valueSchema.getField("change_type").schema()
  @transient private lazy val compatSchema: Schema =
    valueSchema.getField("compatibility_mode").schema()
  @transient private lazy val detectedSchema: Schema =
    valueSchema.getField("detected_by").schema()

  final case class SchemaChange(
      schema_id: String,
      keyspace: String,
      table: String,
      version: Int,
      change_type: String,
      change_details: Map[String, String],
      schema_json: String,
      avro_schema_id: Option[Int],
      compatibility_mode: String,
      effective_from_ms: Long,
      detected_by: String)

  def toRecord(c: SchemaChange): GenericRecord = {
    val r = new GenericData.Record(valueSchema)
    r.put("schema_id", c.schema_id)
    r.put("keyspace", c.keyspace)
    r.put("table", c.table)
    r.put("version", c.version)
    r.put("change_type", new GenericData.EnumSymbol(changeTypeSchema, c.change_type))
    r.put("change_details", c.change_details.asJava)
    r.put("avro_schema", c.schema_json)
    r.put("avro_schema_id", c.avro_schema_id.map(Int.box).orNull)
    r.put("compatibility_mode",
      new GenericData.EnumSymbol(compatSchema, c.compatibility_mode))
    r.put("effective_from", c.effective_from_ms)
    r.put("detected_by", new GenericData.EnumSymbol(detectedSchema, c.detected_by))
    r
  }

  def toChange(r: GenericRecord): SchemaChange = SchemaChange(
    schema_id = r.get("schema_id").toString,
    keyspace = r.get("keyspace").toString,
    table = r.get("table").toString,
    version = r.get("version").asInstanceOf[Int],
    change_type = r.get("change_type").toString,
    change_details = r.get("change_details").asInstanceOf[java.util.Map[_, _]]
      .asScala.map { case (k, v) => k.toString -> v.toString }.toMap,
    schema_json = r.get("avro_schema").toString,
    avro_schema_id = Option(r.get("avro_schema_id")).map(_.asInstanceOf[Int]),
    compatibility_mode = r.get("compatibility_mode").toString,
    effective_from_ms = r.get("effective_from").asInstanceOf[Long],
    detected_by = r.get("detected_by").toString)

  /** Change rows → wire frame: key = UTF-8 `keyspace.table` (the
    * contract's plain-string key — ordered history rides the single
    * partition), value = binary Avro `SchemaChange`.
    */
  def encodeFrame(changes: Dataset[SchemaChange]): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.mapPartitions { it =>
      val writer = new GenericDatumWriter[GenericRecord](valueSchema)
      val baos = new java.io.ByteArrayOutputStream()
      var enc: BinaryEncoder = null
      it.map { c =>
        baos.reset()
        enc = EncoderFactory.get.binaryEncoder(baos, enc)
        writer.write(toRecord(c), enc)
        enc.flush()
        (s"${c.keyspace}.${c.table}".getBytes("UTF-8"), baos.toByteArray)
      }
    }.toDF("key", "value")
  }

  /** Wire frame (binary `value`) → change rows. */
  def decodeFrame(raw: DataFrame): Dataset[SchemaChange] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select("value").as[Array[Byte]].mapPartitions { it =>
      val reader = new GenericDatumReader[GenericRecord](valueSchema)
      var decoder: BinaryDecoder = null
      it.map { bytes =>
        decoder = DecoderFactory.get.binaryDecoder(bytes, decoder)
        toChange(reader.read(null, decoder))
      }
    }
  }

  /** Build the audit record for a registry transition `prev → next`
    * (TABLE_CREATED on first registration, COLUMN_ADDED per the additive
    * path — the change classes this engine's evolution gate produces;
    * `change_details` mirrors the contract's example fields). The
    * deterministic schema_id (md5 of table+version+schema) makes a replay
    * of the same registration produce a byte-identical record.
    */
  def changeFor(keyspace: String, table: String, version: Int,
      prev: Option[StructType], next: StructType, nowUs: Long,
      compatibilityMode: String = "BACKWARD",
      detectedBy: String = "SCHEMA_MONITOR"): SchemaChange = {
    val json = Evolution.serialize(next)
    val (changeType, details) = prev match {
      case None => ("TABLE_CREATED",
        Map("columns" -> next.fieldNames.mkString(",")))
      case Some(p) =>
        val added = next.fields.filterNot(f => p.fieldNames.contains(f.name))
        ("COLUMN_ADDED", added.map(f =>
          s"column:${f.name}" -> f.dataType.simpleString).toMap +
          ("nullable" -> "true"))
    }
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$keyspace.$table:$version:$json".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    SchemaChange(id, keyspace, table, version, changeType, details, json,
      avro_schema_id = None, compatibility_mode = compatibilityMode,
      effective_from_ms = nowUs / 1000L, detected_by = detectedBy)
  }

  /** Replay a decoded change stream into a registry — the consumer side
    * of the audit topic (rebuild-from-retention). Changes are applied in
    * (keyspace, table, version) order; versions already present are
    * skipped, so a partial replay over an existing registry converges
    * instead of double-registering.
    *
    * `registryKey` maps a change to the registry's table key — default
    * `keyspace.table`, the topic's own key, so two keyspaces carrying the
    * same table name can never silently merge (or drop) each other's
    * history. Pass `_.table` only for registries known to hold a single
    * keyspace under bare table names.
    */
  def applyTo(reg: SchemaRegistry, changes: Seq[SchemaChange],
      registryKey: SchemaChange => String = c => s"${c.keyspace}.${c.table}"): Int = {
    var applied = 0
    changes.sortBy(c => (c.keyspace, c.table, c.version)).foreach { c =>
      val key = registryKey(c)
      val cur = reg.current(key).map(_._1).getOrElse(0)
      if (c.version > cur) {
        val v = reg.register(key, Evolution.deserialize(c.schema_json),
          c.effective_from_ms * 1000L)
        require(v == c.version,
          s"registry version drift for $key: replayed ${c.version}, got $v")
        applied += 1
      }
    }
    applied
  }
}
