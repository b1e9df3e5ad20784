package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The ChangeEvent wire envelope and its codec (reference
  * `src/models/change_event.py:17-71`, Avro union envelope
  * `specs/001-cass-cdc-pg/contracts/kafka-topics.md:96-160`).
  *
  * `before`/`after` are permissive string-maps at envelope level — the
  * schema-evolution trick of SURVEY.md §7.4(4): additive table changes
  * never break `from_json`; the typed cast happens per-table afterwards
  * (`castRow`) driven by the schema-metadata table, so new columns flow
  * through without a stream restart.
  */
object CdcSchemas {

  val envelope: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("source_table", StringType, nullable = false),
    StructField("operation_type", StringType, nullable = false),
    StructField("timestamp_micros", LongType, nullable = false),
    StructField("before", MapType(StringType, StringType), nullable = true),
    StructField("after", MapType(StringType, StringType), nullable = true),
    StructField("schema_version", IntegerType, nullable = false),
    StructField("ttl_seconds", IntegerType, nullable = true),
    StructField("is_tombstone", BooleanType, nullable = false)))

  val Operations: Seq[String] = Seq("CREATE", "UPDATE", "DELETE", "TRUNCATE")

  private val uuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** Parse a JSON-string column into the envelope struct. */
  def parse(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("event", from_json(col(jsonCol), envelope)).select("event.*")

  /** Envelope validity predicate — the reference's validator rules
    * (`validators.py:44-83`, `change_event.py:93-117`): required fields,
    * UUID event_id, ts>0 and not >1min future, op-specific before/after
    * presence, tombstone handling.
    */
  def validEnvelope(nowUs: Column): Column = {
    val op = col("operation_type")
    val opRule =
      (op === "CREATE" && col("after").isNotNull && col("before").isNull) ||
      (op === "UPDATE" && col("after").isNotNull && col("before").isNotNull) ||
      (op === "DELETE" && (col("before").isNotNull || col("is_tombstone"))) ||
      (op === "TRUNCATE" && col("before").isNull && col("after").isNull)
    col("event_id").isNotNull && col("event_id").rlike(uuidRe) &&
      op.isin(Operations.map(lit): _*) &&
      col("timestamp_micros").isNotNull && col("timestamp_micros") > 0 &&
      col("timestamp_micros") <= nowUs + lit(60L * 1000000L) &&
      col("schema_version") >= 1 &&
      (col("ttl_seconds").isNull || col("ttl_seconds") >= 0) &&
      opRule
  }

  /** Unwrap (T1, ExtractNewRecordState): flat row = after for upserts,
    * before for deletes; adds the Debezium-style `__op`/`__source_ts_ms`/
    * `__deleted` metadata (`cassandra-source.json:40-43`).
    */
  def unwrap(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("row",
        when(col("operation_type") === "DELETE", col("before")).otherwise(col("after")))
      .withColumn("__deleted", col("operation_type") === "DELETE" || col("is_tombstone"))
      .withColumn("__op", col("operation_type"))
      .withColumn("__source_ts_ms", (col("timestamp_micros") / 1000).cast("long"))

  /** Typed per-table cast (T9/T10): project the permissive string-map row
    * into the table's StructType, casting each column. Unknown map keys
    * are dropped; missing columns become null (additive evolution).
    * Set-typed columns get `array_distinct` (set semantics on write).
    */
  def castRow(unwrapped: DataFrame, schema: StructType,
      setColumns: Set[String] = Set.empty): DataFrame = {
    val cols = schema.fields.map { f =>
      val raw = col("row").getItem(f.name)
      val cast = f.dataType match {
        case ArrayType(et, _) =>
          val arr = from_json(raw, ArrayType(StringType))
            .cast(ArrayType(et))
          if (setColumns.contains(f.name)) array_distinct(arr) else arr
        case mt: MapType => from_json(raw, MapType(StringType, StringType)).cast(mt)
        case st: StructType => from_json(raw, st)
        case TimestampType =>
          // accept ISO strings or epoch-ms ints (type_mapper.py:121-126);
          // try_* because ANSI mode (Spark 4 default) throws on malformed
          // input — unconvertible values become null and are classified
          // TYPE_CONVERSION_ERROR by the validation split (DLQ path).
          // Column-API try_cast, NOT expr() string interpolation: column
          // names here come from observed DATA (the evolution path
          // registers any map key), and a name carrying a quote/bracket
          // would wedge every later batch on a ParseException
          coalesce(
            try_to_timestamp(raw),
            timestamp_millis(raw.try_cast(LongType)))
        case dt => raw.try_cast(dt)
      }
      cast.as(f.name)
    }
    unwrapped.select(
      (cols.toSeq ++ Seq(col("event_id"), col("timestamp_micros"), col("ttl_seconds"),
        col("__deleted"), col("__op"), col("schema_version"))): _*)
  }
}
