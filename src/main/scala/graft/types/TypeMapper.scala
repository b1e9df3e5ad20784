package graft.types

import org.apache.spark.sql.types._

/** Cassandra-type-universe mapping (reference
  * `src/services/type_mapper.py:19-81`): CQL DDL type string → Catalyst
  * DataType (+ the PostgreSQL type the JDBC sink DDL emits). Handles the
  * recursive cases (`list<>`, `set<>`, `map<>`, `frozen<>`, `tuple<>`).
  *
  * Deviations from the reference (deliberate, documented in SURVEY.md
  * §1.2): maps stay structured `MapType` instead of JSONB text; sets keep
  * element type with distinct-on-write semantics.
  */
object TypeMapper {

  final case class Mapped(catalyst: DataType, pg: String)

  private val scalar: Map[String, Mapped] = Map(
    "text" -> Mapped(StringType, "VARCHAR"),
    "varchar" -> Mapped(StringType, "VARCHAR"),
    "ascii" -> Mapped(StringType, "VARCHAR"),
    "int" -> Mapped(IntegerType, "INTEGER"),
    "bigint" -> Mapped(LongType, "BIGINT"),
    "smallint" -> Mapped(ShortType, "SMALLINT"),
    "tinyint" -> Mapped(ByteType, "SMALLINT"),
    "varint" -> Mapped(DecimalType(38, 0), "NUMERIC"),
    "float" -> Mapped(FloatType, "REAL"),
    "double" -> Mapped(DoubleType, "DOUBLE PRECISION"),
    "decimal" -> Mapped(DecimalType(38, 18), "DECIMAL"),
    "boolean" -> Mapped(BooleanType, "BOOLEAN"),
    "uuid" -> Mapped(StringType, "UUID"),
    "timeuuid" -> Mapped(StringType, "UUID"),
    "timestamp" -> Mapped(TimestampType, "TIMESTAMPTZ"),
    "date" -> Mapped(DateType, "DATE"),
    "time" -> Mapped(LongType, "TIME"), // ns-of-day; Spark has no TIME type
    "blob" -> Mapped(BinaryType, "BYTEA"),
    "inet" -> Mapped(StringType, "INET"),
    "counter" -> Mapped(LongType, "BIGINT"))

  /** Parse a CQL type string. Unknown types fall back to text
    * (`type_mapper.py:81`).
    */
  def map(cql: String): Mapped = {
    val t = cql.trim.toLowerCase
    def inner(prefix: String): String =
      t.stripPrefix(prefix + "<").stripSuffix(">")
    if (t.startsWith("frozen<")) map(inner("frozen"))
    else if (t.startsWith("list<")) {
      val e = map(inner("list"))
      Mapped(ArrayType(e.catalyst), s"${e.pg}[]")
    } else if (t.startsWith("set<")) {
      val e = map(inner("set"))
      Mapped(ArrayType(e.catalyst), s"${e.pg}[]") // distinct enforced on write
    } else if (t.startsWith("map<")) {
      val Array(k, v) = splitTopLevel(inner("map"))
      Mapped(MapType(map(k).catalyst, map(v).catalyst), "JSONB")
    } else if (t.startsWith("tuple<")) {
      val parts = splitTopLevel(inner("tuple"))
      val fields = parts.zipWithIndex.map { case (p, i) =>
        StructField(s"_$i", map(p).catalyst)
      }
      Mapped(StructType(fields.toIndexedSeq), "JSONB")
    } else scalar.getOrElse(t, Mapped(StringType, "TEXT"))
  }

  /** Split "k, v" / "a, b, c" respecting nested angle brackets. */
  private def splitTopLevel(s: String): Array[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '<' => depth += 1; cur += '<'
      case '>' => depth -= 1; cur += '>'
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    out += cur.result().trim
    out.result().toArray
  }

  /** Build a table StructType from (name, cqlType, kind) rows — the shape
    * `system_schema.columns` returns (`cassandra_repository.py:110-168`).
    * Nullability: everything nullable except partition keys
    * (`type_mapper.py:225`).
    */
  def structFor(columns: Seq[(String, String, String)]): StructType =
    StructType(columns.map { case (name, cql, kind) =>
      StructField(name, map(cql).catalyst, nullable = kind != "partition_key")
    })

  /** PG DDL column list for the sink auto-create (S13). */
  def pgColumns(columns: Seq[(String, String, String)]): Seq[(String, String)] =
    columns.map { case (name, cql, _) => name -> map(cql).pg }

  /** Catalyst → SQL column type for additive target evolution — the
    * inverse direction of [[structFromJdbc]], used when auto.evolve
    * (`docker/connectors/postgres-sink.json:13-14`, SC-011/012) ALTERs a
    * live table to follow the registry. `dialect` covers the few names
    * PostgreSQL and Derby (the live test target) disagree on; nested
    * types serialize to bounded VARCHAR — the portable analog of the
    * reference's JSONB columns.
    */
  def sqlFor(dt: DataType, dialect: String = "postgresql"): String = {
    val derby = dialect == "derby"
    dt match {
      case LongType                => "BIGINT"
      case IntegerType             => "INTEGER"
      case ShortType | ByteType    => "SMALLINT"
      case FloatType               => "REAL"
      case DoubleType              => "DOUBLE PRECISION"
      case d: DecimalType          => s"DECIMAL(${d.precision},${d.scale})"
      case BooleanType             => "BOOLEAN"
      case DateType                => "DATE"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case BinaryType              => if (derby) "BLOB" else "BYTEA"
      case _                       => "VARCHAR(32000)"
    }
  }

  /** Dialect key for [[sqlFor]] from a JDBC url. */
  def dialectOf(url: String): String =
    if (url.startsWith("jdbc:derby")) "derby" else "postgresql"

  /** S5 live catalog scan: table schema straight from a JDBC catalog via
    * `DatabaseMetaData.getColumns` + primary-key nullability — the
    * target-side analog of reading `system_schema.columns`
    * (`cassandra_repository.py:110-168`; the source side has no live
    * Cassandra here, so the catalog read is exercised against the real
    * JDBC target). java.sql.Types → Catalyst; unknown types fall back to
    * string like the CQL path.
    */
  def structFromJdbc(conn: java.sql.Connection, table: String): StructType = {
    import java.sql.Types._
    def catalyst(sqlType: Int, precision: Int, scale: Int): DataType = sqlType match {
      case BIGINT => LongType
      case INTEGER => IntegerType
      case SMALLINT => ShortType
      case TINYINT => ByteType
      case FLOAT | REAL => FloatType
      case DOUBLE => DoubleType
      case NUMERIC | DECIMAL =>
        if (precision > 0 && precision <= 38) DecimalType(precision, math.max(0, scale))
        else DecimalType(38, 18)
      case BOOLEAN | BIT => BooleanType
      case DATE => DateType
      case TIMESTAMP | TIMESTAMP_WITH_TIMEZONE => TimestampType
      case BINARY | VARBINARY | LONGVARBINARY | BLOB => BinaryType
      case _ => StringType
    }
    val md = conn.getMetaData
    // getColumns treats the table name as a LIKE pattern: an unescaped
    // '_' (present in every CDC table name) is a single-char wildcard
    // that would merge similarly-named tables' columns into one struct.
    // getPrimaryKeys takes an exact name — only the pattern is escaped.
    val esc = md.getSearchStringEscape
    val tablePattern = table.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
    // scope to the connection's current schema — a null pattern unions
    // same-named tables across schemas into one merged struct
    val schemaPat = try Option(conn.getSchema).map(s =>
        s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")).orNull
      catch { case _: Exception => null }
    val pks = {
      // schema-scope the pk lookup like the column one — but with the
      // EXACT schema name (getPrimaryKeys takes names, not LIKE patterns):
      // a null schema can read pk/nullability flags off a same-named
      // table in another schema while the columns come from this one
      val schemaExact = try conn.getSchema catch { case _: Exception => null }
      val rs = md.getPrimaryKeys(null, schemaExact, table)
      val b = Set.newBuilder[String]
      try while (rs.next()) b += rs.getString("COLUMN_NAME") finally rs.close()
      b.result()
    }
    val rs = md.getColumns(null, schemaPat, tablePattern, null)
    val fields = Seq.newBuilder[StructField]
    try while (rs.next()) {
      val name = rs.getString("COLUMN_NAME")
      fields += StructField(name,
        catalyst(rs.getInt("DATA_TYPE"), rs.getInt("COLUMN_SIZE"),
          rs.getInt("DECIMAL_DIGITS")),
        nullable = !pks.contains(name) &&
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls)
    } finally rs.close()
    StructType(fields.result())
  }
}
