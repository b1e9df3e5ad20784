package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.DlqService
import graft.schema.Evolution
import graft.types.{CdcSchemas, TypeMapper}
import graft.util.{CircuitBreaker, Retry}

class TypesSchemaSpec extends SparkSpecBase {
  import spark.implicits._

  test("type mapper covers the reference's type universe") {
    assert(TypeMapper.map("text").catalyst == StringType)
    assert(TypeMapper.map("varint").catalyst == DecimalType(38, 0))
    assert(TypeMapper.map("uuid") == TypeMapper.Mapped(StringType, "UUID"))
    assert(TypeMapper.map("list<int>").catalyst == ArrayType(IntegerType))
    assert(TypeMapper.map("set<text>").catalyst == ArrayType(StringType))
    assert(TypeMapper.map("map<text, bigint>").catalyst == MapType(StringType, LongType))
    assert(TypeMapper.map("frozen<map<text, list<int>>>").catalyst ==
      MapType(StringType, ArrayType(IntegerType)))
    assert(TypeMapper.map("tuple<int, text>").catalyst ==
      StructType(Seq(StructField("_0", IntegerType), StructField("_1", StringType))))
    assert(TypeMapper.map("wat").catalyst == StringType) // unknown → TEXT fallback
    assert(TypeMapper.map("map<text,text>").pg == "JSONB")
    assert(TypeMapper.map("list<int>").pg == "INTEGER[]")
  }

  test("structFor: only partition keys are non-nullable") {
    val st = TypeMapper.structFor(Seq(
      ("id", "uuid", "partition_key"), ("ts", "timestamp", "clustering"),
      ("v", "double", "regular")))
    assert(!st("id").nullable && st("ts").nullable && st("v").nullable)
  }

  test("structFromJdbc: live catalog scan off a real JDBC target (S5)") {
    val url = "jdbc:derby:memory:catalogtest;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        """CREATE TABLE CAT_T (
          |  "id" BIGINT NOT NULL,
          |  "name" VARCHAR(64),
          |  "score" DOUBLE,
          |  "amount" DECIMAL(12,2),
          |  "created" TIMESTAMP,
          |  "payload" BLOB,
          |  PRIMARY KEY ("id"))""".stripMargin)
      val st = TypeMapper.structFromJdbc(conn, "CAT_T")
      assert(st.fieldNames.toSeq == Seq("id", "name", "score", "amount", "created", "payload"))
      assert(st("id").dataType == LongType && !st("id").nullable)
      assert(st("name").dataType == StringType && st("name").nullable)
      assert(st("score").dataType == DoubleType)
      assert(st("amount").dataType == DecimalType(12, 2))
      assert(st("created").dataType == TimestampType)
      assert(st("payload").dataType == BinaryType)
    } finally conn.close()
  }

  test("envelope parse + validation split on canonical fixtures") {
    val now = 1732092400000000L
    val valid =
      """{"event_id":"550e8400-e29b-41d4-a716-446655440000","source_table":"users",
        |"operation_type":"CREATE","timestamp_micros":1732092300000000,
        |"before":null,"after":{"id":"u1","age":"42"},
        |"schema_version":1,"ttl_seconds":null,"is_tombstone":false}""".stripMargin.replace("\n", "")
    val badUuid = valid.replace("550e8400-e29b-41d4-a716-446655440000", "nope")
    val updNoBefore = valid.replace("CREATE", "UPDATE")
    val futureTs = valid.replace("1732092300000000", (now + 120000000L).toString)
    val df = Seq(valid, badUuid, updNoBefore, futureTs).toDF("json")
    val parsed = CdcSchemas.parse(df, "json")
    val ok = parsed.filter(CdcSchemas.validEnvelope(lit(now)))
    assert(ok.count() == 1)
    assert(ok.select("after").as[Map[String, String]].head()("age") == "42")
  }

  test("unwrap picks before for deletes and flags __deleted") {
    val rows = Seq(
      ("e1", "users", "CREATE", 100L, null, Map("id" -> "a"), 1, null, false),
      ("e2", "users", "DELETE", 200L, Map("id" -> "b"), null, 1, null, false))
      .toDF("event_id", "source_table", "operation_type", "timestamp_micros",
        "before", "after", "schema_version", "ttl_seconds", "is_tombstone")
    val u = CdcSchemas.unwrap(rows)
    val byId = u.select("event_id", "row", "__deleted")
      .as[(String, Map[String, String], Boolean)].collect().map(r => r._1 -> r).toMap
    assert(byId("e1")._2("id") == "a" && !byId("e1")._3)
    assert(byId("e2")._2("id") == "b" && byId("e2")._3)
  }

  test("castRow: typed projection with set-distinct, epoch-ms timestamps, missing → null") {
    val rows = Seq(
      ("e1", "users", "CREATE", 100L, null,
        Map("id" -> "a", "age" -> "42", "tags" -> """["x","x","y"]""",
          "created_at" -> "1732092300000"),
        1, null, false))
      .toDF("event_id", "source_table", "operation_type", "timestamp_micros",
        "before", "after", "schema_version", "ttl_seconds", "is_tombstone")
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("age", IntegerType),
      StructField("tags", ArrayType(StringType)),
      StructField("created_at", TimestampType),
      StructField("missing_col", StringType)))
    val out = CdcSchemas.castRow(CdcSchemas.unwrap(rows), schema, setColumns = Set("tags"))
      .collect().head
    assert(out.getAs[Int]("age") == 42)
    assert(out.getSeq[String](out.fieldIndex("tags")).sorted == Seq("x", "y"))
    assert(out.getAs[java.sql.Timestamp]("created_at").getTime == 1732092300000L)
    assert(out.getAs[String]("missing_col") == null)
  }

  test("castRow: data-derived column names with quotes/brackets cannot wedge the cast") {
    // the evolution path registers any observed map key as a column name;
    // a name carrying SQL metacharacters must cast fine (Column API), not
    // throw a ParseException on every later batch
    val rows = Seq(
      ("e1", "users", "CREATE", 100L, null,
        Map("o'brien" -> "7", "a]b[c" -> "x", "with space" -> "8"),
        1, null, false))
      .toDF("event_id", "source_table", "operation_type", "timestamp_micros",
        "before", "after", "schema_version", "ttl_seconds", "is_tombstone")
    val schema = StructType(Seq(
      StructField("o'brien", LongType),
      StructField("a]b[c", StringType),
      StructField("with space", IntegerType)))
    val out = CdcSchemas.castRow(CdcSchemas.unwrap(rows), schema).collect().head
    assert(out.getAs[Long]("o'brien") == 7L)
    assert(out.getAs[String]("a]b[c") == "x")
    assert(out.getAs[Int]("with space") == 8)
  }

  test("SC-002 type coverage: 24 distinct CQL types replicate without loss") {
    // The BASELINE row "20+ distinct data types replicated without loss"
    // (spec.md:250, init-schema.cql:8-41): one envelope row carrying a
    // value of every mapped type, through structFor + unwrap + castRow,
    // each value asserted exact; pgColumns must emit sink DDL for all.
    val cols: Seq[(String, String, String)] = Seq(
      ("c_text", "text", "regular"), ("c_varchar", "varchar", "regular"),
      ("c_ascii", "ascii", "regular"), ("c_int", "int", "regular"),
      ("c_bigint", "bigint", "regular"), ("c_smallint", "smallint", "regular"),
      ("c_tinyint", "tinyint", "regular"), ("c_varint", "varint", "regular"),
      ("c_float", "float", "regular"), ("c_double", "double", "regular"),
      ("c_decimal", "decimal", "regular"), ("c_boolean", "boolean", "regular"),
      ("c_uuid", "uuid", "regular"), ("c_timeuuid", "timeuuid", "regular"),
      ("c_timestamp", "timestamp", "regular"), ("c_date", "date", "regular"),
      ("c_time", "time", "regular"), ("c_blob", "blob", "regular"),
      ("c_inet", "inet", "regular"), ("c_counter", "counter", "regular"),
      ("c_list", "list<int>", "regular"), ("c_set", "set<text>", "regular"),
      ("c_map", "map<text,int>", "regular"), ("c_tuple", "tuple<int,text>", "regular"))
    assert(cols.size >= 20 && cols.map(_._2).distinct.size == cols.size)
    val schema = TypeMapper.structFor(cols)
    val image = Map(
      "c_text" -> "héllo", "c_varchar" -> "w", "c_ascii" -> "ok",
      "c_int" -> "-2147483648", "c_bigint" -> "9223372036854775807",
      "c_smallint" -> "-32768", "c_tinyint" -> "127",
      "c_varint" -> "99999999999999999999999999999999999999",
      "c_float" -> "1.5", "c_double" -> "2.625",
      "c_decimal" -> "12345.678900000000000001", "c_boolean" -> "true",
      "c_uuid" -> "123e4567-e89b-12d3-a456-426614174000",
      "c_timeuuid" -> "58e0a7d7-eebc-11d8-9669-0800200c9a66",
      "c_timestamp" -> "2024-11-20 08:45:00", "c_date" -> "2024-11-20",
      "c_time" -> "31500000000000", "c_blob" -> "bytes",
      "c_inet" -> "10.0.0.7", "c_counter" -> "41",
      "c_list" -> "[3,1,2]", "c_set" -> """["a","b","a"]""",
      "c_map" -> """{"k1":1,"k2":2}""", "c_tuple" -> """{"_0":9,"_1":"t"}""")
    val env = Seq(("e1", "typed", "CREATE", 100L, null, image, 1, null, false))
      .toDF("event_id", "source_table", "operation_type", "timestamp_micros",
        "before", "after", "schema_version", "ttl_seconds", "is_tombstone")
    val out = CdcSchemas.castRow(CdcSchemas.unwrap(env), schema,
      setColumns = Set("c_set")).collect().head
    assert(out.getAs[String]("c_text") == "héllo")
    assert(out.getAs[Int]("c_int") == Int.MinValue)
    assert(out.getAs[Long]("c_bigint") == Long.MaxValue)
    assert(out.getAs[Short]("c_smallint") == Short.MinValue)
    assert(out.getAs[Byte]("c_tinyint") == 127.toByte)
    assert(out.getAs[java.math.BigDecimal]("c_varint").toPlainString
      == "99999999999999999999999999999999999999")
    assert(out.getAs[Float]("c_float") == 1.5f && out.getAs[Double]("c_double") == 2.625)
    assert(out.getAs[java.math.BigDecimal]("c_decimal").stripTrailingZeros.toPlainString
      == "12345.678900000000000001")
    assert(out.getAs[Boolean]("c_boolean"))
    assert(out.getAs[String]("c_uuid") == "123e4567-e89b-12d3-a456-426614174000")
    assert(out.getAs[java.sql.Timestamp]("c_timestamp").toInstant
      == java.time.Instant.parse("2024-11-20T08:45:00Z")) // session TZ = UTC
    assert(out.getAs[java.sql.Date]("c_date").toString == "2024-11-20")
    assert(out.getAs[Long]("c_time") == 31500000000000L) // ns-of-day
    assert(new String(out.getAs[Array[Byte]]("c_blob"), "UTF-8") == "bytes")
    assert(out.getAs[String]("c_inet") == "10.0.0.7")
    assert(out.getAs[Long]("c_counter") == 41L)
    assert(out.getSeq[Int](out.fieldIndex("c_list")) == Seq(3, 1, 2)) // order kept
    assert(out.getSeq[String](out.fieldIndex("c_set")).sorted == Seq("a", "b")) // set distinct
    assert(out.getMap[String, Int](out.fieldIndex("c_map")) == Map("k1" -> 1, "k2" -> 2))
    val tup = out.getStruct(out.fieldIndex("c_tuple"))
    assert(tup.getInt(0) == 9 && tup.getString(1) == "t")
    // sink side: every type gets a PG DDL column (S13 auto-create input)
    val ddl = TypeMapper.pgColumns(cols).toMap
    assert(ddl.size == cols.size && ddl.values.forall(_.nonEmpty))
    assert(ddl("c_list") == "INTEGER[]" && ddl("c_map") == "JSONB" && ddl("c_uuid") == "UUID")
  }

  test("schema evolution: diff, widening, compat modes, evolve") {
    val v1 = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("age", IntegerType)))
    val v2 = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("age", LongType),               // int → bigint widening
      StructField("email", StringType)))          // added
    val changes = Evolution.diff(v1, v2)
    assert(changes.collect { case a: Evolution.AddColumn => a.column } == Seq("email"))
    assert(changes.collect { case t: Evolution.TypeChange => t }.head.to == LongType)
    assert(Evolution.check(v1, v2, Evolution.Backward) == Evolution.Compatible)

    val narrowed = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("age", ShortType)))
    Evolution.check(v1, narrowed, Evolution.Full) match {
      case Evolution.Incompatible(rs) => assert(rs.exists(_.contains("age")))
      case _ => fail("narrowing must be incompatible")
    }

    // drops are graceful in every mode (schema_service.py:299-360 — the
    // target keeps the column; readers ignore it)
    val dropped = StructType(Seq(StructField("id", StringType, nullable = false)))
    assert(Evolution.check(v1, dropped, Evolution.Forward) == Evolution.Compatible)
    assert(Evolution.check(v1, dropped, Evolution.Backward) == Evolution.Compatible)

    // a non-nullable add without default can't be read over old-schema
    // data → incompatible under Backward/Full, fine under Forward
    val nnAdd = StructType(v1.fields :+ StructField("req", StringType, nullable = false))
    assert(Evolution.check(v1, nnAdd, Evolution.Backward)
      .isInstanceOf[Evolution.Incompatible])
    assert(Evolution.check(v1, nnAdd, Evolution.Full)
      .isInstanceOf[Evolution.Incompatible])
    assert(Evolution.check(v1, nnAdd, Evolution.Forward) == Evolution.Compatible)

    val evolved = Evolution.evolve(v1, v2)
    assert(evolved.fieldNames.toSeq == Seq("id", "age", "email"))
    assert(evolved("age").dataType == IntegerType, "evolve never mutates existing types")
    assert(Evolution.deserialize(Evolution.serialize(evolved)) == evolved)
  }

  test("DLQ list/stats/replay") {
    val dlq = Seq(
      (1L, "SCHEMA_MISMATCH", "PENDING", 300L),
      (2L, "TYPE_CONVERSION_ERROR", "PENDING", 100L),
      (3L, "SCHEMA_MISMATCH", "ABANDONED", 200L))
      .toDF("event_id", "error_type", "resolution_status", "failed_at_us")
    val listed = DlqService.list(dlq, Seq(col("error_type") === "SCHEMA_MISMATCH"), 10, 0)
    assert(listed.select("event_id").as[Long].collect().toSeq == Seq(1L, 3L))

    val stats = DlqService.stats(dlq)
      .filter(col("error_type").isNull && col("resolution_status").isNull)
      .select("n").as[Long].head()
    assert(stats == 3)

    val (outbound, updated) = DlqService.replay(dlq, Seq(1L, 2L), nowUs = 999L)
    assert(outbound.count() == 2)
    val st = updated.select("event_id", "resolution_status").as[(Long, String)]
      .collect().toMap
    assert(st(1L) == "MANUAL_RESOLVED" && st(2L) == "MANUAL_RESOLVED" && st(3L) == "ABANDONED")
  }

  test("retry backoff: exponential, capped per-delay and in total") {
    val ds = Retry.delays(Retry.Policy(maxAttempts = 8, initialDelayMs = 1000,
      maxDelayMs = 60000, multiplier = 4.0, totalCapMs = 300000))
    assert(ds.take(4) == Seq(1000L, 4000L, 16000L, 60000L))
    assert(ds.sum <= 300000L)
    var calls = 0
    val r = Retry.withRetry(Retry.Policy(maxAttempts = 3), _ => ()) {
      calls += 1
      if (calls < 3) throw new RuntimeException("boom")
      "ok"
    }
    assert(r == "ok" && calls == 3)
  }

  test("circuit breaker opens after threshold, half-opens after cooldown") {
    var now = 0L
    val cb = new CircuitBreaker(failureThreshold = 2, openMs = 1000, clock = () => now)
    def boom(): Unit = intercept[RuntimeException](cb.call(throw new RuntimeException("x")))
    boom(); boom()
    intercept[IllegalStateException](cb.call("never runs"))  // OPEN fails fast
    now = 1500                                               // cooldown elapsed
    assert(cb.call("probe") == "probe")                      // HALF_OPEN probe succeeds
    assert(cb.call("closed again") == "closed again")
  }
}
