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
