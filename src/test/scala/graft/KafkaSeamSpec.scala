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
    assert(encoded.columns.toSeq == Seq("key", "value", "headers"))
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

  test("replay produce strips decode-derived columns from the payload (ts_us, _segment)") {
    // a decoded frame carries ts_us (derived) and — via the event-log
    // source — _segment; embedding either into the replayed value would
    // make it differ from the original producer's payload
    val decodedShaped = Seq((1L, 1000000L, 7L, "view", 1.5, "{}", 1000L, "seg-000.log"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props", "ts_us", "_segment")
    val encoded = KafkaCdc.encode(decodedShaped, keyCol = "user_id")
    val payload = encoded.select("value").collect().head.getString(0)
    assert(!payload.contains("ts_us") && !payload.contains("_segment"),
      s"derived columns leaked into the wire payload: $payload")
    assert(payload.contains("\"ts\":1000000"), s"producer data must survive: $payload")
  }

  test("subscribePattern fan-in: two tables' topics route to two targets bit-exactly") {
    import org.apache.spark.sql.types._
    import graft.streaming.KafkaCdc.TableWire
    // two differently-shaped tables on their contract topics — users with
    // µs timestamps, orders with ns — interleaved in ONE wire frame, the
    // shape a subscribePattern consumer sees
    val usersSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("id", StringType), StructField("event_type", StringType),
      StructField("username", StringType)))
    val ordersSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("order_id", StringType), StructField("event_type", StringType),
      StructField("total", DoubleType)))
    val frames = Seq(
      ("u1", """{"event_id":1,"ts":1000,"id":"u1","event_type":"create","username":"alice"}""", "cdc-events-users"),
      ("A", """{"event_id":11,"ts":2000000,"order_id":"A","event_type":"create","total":10.5}""", "cdc-events-orders"),
      ("u2", """{"event_id":2,"ts":3000,"id":"u2","event_type":"create","username":"bob"}""", "cdc-events-orders-archive"), // foreign topic: routed nowhere
      ("B", """{"event_id":12,"ts":4000000,"order_id":"B","event_type":"create","total":20.0}""", "cdc-events-orders"))
      .toDF("k", "v", "t")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"),
        col("t").as("topic"), lit(0).as("partition"),
        monotonically_increasing_id().as("offset"),
        current_timestamp().as("timestamp"), lit(0).as("timestampType"))

    val routed = KafkaCdc.routeByTopic(frames, Map(
      "users" -> TableWire(usersSchema, tsDivisorToMicros = 1L),
      "orders" -> TableWire(ordersSchema, tsDivisorToMicros = 1000L)))

    val users = routed("users").select("event_id", "id", "username", "ts_us")
      .as[(Long, String, String, Long)].collect().toSet
    assert(users == Set((1L, "u1", "alice", 1000L)),
      s"users must see ONLY its topic (no archive-topic leak): $users")
    val orders = routed("orders").select("event_id", "order_id", "total", "ts_us")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(orders == Set((11L, "A", 10.5, 2000L), (12L, "B", 20.0, 4000L)),
      s"orders rows with ns→µs normalization: $orders")

    // fan the routed frames into two per-table targets through the SAME
    // sink path the stream runs — two tables, two isolated states
    val base = tmpDir("fanin")
    def cfgFor(table: String, schema: StructType, pk: String) =
      graft.streaming.ReplicationJob.Config(
        s"$base/$table/src", s"$base/$table/target", s"$base/$table/dlq",
        s"$base/$table/ckpt", table = table, schema = schema, pk = Seq(pk),
        validTypes = Seq("create", "update", "delete"), deleteType = "delete",
        valueCol = None)
    graft.streaming.ReplicationJob.processBatch(spark,
      routed("users"), cfgFor("users", usersSchema, "id"))
    graft.streaming.ReplicationJob.processBatch(spark,
      routed("orders"), cfgFor("orders", ordersSchema, "order_id"))
    val uState = spark.read.parquet(s"$base/users/target")
      .select("id", "username").as[(String, String)].collect().toSet
    assert(uState == Set(("u1", "alice")))
    val oState = spark.read.parquet(s"$base/orders/target")
      .select("order_id", "total").as[(String, Double)].collect().toSet
    assert(oState == Set(("A", 10.5), ("B", 20.0)))
  }

  // ---- binary Avro wire codec (kafka-topics.md:66-160) ----

  private def avroChangeEvent(
      eventId: String, table: String, op: String, tsUs: Long,
      before: java.util.Map[String, AnyRef], after: java.util.Map[String, AnyRef],
      ttl: java.lang.Integer = null) = {
    import org.apache.avro.generic.GenericData
    val src = new GenericData.Record(
      graft.streaming.AvroCdc.valueSchema.getField("source").schema())
    src.put("keyspace", "cdc_ks"); src.put("table", table); src.put("cluster", null)
    val r = new GenericData.Record(graft.streaming.AvroCdc.valueSchema)
    r.put("event_id", eventId)
    r.put("source", src)
    r.put("operation", new GenericData.EnumSymbol(
      graft.streaming.AvroCdc.valueSchema.getField("operation").schema(), op))
    r.put("timestamp_micros", tsUs)
    r.put("before", before)
    r.put("after", after)
    r.put("schema_version", 1)
    r.put("ttl_seconds", ttl)
    r
  }

  test("binary Avro value decodes to envelope and typed columns bit-exactly") {
    import graft.streaming.AvroCdc
    import graft.types.CdcSchemas
    import org.apache.spark.sql.types._
    // union-typed image map, exactly the wire contract's value unions
    val after = new java.util.HashMap[String, AnyRef]()
    after.put("id", java.lang.Long.valueOf(7L))
    after.put("email", "a@b.c")
    after.put("balance", java.lang.Double.valueOf(12.5))
    after.put("active", java.lang.Boolean.TRUE)
    after.put("nickname", null)
    val records = Seq(
      avroChangeEvent("123e4567-e89b-12d3-a456-426614174000", "users", "CREATE",
        1700000000000000L, null, after, ttl = 3600),
      avroChangeEvent("123e4567-e89b-12d3-a456-426614174001", "users", "DELETE",
        1700000001000000L, null, null), // tombstone: DELETE with no before
      avroChangeEvent("123e4567-e89b-12d3-a456-426614174002", "users", "TRUNCATE",
        1700000002000000L, null, null))
    val wire = records.map(r => AvroCdc.recordBytes(r, AvroCdc.valueSchema)).toDF("value")
    val env = AvroCdc.decodeFrame(wire).orderBy("timestamp_micros")
    val rows = env.collect()
    assert(rows.map(_.operation_type).toSeq == Seq("CREATE", "DELETE", "TRUNCATE"))
    assert(rows(0).after.get == Map("id" -> "7", "email" -> "a@b.c",
      "balance" -> "12.5", "active" -> "true", "nickname" -> null))
    assert(rows(0).ttl_seconds.contains(3600) && rows(0).source_table == "users")
    assert(rows(1).is_tombstone, "DELETE with no before image is a tombstone")
    assert(!rows(0).is_tombstone && !rows(2).is_tombstone)
    // every decoded envelope passes the reference validator rules
    val nValid = env.toDF().filter(
      CdcSchemas.validEnvelope(lit(1700000010000000L))).count()
    assert(nValid == 3L, "decoded envelopes must satisfy validEnvelope")
    // unwrap + per-table typed cast: values come back in their wire types
    val users = StructType(Seq(
      StructField("id", LongType), StructField("email", StringType),
      StructField("balance", DoubleType), StructField("active", BooleanType)))
    val typed = CdcSchemas.castRow(CdcSchemas.unwrap(env.toDF()), users)
      .filter(col("__op") === "CREATE")
      .select("id", "email", "balance", "active").head()
    assert(typed.getLong(0) == 7L && typed.getString(1) == "a@b.c")
    assert(typed.getDouble(2) == 12.5 && typed.getBoolean(3))
  }

  test("schema-changes topic: change records round-trip the wire and rebuild a registry") {
    import org.apache.spark.sql.types._
    import graft.schema.SchemaRegistry
    import graft.streaming.SchemaChangeWire
    val v1 = StructType(Seq(
      StructField("id", StringType), StructField("email", StringType)))
    val v2 = graft.schema.Evolution.evolve(v1,
      StructType(Seq(StructField("phone_number", StringType))))

    // classification follows the contract's example (kafka-topics.md:545+)
    val c1 = SchemaChangeWire.changeFor("warehouse", "users", 1, None, v1, nowUs = 1000000L)
    val c2 = SchemaChangeWire.changeFor("warehouse", "users", 2, Some(v1), v2,
      nowUs = 2000000L)
    assert(c1.change_type == "TABLE_CREATED" &&
      c1.change_details("columns") == "id,email")
    assert(c2.change_type == "COLUMN_ADDED" &&
      c2.change_details("column:phone_number") == "string")
    // deterministic id: a replayed registration produces the same record
    assert(SchemaChangeWire.changeFor("warehouse", "users", 1, None, v1,
      nowUs = 1000000L) == c1)

    // wire round-trip: key = keyspace.table UTF-8, value = Avro bytes
    val frame = SchemaChangeWire.encodeFrame(spark.createDataset(Seq(c1, c2)))
    assert(frame.select("key").as[Array[Byte]].collect()
      .map(new String(_, "UTF-8")).toSet == Set("warehouse.users"))
    val back = SchemaChangeWire.decodeFrame(frame.select("value"))
      .collect().sortBy(_.version).toSeq
    assert(back == Seq(c1, c2), s"wire round-trip diverged: $back")

    // consumer side: replaying the audit log rebuilds the registry (the
    // 365-day-retention purpose), and a second replay is a no-op. The
    // default registry key is the topic's own keyspace.table, so the
    // same table name in another keyspace keeps its own history.
    val reg = new SchemaRegistry(tmpDir("scw") + "/reg.tsv")
    val other = SchemaChangeWire.changeFor("analytics", "users", 1, None,
      StructType(Seq(StructField("uid", LongType))), nowUs = 500000L)
    assert(SchemaChangeWire.applyTo(reg, back :+ other) == 3)
    val (ver, cur) = reg.current("warehouse.users").get
    assert(ver == 2 && cur.fieldNames.toSeq == Seq("id", "email", "phone_number"))
    assert(reg.current("analytics.users").get._2.fieldNames.toSeq == Seq("uid"),
      "two keyspaces carrying the same table name must not merge")
    assert(SchemaChangeWire.applyTo(reg, back :+ other) == 0, "replay must be idempotent")
  }

  test("envelope -> Avro bytes -> envelope round-trips exactly (replay produce)") {
    import graft.streaming.AvroCdc
    val original = Seq(
      AvroCdc.Envelope("123e4567-e89b-12d3-a456-426614174000", "cdc_ks",
        Some("dc-east"), "users", "UPDATE", 1700000000000000L,
        before = Some(Map("id" -> "7", "email" -> "old@b.c")),
        after = Some(Map("id" -> "7", "email" -> "new@b.c", "note" -> null)),
        schema_version = 2, ttl_seconds = None, is_tombstone = false),
      AvroCdc.Envelope("123e4567-e89b-12d3-a456-426614174001", "cdc_ks",
        None, "orders", "DELETE", 1700000001000000L, before = None, after = None,
        schema_version = 1, ttl_seconds = Some(60), is_tombstone = true))
    val env = spark.createDataset(original)
    val frame = AvroCdc.encodeFrame(env, e => e.source_table)
    assert(frame.columns.toSeq == Seq("key", "value"))
    // key is a well-formed ChangeEventKey record
    val keys = frame.select("key").as[Array[Byte]].collect()
      .map(b => AvroCdc.parseRecord(b, AvroCdc.keySchema).get("partition_key").toString)
    assert(keys.toSet == Set("users", "orders"))
    // value decodes back to the identical envelope
    val back = AvroCdc.decodeFrame(frame.select("value")).collect().toSet
    assert(back == original.toSet, s"avro round-trip diverged: $back")
  }
}
