package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.schema.{Evolution, SchemaEvolvingBatch, SchemaRegistry}
import graft.sink.{JdbcLwwExecutor, ParquetStateStore}
import graft.types.CdcSchemas

/** Schema evolution wired into the LIVE replication path (FR-014..018):
  * the stream parses the permissive envelope, and the typed cast is
  * driven by the SchemaRegistry consulted per micro-batch — so an added
  * column flows through in the same run with no restart
  * (`test_schema_add_column.py` semantics), and an incompatible declared
  * change routes the batch to the DLQ (`test_schema_incompatible.py`).
  */
class SchemaEvolutionStreamSpec extends SparkSpecBase {

  private def envelope(id: String, ts: Long, row: String): String =
    s"""{"event_id":"00000000-0000-0000-0000-${id.reverse.padTo(12, '0').reverse}",""" +
      s""""source_table":"users","operation_type":"CREATE","timestamp_micros":$ts,""" +
      s""""before":null,"after":$row,"schema_version":1,"ttl_seconds":null,"is_tombstone":false}"""

  test("add-column mid-stream evolves the registry and flows through, no restart") {
    val srcDir = tmpDir("evsrc")
    // batch 1: v1 rows (id, name); batch 2: a new `email` column appears
    Files.writeString(Paths.get(s"$srcDir/f1.json"),
      envelope("1", 1000L, """{"id":"u1","name":"Ann"}""") + "\n" +
        envelope("2", 1000L, """{"id":"u2","name":"Bob"}""") + "\n")
    Files.writeString(Paths.get(s"$srcDir/f2.json"),
      envelope("3", 2000L, """{"id":"u3","name":"Cal","email":"c@x.io"}""") + "\n")
    // file source orders by mtime — pin it so f1 is batch 1
    Files.setLastModifiedTime(Paths.get(s"$srcDir/f1.json"), FileTime.fromMillis(1000000))
    Files.setLastModifiedTime(Paths.get(s"$srcDir/f2.json"), FileTime.fromMillis(2000000))

    val reg = new SchemaRegistry(tmpDir("evreg") + "/registry.tsv")
    val targetDir = tmpDir("evtgt") + "/state"
    val versionsSeen = scala.collection.mutable.ArrayBuffer[Int]()

    val q = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("maxFilesPerTrigger", 1)
      .text(srcDir)
      .writeStream
      .option("checkpointLocation", tmpDir("evckpt"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val unwrapped = CdcSchemas.unwrap(CdcSchemas.parse(batch, "value"))
        val (v, schema) = SchemaEvolvingBatch.observeAndEvolve(reg, "users", unwrapped, 1000L)
        versionsSeen += v
        val typed = CdcSchemas.castRow(unwrapped, schema)
          .select(col("id"), col("name"),
            (if (schema.fieldNames.contains("email")) col("email")
             else lit(null).cast("string")).as("email"),
            col("timestamp_micros"), col("event_id"))
        new ParquetStateStore(spark, targetDir, "id", "timestamp_micros", "event_id")
          .upsert(typed)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(versionsSeen.toSeq == Seq(1, 2), s"expected v1 then v2, saw $versionsSeen")
    assert(reg.current("users").map(_._2.fieldNames.toSet).contains(Set("id", "name", "email")))
    val state = spark.read.parquet(targetDir)
    assert(state.count() == 3)
    val emails = state.select("id", "email").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(emails("u3").contains("c@x.io"), "new column must carry data for new rows")
    assert(emails("u1").isEmpty && emails("u2").isEmpty, "old rows null-padded")
  }

  test("incompatible declared change is rejected and the batch routes to DLQ") {
    import spark.implicits._
    val reg = new SchemaRegistry(tmpDir("evreg2") + "/registry.tsv")
    val v1 = StructType(Seq(StructField("id", StringType, nullable = false),
      StructField("age", IntegerType)))
    assert(SchemaEvolvingBatch.applyDeclared(reg, "users", v1, Evolution.Backward, 1000L).isRight)

    val narrowed = StructType(Seq(StructField("id", StringType, nullable = false),
      StructField("age", StringType))) // int → string: not a widening
    val res = SchemaEvolvingBatch.applyDeclared(reg, "users", narrowed, Evolution.Backward, 2000L)
    assert(res.isLeft, "type narrowing must be incompatible")

    // the rejected batch goes to the DLQ with SCHEMA_MISMATCH and full context
    val batch = Seq(("e1", "u1")).toDF("event_id", "id")
    val dlqDir = tmpDir("evdlq")
    batch.withColumn("error_type", lit("SCHEMA_MISMATCH"))
      .withColumn("error_detail", lit(res.swap.getOrElse(Seq()).mkString("; ")))
      .write.mode("append").parquet(dlqDir)
    val dlq = spark.read.parquet(dlqDir)
    assert(dlq.count() == 1)
    assert(dlq.select("error_detail").as[String].head().contains("age"))
    assert(reg.current("users").map(_._1).contains(1), "registry must not advance on reject")
  }

  test("TTL purge: parquet store deletes expired rows, keeps live and no-TTL rows") {
    import spark.implicits._
    val dir = tmpDir("ttl") + "/state"
    val store = new ParquetStateStore(spark, dir, "k", "ts_us", "eid")
    val nowUs = 1000000000L
    store.upsert(Seq(
      (1L, 10L, 1L, Some(nowUs - 5000000L)), // expired 5 s ago
      (2L, 10L, 2L, Some(nowUs + 5000000L)), // expires in 5 s
      (3L, 10L, 3L, None)                    // no TTL
    ).toDF("k", "ts_us", "eid", "expiry_us"))
    assert(store.purgeExpired("expiry_us", nowUs) == 1L)
    assert(store.read().select("k").as[Long].collect().toSet == Set(2L, 3L))
    assert(store.purgeExpired("expiry_us", nowUs) == 0L, "purge is idempotent")
  }

  test("TTL purge: bucketed store rewrites only affected buckets, drops emptied ones") {
    import graft.sink.BucketedParquetStateStore
    import spark.implicits._
    val dir = tmpDir("ttlb") + "/state"
    val store = new BucketedParquetStateStore(spark, dir, "k", "ts_us", "eid", numBuckets = 8)
    val nowUs = 1000000000L
    // 200 live keys + every key of one specific bucket expired
    val live = (1L to 200L).map(i => (i, 10L, i, Option.empty[Long]))
    store.upsert(live.toDF("k", "ts_us", "eid", "expiry_us"))
    val bucketOf = spark.range(1, 201).select(col("id"),
      pmod(hash(col("id")), lit(8)).as("b")).as[(Long, Int)].collect().toMap
    val victimBucket = bucketOf(1L)
    val victims = (1L to 200L).filter(bucketOf(_) == victimBucket)
    // expire exactly the victim bucket's keys
    store.upsert(victims.map(i => (i, 20L, i + 1000L, Some(nowUs - 1L)))
      .toDF("k", "ts_us", "eid", "expiry_us"))
    assert(store.purgeExpired("expiry_us", nowUs) == victims.size.toLong)
    val left = store.read().select("k").as[Long].collect().toSet
    assert(left == (1L to 200L).toSet -- victims)
    assert(!Files.exists(Paths.get(s"$dir/_bucket=$victimBucket")),
      "fully-expired bucket dir must be removed")
  }

  test("drop-column is graceful in every mode and target data is preserved") {
    // test_schema_drop_column.py: a column vanishing from the declared
    // schema must not break the pipeline, and the target keeps it
    val reg = new SchemaRegistry(tmpDir("evdrop") + "/registry.tsv")
    val v1 = StructType(Seq(StructField("id", StringType, nullable = false),
      StructField("name", StringType), StructField("email", StringType)))
    assert(SchemaEvolvingBatch.applyDeclared(reg, "users", v1, Evolution.Full, 1000L).isRight)
    val dropped = StructType(Seq(StructField("id", StringType, nullable = false),
      StructField("name", StringType)))
    for (mode <- Seq(Evolution.Backward, Evolution.Forward, Evolution.Full))
      assert(Evolution.check(v1, dropped, mode) == Evolution.Compatible,
        s"drop must be graceful under $mode")
    val res = SchemaEvolvingBatch.applyDeclared(reg, "users", dropped, Evolution.Full, 2000L)
    assert(res.isRight)
    assert(res.toOption.get._2.fieldNames.contains("email"),
      "the evolved schema keeps the dropped column (target data preserved)")
  }

  test("type changes: widenings pass, narrowing and NOT NULL tightening fail") {
    // test_schema_type_change.py contracts
    def chk(f: StructType, t: StructType) = Evolution.check(f, t, Evolution.Backward)
    val id = StructField("id", StringType, nullable = false)
    // int -> bigint: the canonical allowed change
    assert(chk(StructType(Seq(id, StructField("n", IntegerType))),
      StructType(Seq(id, StructField("n", LongType)))) == Evolution.Compatible)
    // decimal precision expansion ok, contraction not
    assert(chk(StructType(Seq(id, StructField("d", DecimalType(10, 2)))),
      StructType(Seq(id, StructField("d", DecimalType(18, 4))))) == Evolution.Compatible)
    // precision+scale can both GROW while INTEGER digits shrink — that's
    // a narrowing (DECIMAL(10,0) holds 10 integer digits, (11,5) only 6)
    assert(chk(StructType(Seq(id, StructField("d", DecimalType(10, 0)))),
      StructType(Seq(id, StructField("d", DecimalType(11, 5)))))
      .isInstanceOf[Evolution.Incompatible])
    assert(chk(StructType(Seq(id, StructField("d", DecimalType(18, 4)))),
      StructType(Seq(id, StructField("d", DecimalType(10, 2))))).isInstanceOf[Evolution.Incompatible])
    // bigint -> int narrows
    assert(chk(StructType(Seq(id, StructField("n", LongType))),
      StructType(Seq(id, StructField("n", IntegerType)))).isInstanceOf[Evolution.Incompatible])
    // nullable -> NOT NULL cannot hold over old data; loosening is fine
    assert(chk(StructType(Seq(id, StructField("v", StringType, nullable = true))),
      StructType(Seq(id, StructField("v", StringType, nullable = false))))
      .isInstanceOf[Evolution.Incompatible])
    assert(chk(StructType(Seq(id, StructField("v", StringType, nullable = false))),
      StructType(Seq(id, StructField("v", StringType, nullable = true)))) == Evolution.Compatible)
    // a widening combined with a tightening must still be caught
    assert(chk(StructType(Seq(id, StructField("n", IntegerType, nullable = true))),
      StructType(Seq(id, StructField("n", LongType, nullable = false))))
      .isInstanceOf[Evolution.Incompatible])
  }

  test("SC-012: 100 sequential schema changes sustain well under the 10 s bound") {
    // the reference sustains 100 changes/day with ≤10 s propagation each
    // (spec.md:268-269); here 100 additive evolutions run back-to-back —
    // registry write + read + compatibility check per change — in far
    // less than one propagation bound TOTAL
    val reg = new SchemaRegistry(tmpDir("evrate") + "/registry.tsv")
    val t0 = System.nanoTime()
    var cur = StructType(Seq(StructField("id", StringType, nullable = false)))
    for (i <- 1 to 100) {
      cur = StructType(cur.fields :+ StructField(s"c$i", StringType))
      val r = SchemaEvolvingBatch.applyDeclared(reg, "users", cur, Evolution.Backward,
        nowUs = i * 1000L)
      assert(r.isRight, s"change $i must be compatible")
    }
    val dt = (System.nanoTime() - t0) / 1e9
    assert(reg.current("users").map(_._1).contains(100), "100 versions registered")
    assert(reg.current("users").map(_._2.fields.length).contains(101))
    assert(dt < 10.0, f"100 changes took $dt%.1f s - the reference bound is 10 s PER change")
  }

  test("evolveTable ALTERs in only the missing columns, idempotently") {
    val url = "jdbc:derby:memory:evolvetest;create=true"
    JdbcLwwExecutor.ensureTable(url,
      """CREATE TABLE ev_t ("k" BIGINT NOT NULL, "name" VARCHAR(64), PRIMARY KEY ("k"))""")
    val wanted = Seq(
      "k" -> "BIGINT", "name" -> "VARCHAR(64)",
      "email" -> "VARCHAR(32000)", "age" -> "INTEGER")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      assert(JdbcLwwExecutor.evolveTable(conn, "ev_t", wanted) == Seq("email", "age"))
      // idempotent: nothing left to add
      assert(JdbcLwwExecutor.evolveTable(conn, "ev_t", wanted).isEmpty)
      // absent table: creation is the auto-create path's job, not an ALTER
      assert(JdbcLwwExecutor.evolveTable(conn, "no_such_t", wanted).isEmpty)
      // the new columns are live (quoted case preserved) and nullable
      val st = conn.createStatement()
      st.executeUpdate("""INSERT INTO ev_t ("k", "name", "email", "age")
        | VALUES (1, 'Ann', 'a@x.io', 40)""".stripMargin)
      st.executeUpdate("""INSERT INTO ev_t ("k", "name") VALUES (2, 'Bob')""")
      val rs = st.executeQuery("""SELECT "email" FROM ev_t WHERE "k" = 2""")
      rs.next()
      assert(rs.getString(1) == null, "evolved column must be nullable")
    } finally conn.close()
  }

  test("auto.evolve mid-stream: live JDBC target gains the column in-batch (SC-011)") {
    import spark.implicits._
    val url = "jdbc:derby:memory:evolvestream;create=true"
    // v1 target: no `value` column yet
    JdbcLwwExecutor.ensureTable(url,
      """CREATE TABLE ev_users (
        |  "user_id" BIGINT NOT NULL,
        |  "event_type" VARCHAR(32),
        |  "_cdc_deleted" BOOLEAN,
        |  "_cdc_timestamp_micros" BIGINT,
        |  "_last_event_id" BIGINT,
        |  PRIMARY KEY ("user_id"))""".stripMargin)
    def batchDf(rows: (Long, Long, Long, String, Double)*) =
      rows.toSeq.toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .withColumn("ts", col("ts_us") * 1000)
        .withColumn("props", lit(null).cast("string"))
    val baseCols = Seq("user_id", "event_type",
      "_cdc_deleted", "_cdc_timestamp_micros", "_last_event_id")
    val base = tmpDir("evjdbc")
    def cfg(t: JdbcLwwExecutor.Target) = graft.streaming.ReplicationJob.Config(
      sourceDir = base, targetDir = s"$base/target", dlqDir = s"$base/dlq",
      checkpointDir = s"$base/ckpt", jdbcTarget = Some(t), autoEvolveTarget = true)

    // batch 0 at the v1 contract — nothing to evolve
    val t1 = JdbcLwwExecutor.Target(url, "ev_users", baseCols, pk = Seq("user_id"))
    graft.streaming.ReplicationJob.processBatch(spark,
      batchDf((1L, 100L, 1L, "view", 1.0)), cfg(t1), batchId = 0L)
    // registry evolves: the declared contract now carries `value` — the
    // SAME next micro-batch must ALTER the live table and write through.
    // CLOCKED (r17 verdict #7 — SC-011, spec.md:268: propagation ≤ 10 s):
    // propagation time = the evolving micro-batch's ingest → commit wall
    // time, since the column and its data are target-visible exactly when
    // processBatch returns (ALTER + upsert run inside the same batch).
    val t2 = t1.copy(cols = baseCols :+ "value")
    val tEvolve0 = System.nanoTime()
    graft.streaming.ReplicationJob.processBatch(spark,
      batchDf((2L, 200L, 2L, "click", 2.5)), cfg(t2), batchId = 1L)
    val evolveSec = (System.nanoTime() - tEvolve0) / 1e9
    assert(evolveSec <= 10.0,
      f"SC-011 schema-change propagation took $evolveSec%.1f s (bound 10 s)")

    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT "user_id", "value" FROM ev_users ORDER BY "user_id"""")
      rs.next()
      assert(rs.getLong(1) == 1L && { rs.getDouble(2); rs.wasNull() },
        "pre-evolution row must read NULL for the new column")
      rs.next()
      assert(rs.getLong(1) == 2L && rs.getDouble(2) == 2.5,
        "post-evolution row must carry the new column's value")
      assert(!rs.next())
    } finally conn.close()
  }

  test("TTL purge: JDBC target deletes expired rows through real SQL") {
    val url = "jdbc:derby:memory:ttltest;create=true"
    JdbcLwwExecutor.ensureTable(url,
      """CREATE TABLE ttl_t ("k" BIGINT NOT NULL, "_ttl_expiry_us" BIGINT, PRIMARY KEY ("k"))""")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("""INSERT INTO ttl_t VALUES (1, 100), (2, 2000000), (3, NULL)""")
      assert(JdbcLwwExecutor.purgeExpired(conn, "ttl_t", "_ttl_expiry_us", 1000000L) == 1L)
      val rs = st.executeQuery("""SELECT count(*) FROM ttl_t""")
      rs.next()
      assert(rs.getLong(1) == 2L)
    } finally conn.close()
  }
}
