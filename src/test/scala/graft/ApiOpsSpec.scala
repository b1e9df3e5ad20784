package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.api.{ApiServer, Gdpr}
import graft.ops.Metrics
import graft.recon.ReconciliationScheduler
import graft.sink.{JdbcLwwExecutor, ParquetStateStore}

/** The operational surface: Prometheus metrics exposition, the
  * persistent/pausable reconciliation scheduler, the HTTP API routes,
  * and the GDPR dual-store delete with compensation.
  */
class ApiOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("metrics registry renders the reference's required RED metrics") {
    val r = new Metrics.Registry
    Metrics.recordBatch(r, "users",
      validByType = Seq("CREATE" -> 90L, "UPDATE" -> 10L),
      errorsByType = Seq("SCHEMA_MISMATCH" -> 3L),
      batchSeconds = 0.7, backlog = 42L)
    val text = r.render()
    assert(text.contains("# TYPE cdc_events_processed_total counter"))
    assert(text.contains("""cdc_events_processed_total{table="users",operation="CREATE"} 90"""))
    assert(text.contains("# TYPE cdc_errors_total counter"))
    assert(text.contains("""cdc_errors_total{error_type="SCHEMA_MISMATCH"} 3"""))
    assert(text.contains("# TYPE cdc_backlog_depth gauge"))
    assert(text.contains("""cdc_backlog_depth{table="users"} 42"""))
    assert(text.contains("# TYPE cdc_processing_latency_seconds histogram"))
    assert(text.contains("""cdc_processing_latency_seconds_bucket{le="1.0"} 1"""))
    assert(text.contains("""cdc_processing_latency_seconds_bucket{le="0.5"} 0"""))
    assert(text.contains("""cdc_processing_latency_seconds_bucket{le="+Inf"} 1"""))
    assert(text.contains("cdc_processing_latency_seconds_count 1"))
  }

  test("scheduler: due jobs run, pause/resume, missed intervals collapse, persistence") {
    var now = 1000L
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val store = tmpDir("sched") + "/jobs.tsv"
    val s = new ReconciliationScheduler(store, ran += _, () => now)
    s.schedule("users", intervalMs = 100)
    s.schedule("orders", intervalMs = 1000)
    assert(s.tick().isEmpty, "nothing due yet")
    now = 1150
    assert(s.tick() == Seq("users"))
    s.pause("users")
    now = 1450
    assert(s.tick().isEmpty, "paused job must not run")
    s.resume("users")              // next run one interval out: 1550
    now = 2300                     // 7 intervals past — ONE catch-up run
    assert(s.tick().sorted == Seq("orders", "users"))
    assert(ran.count(_ == "users") == 2)
    // persisted across instances; nextRun advanced in whole intervals
    val s2 = new ReconciliationScheduler(store, ran += _, () => now)
    val u = s2.jobs().find(_.table == "users").get
    assert(!u.paused && u.nextRunMs > now && (u.nextRunMs - 1550) % 100 == 0)
    s2.manualTrigger("orders")
    assert(ran.count(_ == "orders") == 2)
  }

  test("scheduler: a throwing job stays due and retries; others still run") {
    var now = 1000L
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    var failing = true
    val store = tmpDir("schedf") + "/jobs.tsv"
    val s = new ReconciliationScheduler(store, t => {
      ran += t
      if (t == "users" && failing) sys.error("target down")
    }, () => now)
    s.schedule("users", 100)
    s.schedule("orders", 100)
    now = 1150
    assert(s.tick() == Seq("orders"), "failed job must not be reported as run")
    // the failed job was NOT advanced: it is still due next tick
    failing = false
    assert(s.tick().sorted == Seq("users"))
    assert(ran.count(_ == "users") == 2 && ran.count(_ == "orders") == 1)
  }

  test("HTTP API: health, metrics, dlq stats, trigger, GDPR delete end-to-end") {
    // real source state store + real Derby target for the GDPR path
    val stateDir = tmpDir("gdpr") + "/state"
    val source = new ParquetStateStore(spark, stateDir, "user_id", "ts_us", "eid")
    source.upsert(Seq((1L, 10L, 1L, "Ann"), (2L, 20L, 2L, "Bob"))
      .toDF("user_id", "ts_us", "eid", "name"))
    val url = "jdbc:derby:memory:gdprtest;create=true"
    JdbcLwwExecutor.ensureTable(url,
      """CREATE TABLE users_t ("user_id" BIGINT NOT NULL, PRIMARY KEY ("user_id"))""")
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate("INSERT INTO users_t VALUES (1), (2)")
    finally conn.close()
    val target = JdbcLwwExecutor.Target(url, "users_t", Seq("user_id"), Seq("user_id"))
    val auditPath = tmpDir("audit") + "/audit.tsv"

    val reg = new Metrics.Registry
    reg.inc(Metrics.EventsProcessed, Seq("table" -> "users", "operation" -> "CREATE"), 5)
    var healthy = true
    val triggered = scala.collection.mutable.ArrayBuffer[String]()
    val api = new ApiServer(
      registry = reg,
      health = () => Map("spark" -> true, "target" -> healthy),
      dlqStatsJson = () => """{"total":0}""",
      reconTrigger = triggered += _,
      gdprDelete = (table, pk) =>
        Gdpr.deleteRecord(source, target, auditPath, table, pk.toLong))
    val port = api.start()
    val http = HttpClient.newHttpClient()
    def send(method: String, path: String): HttpResponse[String] =
      http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .method(method, HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      val h = send("GET", "/health")
      assert(h.statusCode() == 200 && h.body().contains(""""status":"healthy""""))
      healthy = false
      assert(send("GET", "/health").statusCode() == 503)
      healthy = true

      val m = send("GET", "/metrics")
      assert(m.statusCode() == 200 &&
        m.body().contains("""cdc_events_processed_total{table="users",operation="CREATE"} 5"""))

      assert(send("GET", "/dlq/stats").body() == """{"total":0}""")

      assert(send("POST", "/reconciliation/trigger?table=users").statusCode() == 202)
      assert(triggered.toSeq == Seq("users"))
      assert(send("POST", "/reconciliation/trigger?table=bad-name!").statusCode() == 400)

      // GDPR: both stores lose the row, audit written
      val g = send("DELETE", "/gdpr/users/1")
      assert(g.statusCode() == 200 &&
        g.body().contains(""""deleted_from_source":true""") &&
        g.body().contains(""""deleted_from_target":true"""))
      assert(source.read().filter($"user_id" === 1L).isEmpty)
      val c2 = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c2.createStatement().executeQuery("SELECT count(*) FROM users_t")
        rs.next(); assert(rs.getLong(1) == 1L)
      } finally c2.close()
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(auditPath))
        .contains("deleted_both"))

      assert(send("DELETE", "/gdpr/users/99").statusCode() == 404)

      // a throwing callback (pk.toLong on a non-numeric pk) must surface
      // as a 500 JSON error, not a dropped connection
      val boom = send("DELETE", "/gdpr/users/abc")
      assert(boom.statusCode() == 500 && boom.body().contains("error"))
    } finally api.stop()
  }

  test("HTTP API: dlq records/replay, recon jobs/mismatches, component health") {
    import graft.ops.DlqService
    import org.apache.spark.sql.functions.col
    val dlq = Seq(
      (1L, "SCHEMA_MISMATCH", "PENDING", 300L),
      (2L, "VALIDATION", "PENDING", 100L),
      (3L, "VALIDATION", "PENDING", 200L))
      .toDF("event_id", "error_type", "resolution_status", "failed_at_us")
    val store = tmpDir("schedapi") + "/jobs.tsv"
    val sched = new ReconciliationScheduler(store, _ => ())
    sched.schedule("users", 60000L)
    val replayed = scala.collection.mutable.ArrayBuffer[String]()
    val resolved = scala.collection.mutable.ArrayBuffer[String]()
    val api = new ApiServer(
      registry = new Metrics.Registry,
      health = () => Map("spark" -> true, "target" -> false),
      dlqStatsJson = () => "{}",
      reconTrigger = _ => (),
      gdprDelete = (_, _) => Left("n/a"),
      dlqRecordsJson = (limit, offset) => {
        val ids = DlqService.list(dlq, Seq.empty, limit, offset)
          .select("event_id").collect().map(_.getLong(0))
        ids.mkString("[", ",", "]")
      },
      dlqReplay = ids => {
        replayed ++= ids
        DlqService.replay(dlq, ids.map(_.toLong), nowUs = 999L)._1.count()
      },
      reconJobsJson = () => sched.jobs()
        .map(j => s"""{"table":"${j.table}","paused":${j.paused}}""")
        .mkString("[", ",", "]"),
      mismatchesJson = () => """[{"mismatch_id":"m1"}]""",
      mismatchResolve = id => { resolved += id; id == "m1" })
    val port = api.start()
    val http = HttpClient.newHttpClient()
    def send(method: String, path: String): HttpResponse[String] =
      http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .method(method, HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // ordered DESC by failed_at, paginated
      assert(send("GET", "/dlq/records?limit=2").body() == "[1,3]")
      assert(send("GET", "/dlq/records?limit=2&offset=2").body() == "[2]")
      val r = send("POST", "/dlq/replay?ids=1,3")
      assert(r.statusCode() == 200 && r.body() == """{"replayed":2,"requested":2}""")
      assert(replayed.toSeq == Seq("1", "3"))
      assert(send("POST", "/dlq/replay").statusCode() == 400)
      assert(send("GET", "/reconciliation/jobs").body() ==
        """[{"table":"users","paused":false}]""")
      assert(send("GET", "/reconciliation/mismatches").body() == """[{"mismatch_id":"m1"}]""")
      assert(send("POST", "/reconciliation/mismatches/m1/resolve").statusCode() == 200)
      assert(send("POST", "/reconciliation/mismatches/nope/resolve").statusCode() == 404)
      assert(resolved.toSeq == Seq("m1", "nope"))
      // per-component health
      assert(send("GET", "/health/spark").statusCode() == 200)
      assert(send("GET", "/health/target").statusCode() == 503)
      assert(send("GET", "/health/nope").statusCode() == 404)
      // a trailing segment must not fall through to the aggregate report
      assert(send("GET", "/health/spark/extra").statusCode() == 404)
    } finally api.stop()
  }

  test("rate limiter: burst admits, drained bucket throttles, refill re-admits") {
    var clock = 0L
    val rl = new graft.api.RateLimiter(ratePerSec = 1.0, burst = 3, nowNs = () => clock)
    assert((1 to 3).forall(_ => rl.tryAcquire("c1").isRight), "burst of 3 admitted")
    val denied = rl.tryAcquire("c1")
    assert(denied.isLeft && denied.swap.exists(_ >= 1L), "4th call throttled with retry-after")
    // an unrelated client has its own bucket
    assert(rl.tryAcquire("c2").isRight)
    clock += 1500L * 1000000L // +1.5 s → 1.5 tokens refilled
    assert(rl.tryAcquire("c1").isRight && rl.tryAcquire("c1").isLeft)
  }

  test("HTTP API: 429 + Retry-After when the client bucket drains") {
    val api = new ApiServer(
      registry = new Metrics.Registry,
      health = () => Map("spark" -> true),
      dlqStatsJson = () => "{}",
      reconTrigger = _ => (),
      gdprDelete = (_, _) => Left("n/a"),
      rateLimiter = Some(new graft.api.RateLimiter(ratePerSec = 0.001, burst = 2)))
    val port = api.start()
    val http = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      assert(get("/health").statusCode() == 200)
      assert(get("/health").statusCode() == 200)
      val throttled = get("/health")
      assert(throttled.statusCode() == 429, "drained bucket must answer 429")
      val retryAfter = throttled.headers().firstValue("Retry-After").orElse("")
      assert(retryAfter.nonEmpty && retryAfter.toLong >= 1L,
        s"429 must carry Retry-After seconds, got '$retryAfter'")
    } finally api.stop()
  }

  test("HTTP API hardening: exact paths, POST-only trigger, validation -> 400") {
    val triggered = scala.collection.mutable.ArrayBuffer[String]()
    val api = new ApiServer(
      registry = new Metrics.Registry,
      health = () => Map("spark" -> true),
      dlqStatsJson = () => "{}",
      reconTrigger = triggered += _,
      gdprDelete = (t, _) =>
        if (!Gdpr.validIdentifier(t)) Left(s"invalid identifier: $t")
        else Left(s"record not found in source $t"))
    val port = api.start()
    val http = HttpClient.newHttpClient()
    def send(method: String, path: String): HttpResponse[String] =
      http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .method(method, HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // JDK prefix matching must not leak /healthfoo into /health
      assert(send("GET", "/healthfoo").statusCode() == 404)
      assert(send("GET", "/metricsX").statusCode() == 404)
      assert(send("GET", "/health").statusCode() == 200)
      // side-effecting trigger is POST-only (reference route contract)
      val m = send("GET", "/reconciliation/trigger?table=users")
      assert(m.statusCode() == 405 && m.headers().firstValue("Allow").orElse("") == "POST")
      assert(triggered.isEmpty, "a GET must never fire the trigger")
      assert(send("POST", "/reconciliation/trigger?table=users").statusCode() == 202)
      assert(triggered.toSeq == Seq("users"))
      // caller-fault validation errors are 400, absence 404
      assert(send("DELETE", "/gdpr/bad-name!/1").statusCode() == 400)
      assert(send("DELETE", "/gdpr/users/1").statusCode() == 404)
    } finally api.stop()
  }

  test("GDPR audit: tab/newline in free-text fields cannot corrupt the TSV") {
    val stateDir = tmpDir("gdprs") + "/state"
    val source = new ParquetStateStore(spark, stateDir, "user_id", "ts_us", "eid")
    source.upsert(Seq((9L, 10L, 1L, "Mallory")).toDF("user_id", "ts_us", "eid", "name"))
    val url = "jdbc:derby:memory:gdprsan;create=true"
    JdbcLwwExecutor.ensureTable(url,
      """CREATE TABLE users_s ("user_id" BIGINT NOT NULL, PRIMARY KEY ("user_id"))""")
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate("INSERT INTO users_s VALUES (9)") finally c.close()
    val target = JdbcLwwExecutor.Target(url, "users_s", Seq("user_id"), Seq("user_id"))
    val auditPath = tmpDir("audits") + "/audit.tsv"
    val res = Gdpr.deleteRecord(source, target, auditPath, "users", 9L,
      requester = "evil\tuser", reason = "line1\nline2")
    assert(res.isRight)
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(auditPath))
    val lines = content.split("\n", -1).filter(_.nonEmpty)
    assert(lines.length == 1, s"injected newline must not fabricate records: ${lines.toSeq}")
    assert(lines.head.split("\t", -1).length == 7,
      "injected tab must not shift audit fields")
    assert(content.contains("evil\\tuser") && content.contains("line1\\nline2"))
  }

  test("GDPR erasure under a composite key deletes and compensates EVERY row") {
    // 3 rows share the erasure identifier (leading key) in a composite-
    // key store: target delete must remove all 3, and a failed target
    // delete must compensate all 3 back — one-row backup leaves PII in
    // the target and loses rows on compensation
    val stateDir = tmpDir("gdprm") + "/state"
    val source = new ParquetStateStore(spark, stateDir, Seq("user_id", "device"),
      "ts_us", "eid")
    def seed(): Unit = source.upsert(Seq(
      (42L, 1, 10L, 1L, "a"), (42L, 2, 10L, 2L, "b"), (42L, 3, 10L, 3L, "c"),
      (7L, 1, 10L, 4L, "other"))
      .toDF("user_id", "device", "ts_us", "eid", "name"))
    seed()
    val url = "jdbc:derby:memory:gdprmulti;create=true"
    JdbcLwwExecutor.ensureTable(url,
      """CREATE TABLE users_m ("user_id" BIGINT NOT NULL, "device" INT NOT NULL,
        | PRIMARY KEY ("user_id", "device"))""".stripMargin)
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      "INSERT INTO users_m VALUES (42,1),(42,2),(42,3),(7,1)") finally c.close()
    val target = JdbcLwwExecutor.Target(url, "users_m",
      Seq("user_id", "device"), Seq("user_id", "device"))
    val res = Gdpr.deleteRecord(source, target, tmpDir("auditm") + "/a.tsv", "users", 42L)
    assert(res.isRight)
    val c2 = java.sql.DriverManager.getConnection(url)
    val left = try {
      val rs = c2.createStatement().executeQuery(
        """SELECT "user_id", count(*) FROM users_m GROUP BY "user_id"""")
      val b = Map.newBuilder[Long, Int]
      while (rs.next()) b += rs.getLong(1) -> rs.getInt(2)
      b.result()
    } finally c2.close()
    assert(left == Map(7L -> 1), s"ALL of user 42's rows must leave the target: $left")
    assert(source.read().filter($"user_id" === 42L).count() == 0L)

    // compensation path: re-seed, point at a missing table, verify all 3
    // rows come back
    seed()
    val badTarget = target.copy(table = "missing_m")
    val res2 = Gdpr.deleteRecord(source, badTarget, tmpDir("auditm2") + "/a.tsv",
      "users", 42L)
    assert(res2.isLeft)
    assert(source.read().filter($"user_id" === 42L).count() == 3L,
      "compensation must restore every backed-up row")
  }

  test("scheduler rejects jobstore-corrupting names and non-positive intervals") {
    val s = new graft.recon.ReconciliationScheduler(
      tmpDir("schedval") + "/jobs.tsv", _ => ())
    intercept[IllegalArgumentException](s.schedule("users\tx", 60000L))
    intercept[IllegalArgumentException](s.schedule("users", 0L))
    s.schedule("users", 60000L) // sane input still lands
    assert(s.jobs().map(_.table) == Seq("users"))
  }

  test("GDPR compensation: failed target delete restores the source row") {
    val stateDir = tmpDir("gdprc") + "/state"
    val source = new ParquetStateStore(spark, stateDir, "user_id", "ts_us", "eid")
    source.upsert(Seq((5L, 10L, 1L, "Eve")).toDF("user_id", "ts_us", "eid", "name"))
    val badTarget = JdbcLwwExecutor.Target(
      "jdbc:derby:memory:gdprtest2;create=true", "missing_t", Seq("user_id"), Seq("user_id"))
    val auditPath = tmpDir("auditc") + "/audit.tsv"
    val res = Gdpr.deleteRecord(source, badTarget, auditPath, "users", 5L)
    assert(res.isLeft)
    assert(source.read().filter($"user_id" === 5L).count() == 1L,
      "source row must be restored by the compensating re-insert")
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(auditPath))
      .contains("compensated"))
  }
}
