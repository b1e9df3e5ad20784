package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sink.{JdbcLwwExecutor, JdbcUpsertSql}
import graft.util.{CircuitBreaker, Retry}

/** LWW semantics through ACTUAL SQL execution against an embedded Derby
  * target — the accept/reject matrix of the reference's
  * `tests/integration/test_out_of_order_events.py:90-506` (newer wins,
  * older rejected, equal-ts higher-event-id wins, replay converges),
  * plus retry/breaker wiring around a real failing write.
  */
class JdbcSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:lwwtest;create=true"
  private val cols = Seq("user_id", "event_type", "value_cents",
    "_cdc_deleted", "_cdc_timestamp_micros", "_last_event_id")

  private def freshTarget(table: String): JdbcLwwExecutor.Target = {
    JdbcLwwExecutor.ensureTable(url,
      s"""CREATE TABLE $table (
         |  "user_id" BIGINT NOT NULL,
         |  "event_type" VARCHAR(32),
         |  "value_cents" BIGINT,
         |  "_cdc_deleted" BOOLEAN,
         |  "_cdc_timestamp_micros" BIGINT,
         |  "_last_event_id" BIGINT,
         |  PRIMARY KEY ("user_id"))""".stripMargin)
    val conn = DriverManager.getConnection(url)
    try { conn.createStatement().executeUpdate(s"DELETE FROM $table"); () }
    finally conn.close()
    JdbcLwwExecutor.Target(url, table, cols, pk = Seq("user_id"))
  }

  private def rows(t: JdbcLwwExecutor.Target): Map[Long, (String, Long, Long, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"""SELECT "user_id", "event_type", "value_cents", "_cdc_timestamp_micros", "_last_event_id" FROM ${t.table}""")
      val b = Map.newBuilder[Long, (String, Long, Long, Long)]
      while (rs.next())
        b += rs.getLong(1) -> ((rs.getString(2), rs.getLong(3), rs.getLong(4), rs.getLong(5)))
      b.result()
    } finally conn.close()
  }

  private def df(events: (Long, String, Long, Long, Long)*) =
    events.toSeq.toDF("user_id", "event_type", "value_cents",
        "_cdc_timestamp_micros", "_last_event_id")
      .withColumn("_cdc_deleted", lit(false))
      .select(cols.map(col): _*)

  test("LWW accept/reject matrix executes through real SQL") {
    val t = freshTarget("lww_matrix")
    // batch 1: initial state
    JdbcLwwExecutor.writeBatch(df(
      (1L, "signup", 100L, 1000L, 10L),
      (2L, "view", 200L, 2000L, 20L)), t, sleep = _ => ())
    assert(rows(t) == Map(
      1L -> (("signup", 100L, 1000L, 10L)),
      2L -> (("view", 200L, 2000L, 20L))))
    // batch 2: newer ts wins; older ts rejected; equal ts higher id wins;
    // equal ts lower id rejected; new key inserted
    JdbcLwwExecutor.writeBatch(df(
      (1L, "purchase", 111L, 1500L, 11L), // newer → accept
      (2L, "click", 222L, 999L, 21L)),    // older → reject
      t, sleep = _ => ())
    JdbcLwwExecutor.writeBatch(df(
      (1L, "view", 150L, 1500L, 12L),     // equal ts, higher id → accept
      (2L, "view", 250L, 2000L, 19L),     // equal ts, lower id → reject
      (3L, "signup", 300L, 3000L, 30L)),  // new key → insert
      t, sleep = _ => ())
    assert(rows(t) == Map(
      1L -> (("view", 150L, 1500L, 12L)),
      2L -> (("view", 200L, 2000L, 20L)),
      3L -> (("signup", 300L, 3000L, 30L))))
  }

  test("a stored row with a NULL LWW position loses to any positioned write") {
    // a pre-existing table evolved into the CDC meta columns reads NULL
    // there — without the IS NULL arms that row is permanently
    // unwritable (update predicate NULL, insert hits the pk)
    val t = freshTarget("cdc_nullpos")
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        s"""INSERT INTO ${t.table} ("user_id", "event_type", "value_cents",
           | "_cdc_deleted", "_cdc_timestamp_micros", "_last_event_id")
           | VALUES (1, 'legacy', 5, false, NULL, NULL)""".stripMargin)
      conn.createStatement().executeUpdate(
        s"""INSERT INTO ${t.table} ("user_id", "event_type", "value_cents",
           | "_cdc_deleted", "_cdc_timestamp_micros", "_last_event_id")
           | VALUES (2, 'halfpos', 5, false, 100, NULL)""".stripMargin)
      ()
    } finally conn.close()
    JdbcLwwExecutor.writeBatch(df(
      (1L, "update", 10L, 100L, 7L),
      (2L, "update", 11L, 100L, 8L)), t)
    val state = rows(t)
    assert(state(1L) == (("update", 10L, 100L, 7L)),
      s"null-position stored row must lose: ${state(1L)}")
    assert(state(2L) == (("update", 11L, 100L, 8L)),
      s"null-tie stored row must lose the equal-ts tie: ${state(2L)}")
  }

  test("replayed batch is idempotent (exactly-once construction)") {
    val t = freshTarget("lww_replay")
    val batch = df((1L, "signup", 100L, 1000L, 10L), (2L, "view", 200L, 2000L, 20L))
    JdbcLwwExecutor.writeBatch(batch, t, sleep = _ => ())
    val first = rows(t)
    JdbcLwwExecutor.writeBatch(batch, t, sleep = _ => ()) // at-least-once replay
    assert(rows(t) == first)
  }

  test("hard delete removes tombstone keys") {
    val t = freshTarget("lww_del")
    JdbcLwwExecutor.writeBatch(df(
      (1L, "signup", 100L, 1000L, 10L),
      (2L, "view", 200L, 2000L, 20L)), t, sleep = _ => ())
    val conn = DriverManager.getConnection(url)
    try {
      val n = JdbcLwwExecutor.deletePartition(conn, t,
        df((2L, "error", 0L, 3000L, 30L)).collect().iterator)
      assert(n == 1L)
    } finally conn.close()
    assert(rows(t).keySet == Set(1L))
  }

  test("TWO CONCURRENT writers converge to the LWW fold of the merged " +
    "log, whatever the interleaving (round-16 verdict #7)") {
    // The reference's idempotence argument (timestamp_conflict_resolver
    // .py:247-285 — accept iff strictly newer) also guarantees
    // convergence under concurrent writers racing on one target; this
    // executes it: two interleaved writeBatch streams over one Derby
    // table, three rounds with different event splits, each round
    // asserting final state == the in-memory LWW fold of the merged log.
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val t = freshTarget(s"lww_dual$round")
      // merged log: 40 keys x ~8 events, colliding timestamps, unique ids
      val log = (1 to 320).map { i =>
        val k = rnd.nextInt(40).toLong
        (k, s"e$i", rnd.nextInt(1000).toLong,
          (rnd.nextInt(50) * 100).toLong, i.toLong + round * 10000L)
      }
      val expected = log.groupBy(_._1).map { case (k, evs) =>
        val w = evs.maxBy(e => (e._4, e._5)) // LWW: (ts, event_id)
        k -> ((w._2, w._3, w._4, w._5))
      }
      // split round-robin into two writers x 4 batches each; batches are
      // key-sorted single partitions so intra-transaction lock order is
      // aligned (production discipline; deadlock-retry is the backstop)
      def batches(sel: Int): Seq[org.apache.spark.sql.DataFrame] =
        log.zipWithIndex.collect { case (e, i) if i % 2 == sel => e }
          .grouped(40).map(g => df(g.sortBy(_._1): _*).repartition(1)
            .sortWithinPartitions("user_id")).toSeq
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fs = Seq(0, 1).map { w =>
          pool.submit(new Runnable {
            def run(): Unit = batches(w).foreach(b =>
              JdbcLwwExecutor.writeBatch(b, t, sleep = _ => ()))
          })
        }
        fs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      assert(rows(t) == expected,
        s"round $round: concurrent writers must converge to the LWW fold")
      // and a replay of EVERYTHING by one writer changes nothing (one
      // sorted partition: a multi-partition replay of a NON-compacted
      // log would race itself on duplicate keys — the pipeline's
      // one-row-per-key compaction contract, see writeBatch scaladoc)
      JdbcLwwExecutor.writeBatch(
        df(log.sortBy(_._1): _*).repartition(1)
          .sortWithinPartitions("user_id"), t, sleep = _ => ())
      assert(rows(t) == expected, s"round $round: replay must be a no-op")
    }
  }

  test("retry recovers a transiently failing write; breaker opens on persistent failure") {
    val t = freshTarget("lww_retry")
    // Transient failure: first attempt targets a missing table, then heals.
    var attempts = 0
    Retry.withRetry(Retry.Policy(maxAttempts = 3), sleep = _ => ()) {
      attempts += 1
      val target = if (attempts == 1) t.copy(table = "no_such_table") else t
      JdbcLwwExecutor.writeBatch(df((1L, "signup", 100L, 1000L, 10L)), target,
        policy = Retry.Policy(maxAttempts = 1), sleep = _ => ())
    }
    assert(attempts == 2 && rows(t).contains(1L))
    // Persistent failure: breaker opens after threshold, then fails fast.
    val breaker = new CircuitBreaker(failureThreshold = 2, openMs = 60000)
    val bad = t.copy(table = "still_missing")
    (1 to 2).foreach { _ =>
      intercept[Throwable] {
        JdbcLwwExecutor.writeBatch(df((1L, "x", 0L, 1L, 1L)), bad,
          policy = Retry.Policy(maxAttempts = 1), breaker = breaker, sleep = _ => ())
      }
    }
    val fast = intercept[IllegalStateException] {
      JdbcLwwExecutor.writeBatch(df((1L, "x", 0L, 1L, 1L)), bad,
        policy = Retry.Policy(maxAttempts = 1), breaker = breaker, sleep = _ => ())
    }
    assert(fast.getMessage.contains("OPEN"))
  }

  test("generated Postgres upsert SQL keeps the reference's verbatim conflict clause") {
    val sql = JdbcUpsertSql.upsertSql("cdc_users", cols, Seq("user_id"))
    assert(sql.contains("ON CONFLICT (user_id) DO UPDATE"))
    assert(sql.contains("EXCLUDED._cdc_timestamp_micros > cdc_users._cdc_timestamp_micros"))
    assert(sql.contains("EXCLUDED._last_event_id > cdc_users._last_event_id"))
  }
}
