package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The in-JVM migration guard (advice r16 medium): while a rebucket is
  * live, crash-recovery triggered from a concurrent read()/exists() must
  * be a NO-OP — otherwise it mistakes the swap-window residue for a
  * crash and rolls the in-flight bucket back out from under the
  * migrator (whose next Files.move then hits missing/occupied targets).
  * This spec drives the guard directly (same package for the
  * private[sink] seam) with hand-built swap-window residue.
  */
class MigrationGuardSpec extends SparkSpecBase {
  import spark.implicits._

  private def store(dir: String, buckets: Int) =
    new BucketedParquetStateStore(spark, dir, "user_id", "ts_us", "event_id", buckets)

  private def df(rows: (Long, Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "ts_us", "event_id", "payload")

  test("recoverIfInterrupted is a no-op while a migration is live in " +
    "this JVM; the same residue heals once the guard is released") {
    val dir = tmpDir("bstate_guard") + "/state"
    val s4 = store(dir, buckets = 4)
    s4.upsert(df((1L to 200L).map(i => (i, 100L, i, s"v$i")): _*))
    val before = s4.read().as[(Long, Long, Long, String)].collect().toSet

    // hand-build migrateBucket(0)'s swap-window residue: the live dir
    // moved out to .old, a partial split dir moved in, cursor in flight
    val path = Paths.get(dir)
    Files.writeString(Paths.get(dir, "_graft_rebucket"), "16 4 0")
    Files.move(Paths.get(dir, "_bucket=0"), Paths.get(dir + ".rebucket.b0.old"))
    Files.createDirectories(Paths.get(dir, "_bucket=4"))
    Files.writeString(Paths.get(dir, "_bucket=4", "part-partial.parquet"), "x")

    BucketedParquetStateStore.withMigrationGuard(path) {
      assert(BucketedParquetStateStore.isMigrating(path))
      // a concurrent reader probing the store mid-migration: recovery
      // must NOT touch the migrator's residue
      assert(store(dir, buckets = 4).exists)
      assert(Files.exists(Paths.get(dir + ".rebucket.b0.old")),
        "guarded recovery must not roll the in-flight bucket back")
      assert(Files.exists(Paths.get(dir, "_bucket=4")),
        "guarded recovery must not delete the migrator's moved-in dirs")
    }
    assert(!BucketedParquetStateStore.isMigrating(path),
      "the guard must release on exit")

    // guard released (the simulated migrator "crashed"): the next access
    // heals the residue by the bucket-scoped rollback, losing nothing
    val s = store(dir, buckets = 4)
    assert(s.read().as[(Long, Long, Long, String)].collect().toSet == before)
    assert(!Files.exists(Paths.get(dir + ".rebucket.b0.old")))
    assert(!Files.exists(Paths.get(dir, "_bucket=4")))
    val s16 = s.resumeRebucket()
    assert(s16.read().as[(Long, Long, Long, String)].collect().toSet == before)
  }

  test("overlapping migrations from two threads: the first migrator's " +
    "exit must not release the mark while the second is still live " +
    "(advice r17: per-path refcount, not a boolean)") {
    val path = Paths.get(tmpDir("bstate_guard_overlap"))
    val bEntered = new java.util.concurrent.CountDownLatch(1)
    val aMayExit = new java.util.concurrent.CountDownLatch(1)
    val bMayExit = new java.util.concurrent.CountDownLatch(1)
    @volatile var markAfterAExit = false
    val a = new Thread(() =>
      BucketedParquetStateStore.withMigrationGuard(path) {
        bEntered.await(); aMayExit.await()
      })
    val b = new Thread(() =>
      BucketedParquetStateStore.withMigrationGuard(path) {
        bEntered.countDown(); bMayExit.await()
      })
    a.start(); b.start()
    bEntered.await()          // both frames live
    aMayExit.countDown(); a.join(10000)
    markAfterAExit = BucketedParquetStateStore.isMigrating(path)
    bMayExit.countDown(); b.join(10000)
    assert(markAfterAExit,
      "A's exit released the mark while B's migration was still live")
    assert(!BucketedParquetStateStore.isMigrating(path),
      "the last live frame's exit must release the mark")
  }

  test("withMigrationGuard is re-entrant: the outer frame owns the mark") {
    val path = Paths.get(tmpDir("bstate_guard_reent"))
    BucketedParquetStateStore.withMigrationGuard(path) {
      BucketedParquetStateStore.withMigrationGuard(path) {
        assert(BucketedParquetStateStore.isMigrating(path))
      }
      assert(BucketedParquetStateStore.isMigrating(path),
        "the inner frame must not strip the outer frame's mark")
    }
    assert(!BucketedParquetStateStore.isMigrating(path))
  }
}
