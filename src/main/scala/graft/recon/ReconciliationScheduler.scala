package graft.recon

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Scheduled reconciliation (ST12) — the reference's persistent, pausable
  * per-table scheduler (`src/services/reconciliation_scheduler.py:25-255`,
  * jobstore `_apscheduler_jobs` in `init-db.sql:137-143`): interval jobs
  * per table, persisted across restarts, pause/resume, and manual
  * trigger. The runner is injected (it launches the batch reconciliation
  * DataFrame jobs — `Reconciler.rowCountValidation` etc. with
  * `Trigger.AvailableNow` semantics); the clock is injected for
  * deterministic tests.
  *
  * `tick()` is the scheduling quantum: call it from any driver-side timer
  * (a daemon thread here, cron/Airflow in production — SURVEY.md ST12
  * maps the scheduler to external orchestration plus these batch jobs).
  */
final class ReconciliationScheduler(
    storePath: String,
    runJob: String => Unit,
    clock: () => Long = () => System.currentTimeMillis()) {

  final case class Job(table: String, intervalMs: Long, nextRunMs: Long, paused: Boolean)

  private def load(): Seq[Job] = {
    val p = Paths.get(storePath)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val Array(t, i, n, pz) = l.split("\t", 4)
      Job(t, i.toLong, n.toLong, pz.toBoolean)
    }
  }

  private def save(jobs: Seq[Job]): Unit = {
    // tmp + atomic move: an in-place write killed mid-flight leaves a
    // truncated line that makes every later load() throw — permanently
    // bricking the scheduler behind the daemon's retry loop
    val p = Paths.get(storePath)
    val tmp = Paths.get(storePath + ".tmp")
    Files.writeString(tmp,
      jobs.map(j => s"${j.table}\t${j.intervalMs}\t${j.nextRunMs}\t${j.paused}")
        .mkString("", "\n", "\n"))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def jobs(): Seq[Job] = this.synchronized(load())

  /** Register (or replace) a per-table interval job; first run one
    * interval from now (reference default: hourly per table). All
    * jobstore mutations synchronize on this instance: the API handler
    * thread and the tick daemon share it, and an unguarded
    * load-modify-save would lose a pause issued mid-tick.
    */
  def schedule(table: String, intervalMs: Long): Unit = this.synchronized {
    // loud guards (the codebase's own pattern): a tab/newline in the name
    // corrupts every later load() of the TSV store, and intervalMs = 0
    // divides by zero in tick's catch-up math AFTER the jobs already ran
    require(table.nonEmpty && !table.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"invalid table name for jobstore: ${table.take(64)}")
    require(intervalMs > 0, s"intervalMs must be positive, got $intervalMs")
    save(load().filterNot(_.table == table) :+
      Job(table, intervalMs, clock() + intervalMs, paused = false))
  }

  def pause(table: String): Unit = this.synchronized {
    save(load().map(j => if (j.table == table) j.copy(paused = true) else j))
  }

  /** Resume with the next run one interval out (reference resume
    * semantics — no catch-up burst for the paused window).
    */
  def resume(table: String): Unit = this.synchronized {
    save(load().map(j =>
      if (j.table == table) j.copy(paused = false, nextRunMs = clock() + j.intervalMs) else j))
  }

  /** Run every due, unpaused job; advance each past `now` in whole
    * intervals (a long outage yields ONE catch-up run, not a burst).
    * Returns the tables run. A job that throws is NOT advanced — it stays
    * due and retries next tick (and doesn't block the other due jobs).
    *
    * The jobs run OUTSIDE the lock: a reconciliation pass can take
    * minutes, and holding the lock for its duration would freeze the API
    * surface (pause/resume/jobs) behind it. The post-run save re-reads
    * the store and advances `nextRunMs` only for jobs whose row was not
    * mutated mid-run, so a concurrent pause/schedule/resume always wins.
    */
  def tick(): Seq[String] = {
    val now = clock()
    val due = this.synchronized {
      load().filter(j => !j.paused && j.nextRunMs <= now)
    }
    val ok = due.filter { j =>
      try { runJob(j.table); true }
      catch { case scala.util.control.NonFatal(_) => false }
    }
    this.synchronized {
      save(load().map { j =>
        ok.find(_.table == j.table) match {
          case Some(d) if d.nextRunMs == j.nextRunMs && !j.paused =>
            val missed = (now - j.nextRunMs) / j.intervalMs + 1
            j.copy(nextRunMs = j.nextRunMs + missed * j.intervalMs)
          case _ => j // mutated mid-run (or failed): leave untouched
        }
      })
    }
    ok.map(_.table)
  }

  /** Manual trigger (`reconciliation_scheduler.py:122-140` /
    * `POST /reconciliation/trigger`): runs immediately, schedule
    * untouched.
    */
  def manualTrigger(table: String): Unit = runJob(table)

  /** Daemon-thread driver for `tick()` (local deployments). The loop
    * survives ANY job/store failure — a transient target outage must not
    * silently kill scheduled reconciliation forever.
    */
  def startDaemon(periodMs: Long): Thread = {
    val t = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        try tick() catch {
          case _: InterruptedException => Thread.currentThread().interrupt()
          case scala.util.control.NonFatal(_) => () // next tick retries
        }
        try Thread.sleep(periodMs)
        catch { case _: InterruptedException => Thread.currentThread().interrupt() }
      }
    }, "reconciliation-scheduler")
    t.setDaemon(true)
    t.start()
    t
  }
}
