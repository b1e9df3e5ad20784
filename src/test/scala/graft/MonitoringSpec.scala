package graft

import org.apache.spark.sql.functions._

import graft.streaming.{Monitoring, ReplicationJob}
import graft.streaming.ReplicationJob.Config

/** Heartbeat listener (ST11) over a real streaming query + alert
  * evaluation (ST13).
  */
class MonitoringSpec extends SparkSpecBase {
  import spark.implicits._

  test("heartbeat listener reports batch progress for the replication stream") {
    val base = tmpDir("mon")
    val src = s"$base/src"
    new java.io.File(src).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val cfg = Config(src, s"$base/target", s"$base/dlq", s"$base/ckpt")
    val handle = Monitoring.attach(spark)
    try {
      ReplicationJob.start(spark, cfg).awaitTermination(120000)
      // listener events are delivered async; poll briefly
      var beats = handle.drain()
      val deadline = System.currentTimeMillis() + 10000
      while (beats.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); beats = handle.drain()
      }
      assert(beats.nonEmpty, "no heartbeats collected")
      // AvailableNow can emit several progress events for one drain;
      // the contract is: rows are reported and at least the full input shows up.
      assert(beats.map(_.numInputRows).sum >= 1000L) // sf0.001 events
      assert(beats.exists(_.numInputRows > 0))
      assert(beats.forall(_.batchDurationMs > 0))
    } finally Monitoring.detach(spark, handle)
  }

  test("alert evaluation fires at reference thresholds") {
    val jobs = Seq((1L, 0.4), (2L, 2.0), (3L, 7.5))
      .toDF("job_id", "drift_percentage")
    val alerts = Monitoring.evaluateAlerts(jobs)
      .select("job_id", "severity").as[(Long, String)].collect().toMap
    assert(alerts == Map(2L -> "warning", 3L -> "critical"))
  }
}
