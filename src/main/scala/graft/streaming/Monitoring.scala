package graft.streaming


import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import graft.recon.Reconciler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline monitoring: the heartbeat / throughput / lag surface
  * (reference ST11 heartbeat topics `cassandra-source.json:52-53`, the
  * Prometheus metrics endpoint, and ST13 alerting thresholds).
  *
  * Spark-first shape: a `StreamingQueryListener` collecting per-batch
  * progress (rows/s, batch duration, watermark) — the exact signal the
  * reference publishes as heartbeats — plus an alert evaluator over
  * reconciliation jobs.
  */
object Monitoring {

  final case class Heartbeat(
      queryId: String, batchId: Long, timestamp: String,
      numInputRows: Long, inputRowsPerSecond: Double,
      processedRowsPerSecond: Double, batchDurationMs: Long)

  /** Heartbeats retained when the consumer stops draining: drop-OLDEST
    * beyond this, so a dead scraper against a 1 s trigger caps at hours
    * of history instead of growing the driver heap forever.
    */
  val MaxBufferedBeats = 4096

  /** Attach a progress listener; returns a handle holding collected
    * heartbeats (bounded queue, drop-oldest: callers drain).
    */
  final class Handle private[Monitoring] (val listener: StreamingQueryListener) {
    private[Monitoring] val beats =
      new java.util.concurrent.LinkedBlockingQueue[Heartbeat](MaxBufferedBeats)
    def drain(): Seq[Heartbeat] = {
      val out = Seq.newBuilder[Heartbeat]
      var b = beats.poll()
      while (b != null) { out += b; b = beats.poll() }
      out.result()
    }
  }

  def attach(spark: SparkSession): Handle = {
    lazy val handle: Handle = new Handle(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val hb = Heartbeat(
          p.id.toString, p.batchId, p.timestamp,
          p.numInputRows,
          Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
          Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
          p.batchDuration)
        // drop-oldest on a full buffer: the newest beat is the one a
        // resumed consumer wants
        while (!handle.beats.offer(hb)) handle.beats.poll()
      }
    })
    spark.streams.addListener(handle.listener)
    handle
  }

  def detach(spark: SparkSession, h: Handle): Unit =
    spark.streams.removeListener(h.listener)

  /** Evaluate reconciliation jobs against the reference alert thresholds
    * (drift ≥1% warning / ≥5% critical) → alert rows (ST13,
    * `alert_service.py:41-94`).
    */
  def evaluateAlerts(jobs: DataFrame): DataFrame =
    jobs.withColumn("severity", Reconciler.alertSeverity(col("drift_percentage")))
      .filter(col("severity").isNotNull)
      .withColumn("alert_fired", lit(true))
}
