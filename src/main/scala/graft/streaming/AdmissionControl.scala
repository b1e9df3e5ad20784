package graft.streaming

import scala.collection.concurrent.TrieMap

import graft.util.CircuitBreaker

/** Dynamic sink-lag backpressure (reference FR-024,
  * `specs/001-cass-cdc-pg/spec.md:182`: consumption PAUSES while the
  * sink is degraded, instead of piling ever-larger batches onto it).
  *
  * The feedback path is driver-local by construction: micro-batch
  * admission planning (`latestOffset`) and the `foreachBatch` sink both
  * execute on the driver, so a process-wide channel registry is correct
  * on a real cluster, not just in local mode. A CHANNEL ties one sink's
  * health to one source's admission; multi-table jobs get one channel
  * per table, so a degraded orders target never throttles the users
  * stream.
  *
  * Admission policy, consulted by the source at every trigger:
  *  - breaker OPEN      → admit 0 rows (pause; the sink is failing —
  *    feeding it more rows only burns retries);
  *  - breaker HALF_OPEN → admit `probeRows` (one small batch probes
  *    recovery, mirroring the breaker's own half-open single-call rule);
  *  - otherwise scale by latency: a last batch that took `t` seconds
  *    against a `target` admits `maxRows · target/t` (floored at
  *    `probeRows`) — batch size tracks what the sink can actually absorb
  *    per trigger, the reference's "pause consumption when the sink
  *    lags" generalized to proportional slowdown.
  */
object AdmissionControl {

  /** One sink's health feed. `targetBatchSeconds` defaults to the
    * reference's P95 end-to-end bound (≤2 s, `spec.md` SC-002).
    */
  final case class SinkHealth(
      breaker: Option[CircuitBreaker] = None,
      targetBatchSeconds: Double = 2.0,
      probeRows: Long = 64L,
      lastBatchSeconds: Double = 0.0)

  private val channels = TrieMap.empty[String, SinkHealth]

  def register(channel: String, health: SinkHealth = SinkHealth()): Unit =
    channels.update(channel, health)

  /** The sink side's per-batch report (wall seconds of the last batch). */
  def reportLatency(channel: String, seconds: Double): Unit =
    channels.updateWith(channel)(_.map(_.copy(lastBatchSeconds = seconds)))

  def breakerOf(channel: String): Option[CircuitBreaker] =
    channels.get(channel).flatMap(_.breaker)

  def clear(channel: String): Unit = channels.remove(channel)

  /** Rows to admit this trigger, given the source's configured cap.
    * Unregistered channels admit the full cap (backpressure is opt-in).
    */
  def admit(channel: String, maxRows: Long): Long =
    channels.get(channel) match {
      case None => maxRows
      case Some(h) =>
        val breakerState = h.breaker.map(b => b.state match {
          case b.Open => 0L
          case b.HalfOpen => math.min(h.probeRows, maxRows)
          case b.Closed => maxRows
        })
        breakerState match {
          case Some(capped) if capped < maxRows => capped
          case _ =>
            if (h.lastBatchSeconds <= h.targetBatchSeconds) maxRows
            else math.max(math.min(h.probeRows, maxRows),
              (maxRows * h.targetBatchSeconds / h.lastBatchSeconds).toLong)
        }
    }
}
