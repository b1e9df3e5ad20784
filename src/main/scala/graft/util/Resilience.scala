package graft.util

/** Sink-local resilience utilities (reference `src/utils/retry.py:15-50`
  * exp backoff 1→60 s capped, and `src/utils/circuit_breaker.py:27-111`
  * CLOSED→OPEN after N consecutive failures→HALF_OPEN after a cool-down).
  * Driver-side objects consulted inside `foreachBatch` around the JDBC
  * transaction (SURVEY.md ST7/ST8); Spark task retry covers executor-side
  * failures.
  */
object Retry {

  final case class Policy(
      maxAttempts: Int = 5,
      initialDelayMs: Long = 1000,
      maxDelayMs: Long = 60000,
      multiplier: Double = 2.0,
      totalCapMs: Long = 300000)

  def delays(p: Policy): Seq[Long] = {
    val raw = Iterator.iterate(p.initialDelayMs)(d =>
      math.min((d * p.multiplier).toLong, p.maxDelayMs))
      .take(p.maxAttempts - 1).toSeq
    // truncate so cumulative wait respects the 5-min cap (retry.py total cap)
    raw.scanLeft(0L)(_ + _).tail.zip(raw)
      .takeWhile { case (cum, _) => cum <= p.totalCapMs }.map(_._2)
  }

  def withRetry[T](p: Policy = Policy(), sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    val ds = delays(p)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= ds.length) {
      try return f
      catch {
        // NonFatal only: retrying an OutOfMemoryError sleeps minutes on a
        // dead JVM, and retrying InterruptedException makes query
        // cancellation hang through the remaining backoff schedule —
        // fatal errors and interrupts propagate immediately
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          if (attempt < ds.length) sleep(ds(attempt))
          attempt += 1
      }
    }
    throw lastErr
  }
}

/** CLOSED → OPEN after `failureThreshold` consecutive failures; OPEN fails
  * fast; HALF_OPEN after `openMs` lets one probe through (success closes,
  * failure re-opens). Thread-safe enough for the single foreachBatch
  * writer it guards.
  */
final class CircuitBreaker(
    failureThreshold: Int = 5, openMs: Long = 60000,
    clock: () => Long = () => System.currentTimeMillis()) {

  sealed trait State
  case object Closed extends State
  case object Open extends State
  case object HalfOpen extends State

  private var failures = 0
  private var openedAt = 0L

  def state: State = this.synchronized {
    if (failures >= failureThreshold)
      if (clock() - openedAt >= openMs) HalfOpen else Open
    else Closed
  }

  def call[T](f: => T): T = this.synchronized {
    state match {
      case Open => throw new IllegalStateException("circuit breaker is OPEN")
      case _ =>
        try {
          val r = f
          failures = 0
          r
        } catch {
          case e: Throwable =>
            failures += 1
            if (failures >= failureThreshold) openedAt = clock()
            throw e
        }
    }
  }
}
