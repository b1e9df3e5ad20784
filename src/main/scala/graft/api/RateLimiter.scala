package graft.api

import scala.collection.mutable

/** Per-client token-bucket rate limiter for the ops API (reference
  * `src/middleware/rate_limit.py`: slowapi keyed on remote address with
  * in-memory storage; this is the same shape with a refilling bucket —
  * the moving-window strategy the reference names as the accurate one).
  *
  * Injectable clock for deterministic tests. Driver-side control-plane
  * state: the API serves one driver process, so a mutable map under a
  * lock is the right scale (no Spark jobs involved).
  */
final class RateLimiter(
    ratePerSec: Double,
    burst: Int,
    nowNs: () => Long = () => System.nanoTime(),
    /** Entries idle long enough to have fully refilled are dropped when
      * the map exceeds this size — bounds memory under client churn.
      */
    maxClients: Int = 10000) {

  private final class Bucket(var tokens: Double, var lastNs: Long)
  private val buckets = mutable.HashMap.empty[String, Bucket]

  /** Acquire one token for `key`: Right(()) = admitted; Left(seconds) =
    * throttled, retry after that many whole seconds (the Retry-After
    * header value, ceiling so clients never retry early).
    */
  def tryAcquire(key: String): Either[Long, Unit] = synchronized {
    val t = nowNs()
    val b = buckets.getOrElseUpdate(key, new Bucket(burst.toDouble, t))
    b.tokens = math.min(burst.toDouble, b.tokens + (t - b.lastNs) / 1e9 * ratePerSec)
    b.lastNs = t
    if (b.tokens >= 1.0) { b.tokens -= 1.0; evictIdleIfOverflowing(t); Right(()) }
    else Left(math.ceil((1.0 - b.tokens) / ratePerSec).toLong.max(1L))
  }

  private def evictIdleIfOverflowing(t: Long): Unit =
    if (buckets.size > maxClients) {
      val refillNs = (burst / ratePerSec * 1e9).toLong
      buckets.filterInPlace((_, b) => t - b.lastNs < refillNs)
      if (buckets.size > maxClients) {
        // Active churn kept everything within its refill window: drop the
        // least-recently-seen overflow so the map stays bounded and the
        // next admit doesn't rescan. An evicted-but-active client refills
        // to a full burst on return — bounded over-admission, the safe
        // failure direction for an ops API under address churn.
        val overflow = buckets.size - maxClients
        buckets.toSeq.sortBy(_._2.lastNs).take(overflow)
          .foreach { case (k, _) => buckets.remove(k) }
      }
      ()
    }
}
