package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.ops.Lww

/** Top-level so Spark can derive an Encoder (inner-class case classes
  * can't be encoded).
  */
case class Ev(user_id: Long, event_id: Long, ts_us: Long, payload: String)

/** LWW invariants — the property behind the reference's
  * test_out_of_order_events.py: final state depends only on the event SET,
  * never on arrival order (commutative/idempotent fold on
  * (timestamp, event_id)). Property-style over seeded random event logs.
  */
class LwwSpec extends SparkSpecBase {
  import spark.implicits._

  private def fold(evs: Seq[Ev]): Map[Long, Ev] =
    evs.groupBy(_.user_id).map { case (k, g) =>
      k -> g.maxBy(e => (e.ts_us, e.event_id))
    }

  private def sparkLww(evs: Seq[Ev]): Map[Long, Ev] =
    Lww.latestPerKey(evs.toDF(), Seq("user_id"), Seq(col("ts_us"), col("event_id")))
      .as[Ev].collect().map(e => e.user_id -> e).toMap

  private def randomEvents(rnd: Random, n: Int): Seq[Ev] =
    Seq.fill(n)(Ev(
      rnd.nextInt(5).toLong,
      rnd.nextInt(1000).toLong,
      rnd.nextInt(20).toLong, // small range → frequent ts ties exercise tie-break
      rnd.alphanumeric.take(5).mkString))

  test("permutation invariance: shuffled arrival gives identical state") {
    val rnd = new Random(42)
    (1 to 8).foreach { _ =>
      val evs = randomEvents(rnd, 40)
      val expected = fold(evs)
      assert(sparkLww(evs) == expected)
      assert(sparkLww(rnd.shuffle(evs)) == expected)
    }
  }

  test("idempotence: replaying the same events changes nothing") {
    val rnd = new Random(7)
    (1 to 4).foreach { _ =>
      val evs = randomEvents(rnd, 30)
      assert(sparkLww(evs ++ evs) == fold(evs))
    }
  }

  test("timestamp tie broken by greater event_id") {
    val evs = Seq(Ev(1, 5, 100, "a"), Ev(1, 9, 100, "b"), Ev(1, 7, 100, "c"))
    assert(sparkLww(evs)(1L).event_id == 9)
  }

  test("salted two-phase LWW is bit-identical to the single-phase fold") {
    val rnd = new Random(7)
    // heavy skew: ~80% of events on one key — the salted plan's use case
    val evs = Seq.fill(400)(Ev(
      if (rnd.nextInt(5) > 0) 1L else rnd.nextInt(50).toLong,
      rnd.nextInt(1000).toLong, rnd.nextInt(20).toLong,
      rnd.alphanumeric.take(5).mkString))
    val expected = fold(evs)
    val salted = Lww.latestPerKeySalted(
        evs.toDF().repartition(16), Seq("user_id"),
        Seq(col("ts_us"), col("event_id")), saltBuckets = 8)
      .as[Ev].collect().map(e => e.user_id -> e).toMap
    assert(salted == expected)
  }

  test("resolveAgainstTarget accepts only strictly-newer or tie-higher-id") {
    val incoming = Seq(
      Ev(1, 10, 200, "newer"),   // newer ts → accept
      Ev(2, 10, 100, "older"),   // older ts → reject
      Ev(3, 99, 150, "tie-hi"),  // equal ts, higher id → accept
      Ev(4, 1, 150, "tie-lo"),   // equal ts, lower id → reject
      Ev(5, 1, 10, "new-key")    // no existing row → accept
    ).toDF()
    val target = Seq(
      Ev(1, 1, 150, "t"), Ev(2, 1, 150, "t"), Ev(3, 50, 150, "t"), Ev(4, 50, 150, "t")
    ).toDF()
    val res = Lww.resolveAgainstTarget(incoming, target, "user_id", "ts_us", "event_id")
      .select($"user_id", $"_conflict_resolution.was_accepted", $"_conflict_resolution.had_conflict")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(res(1L) == (true, true))
    assert(res(2L) == (false, true))
    assert(res(3L) == (true, true))
    assert(res(4L) == (false, true))
    assert(res(5L) == (true, false))
  }

  test("resolveAgainstTarget: stored rows with NULL position components lose") {
    // mirror of the parquet fold / JDBC IS NULL arms: a stored row
    // missing ts — or missing only the tie at an equal ts — loses to a
    // positioned incoming row; was_accepted is never NULL
    val incoming = Seq((1L, 100L, 5L, "a"), (2L, 100L, 5L, "b"))
      .toDF("user_id", "ts_us", "event_id", "v")
    val target = Seq(
      (java.lang.Long.valueOf(1L), null: java.lang.Long, null: java.lang.Long, "t"),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(100L), null: java.lang.Long, "t"))
      .toDF("user_id", "ts_us", "event_id", "v")
    val res = Lww.resolveAgainstTarget(incoming, target, "user_id", "ts_us", "event_id")
      .select($"user_id", $"_conflict_resolution.was_accepted")
      .as[(Long, Boolean)].collect().toMap
    assert(res == Map(1L -> true, 2L -> true), s"got $res")
  }
}
