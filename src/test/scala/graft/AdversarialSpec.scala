package graft

import org.apache.spark.sql.functions._

import graft.llm.{Adversarial, Dedup}
import graft.ops.Lww

/** The adversarial-corpus derivations and the cap/salt behavior they
  * exist to exercise (round-17 verdict #5). The oracled gates prove
  * exact parity at fixture scale; this spec pins the hand-checkable
  * mechanics on tiny inputs.
  */
class AdversarialSpec extends SparkSpecBase {
  import spark.implicits._

  test("adversarial documents: 80% boilerplate with doc-unique suffixes, " +
    "pairwise-distinct, deterministic") {
    val docs = (0L to 19L).map(i => (i, s"original text of doc $i"))
      .toDF("doc_id", "text")
    val adv = Adversarial.documents(docs)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val bp = adv.filter { case (id, t) =>
      id % 10 < 8 && t.startsWith(Adversarial.Boilerplate) }
    assert(bp.size == 16, "8 of every 10 docs must be boilerplate")
    assert(adv(18L) == "original text of doc 18" && adv(19L) == "original text of doc 19",
      "the benign tail must pass through unchanged")
    // ids ≡ 8,9 (mod 100): the deterministic organic near-dup pair
    assert(adv(8L) == (1 to 10).map(j => s"g8_$j").mkString(" "))
    assert(adv(9L) == (1 to 9).map(j => s"g8_$j").mkString(" ") + " x9")
    assert(adv.values.toSet.size == 20, "suffix tokens keep all docs distinct")
    assert(adv(0L).endsWith(" u0_0 u0_1 u0_2 u0_3 u0_4"))
    val again = Adversarial.documents(docs)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(again == adv, "derivation must be deterministic")
  }

  test("capped jaccard under boilerplate: no pair between boilerplate " +
    "docs; the deterministic organic near-dup pair still surfaces") {
    // 8 boilerplate docs + the id≡8,9 (mod 100) organic pair: the cap
    // (5 < 8 bp docs) must drop every template shingle, while the pair's
    // pair-unique g-tokens (doc-freq 2) survive and meet the threshold
    // (J = 7/9 ≥ 0.7)
    val docs = ((0L to 7L).map(i => (i * 10, "x")) ++ // ids 0,10,..,70 → bp
      Seq((8L, "ignored"), (9L, "ignored")))          // ids 8,9 → organic pair
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(Adversarial.documents(docs),
      "doc_id", "text", n = 3, thresholdNum = 7, thresholdDen = 10,
      maxShingleDocFreq = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((8L, 9L)),
      s"cap must drop all template shingles (8 bp docs > cap 5) and keep " +
        s"the organic pair: $pairs")
  }

  test("salted LWW fold on Zipf-hot keys is bit-identical to the plain fold") {
    val ev = (0L until 2000L).map { i =>
      // event_id i, ts descending-ish with ties, payload value
      (i, (i * 37) % 500, i % 40, s"t${i % 5}", (i % 97).toDouble)
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val adv = Adversarial.events(ev)
    val hot = adv.groupBy("user_id").count()
      .filter(col("user_id") < 3).agg(sum("count")).head().getLong(0)
    assert(hot >= 1500, s"the three hot keys must own ~80% of the log: $hot")
    val keys = Seq("user_id")
    val ord = Seq(col("ts_us"), col("event_id"))
    val plain = Lww.latestPerKey(adv, keys, ord).collect().toSet
    val salted = Lww.latestPerKeySalted(adv, keys, ord).collect().toSet
    assert(plain == salted, "salting must not change the fold result")
  }
}
