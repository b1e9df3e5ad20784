package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic ADVERSARIAL corpus derivations (round-17 verdict #5):
  * every audit family had only ever seen the benign fixture
  * distribution, while the hot-key caps and salting exist precisely for
  * the regimes a crawl corpus actually produces — boilerplate-dominated
  * text (the reference's pk-hash skew concern,
  * `specs/001-cass-cdc-pg/contracts/kafka-topics.md:63-66`, transposed
  * to content keys) and Zipf-hot entity keys. These derivations are
  * pure column expressions over the driver fixtures, reproduced
  * verbatim in the DuckDB oracles, so the adversarial gates are
  * oracle-checked at every SF and seed like any other gate, and the
  * adversarial queries ride the heavy-list audits (scale width, task
  * balance, shuffle bytes) unchanged.
  *
  * Scale intent: the POINT of these shapes is that the engine's caps
  * engage. 80% boilerplate makes every template shingle appear in 0.8·N
  * docs — an uncapped shingle join is quadratic (0.8N choose 2 pairs);
  * with `maxShingleDocFreq` the hot shingles are dropped before the
  * join and volume stays linear. 80% of events on three keys makes an
  * unsalted per-key agg serialize 0.27·N rows per hot key into single
  * reducers; the salted two-phase fold spreads them.
  */
object Adversarial {

  /** Fixed boilerplate template (39 words from the fixture vocabulary —
    * in-distribution tokens, so capped and uncapped shingles coexist).
    */
  val Boilerplate: String =
    "the big data table scan filter join merge sort group agg window " +
      "stream batch query row column value vector hash key part line dup " +
      "fast slow small customer order spark the query join scan merge sort " +
      "hash group row"

  /** 80% of docs (doc_id % 10 < 8) replaced by the shared template plus
    * five doc-unique suffix tokens (`u<doc_id>_0 .. _4`): maximal
    * cross-doc shingle overlap, yet no two docs identical — the
    * boilerplate regime exact dedup cannot touch and near-dup machinery
    * must survive. Within the benign 20%, ids ≡ 8,9 (mod 100) form
    * DETERMINISTIC organic near-dup pairs from pair-unique tokens
    * (`g<k>_1..g<k>_10` vs the same with the last token replaced —
    * Jaccard 7/9 at n=3, shingle doc-freq 2 so no cap can drop them):
    * the capped-dedup gate must both REFUSE the quadratic boilerplate
    * pairs and still FIND these at every SF — an empty result would
    * prove only half the claim. SQL twin:
    * [[graft.queries.AdversarialQueries.advDocsCte]].
    */
  def documents(docs: DataFrame): DataFrame = {
    def gTokens(base: org.apache.spark.sql.Column, n: Int) =
      concat((1 to n).flatMap(j =>
        Seq(lit(if (j == 1) "g" else " g"), base, lit(s"_$j"))): _*)
    docs.withColumn("text",
      when(col("doc_id") % 100 === 8, gTokens(col("doc_id"), 10))
        .when(col("doc_id") % 100 === 9,
          concat(gTokens(col("doc_id") - 1, 9), lit(" x"), col("doc_id")))
        .when(col("doc_id") % 10 < 8,
          concat(lit(Boilerplate),
            lit(" u"), col("doc_id"), lit("_0 u"), col("doc_id"), lit("_1 u"),
            col("doc_id"), lit("_2 u"), col("doc_id"), lit("_3 u"),
            col("doc_id"), lit("_4")))
        .otherwise(col("text")))
  }

  /** Zipf-hot key regime: 80% of events (event_id % 10 < 8) re-keyed
    * onto three hot users (`user_id % 3`), the rest keep their key —
    * ~27% of the whole log lands on each hot key.
    */
  def events(ev: DataFrame): DataFrame =
    ev.withColumn("user_id",
      when(col("event_id") % 10 < 8, pmod(col("user_id"), lit(3L)))
        .otherwise(col("user_id")))
}
