package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Curation, Sampling}

/** The composed curation pipeline and the per-source health report. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  // s1 exercises every drop rule; s2 is 20 clean docs over token budget
  private def fixture = {
    val s1 = Seq(
      (1L, "s1", "red green blue yellow purple"),   // keep
      (2L, "s1", "red green blue yellow purple"),   // exact dup of 1 → drop
      (3L, "s1", "hi there"),                       // too short → drop
      (4L, "s1", "alpha beta gamma extra words here"), // contaminated → drop
      (5L, "s1", "one two three four five six"))    // keep
    val s2 = (10L until 30L).map(i => (i, "s2", s"w$i x$i y$i z$i"))
    (s1 ++ s2).toDF("doc_id", "source", "text")
  }
  private val evalSet = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")

  test("curate: quality → dedup → decontam → per-source budget, in order") {
    val out = Curation.curate(fixture, evalSet, "doc_id", "text", "source",
      minTokens = 3, maxTokens = 50, minUniqPermille = 100,
      maxTopTokPermille = 900, decontamN = 3, minHitPermille = 100,
      tokenBudgetPerSource = 40L)
    val ids = out.select("doc_id").as[Long].collect().toSet

    // s1: doc 1 + 5 survive every stage; 11 tokens < 40 budget → rate 1000
    assert(ids.intersect(Set(1L, 2L, 3L, 4L, 5L)) === Set(1L, 5L))
    // s2: 80 clean tokens vs budget 40 → rate 500‰; selection must equal
    // the content-hash rule computed independently
    val expectS2 = spark.range(10, 30)
      .filter(Sampling.hashPermille(col("id")) < 500)
      .as[Long].collect().toSet
    assert(ids.filter(_ >= 10L) === expectS2)
    assert(expectS2.nonEmpty && expectS2.size < 20,
      "fixture should make the rate genuinely bind")
    // schema preserved
    assert(out.columns.toSeq === Seq("doc_id", "source", "text"))
  }

  test("curate: non-string and NULL group columns are budgeted strata too") {
    // int group 1 stays under budget; the NULL group is over budget and
    // must be rate-limited like any named stratum, not defaulted to 1000‰
    val docs = (
      Seq((1L, Option(1), "aa bb cc dd ee")) ++
        (10L until 30L).map(i => (i, Option.empty[Int], s"w$i x$i y$i z$i"))
      ).toDF("doc_id", "grp", "text")
    val out = Curation.curate(docs, evalSet, "doc_id", "text", "grp",
      minTokens = 3, maxTokens = 50, minUniqPermille = 100,
      maxTopTokPermille = 900, decontamN = 3, minHitPermille = 100,
      tokenBudgetPerSource = 40L)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L))
    val expectNull = spark.range(10, 30)
      .filter(Sampling.hashPermille(col("id")) < 500)
      .as[Long].collect().toSet
    assert(ids - 1L === expectNull)
    assert(out.columns.toSeq === Seq("doc_id", "grp", "text"))
  }

  test("curate with scrubPii: identifier-only variants dedup together, scrubbed text out") {
    val docs = Seq(
      (1L, "s", "mail jane@example.com about the launch plan"),
      (2L, "s", "mail bob@other.org about the launch plan"), // same post-scrub → dup
      (3L, "s", "a completely different clean document")
    ).toDF("doc_id", "source", "text")
    val out = Curation.curate(docs, evalSet, "doc_id", "text", "source",
      minTokens = 3, maxTokens = 50, minUniqPermille = 100,
      maxTopTokPermille = 900, decontamN = 3, minHitPermille = 100,
      tokenBudgetPerSource = 1000L, scrubPii = true)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 3L))
    assert(out.head._3 === "mail [EMAIL] about the launch plan")
  }

  test("curate runs end-to-end on the fixture documents table") {
    val docs = Tables.documents(spark, sfDir)
    val out = Curation.curate(docs,
      docs.filter(col("source") === "src0"), "doc_id", "text", "source",
      minTokens = 20, maxTokens = 90, minUniqPermille = 350,
      maxTopTokPermille = 150, decontamN = 3, minHitPermille = 100,
      tokenBudgetPerSource = 400L)
    val rows = out.select("doc_id", "text").as[(Long, String)].collect()
    assert(rows.nonEmpty, "fixture curation must keep something")
    assert(rows.length < docs.count(), "and must drop something")
    // invariants: unique ids, no exact-dup texts, every doc quality-kept
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.map(_._2).distinct.length === rows.length, "exact dups survived")
    val toks = rows.map(_._2.split(" ").length)
    assert(toks.forall(n => n >= 20 && n <= 90), "quality bounds violated")
  }

  test("curate: opt-in fluency and DSIR stages drop gibberish and off-target docs") {
    // reference/eval split defines both the LM and the DSIR target; all
    // corpus docs pass the lenient quality gates, so what drops is
    // attributable to the new stages alone
    val ref = Seq(
      (100L, "the cat sat on the mat and then the cat slept", "eval"),
      (101L, "a dog sat on the rug and then a dog slept", "eval")).toDF("doc_id", "text", "source")
    val corpus = Seq(
      (1L, "the cat sat on the rug and then slept well", "web"),
      (2L, "zq xv pw qqn mlk wrt bnp ojy trf czu", "web"),
      (3L, "a cat slept on the mat and the dog sat", "web")).toDF("doc_id", "text", "source")
    def run(flu: Long, dsir: Long) = Curation.curate(corpus, ref,
      "doc_id", "text", "source", minTokens = 2, maxTokens = 50,
      minUniqPermille = 1, maxTopTokPermille = 1000, decontamN = 8,
      minHitPermille = 900, tokenBudgetPerSource = 10000L,
      minFluencyPermille = flu, minDsirPerFeat = dsir)
      .select("doc_id").as[Long].collect().toSet
    assert(run(0, 0) === Set(1L, 2L, 3L), "stages off: everything survives")
    val flu = run(50, 0)
    assert(!flu.contains(2L), "gibberish must fall below the fluency floor")
    assert(flu.contains(1L) && flu.contains(3L), "fluent docs survive")
    // junk features (absent from both target and the rest of the corpus)
    // score exactly (0+1)·1e6/(1+1) = 500k under add-one smoothing;
    // target-like features land ~1M — the floor goes between
    val ds = run(0, 600000)
    assert(!ds.contains(2L), "off-target vocabulary scores under the DSIR floor")
    assert(ds.contains(1L), "target-like docs survive DSIR selection")
  }

  test("curate with normalizeText: case/punct variants dedup together; scrub runs first") {
    val ref = Seq((100L, "unrelated reference material here", "eval"))
      .toDF("doc_id", "text", "source")
    val corpus = Seq(
      (1L, "The cat sat on the mat today", "web"),
      (2L, "the CAT sat, on the mat... today!", "web"), // normalize-dup of 1
      (3L, "mail jane@example.com the cat report now", "web")
    ).toDF("doc_id", "text", "source")
    val out = Curation.curate(corpus, ref, "doc_id", "text", "source",
      minTokens = 2, maxTokens = 50, minUniqPermille = 1,
      maxTopTokPermille = 1000, decontamN = 8, minHitPermille = 900,
      tokenBudgetPerSource = 10000L, scrubPii = true, normalizeText = true)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // doc 2 normalizes to doc 1's text -> exact-dup, min id survives
    assert(out.map(_._1).toSeq === Seq(1L, 3L))
    assert(out.head._2 === "the cat sat on the mat today")
    // scrub saw the raw email BEFORE normalization broke its structure
    val t3 = out.last._2
    assert(!t3.contains("example") && !t3.contains("jane"),
      s"identifier must be scrubbed, got: $t3")
    assert(t3 === "mail email the cat report now")
  }

  test("writeShards: hive-partitioned shards reload to the full corpus, idempotently") {
    import graft.llm.Shuffling
    val dir = tmpDir("shards")
    val docs = (1L to 50L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    Shuffling.writeShards(docs, "doc_id", numShards = 4, outDir = dir)
    Shuffling.writeShards(docs, "doc_id", numShards = 4, outDir = dir) // idempotent re-run
    val back = spark.read.parquet(dir)
    assert(back.count() === 50)
    assert(back.select("shard").distinct().count() === 4)
    // shard membership matches the permutation rule
    val expect = Shuffling.deterministicShuffle(docs, "doc_id", 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val got = back.select(col("doc_id").cast("long"), col("shard").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === expect)
    // payload survives
    assert(back.filter(col("doc_id") === 7).select("text")
      .as[String].head() === "doc 7 body")
  }

  test("corpusReport: per-source doc/token/kept/dup counts") {
    val r = Curation.corpusReport(fixture, "doc_id", "text", "source",
      minTokens = 3, maxTokens = 50, minUniqPermille = 100,
      maxTopTokPermille = 900)
      .orderBy("source").as[(String, Long, Long, Long, Long)].collect()
    // s1: 5 docs, 5+5+2+6+6=24 tokens, kept = all but doc3 (len 2) = 4,
    // dup = doc2 only
    assert(r(0) === (("s1", 5L, 24L, 4L, 1L)))
    // s2: 20 docs, 80 tokens, all kept, no dups
    assert(r(1) === (("s2", 20L, 80L, 20L, 0L)))
  }
}
