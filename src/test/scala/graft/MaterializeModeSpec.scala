package graft

import org.apache.spark.sql.functions._

import graft.streaming.ReplicationJob

/** The cluster materialization mode (`spark.graft.materialize=persist`)
  * must produce identical results to the local[n] default AND release its
  * cache per use — a leak here only ever surfaces as an executor OOM on a
  * real cluster, days in.
  */
class MaterializeModeSpec extends SparkSpecBase {
  import spark.implicits._

  private def inMode[A](mode: String)(f: => A): A = {
    val key = "spark.graft.materialize"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("persist mode: multi-branch dedup pipelines match the local default") {
    val docs = Tables.documents(spark, sfDir)
    def run() = {
      val jac = graft.llm.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 7, 10, 50)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val cc = graft.llm.Dedup.connectedComponents(
        graft.llm.Dedup.lshCandidatePairs(docs, "doc_id", "text"), "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      (jac, cc)
    }
    val local = run()
    val persisted = inMode("persist") { run() }
    assert(persisted == local, "persist mode must not change any result")
    // one-shot query builders cache until session hygiene (the contract
    // the bench's clearCaches mirrors); the hygiene path must fully drain
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "session cache hygiene must be able to drop every query-mode entry")
  }

  test("persist mode: releaseTracked drains the dedup operators' pinned caches") {
    inMode("persist") {
      val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "q w e r t"))
        .toDF("doc_id", "text")
      // operators whose RESULT plans read their stable() caches — they
      // cannot release internally
      graft.llm.Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, thresholdNum = 7, thresholdDen = 10).count()
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "expected pinned cache entries after a persist-mode dedup run")
      val released = graft.util.Materialize.releaseTracked(spark)
      assert(released > 0, "releaseTracked must report the drained entries")
      // unpersist is async; poll briefly for the cache to drain
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"leaked: ${spark.sparkContext.getPersistentRDDs.keys}")
    }
  }

  test("persist mode: decontam pins nothing; retrieval/curation/shuffle drain via releaseTracked") {
    inMode("persist") {
      val docs = Seq(
        (1L, "a b c d e f", "s1"), (2L, "a b c d e f", "s1"),
        (3L, "q w e r t y", "s2"), (4L, "m n o p q r", "s2"))
        .toDF("doc_id", "text", "source")
      val evalSet = Seq((100L, "a b c")).toDF("doc_id", "text")
      // Decontam is single-pass by construction (broadcast eval grams,
      // one corpus aggregate) — it must not pin ANY cache, in any mode
      graft.llm.Decontam.overlapReport(docs, evalSet, "doc_id", "text", n = 3).count()
      graft.llm.Decontam.evalContaminationReport(docs, evalSet, "doc_id", "text", n = 3).count()
      graft.llm.Decontam.decontaminate(docs, evalSet, "doc_id", "text",
        n = 3, minHitPermille = 100).count()
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        "decontam must not pin caches — its plan is single-pass")
      // genuinely multi-consumer operators cache via stable() and hand
      // release to session hygiene; all of them must be TRACKED
      graft.llm.Retrieval.tfidfTopK(docs, evalSet, "doc_id", "text", k = 3).count()
      graft.llm.Retrieval.bm25iTopK(docs, evalSet, "doc_id", "text", k = 3).count()
      graft.llm.Shuffling.deterministicShuffle(docs, "doc_id", numShards = 2).count()
      graft.llm.Curation.curate(docs, evalSet, "doc_id", "text", "source",
        minTokens = 1, maxTokens = 100, minUniqPermille = 0,
        maxTopTokPermille = 1000, decontamN = 3, minHitPermille = 900,
        tokenBudgetPerSource = 1000L).count()
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "expected pinned cache entries from the stable()-using operators")
      assert(graft.util.Materialize.releaseTracked(spark) > 0)
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"leaked: ${spark.sparkContext.getPersistentRDDs.keys}")
    }
  }

  test("persist mode: processBatch releases its per-trigger cache") {
    inMode("persist") {
      val base = tmpDir("matmode")
      val cfg = ReplicationJob.Config(sourceDir = base,
        targetDir = s"$base/target", dlqDir = s"$base/dlq",
        checkpointDir = s"$base/ckpt")
      val batch = Seq(
        (1L, 100L, 1L, "view", 1.0),
        (2L, 200L, 2L, "click", 2.0))
        .toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .withColumn("ts", col("ts_us") * 1000)
        .withColumn("props", lit(null).cast("string"))
      ReplicationJob.processBatch(spark, batch, cfg, batchId = 0L)
      ReplicationJob.processBatch(spark, batch, cfg, batchId = 1L)
      // the release contract: a long-running stream must not accumulate
      // one cached batch per trigger
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"leaked cache entries: ${spark.sparkContext.getPersistentRDDs.keys}")
      val state = spark.read.parquet(s"$base/target")
      assert(state.count() == 2)
    }
  }
}
