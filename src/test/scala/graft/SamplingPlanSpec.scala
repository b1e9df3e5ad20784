package graft

import org.apache.spark.sql.functions._

import graft.llm.Sampling

class SamplingPlanSpec extends SparkSpecBase {
  import spark.implicits._

  test("epochPlan: oversubscribed sources repeat (epochs > 1000 permille)") {
    val docs = Seq(
      (1L, "a b c d", "big"), (2L, "e f g h", "big"),
      (3L, "i j", "small"))
      .toDF("doc_id", "text", "source")
    val plan = Sampling.epochPlan(docs, "source",
      graft.llm.TextAnalysis.tokenCount(col("text")), tokenBudget = 100L)
      .select("source", "n_tokens", "target_tokens", "epochs_permille")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // budget 100 >> corpus 10 tokens: every source repeats
    assert(plan.values.forall(_._3 > 1000L))
    // target tokens = budget * mix/1000; epochs = target*1000 div n_tokens
    plan.values.foreach { case (n, target, ep) =>
      assert(ep === target * 1000 / n)
    }
    // sqrt flattening: 'small' (2 tokens) gets a larger epoch multiple
    // than 'big' (8 tokens) because its mix share shrinks sub-linearly
    assert(plan("small")._3 > plan("big")._3)
  }

  test("sourceReputationFilter: whole source lives or dies by its mean") {
    val docs = Seq(
      // diverse source: all-unique tokens (score 1000)
      (1L, "a b c d", "good"), (2L, "e f g h", "good"),
      // repetitious source: score 250 each
      (3L, "x x x x", "spam"), (4L, "y y y y", "spam"))
      .toDF("doc_id", "text", "source")
    val kept = Sampling.sourceReputationFilter(docs, "doc_id", "text",
      "source", minSrcPermille = 500L)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // a good doc inside the spam source dies with its domain: adding the
    // all-unique doc 5 lifts spam's mean only to (250+250+1000)/3 = 500,
    // still under a 600 floor — so doc 5 is dropped for the company it
    // keeps while the 'good' source (mean 1000) survives
    val docs2 = docs.union(Seq((5L, "p q r s", "spam")).toDF("doc_id", "text", "source"))
    val kept2 = Sampling.sourceReputationFilter(docs2, "doc_id", "text",
      "source", minSrcPermille = 600L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 === Seq(1L, 2L), "domain-level gate, not doc-level")
  }

  test("sourceReputationFilter plan: per-source table broadcasts back, corpus never exchanges") {
    val docs = Tables.documents(spark, sfDir)
    val p = Sampling.sourceReputationFilter(docs, "doc_id", "text",
      "source", 500L).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "source table must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("curriculumPhases: declared cuts bucket exactly; empty phases " +
    "emit zero rows with NULL ranges; NULL scores are excluded; " +
    "unsorted cuts refuse") {
    val docs = Seq(
      (1L, Option(100L), 10L),  // phase 0
      (2L, Option(249L), 20L),  // phase 0 (boundary-1)
      (3L, Option(250L), 30L),  // phase 1 (boundary is inclusive-low)
      (4L, Option(750L), 40L),  // phase 3
      (5L, Option(999L), 50L),  // phase 3
      (6L, Option.empty[Long], 60L) // NULL score: unschedulable
    ).toDF("id", "s", "tk")
    val got = Sampling.curriculumPhases(docs, col("s"), col("tk"),
        cuts = Seq(250L, 500L, 750L))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L), "one row per declared phase")
    assert(got(0L).getAs[Long]("n_docs") === 2L &&
      got(0L).getAs[Long]("n_tokens") === 30L &&
      got(0L).getAs[Long]("score_min") === 100L &&
      got(0L).getAs[Long]("score_max") === 249L)
    assert(got(1L).getAs[Long]("n_docs") === 1L &&
      got(1L).getAs[Long]("score_min") === 250L,
      "the cut value itself belongs to the phase ABOVE it")
    assert(got(2L).getAs[Long]("n_docs") === 0L &&
      got(2L).isNullAt(got(2L).fieldIndex("score_min")),
      "an empty quality band emits n=0 with a NULL observed range")
    assert(got(3L).getAs[Long]("n_docs") === 2L &&
      got(3L).getAs[Long]("n_tokens") === 90L)
    // declared bounds ride along; the open ends are NULL
    assert(got(0L).isNullAt(got(0L).fieldIndex("cut_lo")) &&
      got(0L).getAs[Long]("cut_hi") === 250L)
    assert(got(3L).getAs[Long]("cut_lo") === 750L &&
      got(3L).isNullAt(got(3L).fieldIndex("cut_hi")))
    intercept[IllegalArgumentException] {
      Sampling.curriculumPhases(docs, col("s"), col("tk"), Seq(500L, 250L))
    }
    intercept[IllegalArgumentException] {
      Sampling.curriculumPhases(docs, col("s"), col("tk"), Seq.empty)
    }
  }
}
