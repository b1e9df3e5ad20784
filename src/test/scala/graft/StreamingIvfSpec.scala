package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.streaming.StreamingIvf

class StreamingIvfSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(concat_ws("|", col("qid"), col("cid"), col("cell"),
      col("rank"), col("cos_sim").cast("string")))
      .collect().map(_.getString(0)).toSet

  test("batch-folded IVF assignments == one-pass; search lands on the " +
    "one-pass results; replayed batch is a no-op; delta is searchable") {
    val emb = Tables.embeddings(spark, sfDir)
    val prior = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val queries = emb.filter(col("vec_id") < 20)
    val cents = graft.util.Materialize.stable(
      Similarity.sampledCentroids(prior, 16))

    val idx = new StreamingIvf(spark, tmpDir("ivf_state"))
    idx.recordBatch(prior, cents, batchId = 0L)
    idx.recordBatch(delta, cents, batchId = 1L)

    // assignments: folded == one-pass over the union
    val folded = idx.mergedAssignments()
      .select(concat_ws("|", col("cid"), col("cell")))
      .collect().map(_.getString(0)).toSet
    val onePassAssign = Similarity.ivfAssign(emb, cents)
      .select(concat_ws("|", col("cid"), col("cell")))
      .collect().map(_.getString(0)).toSet
    assert(folded === onePassAssign)

    // search: folded index == the one-pass seam
    val got = rows(idx.search(queries, cents, nprobe = 3, k = 5))
    val want = rows(Similarity.ivfTopKWith(emb, queries, cents,
      nprobe = 3, k = 5))
    assert(got === want)

    // the delta IS searchable: some result cites a vec_id >= 400
    assert(idx.search(queries, cents, nprobe = 3, k = 5)
      .filter(col("cid") >= 400).count() > 0,
      "delta vectors must reach the candidate set")

    // replay batch 1: partition overwritten with identical rows
    idx.recordBatch(delta, cents, batchId = 1L)
    assert(rows(idx.search(queries, cents, nprobe = 3, k = 5)) === want,
      "a replayed batch must not change the index")
  }

  test("assignment against frozen centroids distributes over any " +
    "batch split (three uneven batches)") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.util.Materialize.stable(
      Similarity.sampledCentroids(emb.filter(col("vec_id") < 100), 8))
    val idx = new StreamingIvf(spark, tmpDir("ivf_state3"))
    idx.recordBatch(emb.filter(col("vec_id") < 17), cents, 0L)
    idx.recordBatch(
      emb.filter(col("vec_id") >= 17 && col("vec_id") < 300), cents, 1L)
    idx.recordBatch(emb.filter(col("vec_id") >= 300), cents, 2L)
    val folded = idx.mergedAssignments()
      .select(concat_ws("|", col("cid"), col("cell")))
      .collect().map(_.getString(0)).toSet
    val onePass = Similarity.ivfAssign(emb, cents)
      .select(concat_ws("|", col("cid"), col("cell")))
      .collect().map(_.getString(0)).toSet
    assert(folded === onePass)
  }

  test("zero state: an index with no recorded batch reads as empty and " +
    "is searchable (no rows), not an AnalysisException") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.util.Materialize.stable(
      Similarity.sampledCentroids(emb.filter(col("vec_id") < 100), 8))
    val idx = new StreamingIvf(spark, tmpDir("ivf_state0"))
    assert(idx.mergedAssignments().count() === 0L)
    assert(idx.search(emb.filter(col("vec_id") < 5), cents,
      nprobe = 2, k = 3).count() === 0L)
  }
}
