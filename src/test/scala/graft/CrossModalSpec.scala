package graft

import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, Similarity}

/** Cross-modal retrieval: the two-tower shared space must actually
  * align (text query retrieves its counterpart image), and the REAL
  * encoder seam (mapPartitions extractFeatures) must flow through the
  * same ANN path as the closed-form towers — the contract that lets a
  * real CLIP encoder replace the stub without touching the index code.
  */
class CrossModalSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 5

  test("text tower retrieves the counterpart image: top-1 through the " +
    "IVF path for >= 80% of queries, and ids never collide across modalities") {
    val docs = Tables.documents(spark, sfDir)
    val img = Multimodal.imageTower(docs, "doc_id", "text")
    val txt = Multimodal.textTower(docs, "doc_id", "text")
      .filter(col("vec_id") < 50)
    // disjoint id spaces
    assert(img.join(txt, Seq("vec_id"), "inner").isEmpty,
      "image ids must be offset out of the text id space")
    val top = Similarity.ivfTopK(img, txt, 16, 3, K)
    val n = txt.count()
    val hit1 = top.filter(col("rank") === 1 &&
      col("cid") === col("qid") + Multimodal.ImgIdOffset).count()
    assert(hit1 * 10 >= n * 8,
      s"counterpart image must be top-1 for >= 80% of queries: $hit1/$n")
  }

  test("ivfRecall on the cross-modal pair: every query present, " +
    "recall in [0, 1000], zero-recall queries kept") {
    val docs = Tables.documents(spark, sfDir)
    val img = Multimodal.imageTower(docs, "doc_id", "text")
    val txt = Multimodal.textTower(docs, "doc_id", "text")
      .filter(col("vec_id") < 50)
    val r = Similarity.ivfRecall(img, txt, 16, 3, K)
      .as[(Long, Long, Long)].collect()
    assert(r.length == txt.count().toInt, "one row per query, always")
    assert(r.forall { case (_, c, p) => c >= 0 && c <= K && p >= 0 && p <= 1000 })
  }

  test("extractFeatures (the mapPartitions encoder seam) feeds the same " +
    "IVF path: float embeddings, (vec_id, embedding) contract, live index") {
    val docs = Tables.documents(spark, sfDir).limit(60)
    val feats = Multimodal.extractFeatures(spark,
        Multimodal.withPayload(docs, "text"), "doc_id")
      .toDF("vec_id", "embedding")
    val q = feats.filter(col("vec_id") < 10)
    val top = Similarity.ivfTopK(feats, q, numCentroids = 8, nprobe = 2, k = 3)
    assert(top.count() > 0, "the real-encoder seam must drive the index")
    assert(top.columns.toSeq ==
      Seq("qid", "cid", "cell", "rank", "cos_sim"))
  }
}
