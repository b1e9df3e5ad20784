package graft

import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, Retrieval, Similarity}

/** Round-9 additions: perceptual-hash frame dedup and the cross-encoder
  * rerank seam scoring a real (deterministic int-cosine) function.
  */
class MultimodalRerankSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
  private def emb = Tables.embeddings(spark, sfDir)

  test("frameAHash: video frames only, one 16-bit code per sampled frame") {
    val codes = Multimodal.frameAHash(docs, "doc_id", "text", stride = 5).collect()
    assert(codes.nonEmpty)
    assert(codes.forall { r =>
      val ph = r.getAs[Long]("phash"); ph >= 0 && ph < (1 << Multimodal.AHashBits)
    })
    // population = frameSample's: per video doc, 1 + (n_chars % 30) / 5 frames
    val expected = docs.filter(length(col("text")) % 3 === 2)
      .select(((length(col("text")) % 30) / 5 + 1).cast("long")).collect()
      .map(_.getLong(0)).sum
    assert(codes.length.toLong == expected,
      s"frame fan-out mismatch: got ${codes.length}, expected $expected")
    // deterministic: same input, same codes
    val again = Multimodal.frameAHash(docs, "doc_id", "text", stride = 5).collect()
    assert(codes.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("phashNearDupPairs: equals the brute-force Hamming<=2 cross-doc pair set") {
    val codes = graft.util.Materialize.stable(
      Multimodal.frameAHash(docs, "doc_id", "text", stride = 5))
    val got = Multimodal.phashNearDupPairs(codes, maxHd = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hd").longValue)).toSet
    // oracle: all-pairs scan (fine at sf0.001) — blocking must lose nothing
    val all = codes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ka, pa) <- all; (kb, pb) <- all
      if ka < kb && ka / 64 != kb / 64
      hd = java.lang.Long.bitCount(pa ^ pb) if hd <= 2
    } yield (ka, kb, hd.toLong)).toSet
    assert(want.nonEmpty, "degenerate fixture: no near-dup frame pairs")
    assert(got == want)
  }

  test("hammingCandidates: bounded per query and a superset of hammingTopK's picks") {
    val q = emb.filter(col("vec_id") < 10)
    val cand = Similarity.hammingCandidates(emb, q, c = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val perQ = cand.groupBy(_._1).values.map(_.size)
    assert(perQ.forall(_ <= 20))
    val reranked = Similarity.hammingTopK(emb, q, k = 5, nBits = 32, candMult = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reranked.subsetOf(cand),
      "fused top-k must pick from the stage-1 candidate set")
  }

  test("intCosineScore: exact int64 cosine of comma-joined payloads") {
    val s = Retrieval.intCosineScore("1,2,3", "3,2,1")
    assert(s == 10.0 / (math.sqrt(14.0) * math.sqrt(14.0)))
    assert(Retrieval.intCosineScore("0,0", "1,1") == 0.0) // zero-norm guard
  }

  test("rerank_cross_topk stack: k per query, scores descending, seam-scored") {
    val r = SparkEntry.queries("rerank_cross_topk")(spark, sfDir).collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.nonEmpty && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rows =>
      val ordered = rows.sortBy(_.getAs[Number]("rnk").intValue)
      val scores = ordered.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("audio energy profile: audio docs only, voiced windows bounded and ordered") {
    import org.apache.spark.sql.functions._
    val prof = Multimodal.audioEnergyProfile(docs, "doc_id", "text").collect()
    assert(prof.nonEmpty)
    val audioIds = docs.filter(length(col("text")) % 3 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(prof.map(_.getAs[Long]("doc_id")).toSet === audioIds,
      "exactly the 'audio' payloads get a profile row")
    prof.foreach { r =>
      val nv = r.getAs[Long]("n_voiced")
      assert(nv >= 0 && nv <= 16)
      assert(r.getAs[Long]("total_energy") >= 0)
      if (nv > 0) {
        val (f, l) = (r.getAs[Long]("first_voiced_w"), r.getAs[Long]("last_voiced_w"))
        assert(f >= 0 && l <= 15 && f <= l,
          s"voiced window bounds out of order: $r")
      } else {
        assert(r.isNullAt(r.fieldIndex("first_voiced_w")) &&
          r.isNullAt(r.fieldIndex("last_voiced_w")))
      }
    }
    // the strict mean test can't mark everything voiced
    assert(prof.forall(_.getAs[Long]("n_voiced") < 16))
  }
}
