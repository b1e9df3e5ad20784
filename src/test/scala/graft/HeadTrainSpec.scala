package graft

import org.apache.spark.sql.functions._

import graft.llm.{HeadTrain, NgramHead, QualityRules}
import graft.ops.TableProfile

/** The round-15 verdict-#4 claim, graded out-of-sample: the in-engine
  * DISTILLED head must BEAT the frozen [[NgramHead]] scorer on the
  * held-out fold's AUC against the teacher label — otherwise "training"
  * is ceremony. Both heads score the SAME held-out docs (doc_id % 5 ==
  * 0, never seen by the gradient rounds) against the same thresholded
  * stub-teacher label the gradient rounds distilled.
  */
class HeadTrainSpec extends SparkSpecBase {
  import spark.implicits._

  private def aucX1e6(df: org.apache.spark.sql.DataFrame,
      score: org.apache.spark.sql.Column,
      label: org.apache.spark.sql.Column): Long =
    TableProfile.rocAuc(df, score, label)
      .select("auc_x1e6").as[Long].head()

  test("distilled weights beat the frozen scorer on held-out AUC") {
    val docs = Tables.documents(spark, sfDir)
    val w = graft.util.Materialize.stable(
      HeadTrain.train(docs, "doc_id", "text"))

    // contract: the full bucket table rides through every round — one
    // row per bucket incl. the bias, nothing dropped by a lost gradient
    assert(w.count() === HeadTrain.Buckets + 1)
    assert(w.filter(col("bucket") === -1L).count() === 1)
    // training moved something: an all-zero table would be the frozen
    // init, and the AUC comparison below would be vacuous
    assert(w.filter(col("w") =!= 0L).count() > 0)

    val held = HeadTrain.heldOutScores(docs, "doc_id", "text", w)
    val aucTrained = aucX1e6(held, col("_z"), col("_y") === 1)

    // frozen head over the same held-out docs, same teacher label
    val heldLab = HeadTrain.labeled(docs, "doc_id", "text")
      .filter(pmod(col("_id"), lit(HeadTrain.HoldoutMod)) === 0)
    val frozen = QualityRules.classifierScoresInit(
        spark, heldLab.select(col("_id").as("doc_id"), col("_text").as("text")),
        "doc_id", "text", NgramHead.scorerFactory(spark))
      .join(heldLab.select(col("_id").as("doc_id"), col("_y")), "doc_id")
    val aucFrozen = aucX1e6(frozen, col("score_permille"), col("_y") === 1)

    assert(aucTrained > aucFrozen,
      s"distilled held-out AUC $aucTrained must beat frozen $aucFrozen")
    // honest floor: distillation of a text-derived teacher through the
    // hashed-unigram bottleneck measured 0.965–0.978 across all four
    // fixture realizations (both seeds, all SFs); 0.90 leaves slack
    // without letting a broken trainer slip through
    assert(aucTrained >= 900000L,
      s"distilled held-out AUC $aucTrained below the 0.90 floor")
    // and the frozen stopword head cannot see the teacher (measured
    // 0.52–0.56) — if this ever rises near the trained floor, the
    // comparison above has stopped being evidence
    assert(aucFrozen < 700000L,
      s"precondition: the frozen head should sit near chance on the " +
        s"teacher label, got $aucFrozen")
  }

  test("gradient rounds are exact integers with the documented " +
    "dynamics: signs track labels, magnitude tracks counts, unseen " +
    "buckets never move") {
    // teacher labels by construction: 'aa bb cc dd' has distinct ratio
    // 1000, long6 0 → stub 500 ≥ 333 → y = 1; 'ee ee ee ee' has
    // distinct ratio 250, long6 0 → stub 125 < 333 → y = 0. Held-out
    // fold empty (ids 1, 2 — neither % 5 == 0), so both docs train.
    val docs = Seq(
      (1L, "aa bb cc dd"),
      (2L, "ee ee ee ee")
    ).toDF("doc_id", "text")
    val w = HeadTrain.train(docs, "doc_id", "text")
      .filter(col("w") =!= 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val posB = Seq("aa", "bb", "cc", "dd").map(bucketOf).toSet
    val negB = bucketOf("ee")
    assert(w.keySet.subsetOf(posB + negB + (-1L)),
      s"only seen buckets (and at most the bias) may move, got $w")
    posB.foreach(b => assert(w.getOrElse(b, 0L) > 0,
      s"positive-label bucket $b must move up, got $w"))
    assert(w(negB) < 0, s"negative-label bucket must move down, got $w")
    // the y=0 doc stacks count 4 on one bucket vs count 1 each for the
    // y=1 doc: its per-round gradient is 4× — strictly larger magnitude
    assert(-w(negB) > posB.map(b => w(b)).max,
      s"count-4 bucket must outpace count-1 buckets, got $w")
  }

  test("scorerFactory parity: the published-model scorer (collected " +
    "weights through the per-partition seam) lands on exactly the " +
    "DataFrame margin path's per-mille grid for every doc") {
    val docs = Tables.documents(spark, sfDir)
    val w = graft.util.Materialize.stable(
      HeadTrain.train(docs, "doc_id", "text"))
    // DataFrame path: margins under w, quantized to the per-mille grid
    val lab = HeadTrain.labeled(docs, "doc_id", "text")
    val viaDf = HeadTrain.margins(HeadTrain.features(lab), w)
      .select(col("_id"), expr(
        s"(least(${HeadTrain.ZClamp}L, greatest(${-HeadTrain.ZClamp}L, _z))" +
          s" + ${HeadTrain.ZClamp}L) div 4000").as("_s"))
      .as[(Long, Long)].collect().toMap
    // seam path: the curation recipes' classifier slot
    val viaSeam = QualityRules.classifierScoresInit(
        spark, docs.filter(col("text").isNotNull), "doc_id", "text",
        HeadTrain.scorerFactory(spark, w))
      .select("doc_id", "score_permille")
      .as[(Long, Option[Long])].collect().toMap
    assert(viaDf.nonEmpty && viaDf.keySet == viaSeam.keySet)
    viaDf.foreach { case (id, s) =>
      assert(viaSeam(id).contains(s),
        s"doc $id: seam ${viaSeam(id)} != DataFrame grid $s")
    }
  }

  private def bucketOf(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(tok.getBytes("UTF-8"))
    val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u32 % HeadTrain.Buckets
  }
}
