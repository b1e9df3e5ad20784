package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IN-ENGINE training of the n-gram quality head (round-15 verdict #4):
  * where [[NgramHead]] scores with FROZEN weights, this FITS them — the
  * DISTILLATION step a real curation loop runs: a rich teacher signal
  * (an LLM grader, a rules ensemble) labels a corpus slice, and a cheap
  * hashed n-gram head is trained to reproduce the label so the corpus
  * pass costs a hash-and-sum per doc (the fastText/DCLM classifier
  * recipe). The teacher here is the engine's own deterministic
  * [[QualityRules.stubEduScore]] thresholded at [[TeacherThreshold]] —
  * chosen precisely because both engines already reproduce it
  * bit-for-bit, so the WHOLE training loop (labels included) stays
  * oracle-exact; a production run swaps in its graded pairs, same plan.
  *
  * Model: a hard-sigmoid logistic head over the [[NgramHead]] hashed
  * token-bucket features, trained by `Rounds` unrolled full-batch
  * gradient rounds with the size-normalized integer step
  * `w -= g div (PerDocGradDiv · n_train)` — the 1/N factor keeps the
  * dynamics invariant to corpus size (an unnormalized step measured
  * stable at 500 fixture docs and DIVERGENT at 5 000: ten times the
  * gradient at the same divisor oscillates past the linear range).
  *
  * Exactness strategy (the [[Bpe]]/[[Ulm]] round-loop discipline): ALL
  * arithmetic is exact int64 — weights live in micro-units (1e6 = 1.0),
  * the sigmoid is the hard clamp `(clamp(z, ±2e6) + 2e6) div 4`
  * (dividend non-negative by construction, so integral division is
  * unambiguous), gradients are exact integer sums, and the update
  * divides by the integer `PerDocGradDiv · n_train` (Spark `div` ==
  * DuckDB `//`, truncating toward zero — the [[NgramHead]]-verified
  * parity rule). [[trainSqlDuck]] renders the IDENTICAL unrolled rounds
  * from the same constants, so the engines cannot drift and the gate
  * compares exact weight tables.
  *
  * Why this shape at 100 TB: the corpus is tokenized ONCE into the
  * (doc, bucket, count) feature table — materialized, then each round
  * runs exactly two map-side-combined aggregates over it (the per-doc
  * margin, the per-bucket gradient) plus register-sized joins against
  * the ≤(Buckets+1)-row broadcast weight table and the 1-row broadcast
  * train count (the Q11 idiom — no driver-side count action). Rounds
  * are a fixed hyperparameter, so the whole run is `2·Rounds` bounded
  * passes — no per-round growth, nothing corpus-sized broadcast.
  *
  * Training hygiene: docs with `doc_id % HoldoutMod == 0` are HELD
  * OUT — HeadTrainSpec grades trained-vs-frozen AUC on exactly that
  * fold, so the improvement claim is out-of-sample.
  */
object HeadTrain {

  /** Feature buckets — [[NgramHead.Buckets]], same md5-prefix hashing. */
  val Buckets = 4096
  /** Unrolled full-batch gradient rounds. */
  val Rounds = 8
  /** Inverse per-doc learning rate: w -= g div (PerDocGradDiv·n_train). */
  val PerDocGradDiv = 50L
  /** Teacher cut: stubEduScore ≥ this per-mille value labels y = 1
    * (the corpus-wide median ≈ 330–340 at every fixture realization,
    * so the classes stay near-balanced).
    */
  val TeacherThreshold = 333L
  /** Hard-sigmoid linear range: ±2.0 in micro-units. */
  val ZClamp = 2000000L
  /** Held-out fold: doc_id % HoldoutMod == 0 never trains. */
  val HoldoutMod = 5L

  /** Teacher-labeled rows — (_id, _y ∈ {0,1}, _text): the stub-scored
    * corpus thresholded at [[TeacherThreshold]]; NULL text is
    * unscoreable and excluded. The teacher runs through the SAME
    * per-partition classifier seam the frozen head ships on.
    */
  def labeled(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = QualityRules
      .classifierScores(docs.sparkSession, docs, idCol, textCol)
      .filter(col("score_permille").isNotNull)
      .select(col("doc_id").as("_id"),
        when(col("score_permille") >= TeacherThreshold, 1L)
          .otherwise(0L).as("_y"))
    docs.select(col(idCol).as("_id"), col(textCol).as("_text"))
      .join(scored, Seq("_id"))
  }

  /** Hashed token-bucket counts + the bias feature: one row per
    * (doc, bucket) with the token count, plus (doc, -1, 1) — the bias
    * rides the same join path as every other feature, no special case.
    * Tokens split on single spaces KEEPING empties (the [[NgramHead]]
    * convention, == DuckDB string_split).
    */
  def features(lab: DataFrame): DataFrame = {
    val toks = Dedup.widen(lab)
      .select(col("_id"), explode(split(col("_text"), " ", -1)).as("_tok"))
    toks
      .select(col("_id"),
        pmod(conv(substring(md5(col("_tok")), 1, 8), 16, 10).cast("long"),
          lit(Buckets.toLong)).as("_b"))
      .groupBy("_id", "_b").agg(count(lit(1)).as("_x"))
      .unionByName(lab.select(col("_id"), lit(-1L).as("_b"), lit(1L).as("_x")))
  }

  /** Per-doc margin z = Σ x·w under a weight table — the scoring pass
    * shared by training (per round) and held-out evaluation: features
    * join the broadcast ≤(Buckets+1)-row weight table, one map-side-
    * combined per-doc sum. Output: (_id, _z).
    */
  def margins(feats: DataFrame, weights: DataFrame): DataFrame =
    feats
      .join(broadcast(weights.select(col("bucket").as("_b"), col("w"))),
        Seq("_b"))
      .groupBy("_id").agg(sum(col("_x") * col("w")).as("_z"))

  /** One gradient round: margins under the current weights, hard-sigmoid
    * residuals against the labels, per-bucket integer gradient, the
    * size-normalized update over the FULL bucket table (unseen buckets
    * keep their weight — gradient 0). `nTrain` is the 1-row train-count
    * aggregate, broadcast — never a driver-side count.
    */
  private def round(feats: DataFrame, lab: DataFrame, nTrain: DataFrame,
      weights: DataFrame): DataFrame = {
    val resid = margins(feats, weights)
      .join(lab.select("_id", "_y"), Seq("_id"))
      .select(col("_id"),
        (expr(s"(least(${ZClamp}L, greatest(${-ZClamp}L, _z)) + ${ZClamp}L) div 4")
          - col("_y") * lit(1000000L)).as("_resid"))
    val grad = feats.join(resid, Seq("_id"))
      .groupBy("_b").agg(sum(col("_x") * col("_resid")).as("_g"))
    weights
      .join(grad.select(col("_b").as("bucket"), col("_g")), Seq("bucket"), "left")
      .crossJoin(broadcast(nTrain))
      .select(col("bucket"),
        (col("w") - expr(s"coalesce(_g, 0L) div (${PerDocGradDiv}L * _n_train)"))
          .as("w"))
  }

  /** Train on the non-held-out fold: zero-initialized (Buckets+1)-row
    * weight table (bucket -1 = bias), `Rounds` unrolled gradient rounds
    * with per-round materialization. Output: (bucket, w) — exact int64
    * micro-unit weights, the gate's compared table.
    */
  def train(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val lab = graft.util.Materialize.stable(
      labeled(docs, idCol, textCol)
        .filter(pmod(col("_id"), lit(HoldoutMod)) =!= 0))
    val feats = graft.util.Materialize.stable(features(lab))
    val nTrain = lab.agg(count(lit(1)).as("_n_train"))
    var w: DataFrame = spark.range(-1L, Buckets.toLong)
      .select(col("id").as("bucket"), lit(0L).as("w"))
    for (_ <- 1 to Rounds)
      w = graft.util.Materialize.stable(round(feats, lab, nTrain, w))
    w
  }

  /** Held-out margins under a trained weight table — the spec's
    * out-of-sample scoring pass. Output: (_id, _y, _z).
    */
  def heldOutScores(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame): DataFrame = {
    val lab = labeled(docs, idCol, textCol)
      .filter(pmod(col("_id"), lit(HoldoutMod)) === 0)
    margins(features(lab), weights)
      .join(lab.select("_id", "_y"), Seq("_id"))
      .select("_id", "_y", "_z")
  }

  /** The TRAINED head as a per-partition scorer factory — the
    * [[NgramHead.scorerFactory]] seam with learned weights: collect the
    * ≤(Buckets+1)-row weight table (register-sized MODEL PUBLICATION —
    * the fastText "train, save, ship" step, not a data collect),
    * broadcast it once, score text to the hard-sigmoid per-mille grid
    * `(clamp(Σ x·w, ±ZClamp) + ZClamp) div 4000` ∈ [0, 1000]. Plugs
    * straight into the curation recipes' classifier slot
    * ([[Curation.curateV5]] `mkScorer`), closing the distillation loop:
    * train in-engine, then filter the corpus with what was learned.
    */
  def scorerFactory(spark: org.apache.spark.sql.SparkSession,
      weights: DataFrame): () => String => Long = {
    val arr = new Array[Long](Buckets + 1) // index bucket+1; bias at 0
    weights.collect().foreach { r =>
      arr(r.getLong(0).toInt + 1) = r.getLong(1)
    }
    val bc = spark.sparkContext.broadcast(arr)
    () => {
      val w = bc.value
      val md = java.security.MessageDigest.getInstance("MD5")
      (text: String) => {
        val toks = text.split(" ", -1) // keep trailing empties
        var z = w(0) // bias, x = 1
        var i = 0
        while (i < toks.length) {
          md.reset()
          val d = md.digest(toks(i).getBytes("UTF-8"))
          val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          z += w((u32 % Buckets).toInt + 1)
          i += 1
        }
        val zc = math.max(-ZClamp, math.min(ZClamp, z))
        (zc + ZClamp) / 4000
      }
    }
  }

  // ---------------------------------------------------------------- oracle

  /** The full unrolled training chain as DuckDB CTEs — identical
    * constants, identical integer ops, `AS MATERIALIZED` throughout
    * (DuckDB inlines multi-reference CTEs otherwise and the w-chain
    * references each round twice). The teacher label reuses
    * [[QualityRules.stubEduScoreSqlDuck]] (hardwired to a column named
    * `text`, like the quality gates).
    */
  def trainSqlDuck(table: String, idCol: String): String =
    s"${trainChainDuck(table, idCol)} SELECT b AS bucket, w FROM w$Rounds"

  /** The trained head graded out-of-sample as DuckDB SQL: the training
    * chain + held-out features + margins under the final weights + the
    * exact integer AUC walk (the quality_ngram_head_auc oracle
    * construction) — so the spec's improvement claim is ALSO a
    * driver-gated number, not just a ScalaTest assertion.
    */
  def heldOutAucSqlDuck(table: String, idCol: String): String =
    s"""${trainChainDuck(table, idCol)},
       |ho AS MATERIALIZED (SELECT $idCol AS id,
       |    CASE WHEN ${QualityRules.stubEduScoreSqlDuck} >= $TeacherThreshold
       |      THEN 1 ELSE 0 END AS y, text
       |  FROM $table WHERE text IS NOT NULL AND $idCol % $HoldoutMod = 0),
       |htk AS MATERIALIZED (SELECT id, unnest(string_split(text, ' ')) AS tok
       |  FROM ho),
       |hx AS MATERIALIZED (
       |  SELECT id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)
       |      % $Buckets AS b, CAST(count(*) AS BIGINT) AS x
       |    FROM htk GROUP BY 1, 2
       |  UNION ALL SELECT id, -1 AS b, 1 AS x FROM ho),
       |hz AS MATERIALIZED (SELECT hx.id, CAST(sum(hx.x * w.w) AS BIGINT) AS z
       |  FROM hx JOIN w$Rounds w ON hx.b = w.b GROUP BY 1),
       |hf AS (SELECT t.y = 1 AS y,
       |  (least($ZClamp, greatest(${-ZClamp}, hz.z)) + $ZClamp) // 4000 AS sc
       |  FROM hz JOIN ho t ON hz.id = t.id),
       |hs AS (SELECT sc,
       |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |  CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nn
       |  FROM hf GROUP BY 1),
       |hc AS (SELECT np, nn, coalesce(sum(nn) OVER (ORDER BY sc
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
       |  FROM hs),
       |ha AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |  CAST(sum(nn) AS BIGINT) AS n_neg,
       |  sum(CAST(np AS HUGEINT) * (2 * cnb + nn)) AS num FROM hc)
       |SELECT n_pos, n_neg,
       |  CAST(1000 * num // (2 * CAST(n_pos AS HUGEINT) * n_neg)
       |    AS BIGINT) AS auc_permille,
       |  CAST(1000000 * num // (2 * CAST(n_pos AS HUGEINT) * n_neg)
       |    AS BIGINT) AS auc_x1e6
       |FROM ha""".stripMargin.replace("\n", " ")

  /** The training chain's CTE LIST (no WITH keyword) — for splicing
    * into a larger oracle's WITH clause (the curated-v7 recipe).
    */
  def trainCtesDuck(table: String, idCol: String): String =
    trainChainDuck(table, idCol).stripPrefix("WITH ")

  private def trainChainDuck(table: String, idCol: String): String = {
    val base =
      s"""tr AS MATERIALIZED (SELECT $idCol AS id,
         |    CASE WHEN ${QualityRules.stubEduScoreSqlDuck} >= $TeacherThreshold
         |      THEN 1 ELSE 0 END AS y, text
         |  FROM $table WHERE text IS NOT NULL AND $idCol % $HoldoutMod <> 0),
         |tk AS MATERIALIZED (SELECT id, unnest(string_split(text, ' ')) AS tok
         |  FROM tr),
         |x AS MATERIALIZED (
         |  SELECT id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)
         |      % $Buckets AS b, CAST(count(*) AS BIGINT) AS x
         |    FROM tk GROUP BY 1, 2
         |  UNION ALL SELECT id, -1 AS b, 1 AS x FROM tr),
         |ntr AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM tr),
         |w0 AS MATERIALIZED (SELECT CAST(r.b AS BIGINT) AS b,
         |  CAST(0 AS BIGINT) AS w FROM (SELECT unnest(range(-1, $Buckets)) AS b) r)"""
        .stripMargin.replace("\n", " ")
    val rounds = (1 to Rounds).map { r =>
      s"""z$r AS MATERIALIZED (SELECT x.id, CAST(sum(x.x * w.w) AS BIGINT) AS z
         |  FROM x JOIN w${r - 1} w ON x.b = w.b GROUP BY 1),
         |rs$r AS MATERIALIZED (SELECT z.id,
         |  (least(${ZClamp}, greatest(${-ZClamp}, z.z)) + ${ZClamp}) // 4
         |    - t.y * 1000000 AS resid
         |  FROM z$r z JOIN tr t ON z.id = t.id),
         |g$r AS MATERIALIZED (SELECT x.b,
         |  CAST(sum(x.x * r.resid) AS BIGINT) AS g
         |  FROM x JOIN rs$r r ON x.id = r.id GROUP BY 1),
         |w$r AS MATERIALIZED (SELECT w.b,
         |  w.w - coalesce(g.g, 0) // ($PerDocGradDiv * (SELECT n FROM ntr)) AS w
         |  FROM w${r - 1} w LEFT JOIN g$r g ON w.b = g.b)"""
        .stripMargin.replace("\n", " ")
    }.mkString(", ")
    s"WITH $base, $rounds"
  }
}
