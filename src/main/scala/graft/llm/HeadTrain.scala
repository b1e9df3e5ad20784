package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
  * (doc, bucket, count) feature table, folded once more into per-doc
  * feature ARRAYS (doc-length bounded) — materialized, then each round
  * is ONE distributed pass over it: margin + residual as doc-local
  * array expressions against the (Buckets+1)-long weight literal, then
  * a per-bucket partial aggregate whose exchange carries ≤ Buckets+1
  * rows per map partition. The weight state between rounds is
  * HYPERPARAMETER-sized (4,097 longs), held on the driver and
  * re-published per round — the same register-sized publication
  * [[scorerFactory]] performs once at the end; nothing corpus-sized is
  * ever collected or broadcast. Rounds are a fixed hyperparameter, so
  * the whole run is `Rounds` bounded passes — no per-round growth.
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
        pmod(graft.llm.Dedup.tokenHash(col("_tok")),
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

  /** Train on the non-held-out fold: zero-initialized (Buckets+1)-slot
    * weight register (bucket -1 = bias), `Rounds` gradient rounds.
    * Output: (bucket, w) — exact int64 micro-unit weights, the gate's
    * compared table; identical values to the unrolled-DataFrame form
    * this replaces (same integer ops in the same order — Java long `/`
    * == Spark `div` == DuckDB `//`, truncation toward zero).
    *
    * Round-18 optimization (guide §1.2 step 1 / §2.4): the previous
    * shape kept the weight TABLE distributed — per round that cost a
    * broadcast build of the weights, a margins exchange, a label join, a
    * residual broadcast, a gradient exchange, a left-join + crossJoin
    * update, and an eager localCheckpoint: ~12 stages × 8 rounds, 103
    * jobs / 4.5 s warm at sf0.1 with no stage over 0.3 s — pure
    * scheduling and materialization overhead. The weights are
    * HYPERPARAMETER-sized (Buckets+1 = 4,097 longs — register data, the
    * same table [[scorerFactory]] already collects to publish), so they
    * now live in a driver array between rounds: each round is ONE
    * distributed aggregate pass over the materialized per-doc feature
    * arrays (margin + residual as doc-local array expressions, then
    * explode → per-bucket partial agg whose exchange carries ≤ Buckets+1
    * rows per map partition), collected register-sized like every other
    * publication step. The corpus-sized work — tokenize, bucket counts,
    * per-round gradient pass — stays fully distributed; per-partition
    * state stays doc-length bounded.
    *
    * The weight register rides into the round as a BROADCAST 1-row
    * array-column relation (33 KB), NOT as a per-round `typedlit`
    * literal: a 4,097-element literal embedded in the expression tree
    * makes every round's generated code unique — 8 rounds × fresh
    * whole-stage-codegen compilation + plan analysis was measured at
    * 10.7 s warm (WORSE than the shape it replaced); with the register
    * as a column the per-round plan and generated code are byte-
    * identical, so codegen-cache hits make rounds cheap. The residual
    * is projected BELOW the explode so the doc-local margin fold runs
    * once per doc, never once per exploded feature.
    */
  def train(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val lab = graft.util.Materialize.stable(
      labeled(docs, idCol, textCol)
        .filter(pmod(col("_id"), lit(HoldoutMod)) =!= 0))
    // per-doc feature arrays (doc-length bounded): the (doc, bucket,
    // count) table folded to one row per doc so each gradient round is a
    // single pass with no per-doc exchange. Array order is whatever
    // collect_list produced — every consumer below is an order-free
    // integer sum.
    val docFeats = graft.util.Materialize.stable(
      features(lab)
        .groupBy("_id")
        .agg(collect_list(struct(col("_b"), col("_x"))).as("_f"))
        .join(lab.select("_id", "_y"), Seq("_id")))
    // register-sized control reads: the train count (one 1-row
    // aggregate) and, per round, the ≤(Buckets+1)-row gradient — the
    // same bounded-collect discipline as scorerFactory's publication.
    val nTrain = lab.agg(count(lit(1))).head().getLong(0)
    val w = new Array[Long](Buckets + 1) // slot b+1 = bucket b; 0 = bias
    import spark.implicits._
    for (_ <- 1 to Rounds) {
      // the register as DATA (1-row array column, broadcast), not a
      // literal — identical plan + generated code every round
      val wDf = Seq(Tuple1(w.toSeq)).toDF("_wa")
      val z = aggregate(col("_f"), lit(0L), (acc, s) =>
        acc + s.getField("_x") *
          element_at(col("_wa"), (s.getField("_b") + lit(2L)).cast("int")))
      val resid =
        ((least(lit(ZClamp), greatest(lit(-ZClamp), z)) + lit(ZClamp))
          .divInt(lit(4L)) - col("_y") * lit(1000000L)).as("_resid")
      val grad = docFeats
        .crossJoin(broadcast(wDf))
        .select(col("_f"), resid) // one margin fold per DOC, below the explode
        .select(explode(col("_f")).as("_s"), col("_resid"))
        .groupBy(col("_s._b").as("_b"))
        .agg(sum(col("_s._x") * col("_resid")).as("_g"))
        .collect()
      grad.foreach { r =>
        val slot = r.getLong(0).toInt + 1
        w(slot) = w(slot) - r.getLong(1) / (PerDocGradDiv * nTrain)
      }
    }
    w.zipWithIndex.map { case (wv, i) => (i.toLong - 1L, wv) }.toSeq
      .toDF("bucket", "w")
  }

  /** Integer division with Spark `div` semantics (truncation toward
    * zero) as a Column op — `expr("a div b")` without the string round
    * trip. Used by the training round so the register math matches the
    * oracle's `//` bit-for-bit.
    */
  private implicit class DivCol(private val c: Column) {
    def divInt(d: Column): Column = {
      import org.apache.spark.sql.GraftExpressionBridge._
      column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        expression(c), expression(d)))
    }
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
