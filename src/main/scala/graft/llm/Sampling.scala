package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: rate-based
  * stratified sampling and exact-k-per-stratum selection.
  *
  * Everything keys off a CONTENT hash, never `rand()`: the sample is
  * reproducible across runs, clusters, and engines (the DuckDB oracle
  * computes the identical md5 arithmetic), re-running a pipeline stage
  * re-selects the same rows (idempotent restarts), and upstream
  * repartitioning cannot change the sample — the properties a 100 TB
  * curation run actually needs from a sampler. `rand(seed)` gives none of
  * them (it is seeded per-partition, so any change in partitioning
  * reshuffles the sample).
  */
object Sampling {

  /** Deterministic per-mille bucket in [0, 1000) from a key's md5 —
    * the first 8 hex chars as an int64 (the [[Dedup.tokenHash]] idiom),
    * mod 1000. Uniform to ~2⁻³² for any key set.
    */
  def hashPermille(key: Column): Column =
    pmod(graft.llm.Dedup.tokenHash(key.cast("string")), lit(1000L))

  /** Rate-based stratified sample: keep a row iff its key's per-mille
    * bucket falls under its stratum's rate (`rates`, defaulting to
    * `defaultPermille`). A pure codegen'd filter — no shuffle, no state,
    * trivially parallel at any scale; downsampling a stratum never looks
    * at other strata's rows.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashPermille(col(keyCol)) < rate)
  }

  /** Weighted without-replacement sample, k per stratum, DETERMINISTIC:
    * the integer analog of Efraimidis–Spirakis priority sampling (keys
    * `u^{1/w}` with u random ⇔ rank by w/(-ln u); here the "random" u is
    * the doc's 32-bit hash and the priority is the integer
    * `w · 2³² div (h + 1)` — monotone in w for fixed h, monotone in the
    * hash draw for fixed w, so heavier rows win proportionally more
    * often while any fixed row's selection is reproducible bit-for-bit
    * across runs and engines (the stratifiedSample determinism
    * discipline, extended to weights). Ties (identical priority) break
    * by key. Per-stratum top-k via a partitioned window —
    * WindowGroupLimit prunes map-side, so the exchange moves ≤ k rows
    * per stratum per input partition, never the corpus.
    *
    * Weights must be < 2³¹ — the priority `w · 2³²` must fit int64.
    * A larger weight raises a runtime error (codegen'd guard) rather
    * than wrapping to a wrong negative priority; weights that large
    * mean the caller wants a deterministic-include list, not a sample.
    */
  def weightedPrioritySample(df: DataFrame, keyCol: String,
      strataCol: String, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val hSql =
      s"CAST(conv(substring(CAST(md5(CAST($keyCol AS STRING)) AS STRING), " +
        "1, 8), 16, 10) AS BIGINT)"
    val withP = df
      .withColumn("_w", weight.cast("long"))
      .filter(col("_w") > 0) // zero-weight rows can never be drawn
      .withColumn("priority", expr(
        "CASE WHEN _w >= 2147483648L THEN raise_error(" +
          "'weightedPrioritySample: weight must be < 2^31 " +
          "(w * 2^32 must fit int64)') " +
          s"ELSE (_w * 4294967296L) div ($hSql + 1) END"))
    val w = Window.partitionBy(strataCol)
      .orderBy(col("priority").desc, col(keyCol))
    withP.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("_w")
  }

  /** Leakage-free train/val/test split: the split is decided by the
    * near-dup CLUSTER's hash, not the document's, so every member of a
    * cluster lands in the same split — the guard against train/test
    * contamination through near-duplicates (a doc and its near-copy in
    * different splits defeats held-out evaluation; cf. Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" §6).
    *
    * `labels` is (docCol, clusterCol) — e.g. [[Dedup.connectedComponents]]
    * output with singletons coalesced to their own id. Thresholds are
    * integer per-mille: bucket < `trainPermille` → train, <
    * train+val → val, else test. Pure codegen'd projection — no shuffle,
    * no state: at 100 TB the split is a free column on the labels scan,
    * and re-running it is bit-identical (the property that lets separate
    * pipeline stages agree on membership without coordination).
    */
  def clusterSplit(labels: DataFrame, docCol: String, clusterCol: String,
      trainPermille: Int, valPermille: Int): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      s"per-mille thresholds must partition [0,1000): $trainPermille/$valPermille")
    labels
      .withColumn("bucket", hashPermille(col(clusterCol)))
      .withColumn("split",
        when(col("bucket") < trainPermille, lit("train"))
          .when(col("bucket") < trainPermille + valPermille, lit("val"))
          .otherwise(lit("test")))
      .select(col(docCol), col(clusterCol), col("bucket"), col("split"))
  }

  /** Train/test LEAKAGE audit over a near-duplicate pair graph — the
    * measurement [[clusterSplit]] exists to win: a near-dup pair whose
    * endpoints land in different splits leaks training text into eval.
    * Compares two assignment schemes over the SAME pairs:
    * `doc_hash` (split each doc by its own id hash — the naive scheme)
    * vs `cluster` (split by the component label, so connected docs move
    * together and cross-split pairs are structurally impossible).
    * Output one row per scheme: (scheme, n_pairs, cross_pairs,
    * cross_permille) — the cluster row's 0 is computed, not assumed:
    * both endpoints join the label table independently.
    *
    * Scale shape: the pair table is the near-dup candidate set (already
    * blocking-bounded by its producer); each scheme is two equi-joins
    * at most plus one partial-agg count — no corpus-sized shuffle
    * beyond the label join the split itself needs.
    */
  def splitLeakageAudit(pairs: DataFrame, aCol: String, bCol: String,
      labels: DataFrame, docCol: String, clusterCol: String,
      trainPermille: Int, valPermille: Int): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      s"per-mille thresholds must partition [0,1000): $trainPermille/$valPermille")
    def splitOf(key: Column): Column = {
      val b = hashPermille(key)
      when(b < trainPermille, lit("train"))
        .when(b < trainPermille + valPermille, lit("val"))
        .otherwise(lit("test"))
    }
    def audit(scheme: String, sa: DataFrame): DataFrame =
      sa.agg(count(lit(1)).as("n_pairs"),
          sum(when(col("_sa") =!= col("_sb"), 1L).otherwise(0L))
            .as("cross_pairs"))
        .select(lit(scheme).as("scheme"), col("n_pairs"), col("cross_pairs"),
          expr("1000 * cross_pairs div n_pairs").as("cross_permille"))
    val naive = audit("doc_hash", pairs.select(
      splitOf(col(aCol)).as("_sa"), splitOf(col(bCol)).as("_sb")))
    val lab = labels.select(col(docCol).as("_d"), col(clusterCol).as("_c"))
    val clustered = audit("cluster", pairs
      .join(lab.select(col("_d"), splitOf(col("_c")).as("_sa")),
        col(aCol) === col("_d")).drop("_d")
      .join(lab.select(col("_d"), splitOf(col("_c")).as("_sb")),
        col(bCol) === col("_d")))
    naive.unionByName(clustered)
  }

  /** Exactly `k` rows per stratum, chosen by hash order (ties broken by
    * the key itself, so selection is total and deterministic). The rank
    * filter compiles to Spark's WindowGroupLimit physical rewrite: each
    * map task pre-limits its partition to k rows per stratum BEFORE the
    * exchange, so the shuffle carries O(strata × k × tasks), not the
    * corpus — the scale path for "give me k exemplars per source".
    */
  def exactKPerStratum(df: DataFrame, keyCol: String, strataCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashPermille(col(keyCol)), col(keyCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Data-mixing weights: per-stratum doc/token totals plus the integer
    * per-mille sampling rate that downsamples each stratum to (at most)
    * `tokenBudget` tokens — the "cap every source/domain at B tokens"
    * step of corpus mixing. The output is a tiny per-stratum table; the
    * rates feed [[stratifiedSample]] directly, so the whole mix pipeline
    * is one map-side-partial aggregation here plus one shuffle-free
    * filter there — no per-row state, no skew exposure beyond the
    * aggregation's own partial combine.
    *
    * All-integer arithmetic (`div`, `least`) so the mix plan is exact,
    * reproducible, and engine-portable. A stratum already under budget
    * gets rate 1000 (keep everything).
    */
  def mixWeights(df: DataFrame, strataCol: String, weight: Column,
      tokenBudget: Long): DataFrame =
    df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(weight.cast("long")).as("n_tokens"))
      .withColumn("rate_permille",
        least(lit(1000L), expr(s"${tokenBudget}L * 1000 div n_tokens")))

  /** Exact integer square root of a non-negative long column: the float
    * `sqrt` candidate corrected by ±1 so `s² ≤ n < (s+1)²` holds EXACTLY
    * — `floor(sqrt(double))` alone can land one off near perfect squares
    * once the double rounds, and the mix weights below must be
    * engine-portable integers, not float approximations. The identical
    * CASE correction runs in the DuckDB oracle.
    */
  def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    when((s0 + 1) * (s0 + 1) <= n, s0 + 1)
      .when(s0 * s0 > n, s0 - 1)
      .otherwise(s0)
  }

  /** The matching DuckDB rendering of [[isqrt]] over SQL expression `e`
    * (which must be free of side effects — it is repeated).
    */
  def isqrtSqlDuck(e: String): String = {
    val s0 = s"CAST(floor(sqrt(CAST(($e) AS DOUBLE))) AS BIGINT)"
    s"(CASE WHEN ($s0 + 1) * ($s0 + 1) <= ($e) THEN $s0 + 1 " +
      s"WHEN $s0 * $s0 > ($e) THEN $s0 - 1 ELSE $s0 END)"
  }

  /** Temperature-scaled mixing (the multilingual-training mix of
    * Devlin et al. 2019 / Conneau et al. 2020: sample stratum i with
    * probability ∝ n_i^α, α < 1 flattening the head so low-resource
    * strata are not drowned) at the exact-integer point α = ½ — weights
    * are integer square roots of the per-stratum token counts, so the
    * whole mix plan stays reproducible and oracle-gateable (a float
    * n^0.7 is neither). Output per stratum:
    * `mix_permille` (the temperature-flattened target share of the
    * budget) and `rate_permille` (the per-stratum keep rate that hits
    * that share, capped at 1000 — a stratum whose flattened share
    * exceeds what it holds keeps everything; upsampling is the
    * training loader's job, not the curation filter's).
    *
    * Scale shape: one partial-aggregated shuffle down to ≤|strata| rows,
    * then a single-row total joined back by broadcast — the corpus is
    * touched once and never exchanged on a content key. The rates feed
    * [[stratifiedSample]] exactly like [[mixWeights]]' budget caps.
    */
  def temperatureMixWeights(df: DataFrame, strataCol: String, weight: Column,
      tokenBudget: Long): DataFrame = {
    val per = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(weight.cast("long")).as("n_tokens"))
      .withColumn("w_sqrt", isqrt(col("n_tokens")))
    val total = per.agg(sum("w_sqrt").as("w_total"))
    per.crossJoin(broadcast(total))
      .withColumn("mix_permille", expr("w_sqrt * 1000 div w_total"))
      .withColumn("rate_permille",
        least(lit(1000L),
          expr(s"(${tokenBudget}L * w_sqrt div w_total) * 1000 div n_tokens")))
      .drop("w_total")
  }

  /** Epoch plan: how many (milli-)epochs of each source a training run
    * consumes to hit `tokenBudget` at the given temperature mix — the
    * scheduling table a 100 T-token run is provisioned from (sources
    * smaller than their mix share repeat: epochs > 1000‰; cf. the
    * repeated-epochs accounting in Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"). Pure integer arithmetic over
    * [[temperatureMixWeights]]'s per-source table: target tokens =
    * budget·mix‰/1000, epochs_permille = target·1000 div n_tokens.
    * Output adds `target_tokens` and `epochs_permille` to the mix table.
    */
  def epochPlan(df: DataFrame, strataCol: String, weight: Column,
      tokenBudget: Long): DataFrame =
    temperatureMixWeights(df, strataCol, weight, tokenBudget)
      .withColumn("target_tokens",
        expr(s"${tokenBudget}L * mix_permille div 1000"))
      .withColumn("epochs_permille",
        expr("target_tokens * 1000 div n_tokens"))

  /** CURRICULUM schedule panel: partition the corpus into quality-score
    * PHASES at the declared ascending `cuts` (phase 0 = below cuts(0),
    * phase i = [cuts(i-1), cuts(i)), last phase = at-or-above the top
    * cut) and report each phase's doc/token mass and observed score
    * range — the provisioning table of quality-curriculum training
    * (anneal from the broad low phases to the high-quality tail late in
    * the run: the data-ordering recipe of the phase-annealed pretraining
    * runs, e.g. MiniCPM's decay-phase quality upshift). The phase
    * boundaries are DECLARED, not quantiles, so two snapshots' panels
    * compare phase-for-phase; empty phases emit n=0 rows (a missing
    * quality band is exactly what the panel exists to surface).
    *
    * Scale shape: ONE partial-agg pass keyed by the ≤|cuts|+1-valued
    * phase id, plus a phases-sized scaffold left-join — nothing
    * corpus-sized crosses partitions, no window anywhere. NULL scores
    * are excluded (an unscored doc cannot be scheduled); feed a scored
    * corpus. Output: (phase, cut_lo, cut_hi, n_docs, n_tokens,
    * score_min, score_max) — cut_lo/cut_hi NULL at the open ends.
    */
  def curriculumPhases(docs: DataFrame, score: Column, tokens: Column,
      cuts: Seq[Long]): DataFrame = {
    require(cuts.nonEmpty, "need at least one phase cut")
    require(cuts == cuts.sorted && cuts.distinct == cuts,
      s"cuts must be strictly ascending, got $cuts")
    val spark = docs.sparkSession
    // fold ascending so the HIGHEST cut lands outermost: the built CASE
    // checks s >= cuts.last first, then descends
    val phaseExpr = cuts.zipWithIndex
      .foldLeft(lit(0L)) { case (els, (c, i)) =>
        when(col("_sc") >= c, lit((i + 1).toLong)).otherwise(els)
      }
    val counts = docs
      .select(score.cast("long").as("_sc"), tokens.cast("long").as("_tk"))
      .filter(col("_sc").isNotNull)
      .withColumn("phase", phaseExpr)
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("_tk"), lit(0L)).as("n_tokens"),
        min("_sc").as("score_min"), max("_sc").as("score_max"))
    val bounds = (Seq(Option.empty[Long]) ++ cuts.map(Some(_))).zip(
      cuts.map(Some(_)) ++ Seq(Option.empty[Long]))
    val scaffold = spark.createDataFrame(
      bounds.zipWithIndex.map { case ((lo, hi), i) =>
        (i.toLong, lo.map(Long.box).orNull, hi.map(Long.box).orNull)
      }).toDF("phase", "cut_lo", "cut_hi")
    scaffold.join(counts, Seq("phase"), "left")
      .select(col("phase"), col("cut_lo"), col("cut_hi"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("score_min"), col("score_max"))
  }

  /** Source-reputation filter: a document survives iff its SOURCE's mean
    * lexical-diversity score clears `minSrcPermille` — the domain-level
    * quality gate (a page on a content-farm domain is dropped for the
    * company it keeps, not its own text; cf. the URL/domain-level
    * filtering stage in Penedo et al. 2024, FineWeb). Two stages: the
    * per-doc integer score aggregates to a per-source mean (one tiny
    * partial-agg shuffle), and the source table re-attaches by BROADCAST
    * — the corpus itself never exchanges.
    *
    * Score: distinct tokens ×1000 div tokens (integer per-mille lexical
    * diversity). Output: surviving docs with doc_score and src_score.
    */
  def sourceReputationFilter(docs: DataFrame, idCol: String,
      textCol: String, srcCol: String, minSrcPermille: Long): DataFrame = {
    val scored = docs.select(col(idCol), col(srcCol),
      expr(s"size(array_distinct(split($textCol, ' '))) * 1000 div " +
        s"size(split($textCol, ' '))").cast("long").as("doc_score"))
    val bySrc = scored.groupBy(srcCol)
      .agg(expr("sum(doc_score) div count(1)").as("src_score"))
      .filter(col("src_score") >= minSrcPermille)
    scored.join(broadcast(bySrc), Seq(srcCol))
      .select(col(idCol), col(srcCol), col("doc_score"), col("src_score"))
  }

  /** Greedy quality-ordered selection under a token budget: walk the
    * corpus in (score DESC, doc id ASC) order and keep every document
    * whose INCLUSIVE running token total still fits `tokenBudget` — the
    * "best docs first until the budget is spent" selection step that
    * follows any scoring stage (quality filtering, DSIR, fluency).
    *
    * Scale shape — deliberately NOT a global-sort window (a bare
    * `ORDER BY` window serializes the corpus through one task): the
    * cumulative sum is split into (a) a per-score-bucket token total
    * (one partial-agg shuffle down to ≤ |distinct scores| rows — integer
    * per-mille scores bound this at 1001), (b) an exclusive prefix sum
    * over that TINY table (single-partition window over ≤ 1001 rows —
    * the Q11 bounded-global-threshold idiom), re-attached by BROADCAST,
    * and (c) a within-score cumulative sum windowed PARTITION BY score —
    * each partition is one score stratum, never the corpus. A doc's
    * global inclusive cum = prefix(score) + within-stratum cum.
    *
    * Worst-case stratum = all docs sharing one score; with coarse scores
    * pre-bucket the id into the score key if a stratum outgrows a task.
    *
    * Output: the selected rows only — (id, score, n_tokens, cum_tokens)
    * with `cum_tokens` the global inclusive running total (≤ budget).
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, score: Column,
      tokens: Column, tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 0, s"tokenBudget must be >= 0, got $tokenBudget")
    val scored = docs.select(col(idCol).as("_id"),
      score.cast("long").as("score"), tokens.cast("long").as("n_tokens"))
    val perScore = scored.groupBy("score")
      .agg(sum("n_tokens").as("_bucket_tokens"))
    val wPfx = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pfx = perScore
      .withColumn("_pfx_tokens",
        coalesce(sum("_bucket_tokens").over(wPfx), lit(0L)))
      .select("score", "_pfx_tokens")
    val wIn = Window.partitionBy("score").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .join(broadcast(pfx), Seq("score"))
      .withColumn("cum_tokens", col("_pfx_tokens") + sum("n_tokens").over(wIn))
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col("_id").as(idCol), col("score"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Hashed n-gram feature buckets — one row per (doc_id, bucket) feature
    * OCCURRENCE (multiplicity kept, unlike the dedup shingle postings):
    * every unigram and every bigram of the whitespace tokenization,
    * hashed with the [[Dedup.tokenHash]] idiom into `numBuckets` buckets.
    * The DSIR feature space (Xie et al. 2023 use hashed unigram+bigram
    * counts for exactly this).
    */
  private def featureBuckets(docs: DataFrame, idCol: String,
      textCol: String, numBuckets: Int): DataFrame = {
    // widen below the split so the md5-per-feature map stage runs at
    // session parallelism even from a single-file scan (the Dedup
    // explode-head rationale)
    val toks = graft.llm.Dedup.widen(
      docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks")))
    val grams = toks.select(col("doc_id"), explode(concat(
      col("_toks"),
      when(size(col("_toks")) >= 2,
        expr("transform(sequence(1, size(_toks) - 1), " +
             "i -> concat_ws(' ', slice(_toks, i, 2)))"))
        .otherwise(array()))).as("f"))
    grams.select(col("doc_id"),
      // coalesce OUTSIDE the pmod (f is explode() of split/concat_ws
      // output — never null, so the fallback is unreachable): Pmod is
      // unconditionally nullable, so only an outermost coalesce makes
      // the bucket non-nullable and stops the inner-join-on-b constraint
      // from double-evaluating the md5 chain per feature occurrence
      // (the r18 plan showed the full md5→conv→pmod chain in BOTH a
      // pushed-down isnotnull Filter and the Project, guide §4.4 shape)
      coalesce(pmod(graft.llm.Dedup.tokenHash(col("f")),
        lit(numBuckets.toLong)), lit(0L)).as("b"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * every raw-corpus doc by how much its hashed-n-gram profile looks
    * like a small TARGET corpus (the quality/domain reference) relative
    * to the raw distribution. Per bucket b the add-one-smoothed count
    * ratio in integer per-million — `r_b = (q_b+1)·1000000 div (p_b+1)`
    * with p/q the raw / target bucket counts — and a doc's weight is the
    * sum of `r_b` over its feature occurrences. The paper sums
    * log-density-ratios; this is the engine's exact-integer surrogate:
    * the density normalization `(P+B)/(Q+B)` is constant across buckets,
    * so dropping it rescales every weight by the same factor and
    * preserves the selection order, while keeping every product well
    * under int64 at any corpus size (the bound is q_b ≤ 2⁶³/10⁶ per
    * bucket). Monotone per bucket, reproducible, oracle-gateable — where
    * float logs are none of those. High-weight docs are target-like; feed
    * the weights to [[exactKPerStratum]]-style top-k or threshold
    * selection for the resampling step.
    *
    * Scale shape: the raw corpus is scanned twice (count pass + score
    * pass) but NEVER exchanges on a feature key — both bucket-count
    * tables partial-aggregate down to ≤ `numBuckets` rows, the ratio
    * table (≤ B rows) BROADCASTS into the scoring scan, and the only
    * corpus-sized shuffle is the final doc-keyed partial-agg sum. No
    * corpus-sized intermediate is materialized: at 100 TB both passes are
    * embarrassingly parallel map stages over the text column.
    *
    * Output: one row per corpus doc — (doc_id, n_feats, weight,
    * weight_per_feat). `weight` is the raw sum (length-rewarding — a
    * long doc accumulates more feature mass); `weight_per_feat` is the
    * per-occurrence mean, the length-invariant form to threshold or
    * rank on.
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int = 4096): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val p = featureBuckets(corpus, idCol, textCol, numBuckets)
      .groupBy("b").agg(count(lit(1)).as("pc"))
    val q = featureBuckets(target, idCol, textCol, numBuckets)
      .groupBy("b").agg(count(lit(1)).as("qc"))
    val ratio = p
      .join(q, Seq("b"), "left")
      .select(col("b"),
        expr("(coalesce(qc, 0L) + 1) * 1000000 div (pc + 1)").as("r"))
    featureBuckets(corpus, idCol, textCol, numBuckets)
      .join(broadcast(ratio), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("r").as("weight"))
      .withColumn("weight_per_feat", expr("weight div n_feats"))
  }
}
