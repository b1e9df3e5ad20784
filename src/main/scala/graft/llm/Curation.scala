package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation pipeline — the published pretraining
  * recipe (C4/Gopher/Dolma order) as one composition of this package's
  * operators: quality filter → exact dedup (canonical doc survives) →
  * train/eval decontamination → per-source token-budget downsampling.
  * Plus the per-source health report a curation run is judged by.
  *
  * Everything stays declarative: each stage is the already-audited plan
  * shape of its operator; the only driver-side data is the per-source
  * rate table (bounded by the number of sources, not corpus size).
  */
object Curation {

  /** Snapshot delta — the incremental-ingest primitive: classify every
    * document id across two corpus snapshots as `added` (only in the
    * new), `removed` (only in the old), `changed` (both, content hash
    * differs) or `unchanged`. Content identity is md5 of the text — the
    * same canonical-content key the exact-dedup family uses — so "change"
    * means byte change, never a formatting-dependent equality test over
    * long strings shipped through the join.
    *
    * Scale shape: both snapshots reduce to (id, 16-byte hash) in their
    * scan (map-only, columns pruned to id + text), then ONE full-outer
    * sort-merge join on the id key. At 100 TB the join carries ~24
    * bytes/doc, not the corpus; with both snapshots bucketed by id on
    * write the exchange disappears entirely. Downstream consumers filter
    * `status <> 'unchanged'` to get the delta to re-process — which is
    * the whole point: re-curate the delta, not the corpus.
    */
  def snapshotDelta(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // NULL text hashes to a sentinel, not SQL NULL: a null hash is
    // indistinguishable from "row absent" in the outer join (and a
    // null<->text transition would fall through != to 'unchanged')
    def h(c: Column) = coalesce(md5(c), lit("<null>"))
    val o = oldSnap.select(col(idCol).as("doc_id"), h(col(textCol)).as("old_hash"))
    val n = newSnap.select(col(idCol).as("doc_id"), h(col(textCol)).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")))
  }

  /** Second-generation curation composition — the round-8 stage stack as
    * ONE recipe: Gopher document rules → paragraph-level first-occurrence
    * dedup → exact dedup on the post-paragraph text → temperature-α=½
    * per-source token budgeting with deterministic hash sampling. Each
    * stage is the already-gated operator; this composes them end to end
    * (the `corpus_curated` discipline, second recipe).
    *
    * `stopWords` parameterizes Gopher's stopword-presence rule — the
    * paper's list is English-specific config, not algorithm.
    *
    * Scale shape = the sum of its stages' audited shapes; the only new
    * plumbing is the per-source rate table joined back by broadcast
    * (bounded by |sources|) and a deterministic per-doc hash filter —
    * no driver-side data at all (unlike [[curate]]'s collected rate map).
    * Output: (doc_id, groupCol, n_paras, n_kept, text_hash).
    */
  def curateV2(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, tokenBudget: Long,
      stopWords: Seq[String] = QualityRules.GopherStopWords,
      sep: String = "\n\n"): DataFrame = {
    val ok = QualityRules.gopherQuality(docs, idCol, textCol, stopWords)
      .filter(col("passes_gopher")).select("doc_id")
    // stratum key normalized to a non-null string (the curate() rule):
    // a NULL group would silently drop its docs at the inner rate join
    val kept = docs
      .select(col(idCol).as("doc_id"),
        coalesce(col(groupCol).cast("string"), lit("\u0000null")).as("_grp"),
        col(textCol).as("_txt"))
      .join(ok, Seq("doc_id"))
    val para = Dedup.paragraphDedup(
      kept.select(col("doc_id"), col("_txt")), "doc_id", "_txt", sep)
    val uniq = graft.util.Materialize.stable(
      Dedup.firstOccurrences(
        para.join(kept.select(col("doc_id"), col("_grp")), Seq("doc_id")),
        "doc_id", "text_kept"))
    val rates = Sampling.temperatureMixWeights(uniq, "_grp",
      TextAnalysis.tokenCount(col("text_kept")), tokenBudget)
      .select(col("_grp"), col("rate_permille"))
    uniq.join(broadcast(rates), Seq("_grp"))
      .filter(Sampling.hashPermille(col("doc_id")) < col("rate_permille"))
      .select(col("doc_id"), col("_grp").as(groupCol), col("n_paras"),
        col("n_kept"), md5(col("text_kept")).as("text_hash"))
  }

  /** Third-generation composed pipeline — the round-9 selection stages
    * chained end to end: domain reputation gate
    * ([[Sampling.sourceReputationFilter]]: a doc dies with its source's
    * mean) → Gopher quality rules → exact dedup (first occurrence by id)
    * → greedy token-budget selection
    * ([[Sampling.tokenBudgetSelect]]: best lexical-diversity docs first
    * until the budget is spent). Demonstrates the tranche COMPOSES: the
    * budget selection's cumulative order is computed over exactly the
    * survivors of the three filters.
    *
    * Scale shape = the sum of its stages' audited shapes: broadcast
    * per-source table, codegen'd rules, one md5-keyed exchange for the
    * dedup, and the decomposed (never global-sort) cumulative sum.
    * Output: (doc_id, source, score, n_tokens, cum_tokens, text_hash).
    */
  def curateV3(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, minSrcPermille: Long, tokenBudget: Long,
      stopWords: Seq[String] = QualityRules.GopherStopWords): DataFrame = {
    val reput = Sampling.sourceReputationFilter(docs, idCol, textCol,
      srcCol, minSrcPermille).select(col(idCol))
    val qualified = docs.join(reput, Seq(idCol))
    val ok = QualityRules.gopherQuality(qualified, idCol, textCol, stopWords)
      .filter(col("passes_gopher")).select("doc_id")
    val kept = qualified
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        col(textCol).as("_txt"))
      .join(ok, Seq("doc_id"))
    // three plan branches read `uniq` (the budget selection's prefix
    // table, its main scan, and the final re-attach join) — materialize
    // once, the curateV2 multi-branch discipline
    val uniq = graft.util.Materialize.stable(
      Dedup.firstOccurrences(kept, "doc_id", "_txt"))
    val sel = Sampling.tokenBudgetSelect(uniq, "doc_id",
      expr("size(array_distinct(split(_txt, ' '))) * 1000 div " +
        "size(split(_txt, ' '))"),
      TextAnalysis.tokenCount(col("_txt")), tokenBudget)
    sel.join(uniq.select(col("doc_id"), col("source"),
        md5(col("_txt")).as("text_hash")), Seq("doc_id"))
      .select("doc_id", "source", "score", "n_tokens", "cum_tokens",
        "text_hash")
  }

  /** Fourth-generation composed pipeline — the END-TO-END training-set
    * assembly: domain reputation gate → eval-set DECONTAMINATION
    * ([[Decontam.decontaminate]]: drop docs whose n-gram containment of
    * the eval suite reaches the threshold) → Gopher quality rules →
    * exact dedup (first occurrence by id) → greedy token-budget
    * selection → next-fit-decreasing SEQUENCE PACKING
    * ([[Packing.packGreedyDecreasing]]: the selected docs land in
    * per-source bins of ≤ `binBudget` tokens, long docs first). The
    * stages every release pipeline runs between "raw crawl" and
    * "training shards", proven to compose against ONE assembled oracle
    * — the budget order is computed over exactly the survivors of the
    * three filters, and the bin assignment over exactly the budget's
    * selections.
    *
    * Scale shape = the sum of its stages' audited shapes: broadcast
    * per-source table, broadcast eval grams (the corpus never exchanges
    * on the gram key), codegen'd rules, one md5-keyed exchange for the
    * dedup, the decomposed cumulative sum, and packing's one group-keyed
    * shuffle + partition-local fold.
    * Output: (doc_id, source, n_tokens, bin_idx, text_hash).
    */
  def curateV4(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, srcCol: String, minSrcPermille: Long,
      tokenBudget: Long, binBudget: Long, decontamN: Int,
      minHitPermille: Int, maxGramEvalDf: Long,
      stopWords: Seq[String] = QualityRules.GopherStopWords): DataFrame = {
    val reput = Sampling.sourceReputationFilter(corpus, idCol, textCol,
      srcCol, minSrcPermille).select(col(idCol))
    val qualified = corpus.join(reput, Seq(idCol))
    val clean = Decontam.decontaminate(qualified, evalSet, idCol, textCol,
      decontamN, minHitPermille, maxGramEvalDf)
    val ok = QualityRules.gopherQuality(clean, idCol, textCol, stopWords)
      .filter(col("passes_gopher")).select("doc_id")
    val kept = clean
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        col(textCol).as("_txt"))
      .join(ok, Seq("doc_id"))
    val uniq = graft.util.Materialize.stable(
      Dedup.firstOccurrences(kept, "doc_id", "_txt"))
    val sel = Sampling.tokenBudgetSelect(uniq, "doc_id",
      expr("size(array_distinct(split(_txt, ' '))) * 1000 div " +
        "size(split(_txt, ' '))"),
      TextAnalysis.tokenCount(col("_txt")), tokenBudget)
    val chosen = graft.util.Materialize.stable(
      sel.select("doc_id", "n_tokens")
        .join(uniq.select(col("doc_id"), col("source"),
          md5(col("_txt")).as("text_hash")), Seq("doc_id")))
    Packing.packGreedyDecreasing(chosen, "doc_id", "source",
        col("n_tokens"), binBudget)
      .select(col("doc_id"), col("grp").as("source"), col("n_tokens"),
        col("bin_idx"))
      .join(chosen.select("doc_id", "text_hash"), Seq("doc_id"))
  }

  /** Fifth-generation composed pipeline — [[curateV4]] with the LEARNED
    * quality tier spliced in (the FineWeb-Edu / DCLM stage): domain
    * reputation gate → eval-set decontamination → Gopher rules →
    * CLASSIFIER threshold filter ([[QualityRules.classifierScores]]
    * through the mapPartitions seam; docs scoring below
    * `minScorePermille` die here) → exact dedup
    * ([[Dedup.firstOccurrences]]) → greedy token-budget selection →
    * next-fit-decreasing packing. Proves the model seam COMPOSES: the
    * dedup/budget/packing stages run over exactly the classifier's
    * survivors, against one assembled oracle.
    *
    * Scale shape = [[curateV4]]'s audited shapes plus one
    * embarrassingly-parallel map stage for the scores (per-partition
    * model init, no exchange of its own — the filter rides the scored
    * rows). Output: (doc_id, source, n_tokens, bin_idx, text_hash).
    */
  def curateV5(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, srcCol: String, minSrcPermille: Long,
      minScorePermille: Long, tokenBudget: Long, binBudget: Long,
      decontamN: Int, minHitPermille: Int, maxGramEvalDf: Long,
      stopWords: Seq[String] = QualityRules.GopherStopWords,
      mkScorer: () => String => Long =
        () => QualityRules.stubEduScore): DataFrame = {
    val st = v5Stages(corpus, evalSet, idCol, textCol, srcCol,
      minSrcPermille, minScorePermille, tokenBudget, decontamN,
      minHitPermille, maxGramEvalDf, stopWords, mkScorer,
      materializeStages = false)
    val chosen = graft.util.Materialize.stable(
      st.sel.select("doc_id", "n_tokens")
        .join(st.uniq.select(col("doc_id"), col("source"),
          md5(col("_txt")).as("text_hash")), Seq("doc_id")))
    Packing.packGreedyDecreasing(chosen, "doc_id", "source",
        col("n_tokens"), binBudget)
      .select(col("doc_id"), col("grp").as("source"), col("n_tokens"),
        col("bin_idx"))
      .join(chosen.select("doc_id", "text_hash"), Seq("doc_id"))
  }

  /** The v5 assembly's intermediate stage frames, in pipeline order.
    * `_txt`-bearing frames carry (doc_id, source, _txt).
    */
  private[llm] final case class V5Stages(qualified: DataFrame,
      clean: DataFrame, kept: DataFrame, keptClassified: DataFrame,
      uniq: DataFrame, sel: DataFrame)

  /** ONE recipe for the v5 stage chain — reputation gate → eval-set
    * decontamination → Gopher rules → classifier threshold → exact
    * dedup → token-budget selection — consumed by BOTH [[curateV5]]
    * (which appends packing) and [[curationFunnel]] (which counts each
    * frame), mirroring the oracle side's shared `curatedStageCtes`. The
    * twin hazard this kills: an edit to one copy of the chain (say,
    * reordering classifier vs dedup) that missed the other would keep
    * both gates individually green while the funnel silently audited a
    * DIFFERENT pipeline than the one shipping data.
    *
    * `materializeStages` is the funnel's knob: the funnel consumes
    * every frame twice (its own count + the next stage), so it
    * materializes each once; the recipe consumes each frame once and
    * keeps the chain lazy (`uniq` is the exception — two consumers in
    * both callers).
    */
  private def v5Stages(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, srcCol: String, minSrcPermille: Long,
      minScorePermille: Long, tokenBudget: Long, decontamN: Int,
      minHitPermille: Int, maxGramEvalDf: Long, stopWords: Seq[String],
      mkScorer: () => String => Long,
      materializeStages: Boolean): V5Stages = {
    def m(df: DataFrame): DataFrame =
      if (materializeStages) graft.util.Materialize.stable(df) else df
    val reput = Sampling.sourceReputationFilter(corpus, idCol, textCol,
      srcCol, minSrcPermille).select(col(idCol))
    val qualified = m(corpus.join(reput, Seq(idCol)))
    val clean = m(Decontam.decontaminate(qualified, evalSet, idCol, textCol,
      decontamN, minHitPermille, maxGramEvalDf))
    val ok = QualityRules.gopherQuality(clean, idCol, textCol, stopWords)
      .filter(col("passes_gopher")).select("doc_id")
    val kept = m(clean
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        col(textCol).as("_txt"))
      .join(ok, Seq("doc_id")))
    // the learned tier: score through the per-partition model seam,
    // keep only docs at or above the declared operating point (the
    // threshold a real pipeline reads off operatingPoints)
    val passing = QualityRules
      .classifierScoresInit(corpus.sparkSession, kept, "doc_id", "_txt",
        mkScorer)
      .filter(col("score_permille") >= minScorePermille)
      .select("doc_id")
    val keptClassified = m(kept.join(passing, Seq("doc_id")))
    val uniq = graft.util.Materialize.stable(
      Dedup.firstOccurrences(keptClassified, "doc_id", "_txt"))
    val sel = Sampling.tokenBudgetSelect(uniq, "doc_id",
      expr("size(array_distinct(split(_txt, ' '))) * 1000 div " +
        "size(split(_txt, ' '))"),
      TextAnalysis.tokenCount(col("_txt")), tokenBudget)
    V5Stages(qualified, clean, kept, keptClassified, uniq, sel)
  }

  /** Stage-by-stage survivor FUNNEL of the [[curateV5]] assembly — the
    * per-stage loss attribution a curation operator asks for first
    * ("where did my corpus go"): one row per stage (raw → reputation →
    * decontam → gopher → classifier → dedup → budget) with surviving
    * doc and token counts. Runs the SAME stage operators as the recipe
    * (and its oracle reads the same CTE chain as the recipe's), so the
    * funnel can never drift from the pipeline it audits.
    *
    * Scale shape: each stage frame is materialized once (two
    * consumers: its own count and the next stage) and each count is a
    * single partial agg — the funnel adds seven 1-row aggregations to
    * the recipe's own audited shapes, nothing corpus-sized beyond
    * them. Output: (stage_idx, stage, n_docs, n_tokens).
    */
  def curationFunnel(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, srcCol: String, minSrcPermille: Long,
      minScorePermille: Long, tokenBudget: Long,
      decontamN: Int, minHitPermille: Int, maxGramEvalDf: Long,
      stopWords: Seq[String] = QualityRules.GopherStopWords,
      mkScorer: () => String => Long =
        () => QualityRules.stubEduScore): DataFrame = {
    def stage(idx: Int, name: String, df: DataFrame, tok: Column): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(tok), lit(0L)).as("n_tokens"))
        .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    val tokTxt = TextAnalysis.tokenCount(col("_txt"))
    val raw = corpus.select(col(textCol).as("_txt"))
    val st = v5Stages(corpus, evalSet, idCol, textCol, srcCol,
      minSrcPermille, minScorePermille, tokenBudget, decontamN,
      minHitPermille, maxGramEvalDf, stopWords, mkScorer,
      materializeStages = true)
    stage(0, "raw", raw, tokTxt)
      .unionByName(stage(1, "reputation",
        st.qualified.select(col(textCol).as("_txt")), tokTxt))
      .unionByName(stage(2, "decontam",
        st.clean.select(col(textCol).as("_txt")), tokTxt))
      .unionByName(stage(3, "gopher", st.kept, tokTxt))
      .unionByName(stage(4, "classifier", st.keptClassified, tokTxt))
      .unionByName(stage(5, "dedup", st.uniq, tokTxt))
      .unionByName(stage(6, "budget", st.sel, col("n_tokens")))
  }

  /** Per-source corpus health: doc/token totals, docs passing the
    * quality filter, and exact-duplicate (non-canonical) copies.
    * Output: (source, n_docs, n_tokens, n_kept, n_dup).
    *
    * Scale shape: the quality profile's two keyed exchanges, one
    * md5-groupBy for canonicals (the [[Dedup]] exact-dup key), and one
    * per-source partial agg — all map-side combined; the hash join back
    * to docs is on the dup key with bounded fan-out (group size = copy
    * count).
    */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, minTokens: Long, maxTokens: Long,
      minUniqPermille: Long, maxTopTokPermille: Long): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(groupCol).as("source"), md5(col(textCol)).as("_hash"))
    // canonical = [[Dedup.exactDuplicates]]' single-shuffle min-id rule —
    // shared so the report's n_dup can never drift from the dedup gates
    val canon = Dedup.exactDuplicates(docs, idCol, textCol)
      .select(col("text_hash").as("_hash"), col("canonical_id").as("_canonical"))
    val qf = TextAnalysis.qualityFilter(docs, idCol, textCol,
      minTokens, maxTokens, minUniqPermille, maxTopTokPermille)
      .select(col("doc_id"), col("n_tokens"), col("keep"))
    base.join(canon, Seq("_hash"))
      .withColumn("_is_dup", col("doc_id") =!= col("_canonical"))
      .join(qf, Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum(col("keep").cast("long")).as("n_kept"),
        sum(col("_is_dup").cast("long")).as("n_dup"))
  }

  /** The curated corpus: quality-kept, exact-deduplicated (smallest id
    * per text survives), decontaminated against `evalSet` at
    * `minHitPermille` 3-gram containment, then rate-downsampled toward
    * `tokenBudgetPerSource` tokens per source (rates from
    * [[Sampling.mixWeights]], applied content-hash-deterministically —
    * the budget holds in EXPECTATION, since per-doc hash selection
    * cannot weigh token counts; an exact cap would need the packing
    * fold). `groupCol` may be any type; a NULL stratum is budgeted like
    * any other. All input columns preserved. `scrubPii = true` runs
    * [[PiiScrub.scrubbed]] FIRST, so quality/dedup/decontam all see the
    * scrubbed text — the same stage order [[StreamingCuration]] applies
    * per batch (docs differing only in scrubbed identifiers dedup
    * together).
    *
    * The clean frame feeds both the rates aggregation and the returned
    * sample plan, so it is materialized once — otherwise the whole
    * quality→dedup→decontam subtree would execute twice.
    *
    * `normalizeText = true` canonicalizes the text
    * ([[TextAnalysis.normalize]]) after any scrub and before every
    * downstream stage, so case/punctuation variants exact-dedup
    * together and grams are canonical.
    *
    * Two opt-in stages wire the model-based scorers into the recipe,
    * both judged against `evalSet` in its clean-reference role:
    * `minFluencyPermille > 0` drops docs whose
    * [[TextAnalysis.lmFluency]] score (bigram LM trained on `evalSet`)
    * falls below the threshold — the CCNet LM-filter slot, applied with
    * the quality gates (docs with no bigrams score 0 and drop);
    * `minDsirPerFeat > 0` keeps only docs whose
    * [[Sampling.importanceWeights]] per-feature mean (target =
    * `evalSet`) reaches the threshold — the DSIR targeted-selection
    * slot, applied after decontamination, before the budget.
    */
  def curate(docs0: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, groupCol: String, minTokens: Long, maxTokens: Long,
      minUniqPermille: Long, maxTopTokPermille: Long, decontamN: Int,
      minHitPermille: Int, tokenBudgetPerSource: Long,
      scrubPii: Boolean = false, minFluencyPermille: Long = 0L,
      minDsirPerFeat: Long = 0L, normalizeText: Boolean = false): DataFrame = {
    // scrub BEFORE normalize: normalization strips the @/./- structure
    // the PII patterns match on, so the reverse order would let broken
    // identifiers through as plain tokens. Scrubbed placeholders then
    // normalize to ordinary tokens ("[EMAIL]" -> "email"), which is what
    // dedup/grams should see anyway.
    val docs1 = if (scrubPii) PiiScrub.scrubbed(docs0, textCol) else docs0
    val docs =
      if (normalizeText)
        docs1.withColumn(textCol, TextAnalysis.normalize(col(textCol)))
      else docs1
    val keptIds = TextAnalysis.qualityFilter(docs, idCol, textCol,
      minTokens, maxTokens, minUniqPermille, maxTopTokPermille)
      .filter(col("keep")).select(col("doc_id").as(idCol))
    // when a model stage is on, its input frame feeds BOTH the scorer
    // subtree and the re-join — materialize it once (the clean-frame
    // rationale below) so the quality/decontam subtrees don't execute
    // twice under AQE's concurrent branch launch
    val kept0 =
      if (minFluencyPermille > 0)
        graft.util.Materialize.stable(docs.join(keptIds, Seq(idCol)))
      else docs.join(keptIds, Seq(idCol))
    val kept =
      if (minFluencyPermille <= 0) kept0
      else kept0.join(
        TextAnalysis.lmFluency(kept0, evalSet, idCol, textCol)
          .filter(col("score_permille") >= minFluencyPermille)
          .select(col("doc_id").as(idCol)),
        Seq(idCol))
    val canonIds = Dedup.exactDuplicates(kept, idCol, textCol)
      .select(col("canonical_id").as(idCol))
    val deduped = kept.join(canonIds, Seq(idCol))
    val decon0 = Decontam.decontaminate(deduped, evalSet, idCol, textCol,
      decontamN, minHitPermille)
    val decon =
      if (minDsirPerFeat > 0) graft.util.Materialize.stable(decon0) else decon0
    val selected =
      if (minDsirPerFeat <= 0) decon
      else decon.join(
        Sampling.importanceWeights(decon, evalSet, idCol, textCol)
          .filter(col("weight_per_feat") >= minDsirPerFeat)
          .select(col("doc_id").as(idCol)),
        Seq(idCol))
    // stratum key normalized to a non-null string so the rate lookup is
    // total: NULL group values get their own budgeted stratum instead of
    // silently falling through to the keep-everything default
    val nullKey = "\u0000null"
    val clean = graft.util.Materialize.stable(
      selected.withColumn("_stratum",
        coalesce(col(groupCol).cast("string"), lit(nullKey))))
    // bounded control data: one rate row per source
    val rates = Sampling.mixWeights(clean, "_stratum",
      TextAnalysis.tokenCount(col(textCol)), tokenBudgetPerSource)
      .select(col("_stratum"), col("rate_permille"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    Sampling.stratifiedSample(clean, idCol, "_stratum", rates,
      defaultPermille = 1000)
      .drop("_stratum")
  }
}
