package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share word
  * n-grams with a benchmark/eval set, so contaminated docs can be dropped
  * (or down-weighted) before training. This is the published overlap
  * method (GPT-3 appendix C; PaLM §8 uses the same shape with n=8..13):
  * a doc is contaminated when any of its n-grams also occurs in any eval
  * doc; the n-gram width is the precision knob.
  *
  * Scale shape (the reason this is engine-shaped and not a bolt-on):
  *  - The corpus side is the 100 TB side; it is touched exactly once by
  *    the same distinct-(doc, gram-hash) explode the dedup family uses
  *    ([[Dedup.shingleHashPostings]] — 8-byte hashes, codegen'd md5, no
  *    UDFs).
  *  - The eval side is small by construction (benchmarks are MBs, not
  *    TBs), so the overlap join BROADCASTS the eval gram set: the corpus
  *    gram stream is filtered map-side and the only shuffle is the final
  *    per-doc count aggregation — nothing corpus-sized ever exchanges on
  *    the gram key.
  *  - `maxGramEvalDf` drops grams present in more than that many eval
  *    docs (boilerplate headers, license lines) — the standard guard that
  *    keeps one stopword-ish gram from matching half the corpus.
  */
object Decontam {

  /** Per-corpus-doc overlap report against `evalSet`. Only contaminated
    * docs appear (inner-join semantics — at 100 TB the interesting output
    * is the hit list, not an all-docs left join; callers wanting the
    * clean set anti-join on `doc_id`). Columns:
    *   doc_id      corpus doc
    *   n_hits      distinct contaminated n-gram hashes in the doc
    *   n_eval_docs distinct eval docs sharing ≥1 gram with it
    *   n_grams     the doc's distinct n-gram count (overlap denominator)
    *   hit_permille n_hits·1000 div n_grams — the containment score the
    *               drop/keep threshold is applied to
    */
  def overlapReport(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, maxGramEvalDf: Long = 0): DataFrame = {
    val corp = Dedup.shingleHashPostings(corpus, idCol, textCol, n)
    val ev0 = Dedup.shingleHashPostings(evalSet, idCol, textCol, n)
      .withColumnRenamed("doc_id", "eval_id")
    val ev =
      if (maxGramEvalDf <= 0) ev0
      else {
        val hot = ev0.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxGramEvalDf).select("h")
        ev0.join(hot, Seq("h"), "left_anti")
      }
    // ONE corpus pass, NOTHING cached: left-join the broadcast eval
    // grams onto the postings stream and compute the overlap numerator,
    // the eval-doc spread, and the denominator in a single per-doc
    // aggregate (the multi-distinct Expand triples the narrow
    // (doc_id, h, eval_id) stream map-side — far cheaper than the old
    // shape's second corpus scan + corpus-sized MEMORY_AND_DISK cache +
    // doc_id re-join, and there is no cache handle left to leak in a
    // long-lived session)
    corp.join(broadcast(ev), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        countDistinct(when(col("eval_id").isNotNull, col("h"))).as("n_hits"),
        countDistinct(col("eval_id")).as("n_eval_docs"),
        countDistinct(col("h")).as("n_grams"))
      .filter(col("n_hits") > 0)
      .withColumn("hit_permille", expr("n_hits * 1000 div n_grams"))
      .select("doc_id", "n_hits", "n_eval_docs", "n_grams", "hit_permille")
  }

  /** Multi-eval contamination matrix: one row per (corpus doc, eval
    * set) with ≥1 shared n-gram — the "which benchmark leaks into which
    * doc" report a release pipeline runs once over ALL its eval suites
    * instead of once per suite. `setCol` labels each eval doc's suite.
    *
    * Scale shape: the corpus postings are computed ONCE and materialized
    * (they feed the per-set hit join AND the per-doc denominator — the
    * [[Dedup]] postings discipline); the eval side reduces to a
    * broadcast distinct (set, gram) table with the per-SET
    * `maxGramEvalDf` boilerplate cap, so adding an eval suite adds
    * broadcast rows, never a corpus scan. The corpus never exchanges on
    * the gram key.
    */
  def overlapMatrix(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, setCol: String, n: Int,
      maxGramEvalDf: Long = 0): DataFrame = {
    val corp = graft.util.Materialize.stable(
      Dedup.shingleHashPostings(corpus, idCol, textCol, n))
    // per-set distinct grams: postings keyed by eval doc, set re-attached
    // from the (eval_id → set) map, then the per-set df cap
    val evPost = Dedup.shingleHashPostings(evalSet, idCol, textCol, n)
      .withColumnRenamed("doc_id", "eval_id")
      .join(broadcast(evalSet.select(col(idCol).as("eval_id"),
        col(setCol).as("eval_set")).distinct()), Seq("eval_id"))
    val evGrams0 = evPost.select("eval_set", "h").distinct()
    val evGrams =
      if (maxGramEvalDf <= 0) evGrams0
      else {
        val hot = evPost.groupBy("eval_set", "h")
          .agg(countDistinct("eval_id").as("df"))
          .filter(col("df") > maxGramEvalDf).select("eval_set", "h")
        evGrams0.join(hot, Seq("eval_set", "h"), "left_anti")
      }
    val hits = corp.join(broadcast(evGrams), Seq("h"))
      .groupBy(col("doc_id"), col("eval_set"))
      .agg(countDistinct("h").as("n_hits"))
    val sizes = corp.groupBy("doc_id").agg(countDistinct("h").as("n_grams"))
    hits.join(sizes, Seq("doc_id"))
      .withColumn("hit_permille", expr("n_hits * 1000 div n_grams"))
      .select("doc_id", "eval_set", "n_hits", "n_grams", "hit_permille")
  }

  /** Surgical decontamination — trim the contaminated SPAN out of each
    * training doc instead of dropping the doc (the C4-style remedy when
    * contamination is a quoted benchmark snippet inside an otherwise
    * clean document): positional corpus n-gram windows that appear in
    * the eval set bound the affected token range [first_hit, last_hit +
    * n − 1], which is cut out exactly like [[Dedup.trimDupSpans]] cuts
    * duplicated spans. Docs the trim empties are dropped; clean docs
    * pass through untouched. `maxGramEvalDf` drops boilerplate grams
    * carried by more than that many eval docs (the [[overlapReport]]
    * cap) so ubiquitous phrases don't shred the corpus.
    *
    * HULL SEMANTICS — deliberately conservative: the cut is the single
    * convex hull [min first_hit, max last_hit + n − 1] over ALL hits,
    * not per-span islands. A doc quoting two small eval snippets near
    * its start and end therefore loses the clean middle too. That is
    * the safe default for decontamination (anything between two leaks
    * is suspect context); callers who need island/gap precision should
    * run [[Dedup.trimDupSpans]]'s shape over the hit positions instead.
    *
    * Scale shape: the positional-window map stage + ONE broadcast
    * left-semi membership join (eval grams are MBs) + a per-doc min/max
    * partial agg — the corpus never exchanges on the gram key; the only
    * doc-keyed exchange attaches the two span bounds back to the text.
    * The positional window hash and the eval shingle hash are the SAME
    * `tokenHash(concat_ws(' ', window))`, so membership is exact.
    */
  /** Distinct eval-set gram hashes, minus grams carried by more than
    * `maxGramEvalDf` eval docs (0 = keep all) — the broadcast membership
    * set both trim variants probe.
    */
  private def evalGramSet(evalSet: DataFrame, idCol: String, textCol: String,
      n: Int, maxGramEvalDf: Long): DataFrame = {
    val ev0 = Dedup.shingleHashPostings(evalSet, idCol, textCol, n)
    if (maxGramEvalDf <= 0) ev0.select("h").distinct()
    else {
      val hot = ev0.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxGramEvalDf).select("h")
      ev0.select("h").distinct().join(hot, Seq("h"), "left_anti")
    }
  }

  /** Bloom pre-filter + audit for the overlap join: the eval gram set
    * compressed to an m-bit filter ([[graft.sketch.Bloom]]) probes the
    * corpus gram stream BEFORE any join — the shape for when even the
    * distinct eval/prior-corpus hash set outgrows a comfortable raw
    * broadcast (the filter is a fixed ≤ 512 KiB whatever the key count;
    * 10⁹ grams broadcast raw is 8 GB). A doc is a CANDIDATE iff any of
    * its grams passes the filter; no false negatives means the exact
    * overlap join downstream can run on candidates only. Per `groupCol`
    * the audit reports candidates next to the exact contaminated count —
    * the admitted-FP price, the [[graft.sketch.Bloom]] gate discipline.
    *
    * Output: (group, n_docs, n_candidates, n_contaminated, n_false_pos)
    * over docs long enough to have an n-gram.
    */
  def bloomPrefilterAudit(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int, groupCol: String,
      mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    import graft.sketch.Bloom
    val corp = Dedup.shingleHashPostings(corpus, idCol, textCol, n)
    val ev = evalGramSet(evalSet, idCol, textCol, n, maxGramEvalDf = 0)
    val words = Bloom.collectWords(
      Bloom.buildWords(ev, col("h"), mBits, k), mBits)
    val perDoc = corp
      .withColumn("_cand", Bloom.mightContain(words, mBits, k, col("h")))
      .join(broadcast(ev.withColumn("_in_eval", lit(1))), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(max(when(col("_cand"), 1).otherwise(0)).as("_is_cand"),
        max(when(col("_in_eval") === 1, 1).otherwise(0)).as("_is_cont"))
    corpus.select(col(idCol).cast("long").as("doc_id"), col(groupCol))
      .join(perDoc, Seq("doc_id"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("_is_cand").as("n_candidates"),
        sum("_is_cont").as("n_contaminated"))
      .withColumn("n_false_pos", col("n_candidates") - col("n_contaminated"))
  }

  def trimContaminated(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, maxGramEvalDf: Long = 0): DataFrame = {
    val evGrams = evalGramSet(evalSet, idCol, textCol, n, maxGramEvalDf)
    val pos = Dedup.positionalWindowHashes(corpus, idCol, textCol, n)
      .select(col("doc_id"), (col("pos") + 1).as("start"), col("h"))
    val bounds = pos.join(broadcast(evGrams), Seq("h"), "left_semi")
      .groupBy("doc_id")
      .agg(min("start").as("first_hit"), max("start").as("last_hit"))
      .select(col("doc_id").as(idCol), col("first_hit"), col("last_hit"))
    corpus.join(bounds, Seq(idCol), "left")
      .withColumn("_toks", split(col(textCol), " "))
      .withColumn(textCol,
        when(col("first_hit").isNull, col(textCol)).otherwise(concat_ws(" ",
          concat(
            expr("slice(_toks, 1, first_hit - 1)"),
            expr(s"slice(_toks, last_hit + $n, " +
              s"greatest(0, size(_toks) - (last_hit + ${n - 1})))")))))
      .filter(col("first_hit").isNull || length(col(textCol)) > 0)
      .drop("_toks", "first_hit", "last_hit")
  }

  /** Per-SPAN surgical decontamination — the island/gap upgrade over
    * [[trimContaminated]]'s hull: contaminated n-gram windows are merged
    * into islands (two hits merge when the next window starts within
    * `mergeGap` tokens of the previous window's end) and ONLY the island
    * spans are cut, so a doc quoting two small eval snippets near its
    * start and end keeps its clean middle. Gaps-and-islands is the
    * classic window construction: a break flag per hit (start further
    * than `n + mergeGap` past the previous hit's start), a running sum
    * numbering the islands, min/max per island → span list per doc, and
    * one higher-order-function pass drops tokens inside any span.
    *
    * Scale shape: same as the hull variant (positional windows + ONE
    * broadcast semi join; the corpus never exchanges on the gram key)
    * plus a doc-keyed window over HIT rows only — bounded by hits per
    * doc, not doc length — and the span list rides a per-doc array
    * (quote counts, not corpus-sized state).
    */
  def trimContaminatedSpans(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int, maxGramEvalDf: Long = 0,
      mergeGap: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(mergeGap >= 0, s"mergeGap must be >= 0, got $mergeGap")
    val evGrams = evalGramSet(evalSet, idCol, textCol, n, maxGramEvalDf)
    val hits = Dedup.positionalWindowHashes(corpus, idCol, textCol, n)
      .select(col("doc_id"), (col("pos") + 1).as("start"), col("h"))
      .join(broadcast(evGrams), Seq("h"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("start")
    val prev = lag("start", 1).over(w)
    val spans = hits
      .withColumn("_brk",
        when(prev.isNull || col("start") > prev + (n + mergeGap), 1L).otherwise(0L))
      .withColumn("_isl", sum("_brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("_isl"))
      .agg(min("start").as("s"), (max("start") + (n - 1)).as("e"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("_spans"))
      .withColumnRenamed("doc_id", idCol)
    corpus.join(spans, Seq(idCol), "left")
      .withColumn("_toks", split(col(textCol), " "))
      .withColumn(textCol,
        when(col("_spans").isNull, col(textCol)).otherwise(concat_ws(" ",
          expr("transform(filter(transform(_toks, (t, i) -> " +
            "struct(t AS t, i + 1 AS p)), x -> NOT exists(_spans, " +
            "sp -> x.p >= sp.s AND x.p <= sp.e)), x -> x.t)"))))
      .filter(col("_spans").isNull || length(col(textCol)) > 0)
      .drop("_toks", "_spans")
  }

  /** The EVAL-side contamination view — per benchmark doc, how much of
    * it leaks into the training corpus (the table an eval-integrity
    * report actually publishes): distinct leaked grams, distinct
    * training docs carrying any of them, and leaked-gram containment in
    * per-mille of the eval doc's grams. An eval doc with
    * `leak_permille` near 1000 is effectively memorizable from train.
    * Inner-join semantics like [[overlapReport]] (clean eval docs are
    * the anti-join complement). Same scale shape mirrored: the EVAL
    * side is the small one, so its postings broadcast and the
    * corpus-sized stream never exchanges on the gram key.
    * Output: (eval_id, n_leaked, n_train_docs, n_grams, leak_permille).
    */
  def evalContaminationReport(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corp = Dedup.shingleHashPostings(corpus, idCol, textCol, n)
    // eval postings are MB-scale by construction: recomputing them for
    // the size branch is cheaper than pinning a cache no one releases
    val ev = Dedup.shingleHashPostings(evalSet, idCol, textCol, n)
      .withColumnRenamed("doc_id", "eval_id")
    val sizes = ev.groupBy("eval_id").agg(count(lit(1)).as("n_grams"))
    val hits = corp.join(broadcast(ev), Seq("h"))
      .groupBy("eval_id")
      .agg(countDistinct(col("h")).as("n_leaked"),
        countDistinct(col("doc_id")).as("n_train_docs"))
    hits.join(sizes, Seq("eval_id"))
      .withColumn("leak_permille", expr("n_leaked * 1000 div n_grams"))
      .select("eval_id", "n_leaked", "n_train_docs", "n_grams", "leak_permille")
  }

  /** The clean corpus: drop every doc `overlapReport` flags at or above
    * `minHitPermille` containment. One broadcast-filtered pass + one
    * anti-join keyed on doc id.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, minHitPermille: Int,
      maxGramEvalDf: Long = 0): DataFrame = {
    val flagged = overlapReport(corpus, evalSet, idCol, textCol, n, maxGramEvalDf)
      .filter(col("hit_permille") >= minHitPermille)
      .select(col("doc_id").as(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination — the embedding-space leg the n-gram
    * overlap methods structurally miss: a paraphrased or translated
    * benchmark item shares no 3-grams with its training-set twin but
    * sits next to it in embedding space. Flag every corpus vector whose
    * cosine against ANY eval vector reaches `threshold` (the method of
    * the Phi / "rephrased samples ruin benchmarks" contamination
    * studies — embedding-similarity contamination detection).
    *
    * Output: one row per FLAGGED corpus vector — (`vec_id`,
    * `n_eval_hits` = how many eval vectors it clears the threshold
    * against, `max_cos` = the strongest match). Unflagged vectors are
    * absent (the clean side is the anti-join, [[decontaminateSemantic]]).
    *
    * Scale shape (the token-decontam contract transplanted to vectors):
    * the eval side is small BY CONSTRUCTION (benchmarks are thousands
    * of items, not billions), so it BROADCASTS — the corpus side is
    * touched exactly once by a pure map stage (quantize → codegen'd
    * int64 dot per eval vector → threshold filter), and the per-vector
    * rollup's partial aggregate collapses map-side (all of a corpus
    * row's candidates are born on its own partition), so the ONLY
    * exchange carries one register-sized row per flagged id. Nothing
    * corpus-sized crosses partitions; for an eval set too large to
    * broadcast, block with [[Similarity.lshMultiTableTopK]]'s multi-table
    * buckets first — same verify leg, candidate-bounded.
    *
    * Exactness: quantized int64 dot ([[Similarity.dotQ]], exact) and the
    * cross-engine-identical `dot / (√na·√nb)` double sequence
    * ([[Similarity.cosineFromInts]]), so the oracle reproduces every
    * comparison bit-for-bit.
    */
  def embeddingOverlapReport(corpusEmb: DataFrame, evalEmb: DataFrame,
      threshold: Double): DataFrame = {
    val c = Dedup.widen(corpusEmb)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("nv", Similarity.dotQ("qv", "qv"))
    val e = evalEmb
      .select(col("vec_id").as("eval_id"),
        Similarity.quantize(col("embedding")).as("ev"))
      .withColumn("ne", Similarity.dotQ("ev", "ev"))
    c.crossJoin(broadcast(e))
      .withColumn("cos_sim",
        Similarity.cosineFromInts(Similarity.dotQ("qv", "ev"),
          col("nv"), col("ne")))
      .filter(col("cos_sim") >= threshold)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_eval_hits"), max("cos_sim").as("max_cos"))
  }

  /** The semantically-clean corpus: drop every vector
    * [[embeddingOverlapReport]] flags. One broadcast map pass + one
    * id-keyed anti-join — the [[decontaminate]] shape on the embedding
    * column.
    */
  def decontaminateSemantic(corpusEmb: DataFrame, evalEmb: DataFrame,
      threshold: Double): DataFrame = {
    val flagged = embeddingOverlapReport(corpusEmb, evalEmb, threshold)
      .select("vec_id")
    corpusEmb.join(flagged, Seq("vec_id"), "left_anti")
  }
}
