package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus: TF-IDF and BM25 top-k —
  * the "find the training docs most relevant to this probe/benchmark
  * query" primitive behind targeted decontamination, dataset audit
  * queries, and retrieval-based curation.
  *
  * Scale shape (both scorers share it):
  *  - The corpus is touched once to build the (doc, term, tf) inverted
  *    index — one explode + one partial-aggregated shuffle, the same
  *    budget as [[TextAnalysis.repetitionProfile]].
  *  - The query side is small by construction (a probe set, not a second
  *    corpus), so per-(query, term) weights — IDF joined onto query
  *    terms — collapse to a tiny frame that BROADCASTS into the postings
  *    scan. The corpus-sized tf stream is filtered map-side to matching
  *    terms only; nothing corpus-sized ever exchanges on the term key.
  *  - Scoring aggregates on (query, doc) with map-side combine; the
  *    top-k rank filter compiles to WindowGroupLimit, so each map task
  *    pre-limits to k rows per query BEFORE the exchange.
  *
  * [[tfidfTopK]] is all-integer (IDF in per-mille by integer division) —
  * exact, reproducible, and DuckDB-oracle-gateable. [[bm25TopK]] is the
  * real BM25 (Robertson/Sparck Jones; k1/b saturation needs floats) with
  * the identical plan shape; its correctness is spec-proven against an
  * independent in-memory fold.
  */
object Retrieval {

  /** Inverted index: one row per (doc_id, term) with its in-doc count.
    * Whitespace tokens ([[TextAnalysis.tokens]]); empty docs contribute
    * nothing.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary, top-k by global occurrence count (ties broken by
    * the term itself): the tokenizer-fit / corpus-audit primitive.
    * Output: (term, n_occurrences, n_docs). One partial-agg shuffle on
    * the term; the orderBy+limit plans as TakeOrderedAndProject — each
    * task keeps its own top-k, only k·tasks rows ever reach the driver
    * merge, never the full term table.
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term"))
      .limit(k)
  }

  /** Per-document out-of-vocabulary rate under the top-`k` corpus
    * vocabulary (the [[vocabulary]] selection: occurrence-count order,
    * ties by term): for each doc, its token count, how many of those
    * token OCCURRENCES fall outside the vocabulary, and the integer
    * per-mille OOV rate — the coverage audit run before freezing a
    * tokenizer/vocab size (a rising OOV rate is the signal to grow `k`
    * or retrain).
    *
    * Scale shape: the vocabulary is k-bounded whatever the corpus
    * (TakeOrdered, never a global sort of the full term table) and
    * re-attaches by BROADCAST left join onto the exploded token stream;
    * the only corpus-sized exchange is the final doc-keyed partial-agg
    * count, which map-side-combines to ≤ one row per doc per task.
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val vocab = vocabulary(docs, idCol, textCol, k)
      .select(col("term"), lit(1L).as("_in_vocab"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_permille", expr("n_oov * 1000 div n_tokens"))
  }

  /** Distinct (query_id, term) rows of the query set — the small side. */
  private def queryTerms(queries: DataFrame, idCol: String, textCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))

  /** Integer TF-IDF top-k: for each query doc, the `k` corpus docs with
    * the highest Σ_t tf(d,t) · idf_permille(t) over the query's terms,
    * IDF-per-mille = N·1000 div df, ties broken by doc_id. `maxDf > 0`
    * drops query terms in more than that many corpus docs (the stopword
    * guard — saves the broadcast from carrying weights that contribute
    * ~nothing and match ~everything). Output: (query_id, doc_id, score,
    * rnk).
    */
  def tfidfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, maxDf: Long = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // the postings feed both the df-count branch and the scoring join —
    // materialize once (the Jaccard-pipeline rationale)
    val tf = graft.util.Materialize.stable(termFrequencies(corpus, idCol, textCol))
    val dfreq0 = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dfreq = if (maxDf > 0) dfreq0.filter(col("df") <= maxDf) else dfreq0
    // corpus doc count as a broadcast 1-row frame (watermark idiom) —
    // cheap against the materialized postings, no driver-side action
    val nDf = tf.select(countDistinct(col("doc_id")).as("n"))
    val qidf = queryTerms(queries, idCol, textCol)
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDf))
      .withColumn("idf_permille", expr("n * 1000 div df"))
      .select("query_id", "term", "idf_permille")
    val scored = tf
      .join(broadcast(qidf), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("tf * idf_permille")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("query_id", "doc_id", "score", "rnk")
  }

  /** BM25 top-k (k1/b defaults per Robertson et al.): same plan shape as
    * [[tfidfTopK]] — broadcast per-(query, term) IDF, one corpus postings
    * pass, WindowGroupLimit top-k — with the standard saturation
    * term-weighting. Output: (query_id, doc_id, score, rnk); `score` is a
    * double (BM25 is inherently real-valued), so this operator is
    * spec-gated rather than hash-oracle-gated.
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDf: Long = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = graft.util.Materialize.stable(termFrequencies(corpus, idCol, textCol))
    // per-doc lengths + the global (N, avgdl) pair, broadcast as 1 row
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val dfreq0 = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dfreq = if (maxDf > 0) dfreq0.filter(col("df") <= maxDf) else dfreq0
    val qidf = queryTerms(queries, idCol, textCol)
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      // Robertson-Sparck Jones IDF with the +1 floor (Lucene's form):
      // ln((N - df + 0.5)/(df + 0.5) + 1) — never negative
      .withColumn("idf",
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .select("query_id", "term", "idf", "avgdl")
    val scored = tf
      .join(dl, Seq("doc_id"))
      .join(broadcast(qidf), Seq("term"))
      .withColumn("w",
        col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(sum("w").as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("query_id", "doc_id", "score", "rnk")
  }

  /** Integer BM25 top-k: [[bm25TopK]]'s saturation weighting carried out
    * entirely in per-mille integer arithmetic — k1/b as per-mille ints,
    * the doc-length ratio as `dl·N·1000 div T` (N docs, T total tokens,
    * both exact), the saturation factor as
    * `tf·(k1‰+1000)·1000 div (tf·1000 + k1‰·(1000−b‰+b‰·dlr div 1000) div 1000)`,
    * and [[tfidfTopK]]'s integer IDF (`N·1000 div df`) in place of the
    * float log form. Exact, engine-reproducible, and hash-oracle-gated —
    * the same trick that makes TF-IDF and RRF gateable; the float
    * [[bm25TopK]] stays the production default where Lucene-parity
    * scores matter. Identical plan shape: broadcast per-(query, term)
    * weights, one postings pass, doc_id-keyed length join,
    * WindowGroupLimit top-k. Output: (query_id, doc_id, score, rnk).
    */
  def bm25iTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, k1Permille: Int = 1200, bPermille: Int = 750,
      maxDf: Long = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1Permille >= 0, s"k1Permille must be >= 0, got $k1Permille")
    require(bPermille >= 0 && bPermille <= 1000,
      s"bPermille must be in [0, 1000], got $bPermille")
    val tf = graft.util.Materialize.stable(termFrequencies(corpus, idCol, textCol))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N and total-token count as an exact integer 1-row broadcast (the
    // float variant's avg collapses to the (n, t) pair)
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("t"))
    val dfreq0 = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dfreq = if (maxDf > 0) dfreq0.filter(col("df") <= maxDf) else dfreq0
    val qidf = queryTerms(queries, idCol, textCol)
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_permille", expr("n * 1000 div df"))
      .select("query_id", "term", "idf_permille")
    val dlr = dl.crossJoin(broadcast(stats))
      .select(col("doc_id"), expr("dl * n * 1000 div t").as("dlr"))
    val scored = tf
      .join(dlr, Seq("doc_id"))
      .join(broadcast(qidf), Seq("term"))
      .withColumn("sat_permille", expr(
        s"(tf * ${k1Permille + 1000} * 1000) div " +
          s"(tf * 1000 + ($k1Permille * (${1000 - bPermille} + " +
          s"$bPermille * dlr div 1000) div 1000))"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("idf_permille * sat_permille")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("query_id", "doc_id", "score", "rnk")
  }

  /** Retrieval-effectiveness audit: SELF-RETRIEVAL MRR and hit@k —
    * each query is a known-relevant document's own leading
    * `queryTokens` tokens, and the metric is the rank at which the
    * retriever ([[bm25iTopK]]) returns that document. The standard
    * labeled-data-free IR sanity check: a retriever that cannot find a
    * doc from its own prefix has no business ranking anything else
    * (and the audit number is exactly comparable across index/tokenizer
    * changes). All-integer: per-query reciprocal rank is
    * `1e6 div rank`, MRR×1e6 is the integer mean over ALL queries —
    * zero-recall queries count in the denominator, so the mean is
    * honest.
    *
    * Scale shape: inherits [[bm25iTopK]]'s audited plan (one postings
    * pass, broadcast query weights, WindowGroupLimit top-k); the self
    * filter and rollup run on the Q·k-bounded result. Output one row:
    * (n_queries, hits_at_1, hits_at_k, mrr_x1e6).
    */
  def selfRetrievalAudit(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, queryTokens: Int, k: Int): DataFrame = {
    require(queryTokens >= 1, s"queryTokens must be >= 1, got $queryTokens")
    // dropDuplicates mirrors the oracle's SELECT DISTINCT: a duplicated
    // query id would otherwise inflate hits/_sum_rr (summed per result
    // row) while n_queries stays countDistinct
    val trunc = queries.select(col(idCol), concat_ws(" ",
      slice(split(col(textCol), " "), 1, queryTokens)).as(textCol))
      .dropDuplicates(idCol)
    val res = bm25iTopK(corpus, trunc, idCol, textCol, k)
    val nQ = trunc.agg(countDistinct(col(idCol)).as("n_queries"))
    val self = res.filter(col("doc_id") === col("query_id"))
      .agg(sum(when(col("rnk") === 1, 1L).otherwise(0L)).as("_h1"),
        count(lit(1)).as("_hk"),
        sum(expr("1000000 div rnk")).as("_sum_rr"))
    broadcast(nQ).crossJoin(self).select(col("n_queries"),
      coalesce(col("_h1"), lit(0L)).as("hits_at_1"),
      coalesce(col("_hk"), lit(0L)).as("hits_at_k"),
      // explicit zero-queries guard: `div 0` would yield NULL silently
      when(col("n_queries") === 0, lit(0L))
        .otherwise(expr("coalesce(_sum_rr, 0) div n_queries"))
        .as("mrr_x1e6"))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke, SIGIR 2009) — the hybrid
    * lexical+semantic retrieval standard: fuse any number of per-query
    * rankings (each `(query_id, doc_id, rnk)`-shaped — [[tfidfTopK]],
    * [[bm25TopK]], an ANN top-k) by `Σ_lists 10⁶ div (rrfK + rnk)`,
    * integer per-million so the fused gate stays hash-oracle-exact even
    * when an input ranking was float-scored (RRF consumes only RANKS —
    * its well-known robustness, and here also its exactness trick). A
    * doc absent from a list contributes 0 from it. Output:
    * (query_id, doc_id, rrf_score, rnk), top `k` per query.
    *
    * Scale shape: inputs are already top-k'd per query (bounded rows —
    * lists × Q × k), so the union + (query, doc)-keyed partial-agg sum
    * + WindowGroupLimit is bounded work regardless of corpus size; the
    * heavy lifting stays inside the input retrievers' audited plans.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    val scored = rankings
      .map(_.select(col("query_id"), col("doc_id"),
        expr(s"1000000 div ($rrfK + rnk)").as("_contrib")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id"))
    scored.groupBy("query_id", "doc_id").agg(sum("_contrib").as("rrf_score"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** RAG CONTEXT ASSEMBLY — the step between retrieval and the prompt:
    * per query, take the LONGEST RANK-ORDER PREFIX of the [[bm25iTopK]]
    * ranking whose cumulative token count fits `tokenBudget` (context
    * windows are budgeted in tokens, and relevance order is the packing
    * order — the standard "fill the context until it overflows" rule;
    * skip-and-continue bin packing belongs to [[Packing]], this is the
    * prompt-assembly cut). A doc longer than the remaining budget ends
    * the prefix even if a later, shorter doc would fit — that keeps the
    * context a CONTIGUOUS relevance prefix, which is what generation
    * quality wants and what makes the operation one windowed cumsum.
    *
    * Scale shape: the ranking is Q·k-bounded (the retriever's audited
    * plan did the heavy lifting); the token-length attach joins the
    * BROADCAST ranking against one corpus projection (`doc_id`,
    * codegen'd [[TextAnalysis.tokenCount]]) so the corpus is touched
    * once map-side and never shuffles; the per-query cumsum windows
    * over ≤ k rows. Output: (query_id, doc_id, rnk, score, doc_tokens,
    * cum_tokens) for the surviving prefix.
    */
  def contextPack(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, tokenBudget: Long,
      k1Permille: Int = 1200, bPermille: Int = 750): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val topk = bm25iTopK(corpus, queries, idCol, textCol, k,
      k1Permille, bPermille)
    val lens = corpus.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).as("doc_tokens"))
    val w = Window.partitionBy("query_id").orderBy("rnk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a NULL-text doc has no length to budget — excluded BEFORE the
    // cumsum (a windowed sum skips NULLs, which would pack it "free")
    lens.filter(col("doc_tokens").isNotNull)
      .join(broadcast(topk), Seq("doc_id"))
      .withColumn("cum_tokens", sum("doc_tokens").over(w))
      .filter(col("cum_tokens") <= tokenBudget)
      .select("query_id", "doc_id", "rnk", "score", "doc_tokens",
        "cum_tokens")
  }

  final case class Reranked(query_id: Long, doc_id: Long, score: Double)

  /** Cross-encoder reranking seam — the final RAG-stack stage after
    * retrieve ([[tfidfTopK]]/ANN) and fuse ([[rrfFuse]]): score each
    * (query text, candidate text) PAIR with a model and re-rank. The
    * model itself is external (a cross-encoder has no closed form); what
    * the engine owns — and what this ships, [[graft.llm.Multimodal]]'s
    * seam discipline — is the distributed plumbing: candidates join
    * their texts by key, pairs flow through `mapPartitions` so one model
    * session per PARTITION amortizes across its pairs (never
    * per-row init), and the output re-ranks deterministically
    * (score desc, doc_id). Input work is bounded upstream: candidates
    * arrive top-k'd per query, so the model only ever sees Q·k pairs.
    * Stub scorer: deterministic token-overlap ratio.
    */
  def rerankBatched(spark: org.apache.spark.sql.SparkSession,
      candidates: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, k: Int,
      scoreOne: (String, String) => Double = stubCrossScore): DataFrame = {
    import spark.implicits._
    require(k > 0, s"k must be positive, got $k")
    val qt = queries.select(col(idCol).cast("long").as("query_id"),
      col(textCol).as("_qtext"))
    val ct = corpus.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("_dtext"))
    val scored = candidates
      .select(col("query_id").cast("long"), col("doc_id").cast("long"))
      .join(broadcast(qt), Seq("query_id"))
      .join(ct, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("_qtext"), col("_dtext"))
      .as[(Long, Long, String, String)]
      .mapPartitions { rows =>
        // per-partition model init amortizes here (the seam contract)
        rows.map { case (q, d, qt0, dt0) => Reranked(q, d, scoreOne(qt0, dt0)) }
      }
      .toDF()
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Deterministic fake cross-encoder: |query ∩ doc| / |query| over
    * whitespace tokens — a monotone relevance proxy the specs can reason
    * about exactly.
    */
  /** MMR diversified re-ranking (Carbonell & Goldstein 1998, "The Use of
    * MMR, Diversity-Based Reranking"): greedily select `k` of each
    * query's candidates maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — relevance traded
    * against redundancy with what's already picked. The selection is
    * inherently sequential in k, so the k rounds are UNROLLED into the
    * plan (k is a small constant — this is a top-of-funnel diversifier,
    * not a scan): each round is one anti-join (drop selected), one
    * equi-join onto the candidate-pair similarities restricted to the
    * selected set (max-aggregated), and one rank-1 window — every stage
    * keyed by qid, all candidate sets bounded by the upstream retriever's
    * top-C, so per-round work is O(Q·C) rows regardless of corpus size.
    *
    * `cands`: (qid, cid, rel); `pairSims`: (qid, cid_a, cid_b, sim) over
    * each query's candidate set. λ in per-mille; the MMR score is
    * `(λ·rel − (1000−λ)·max_sim) / 1000.0` — the identical double
    * expression the DuckDB oracle evaluates. Ties to the smaller cid.
    * Output: (qid, cid, pick, rel), pick = selection order 1..k.
    */
  def mmrRerank(cands: DataFrame, pairSims: DataFrame, k: Int,
      lambdaPermille: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      s"lambdaPermille must be in 0..1000, got $lambdaPermille")
    val c = graft.util.Materialize.stable(
      cands.select(col("qid"), col("cid"), col("rel")))
    val ps = graft.util.Materialize.stable(
      pairSims.select(col("qid"), col("cid_a"), col("cid_b"), col("sim")))
    val relW = Window.partitionBy("qid").orderBy(col("rel").desc, col("cid"))
    // Each round reads the previous round's `selected` TWICE (anti-join
    // + max-sim restriction), so leaving it as a lazy plan doubles the
    // tree per round — exponential in k at compile time (measured: 7–11 s
    // at k=5 where the data is 500 rows). Materializing per round
    // truncates the lineage: k tiny cached frames (≤ Q·r rows), linear
    // plan growth.
    var selected = graft.util.Materialize.stable(
      c.withColumn("rn", row_number().over(relW))
        .filter(col("rn") === 1).drop("rn")
        .withColumn("pick", lit(1)))
    for (r <- 2 to k) {
      val rem = c.join(selected.select("qid", "cid"), Seq("qid", "cid"), "left_anti")
      val maxSim = ps
        .join(selected.select(col("qid"), col("cid").as("cid_b")), Seq("qid", "cid_b"))
        .groupBy(col("qid"), col("cid_a").as("cid"))
        .agg(max("sim").as("max_sim"))
      val mmrW = Window.partitionBy("qid").orderBy(col("mmr").desc, col("cid"))
      // left join: a candidate with no recorded similarity to any selected
      // doc is maximally diverse — MMR convention sim = 0, not silent drop
      val next = rem.join(maxSim, Seq("qid", "cid"), "left")
        .withColumn("max_sim", coalesce(col("max_sim"), lit(0.0)))
        .withColumn("mmr", expr(
          s"($lambdaPermille * rel - ${1000 - lambdaPermille} * max_sim) / 1000.0"))
        .withColumn("rn", row_number().over(mmrW))
        .filter(col("rn") === 1)
        .select(col("qid"), col("cid"), col("rel"))
        .withColumn("pick", lit(r))
      selected = graft.util.Materialize.stable(selected.unionByName(next))
    }
    selected.select("qid", "cid", "pick", "rel")
  }

  /** The DuckDB rendering of [[mmrRerank]]'s unrolled rounds, generated
    * from the SAME k and λ so the two engines cannot drift. `candsCte` /
    * `pairsCte` name CTEs (defined by the caller's `withCtes` prefix)
    * exposing (qid, cid, rel) and (qid, cid_a, cid_b, sim).
    */
  def mmrSqlDuck(candsCte: String, pairsCte: String, k: Int,
      lambdaPermille: Int, withCtes: String): String = {
    val rounds = (2 to k).map { r =>
      s"""rem$r AS (SELECT c.* FROM $candsCte c LEFT JOIN selall${r - 1} s
         |    ON c.qid = s.qid AND c.cid = s.cid WHERE s.cid IS NULL),
         |ms$r AS (SELECT r.qid, r.cid, r.rel, coalesce(m.max_sim, 0) AS max_sim
         |  FROM rem$r r LEFT JOIN (SELECT p.qid, p.cid_a, max(p.sim) AS max_sim
         |    FROM $pairsCte p JOIN selall${r - 1} s ON s.qid = p.qid AND s.cid = p.cid_b
         |    GROUP BY p.qid, p.cid_a) m ON m.qid = r.qid AND m.cid_a = r.cid),
         |sel$r AS (SELECT qid, cid, rel, $r AS pick FROM
         |  (SELECT qid, cid, rel, row_number() OVER (PARTITION BY qid ORDER BY
         |     ($lambdaPermille * rel - ${1000 - lambdaPermille} * max_sim) / 1000.0 DESC,
         |     cid) AS rn FROM ms$r) WHERE rn = 1),
         |selall$r AS (SELECT * FROM selall${r - 1} UNION ALL SELECT * FROM sel$r)"""
        .stripMargin.replace("\n", " ")
    } match {
      // mkString(start, sep, end) on an EMPTY seq still emits the start —
      // a trailing comma before the final SELECT at k = 1
      case rs if rs.isEmpty => ""
      case rs               => rs.mkString(", ", ", ", "")
    }
    s"""WITH ${withCtes}sel1 AS (SELECT qid, cid, rel, 1 AS pick FROM
       |  (SELECT qid, cid, rel, row_number() OVER (PARTITION BY qid
       |     ORDER BY rel DESC, cid) AS rn FROM $candsCte) WHERE rn = 1),
       |selall1 AS (SELECT * FROM sel1)$rounds
       |SELECT qid, cid, pick, rel FROM selall$k""".stripMargin.replace("\n", " ")
  }

  def stubCrossScore(query: String, doc: String): Double = {
    val q = query.split(" ").filter(_.nonEmpty).toSet
    if (q.isEmpty) 0.0
    else {
      val d = doc.split(" ").filter(_.nonEmpty).toSet
      q.intersect(d).size.toDouble / q.size
    }
  }

  /** Non-trivial [[rerankBatched]] scorer: the payloads are comma-joined
    * quantized embedding vectors (opaque to the seam, exactly as model
    * input tensors would be); the "forward pass" parses them and computes
    * the exact-int64 cosine `dot / (√nq·√nc)` — deterministic, and the
    * identical IEEE sequence the DuckDB oracle's closed form evaluates
    * (gated as `rerank_cross_topk`).
    */
  def intCosineScore(query: String, doc: String): Double = {
    val q = query.split(',')
    val d = doc.split(',')
    var dot = 0L; var nq = 0L; var nc = 0L
    var i = 0
    while (i < q.length && i < d.length) {
      val qi = q(i).toLong; val di = d(i).toLong
      dot += qi * di; nq += qi * qi; nc += di * di
      i += 1
    }
    if (nq == 0L || nc == 0L) 0.0
    else dot.toDouble / (math.sqrt(nq.toDouble) * math.sqrt(nc.toDouble))
  }
}
