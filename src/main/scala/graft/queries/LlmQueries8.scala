package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Decontam, Dedup, Retrieval, Sampling, Similarity, TextAnalysis}
import graft.ops.TableProfile

/** Eighth tranche (round 14): the embedding-space decontamination leg,
  * contrastive-triple mining, and RAG context assembly — the semantic
  * twin of the n-gram decontam family plus the two operators that sit
  * immediately downstream of the retrieval/ANN stack in a training
  * pipeline (mine the triples a two-tower model trains on; cut the
  * context a generator prompts with). Constants are shared fields
  * referenced by both the Spark plan and the rendered oracle.
  */
object LlmQueries8 {

  /** Cosine threshold for semantic contamination. The fixture
    * embeddings are uniform random (cross-split max cosine ≈ 0.43—0.51
    * across the SFs), so 0.30 is what yields a non-trivial flagged set;
    * a production run on real embeddings would sit at ~0.9+.
    */
  private val SemThreshold = 0.30

  /** Every 20th vector plays the eval set — register-sized by
    * construction at any SF (5% of the table), the broadcast contract.
    */
  private val EvalMod = 20

  private val AnchorMod = 25 // contrastive anchors: every 25th vector

  private val PackK = 10        // retriever depth feeding the packer
  private val PackBudget = 300L // context token budget (fixture docs run
  // ~60—100 tokens, so the cut binds mid-ranking — 3—5 of the 10
  // retrieved docs survive — at every SF)

  private val BalanceCentroids = 16 // the ann_ivf_topk geometry
  private val CapPerCell = 8        // diversity cap: ≤8 vectors per cell

  private val PhaseCuts = Seq(250L, 500L, 750L) // declared quality-phase
  // boundaries (integer per-mille score domain)

  private val MirrorIdOffset = 10000000L // the minted syndicated copy's
  // id offset (far above any fixture doc_id at every SF)

  private val EcdfCuts = Seq(334L, 667L) // rank-band curriculum cuts:
  // bottom / middle / top thirds of the score distribution

  /** The keep-best gates' shared scored corpus: fixture docs plus a
    * minted 'mirror0' syndicated copy of every doc (id-offset), so
    * every text is a real >=2-copy group decided by source score at
    * every SF.
    */
  private def keepBestCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("source"))
    base.unionByName(base.select(
        (col("doc_id") + MirrorIdOffset).as("doc_id"), col("text"),
        lit("mirror0").as("source")))
      .withColumn("src_score", Sampling.hashPermille(col("source")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Semantic decontamination report: corpus vectors whose cosine
    // against ANY eval vector reaches the threshold — the
    // embedding-space contamination n-gram overlap cannot see
    // (paraphrased/translated benchmark twins). Eval side broadcasts;
    // the corpus is touched once map-side.
    "decontam_embedding" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Decontam.embeddingOverlapReport(
        emb.filter(col("vec_id") % EvalMod =!= 0),
        emb.filter(col("vec_id") % EvalMod === 0),
        threshold = SemThreshold)
    }),

    // The semantically-clean corpus: the anti-join composition over the
    // same report (kept columns bounded: id + label).
    "decontam_embedding_clean" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Decontam.decontaminateSemantic(
        emb.filter(col("vec_id") % EvalMod =!= 0),
        emb.filter(col("vec_id") % EvalMod === 0),
        threshold = SemThreshold)
        .select("vec_id", "label")
    }),

    // Contrastive triple assembly: per anchor, the most-similar
    // same-label vector (positive), the most-similar different-label
    // vector (negative), and the triplet margin — the mining table a
    // two-tower/triplet-loss trainer consumes directly.
    "ann_contrastive_triples" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.contrastiveTriples(emb,
        emb.filter(col("vec_id") % AnchorMod === 0), "label")
    }),

    // RAG context assembly: per query, the longest rank-order prefix of
    // the int-BM25 top-10 whose cumulative token count fits the budget
    // — the retrieval-to-prompt cut.
    "rag_context_pack" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Retrieval.contextPack(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0" && col("doc_id") % 100 === 0),
        "doc_id", "text", k = PackK, tokenBudget = PackBudget)
    }),

    // Curation-aware exact dedup: within each duplicate group keep the
    // copy from the BEST-scored source (ties → lowest id) instead of
    // the first id — firstOccurrences' single-exchange max_by shape
    // with the quality signal in the ordering key. The fixture corpus
    // has no exact dups below sf0.1, so the gate unions a 'mirror0'
    // syndicated copy of every doc (id-offset) — every text is then a
    // real ≥2-copy group and the winner is decided by source score at
    // EVERY scale, not just where the generator happened to collide.
    "dedup_keep_best" -> ((s, dir) =>
      Dedup.bestOccurrences(keepBestCorpus(s, dir), "doc_id", "text",
        col("src_score"))
        .select("doc_id", "source", "src_score")),

    // Keep-best's register identity in-plan: per-group argmax survivors
    // MERGE (best-of(A ∪ B) == best-of(best-of A ∪ best-of B) per text
    // hash), so an ingest stream maintains the canonical set by
    // re-reducing each batch's winners against state — two doc_id-parity
    // legs of bestOccurrences re-reduced through the SAME operator,
    // oracle shared verbatim with dedup_keep_best.
    "dedup_keep_best_stream" -> ((s, dir) => {
      val docs = keepBestCorpus(s, dir)
      def leg(pred: org.apache.spark.sql.Column) =
        Dedup.bestOccurrences(docs.filter(pred), "doc_id", "text",
          col("src_score"))
      Dedup.bestOccurrences(
        leg(col("doc_id") % 2 === 0).unionByName(leg(col("doc_id") % 2 === 1)),
        "doc_id", "text", col("src_score"))
        .select("doc_id", "source", "src_score")
    }),

    // Cluster-balanced (diversity) selection: assign every vector its
    // IVF cell, then cap each cell at CapPerCell by the deterministic
    // hash priority — the DataComp-style "no cluster dominates the
    // training set" pruning, expressed as the composition of two
    // audited operators (broadcast-centroid assignment + per-stratum
    // WindowGroupLimit over cell-sized groups).
    "cluster_balanced_select" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.sampledCentroids(emb, BalanceCentroids)
      val assigned = Similarity.ivfAssign(emb, cents)
        .select(col("cid").as("vec_id"), col("cell"))
      Sampling.exactKPerStratum(assigned, "vec_id", "cell",
          k = CapPerCell)
        .select("cell", "vec_id", "rk")
    }),

    // Curriculum schedule panel: the classifier-scored corpus cut into
    // declared quality phases with per-phase doc/token mass — the
    // annealing-schedule provisioning table (broad phases early,
    // high-quality tail late).
    "curriculum_phases" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = graft.llm.QualityRules
        .classifierScores(s, docs, "doc_id", "text")
        .join(docs.select(col("doc_id"),
          graft.llm.TextAnalysis.tokenCount(col("text")).as("_tk")),
          "doc_id")
      Sampling.curriculumPhases(scored, col("score_permille"), col("_tk"),
        cuts = PhaseCuts)
    }),

    // The curriculum panel's register identity in-plan: per-batch phase
    // panels sum-merge (n_docs/n_tokens add, score ranges min/max, the
    // declared bounds ride along) — two doc_id-parity legs fold to the
    // ONE-PASS panel, oracle shared verbatim with curriculum_phases.
    "curriculum_phases_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def leg(pred: org.apache.spark.sql.Column) = {
        val part = docs.filter(pred)
        val scored = graft.llm.QualityRules
          .classifierScores(s, part, "doc_id", "text")
          .join(part.select(col("doc_id"),
            graft.llm.TextAnalysis.tokenCount(col("text")).as("_tk")),
            "doc_id")
        Sampling.curriculumPhases(scored, col("score_permille"),
          col("_tk"), cuts = PhaseCuts)
      }
      leg(col("doc_id") % 2 === 0).unionByName(leg(col("doc_id") % 2 === 1))
        .groupBy("phase", "cut_lo", "cut_hi")
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
          min("score_min").as("score_min"), max("score_max").as("score_max"))
    }),

    // Embedding drift between two snapshots: per label, the exact L1
    // distance of the per-dimension integer centroids — the encoder/
    // distribution drift monitor.
    "embedding_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.centroidDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "label")
    }),

    // ECDF rank-normalization table over the classifier scores: per
    // distinct score, its per-mille empirical-CDF rank — the scale-free
    // form heterogeneous quality scores are mixed/thresholded on.
    "quality_score_ecdf" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TableProfile.scoreEcdf(
        graft.llm.QualityRules.classifierScores(s, docs, "doc_id", "text"),
        col("score_permille"))
    }),

    // The FOURTH walk off the calibration registers, in-plan: two
    // doc_id-parity legs fold their per-score counts, the merged table
    // rides scoreEcdfFromCounts — oracle shared verbatim with
    // quality_score_ecdf (the register identity again).
    "quality_ecdf_stream" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def legCounts(pred: org.apache.spark.sql.Column) = graft.llm
        .QualityRules.classifierScores(s, docs.filter(pred), "doc_id", "text")
        .select(col("score_permille").as("score"))
        .filter(col("score").isNotNull)
        .groupBy("score").agg(count(lit(1)).as("n"))
      TableProfile.scoreEcdfFromCounts(
        legCounts(col("doc_id") % 2 === 0)
          .unionByName(legCounts(col("doc_id") % 2 === 1))
          .groupBy("score").agg(sum("n").as("n")))
    }),

    // The drift panel's register identity in-plan: each snapshot's
    // per-(label, dim) component sums fold across batches (sums and
    // counts ADD), and the merged registers ride the SAME
    // centroidDriftFromSums join the batch panel runs — two vec_id-mod
    // batch legs per snapshot, oracle shared verbatim with
    // embedding_drift.
    "embedding_drift_stream" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      def folded(snapPred: org.apache.spark.sql.Column) = {
        def leg(batchPred: org.apache.spark.sql.Column) =
          Similarity.centroidSums(emb.filter(snapPred && batchPred), "label")
        leg(col("vec_id") % 4 < 2).unionByName(leg(col("vec_id") % 4 >= 2))
          .groupBy("label", "_i")
          .agg(sum("_s").as("_s"), sum("_n").as("_n"))
      }
      Similarity.centroidDriftFromSums(
        folded(col("vec_id") % 2 === 0), folded(col("vec_id") % 2 === 1))
    }),

    // ECDF-derived curriculum: phase cuts as RANK bands (bottom/middle/
    // top thirds of the score distribution) instead of declared score
    // values — the scale-free curriculum that survives a score-model
    // swap. Fully in-plan: the ecdf table joins back on the score
    // column (a score-bounded broadcast), and the phase panel runs on
    // the rank.
    "curriculum_ecdf_phases" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = graft.llm.QualityRules
        .classifierScores(s, docs, "doc_id", "text")
        .join(docs.select(col("doc_id"),
          graft.llm.TextAnalysis.tokenCount(col("text")).as("_tk")),
          "doc_id")
      val ecdf = TableProfile.scoreEcdf(scored, col("score_permille"))
        .select(col("score").as("score_permille"), col("ecdf_permille"))
      Sampling.curriculumPhases(
        scored.join(broadcast(ecdf), Seq("score_permille")),
        col("ecdf_permille"), col("_tk"), cuts = EcdfCuts)
    }),

    // Fill-in-the-middle span extraction: deterministic (prefix, middle,
    // suffix) split per doc, segments as md5 fingerprints — the FIM
    // training transform as a pure-map corpus operator.
    "fim_spans" -> ((s, dir) =>
      graft.llm.TextAnalysis.fimSpans(
        Tables.documents(s, dir), "doc_id", "text", minTokens = 2)),

    // Tokenizer fertility panel: per source, whitespace words vs BPE-ish
    // pre-tokens and the x1000 fertility ratio — the tokenizer-budget
    // metric a multilingual pipeline reads per feed.
    "token_fertility_by_source" -> ((s, dir) =>
      graft.llm.TextAnalysis.tokenFertilityBySource(
        Tables.documents(s, dir), "source", "text")),

    // Near-dup cluster canonicalization with the quality signal: LSH
    // candidate pairs → connected components → keep the BEST-scored doc
    // per cluster (singletons are their own cluster) — the fuzzy-dedup
    // twin of dedup_keep_best, composed from three audited operators.
    "dedup_cluster_keep_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"), col("source"),
          Sampling.hashPermille(col("source")).as("src_score"))
      val cc = Dedup.connectedComponents(
        Dedup.lshCandidatePairs(docs, "doc_id", "text"), "doc_a", "doc_b")
      val labeled = docs.join(cc, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      Dedup.bestByKey(labeled, "doc_id", col("cluster_id"), col("src_score"))
        .select("cluster_id", "doc_id", "source", "src_score")
    })
  )

  private val quantDuck = Similarity.quantizeSqlDuck

  /** The shared quantize+norm CTE prefix over `embeddings`. */
  private val vecCtes =
    s"""v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |  $quantDuck AS qv FROM embeddings),
       |n AS (SELECT vec_id, label, qv,
       |  ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v)"""
      .stripMargin.replace("\n", " ")

  /** md5-per-mille hash of an expression, rendered exactly as
    * [[Sampling.hashPermille]] computes it (string input: md5 applies
    * directly).
    */
  private def permilleDuck(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 8)) AS BIGINT) % 1000"

  def oracleSql: Map[String, String] = Map(

    "decontam_embedding" ->
      s"""WITH $vecCtes,
         |c AS (SELECT * FROM n WHERE vec_id % $EvalMod <> 0),
         |ev AS (SELECT vec_id AS eval_id, qv AS evv, nrm AS ne FROM n
         |  WHERE vec_id % $EvalMod = 0),
         |p AS (SELECT c.vec_id, eval_id,
         |    ${Similarity.dotQSqlDuck("c.qv", "ev.evv")} AS dot,
         |    c.nrm AS nv, ev.ne FROM c CROSS JOIN ev),
         |s AS (SELECT vec_id, eval_id, CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(ne AS DOUBLE))) AS cos
         |  FROM p)
         |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
         |  max(cos) AS max_cos
         |FROM s WHERE cos >= $SemThreshold GROUP BY 1"""
        .stripMargin.replace("\n", " "),

    "decontam_embedding_clean" ->
      s"""WITH $vecCtes,
         |c AS (SELECT * FROM n WHERE vec_id % $EvalMod <> 0),
         |ev AS (SELECT vec_id AS eval_id, qv AS evv, nrm AS ne FROM n
         |  WHERE vec_id % $EvalMod = 0),
         |p AS (SELECT c.vec_id,
         |    ${Similarity.dotQSqlDuck("c.qv", "ev.evv")} AS dot,
         |    c.nrm AS nv, ev.ne FROM c CROSS JOIN ev),
         |flagged AS (SELECT DISTINCT vec_id FROM p
         |  WHERE CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(ne AS DOUBLE)))
         |    >= $SemThreshold)
         |SELECT e.vec_id, e.label FROM embeddings e
         |WHERE e.vec_id % $EvalMod <> 0
         |  AND e.vec_id NOT IN (SELECT vec_id FROM flagged)"""
        .stripMargin.replace("\n", " "),

    "ann_contrastive_triples" ->
      s"""WITH $vecCtes,
         |p AS (SELECT q.vec_id AS qid, q.label AS q_label,
         |    c.vec_id AS cid, c.label AS c_label,
         |    ${Similarity.dotQSqlDuck("q.qv", "c.qv")} AS dot,
         |    q.nrm AS nq, c.nrm AS nc
         |  FROM n q, n c WHERE q.vec_id % $AnchorMod = 0
         |    AND c.vec_id <> q.vec_id
         |    AND q.label IS NOT NULL AND c.label IS NOT NULL),
         |s AS (SELECT qid, q_label, cid, c_label, CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE)))
         |    AS cos_sim FROM p),
         |pos AS (SELECT qid, q_label, cid AS pos_id, cos_sim AS pos_cos,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, cid) AS rn
         |  FROM s WHERE c_label = q_label),
         |neg AS (SELECT qid, cid AS neg_id, cos_sim AS neg_cos,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos_sim DESC, cid) AS rn
         |  FROM s WHERE c_label <> q_label)
         |SELECT pos.qid, pos.q_label, pos.pos_id, pos.pos_cos,
         |  neg.neg_id, neg.neg_cos, pos.pos_cos - neg.neg_cos AS margin
         |FROM pos JOIN neg ON pos.qid = neg.qid
         |WHERE pos.rn = 1 AND neg.rn = 1"""
        .stripMargin.replace("\n", " "),

    "rag_context_pack" -> {
      val k1p = 1200
      val bp = 750
      s"""WITH corp AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE source <> 'src0'),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM corp GROUP BY 1, 2),
         |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
         |qt AS (SELECT DISTINCT doc_id AS query_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE source = 'src0' AND doc_id % 100 = 0),
         |qi AS (SELECT query_id, qt.term, st.n * 1000 // dft.df AS idf_permille
         |  FROM qt JOIN dft ON qt.term = dft.term CROSS JOIN st),
         |dlr AS (SELECT doc_id, dl * n * 1000 // t AS dlr FROM dl CROSS JOIN st),
         |sc AS (SELECT query_id, tf.doc_id, CAST(sum(qi.idf_permille *
         |    ((tf.tf * ${k1p + 1000} * 1000) // (tf.tf * 1000 +
         |      ($k1p * (${1000 - bp} + $bp * dlr.dlr // 1000) // 1000)))) AS BIGINT) AS score
         |  FROM tf JOIN qi ON tf.term = qi.term
         |  JOIN dlr ON dlr.doc_id = tf.doc_id GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, score, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc),
         |topk AS (SELECT * FROM r WHERE rnk <= $PackK),
         |lens AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER)
         |    AS doc_tokens
         |  FROM documents WHERE source <> 'src0' AND text IS NOT NULL),
         |cum AS (SELECT topk.query_id, topk.doc_id, topk.rnk, topk.score,
         |    lens.doc_tokens,
         |    CAST(sum(lens.doc_tokens) OVER (PARTITION BY topk.query_id
         |      ORDER BY topk.rnk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |  FROM topk JOIN lens ON lens.doc_id = topk.doc_id)
         |SELECT query_id, doc_id, rnk, score, doc_tokens, cum_tokens
         |FROM cum WHERE cum_tokens <= $PackBudget"""
        .stripMargin.replace("\n", " ")
    },

    "dedup_keep_best" -> keepBestSqlDuck,

    // the register identity: per-batch winners re-reduced must land on
    // the ONE-PASS canonical set — oracle shared verbatim
    "dedup_keep_best_stream" -> keepBestSqlDuck,

    "cluster_balanced_select" -> {
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |cents AS (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent FROM
         |  (SELECT vec_id, qv, nrm FROM n
         |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |   LIMIT $BalanceCentroids)),
         |ca AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT n.vec_id, c.cent_id,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("n.qv", "c.centv"), "n.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM n, cents c) WHERE crn = 1),
         |r AS (SELECT cell, vec_id, row_number() OVER (PARTITION BY cell
         |    ORDER BY ${permilleDuck("CAST(vec_id AS VARCHAR)")}, vec_id)
         |    AS rk FROM ca)
         |SELECT cell, vec_id, rk FROM r WHERE rk <= $CapPerCell"""
        .stripMargin.replace("\n", " ")
    },

    "curriculum_phases" -> curriculumSqlDuck,

    // the register identity: the two-leg phase-panel fold must land on
    // the ONE-PASS panel — oracle shared verbatim
    "curriculum_phases_stream" -> curriculumSqlDuck,

    "embedding_drift" -> driftSqlDuck,

    // the register identity: the batch-folded per-(label, dim) sums
    // must land on the ONE-PASS drift panel — oracle shared verbatim
    "embedding_drift_stream" -> driftSqlDuck,

    "quality_score_ecdf" -> ecdfSqlDuck,

    // the register identity, fourth walk: the folded count table must
    // land on the ONE-PASS ECDF — oracle shared verbatim
    "quality_ecdf_stream" -> ecdfSqlDuck,

    "dedup_cluster_keep_best" ->
      s"""WITH RECURSIVE ${LlmQueries.lshCtes},
         |prs AS (${LlmQueries.lshPairSelect}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |  UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(v, r) AS (SELECT src, src FROM edges
         |  UNION SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.v = e.dst),
         |cc AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
         |docs AS (SELECT doc_id, source,
         |  ${permilleDuck("source")} AS src_score
         |  FROM documents WHERE text IS NOT NULL),
         |lab AS (SELECT d.doc_id,
         |    coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
         |    d.source, d.src_score
         |  FROM docs d LEFT JOIN cc ON cc.doc_id = d.doc_id),
         |r2 AS (SELECT cluster_id, doc_id, source, src_score,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY src_score DESC, doc_id) AS rn FROM lab)
         |SELECT cluster_id, doc_id, source, src_score FROM r2 WHERE rn = 1"""
        .stripMargin.replace("\n", " "),

    "fim_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |  FROM documents WHERE text IS NOT NULL),
         |f AS (SELECT * FROM t WHERE n >= 2),
         |d AS (SELECT doc_id, l, n,
         |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':a'),
         |    1, 8)) AS BIGINT) % n AS a FROM f),
         |e AS (SELECT doc_id, l, n, a,
         |  a + 1 + CAST(concat('0x',
         |    substr(md5(CAST(doc_id AS VARCHAR) || ':b'), 1, 8))
         |    AS BIGINT) % (n - a) AS b FROM d)
         |SELECT doc_id, n AS n_tokens, a, b,
         |  a AS prefix_tokens, b - a AS middle_tokens,
         |  n - b AS suffix_tokens,
         |  md5(coalesce(array_to_string(l[1:a], ' '), '')) AS prefix_md5,
         |  md5(coalesce(array_to_string(l[a+1:b], ' '), '')) AS middle_md5,
         |  md5(coalesce(array_to_string(l[b+1:n], ' '), '')) AS suffix_md5
         |FROM e""".stripMargin.replace("\n", " "),

    "token_fertility_by_source" ->
      s"""WITH f AS (SELECT source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         |  CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.BpeishPattern.replace("'", "''")}', 0))
         |    AS BIGINT) AS p
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(w) AS BIGINT) AS n_words,
         |  CAST(sum(p) AS BIGINT) AS n_pretokens,
         |  CAST(sum(p) AS BIGINT) * 1000 // CAST(sum(w) AS BIGINT)
         |    AS fertility_x1000
         |FROM f GROUP BY 1""".stripMargin.replace("\n", " "),

    "curriculum_ecdf_phases" -> {
      val Seq(e1, e2) = EcdfCuts
      s"""WITH sc AS (SELECT
         |  ${graft.llm.QualityRules.stubEduScoreSqlDuck} AS s,
         |  len(string_split(text, ' ')) AS tk
         |  FROM documents WHERE text IS NOT NULL),
         |gg AS (SELECT s AS score, CAST(count(*) AS BIGINT) AS n
         |  FROM sc GROUP BY 1),
         |cdf AS (SELECT score, CAST(sum(n) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    * 1000 // CAST(sum(n) OVER () AS BIGINT) AS ep FROM gg),
         |j AS (SELECT cdf.ep AS e, sc.tk FROM sc
         |  JOIN cdf ON sc.s = cdf.score),
         |ph AS (SELECT CASE WHEN e >= $e2 THEN 2 WHEN e >= $e1 THEN 1
         |    ELSE 0 END AS phase, e, tk FROM j),
         |c AS (SELECT phase, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(tk) AS BIGINT) AS n_tokens,
         |  CAST(min(e) AS BIGINT) AS score_min,
         |  CAST(max(e) AS BIGINT) AS score_max FROM ph GROUP BY 1),
         |g(phase, cut_lo, cut_hi) AS (VALUES
         |  (CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST($e1 AS BIGINT)),
         |  (1, $e1, $e2), (2, $e2, NULL))
         |SELECT g.phase, g.cut_lo, g.cut_hi,
         |  coalesce(c.n_docs, 0) AS n_docs,
         |  coalesce(c.n_tokens, 0) AS n_tokens,
         |  c.score_min, c.score_max
         |FROM g LEFT JOIN c ON g.phase = c.phase"""
        .stripMargin.replace("\n", " ")
    }
  )

  /** The one-pass centroid-drift oracle — shared verbatim by the batch
    * gate (`embedding_drift`) and the register fold
    * (`embedding_drift_stream`).
    */
  private val driftSqlDuck: String =
    s"""WITH va AS (SELECT CAST(label AS BIGINT) AS label, $quantDuck AS qv
       |  FROM embeddings WHERE vec_id % 2 = 0 AND label IS NOT NULL),
       |vb AS (SELECT CAST(label AS BIGINT) AS label, $quantDuck AS qv
       |  FROM embeddings WHERE vec_id % 2 = 1 AND label IS NOT NULL),
       |ea AS (SELECT label, generate_subscripts(qv, 1) AS i,
       |  unnest(qv) AS qe FROM va),
       |eb AS (SELECT label, generate_subscripts(qv, 1) AS i,
       |  unnest(qv) AS qe FROM vb),
       |sa AS (SELECT label, i, CAST(sum(qe) AS BIGINT) AS s,
       |  CAST(count(*) AS BIGINT) AS n FROM ea GROUP BY 1, 2),
       |sb AS (SELECT label, i, CAST(sum(qe) AS BIGINT) AS s,
       |  CAST(count(*) AS BIGINT) AS n FROM eb GROUP BY 1, 2),
       |j AS (SELECT coalesce(sa.label, sb.label) AS label,
       |    sa.s AS s_a, sa.n AS n_a0, sb.s AS s_b, sb.n AS n_b0
       |  FROM sa FULL OUTER JOIN sb
       |    ON sa.label = sb.label AND sa.i = sb.i)
       |SELECT label, coalesce(max(n_a0), 0) AS n_a,
       |  coalesce(max(n_b0), 0) AS n_b,
       |  CAST(sum(abs(s_a // n_a0 - s_b // n_b0)) AS BIGINT) AS drift_l1
       |FROM j GROUP BY 1""".stripMargin.replace("\n", " ")

  /** The one-pass keep-best oracle — shared verbatim by the batch gate
    * (`dedup_keep_best`) and the per-batch-winners fold
    * (`dedup_keep_best_stream`).
    */
  private val keepBestSqlDuck: String =
      s"""WITH base AS (SELECT doc_id, text, source FROM documents
         |  WHERE text IS NOT NULL),
         |mirrored AS (SELECT * FROM base UNION ALL
         |  SELECT doc_id + $MirrorIdOffset, text, 'mirror0' FROM base),
         |sc AS (SELECT doc_id, text, source,
         |  ${permilleDuck("source")} AS src_score FROM mirrored),
         |r AS (SELECT doc_id, source, src_score, row_number() OVER (
         |    PARTITION BY md5(text)
         |    ORDER BY src_score DESC, doc_id) AS rn FROM sc)
         |SELECT doc_id, source, src_score FROM r WHERE rn = 1"""
        .stripMargin.replace("\n", " ")

  /** The one-pass ECDF oracle — shared verbatim by the batch gate
    * (`quality_score_ecdf`) and the register fold
    * (`quality_ecdf_stream`).
    */
  private val ecdfSqlDuck: String =
    s"""WITH sc AS (SELECT
       |  ${graft.llm.QualityRules.stubEduScoreSqlDuck} AS s
       |  FROM documents WHERE text IS NOT NULL),
       |g AS (SELECT s AS score, CAST(count(*) AS BIGINT) AS n
       |  FROM sc GROUP BY 1),
       |c AS (SELECT score, n, CAST(sum(n) OVER (ORDER BY score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_n,
       |  CAST(sum(n) OVER () AS BIGINT) AS total FROM g)
       |SELECT score, n, cum_n, cum_n * 1000 // total AS ecdf_permille
       |FROM c""".stripMargin.replace("\n", " ")

  /** The one-pass curriculum-phase oracle — shared verbatim by the batch
    * gate (`curriculum_phases`) and the two-leg register fold
    * (`curriculum_phases_stream`): the fold's whole contract is landing
    * on this exact panel.
    */
  private val curriculumSqlDuck: String = {
      val Seq(c1, c2, c3) = PhaseCuts
      s"""WITH sc AS (SELECT
         |  ${graft.llm.QualityRules.stubEduScoreSqlDuck} AS s,
         |  len(string_split(text, ' ')) AS tk
         |  FROM documents WHERE text IS NOT NULL),
         |ph AS (SELECT CASE WHEN s >= $c3 THEN 3 WHEN s >= $c2 THEN 2
         |    WHEN s >= $c1 THEN 1 ELSE 0 END AS phase, s, tk FROM sc),
         |c AS (SELECT phase, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(tk) AS BIGINT) AS n_tokens,
         |  CAST(min(s) AS BIGINT) AS score_min,
         |  CAST(max(s) AS BIGINT) AS score_max FROM ph GROUP BY 1),
         |g(phase, cut_lo, cut_hi) AS (VALUES
         |  (CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST($c1 AS BIGINT)),
         |  (1, $c1, $c2), (2, $c2, $c3), (3, $c3, NULL))
         |SELECT g.phase, g.cut_lo, g.cut_hi,
         |  coalesce(c.n_docs, 0) AS n_docs,
         |  coalesce(c.n_tokens, 0) AS n_tokens,
         |  c.score_min, c.score_max
         |FROM g LEFT JOIN c ON g.phase = c.phase"""
        .stripMargin.replace("\n", " ")
  }
}
