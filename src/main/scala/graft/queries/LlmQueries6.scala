package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Bpe, Decontam, Dedup, Sampling, Similarity}

/** Sixth tranche: BPE tokenizer training, leakage-free cluster-aware
  * splits, and per-language quantile quality calibration. The k BPE
  * merge rounds are generated from the SAME constant on both sides
  * ([[Bpe.mergesSqlDuck]]), mirroring the MMR unroll discipline; the
  * split/calibration constants are shared fields referenced by both the
  * Spark plan and the rendered oracle.
  */
object LlmQueries6 {

  private val MergeRounds = 6 // learned merges; rounds unrolled in-plan
  private val PairTopN = 20   // initial pair-count audit rows

  private val TrainPermille = 800 // cluster-split thresholds
  private val ValPermille = 100

  private val KeepPermille = 400 // per-language quality keep rate

  private val MatDim = 16 // matryoshka truncation: first 16 of 64 dims
  private val MatK = 5

  private val EpochBudget = 100000L // tokens; >> corpus so epochs > 1000‰
  private val MinSrcPermille = 500L // source-reputation floor (the
  // fixture's per-source diversity means span ~450-560‰, so 500 divides
  // the sources non-trivially at both gate scales)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Initial adjacent-character pair counts (the round-1 input of BPE
    // training): corpus collapses to the word-frequency dict in its one
    // scan; the counts are vocab-sized.
    "bpe_pair_counts" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pc = Bpe.pairCounts(
        Bpe.initialForms(Bpe.wordFreqs(Tables.documents(s, dir), "text")))
      val w = Window.orderBy(col("cnt").desc, col("lhs"), col("rhs"))
      pc.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= PairTopN)
    }),

    // The learned merge table after k rounds — the tokenizer artifact a
    // training pipeline ships (subword-nmt's merges.txt).
    "bpe_merges" -> ((s, dir) =>
      Bpe.learnMerges(Tables.documents(s, dir), "text", MergeRounds)._1),

    // Final per-word segmentation under those merges: the encode side,
    // over the same vocab-sized dict.
    "bpe_segment" -> ((s, dir) =>
      Bpe.segmented(
        Bpe.learnMerges(Tables.documents(s, dir), "text", MergeRounds)._2)
        .select("word", "freq", "form", "n_tokens")),

    // Tokenizer compression curve: corpus token totals after each merge
    // round — where the curve flattens is where more merges stop paying.
    "bpe_merge_curve" -> ((s, dir) =>
      Bpe.mergeCurve(Tables.documents(s, dir), "text", MergeRounds)),

    // Per-doc token accounting under the learned merges: the number every
    // downstream packing/budget decision uses; the vocab-sized dict
    // broadcasts back onto the corpus word stream.
    "bpe_encode_corpus" -> ((s, dir) =>
      Bpe.encodeCorpus(Tables.documents(s, dir), "doc_id", "text",
        MergeRounds)),

    // Leakage-free train/val/test split: split membership decided by the
    // near-dup CLUSTER hash (LSH graph, singletons = own cluster), so a
    // doc and its near-copy can never straddle the held-out boundary.
    "split_cluster_assign" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val labels = docs.select("doc_id")
        .join(Dedup.connectedComponents(
          Dedup.lshCandidatePairs(docs, "doc_id", "text"), "doc_a", "doc_b"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      Sampling.clusterSplit(labels, "doc_id", "cluster_id",
        TrainPermille, ValPermille)
    }),

    // Per-language quality-quantile calibration: keep the top p‰ of each
    // language by unique-token count — the threshold ADAPTS to each
    // language's population (a fixed global cutoff over-filters
    // low-resource languages). Exact integer rank test rnk·1000 ≤ p·n,
    // no float percentile; rank-1-per-group machinery compiles map-side.
    "quality_quantile_cal" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val scored = docs.select(col("doc_id"), col("lang"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("score"))
      val w = Window.partitionBy("lang")
        .orderBy(col("score").desc, col("doc_id"))
      val cw = Window.partitionBy("lang")
      scored
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n_lang", count(lit(1)).over(cw))
        .filter(col("rnk") * 1000 <= lit(KeepPermille) * col("n_lang"))
    }),

    // Multi-eval contamination matrix: src0 and src1 as two eval suites
    // screened against the rest of the corpus in ONE postings pass —
    // per (doc, suite) overlap with the same per-suite boilerplate cap
    // decontam_overlap uses.
    "decontam_multi_eval" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Decontam.overlapMatrix(
        docs.filter(!col("source").isin("src0", "src1")),
        docs.filter(col("source").isin("src0", "src1")),
        "doc_id", "text", "source", n = 3, maxGramEvalDf = 20)
    }),

    // Matryoshka-truncated retrieval (first 16 of 64 dims): the 4×
    // bandwidth-cut first stage of MRL search.
    "ann_matryoshka_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.matryoshkaTopK(emb, emb.filter(col("vec_id") < 50),
        k = MatK, dim = MatDim)
    }),

    // ...and its recall@k audit against the full-dimension ranking —
    // run before trusting a truncation level at scale.
    "ann_matryoshka_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.matryoshkaRecall(emb, emb.filter(col("vec_id") < 50),
        k = MatK, dim = MatDim)
    }),

    // Epoch plan: milli-epochs per source to hit the token budget at
    // the n^½ temperature mix — budget >> corpus so sources repeat
    // (epochs_permille > 1000).
    "mix_epoch_plan" -> ((s, dir) =>
      Sampling.epochPlan(Tables.documents(s, dir), "source",
        graft.llm.TextAnalysis.tokenCount(col("text")), EpochBudget)),

    // Domain-level reputation gate: a doc survives iff its SOURCE's mean
    // lexical diversity clears the floor — corpus never exchanges, the
    // per-source table broadcasts back.
    "source_reputation_filter" -> ((s, dir) =>
      Sampling.sourceReputationFilter(Tables.documents(s, dir),
        "doc_id", "text", "source", MinSrcPermille)),

    // Winnow→verify: winnowing candidates confirmed by exact shingle
    // Jaccard from ONE positional-hash scan — the verification pass
    // completing the winnowing blocking family (same shared-scan
    // discipline as dedup_minhash_est).
    "dedup_winnow_verified" -> ((s, dir) =>
      Dedup.winnowVerifiedPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, w = 4, minShared = 2L, maxFpDocFreq = 50L,
        minJacPermille = 200L)),

    // Typo/variant mining over the vocabulary: edit-distance-≤2 word
    // pairs, length-blocked equi-join over the vocab table (corpus-
    // scale-independent after the word-count scan).
    "vocab_edit_pairs" -> ((s, dir) =>
      graft.llm.TextAnalysis.vocabEditPairs(Tables.documents(s, dir),
        "text", maxDist = 2, minFreq = 1L)),

    // Frame near-dup clusters: transitive closure of the phash pair
    // graph; cluster id = representative frame (min-label).
    "multimodal_frame_clusters" -> ((s, dir) =>
      graft.llm.Multimodal.frameDupClusters(
        graft.llm.Multimodal.frameAHash(Tables.documents(s, dir),
          "doc_id", "text", stride = 5), maxHd = 2)),

    // CCNet head/middle/tail: per-language fluency terciles over the
    // src0-trained LM scores — the table per-bucket sampling rates are
    // set from (Wenzek et al. 2020 §4.4).
    "ccnet_lang_buckets" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.llm.TextAnalysis.fluencyBuckets(
        graft.llm.TextAnalysis.lmFluency(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), "doc_id", "text"),
        docs, "doc_id", "lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "bpe_pair_counts" ->
      Bpe.pairCountsSqlDuck("documents", "text", PairTopN),
    "bpe_merges" -> Bpe.mergesSqlDuck("documents", "text", MergeRounds),
    "bpe_segment" -> Bpe.segmentedSqlDuck("documents", "text", MergeRounds),
    "bpe_encode_corpus" ->
      Bpe.encodeCorpusSqlDuck("documents", "doc_id", "text", MergeRounds),
    "bpe_merge_curve" ->
      Bpe.mergeCurveSqlDuck("documents", "text", MergeRounds),

    // same recursive-CTE closure as dedup_clusters / dedup_cluster_rep;
    // bucket arithmetic is the hashPermille idiom over the cluster id
    "split_cluster_assign" ->
      s"""WITH RECURSIVE ${LlmQueries.lshCtes}, prs AS (${LlmQueries.lshPairSelect}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |  UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(v, r) AS (SELECT src, src FROM edges
         |  UNION SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.v = e.dst),
         |lab0 AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
         |lab AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN lab0 l ON d.doc_id = l.doc_id),
         |b AS (SELECT doc_id, cluster_id,
         |  CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |    % 1000 AS bucket FROM lab)
         |SELECT doc_id, cluster_id, bucket,
         |  CASE WHEN bucket < $TrainPermille THEN 'train'
         |       WHEN bucket < ${TrainPermille + ValPermille} THEN 'val'
         |       ELSE 'test' END AS split FROM b"""
        .stripMargin.replace("\n", " "),

    "quality_quantile_cal" ->
      s"""WITH sc AS (SELECT doc_id, lang,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS score
         |  FROM documents),
         |r AS (SELECT doc_id, lang, score,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
         |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
         |  FROM sc)
         |SELECT doc_id, lang, score, rnk, n_lang FROM r
         |WHERE rnk * 1000 <= $KeepPermille * n_lang"""
        .stripMargin.replace("\n", " "),

    "decontam_multi_eval" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |shh AS (SELECT DISTINCT doc_id, source,
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM sh),
        |corp AS (SELECT doc_id, h FROM shh WHERE source NOT IN ('src0', 'src1')),
        |ev AS (SELECT doc_id AS eval_id, source AS eval_set, h FROM shh
        |  WHERE source IN ('src0', 'src1')),
        |cap AS (SELECT eval_set, h FROM ev GROUP BY eval_set, h
        |  HAVING count(DISTINCT eval_id) <= 20),
        |hits AS (SELECT c.doc_id, e.eval_set, count(DISTINCT c.h) AS n_hits
        |  FROM corp c JOIN cap e ON c.h = e.h GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id)
        |SELECT h.doc_id, h.eval_set, n_hits, s.n_grams,
        |  n_hits * 1000 // s.n_grams AS hit_permille
        |FROM hits h JOIN sizes s ON h.doc_id = s.doc_id"""
        .stripMargin.replace("\n", " "),

    "ann_matryoshka_topk" -> {
      val quant = Similarity.quantizeSqlDuck
      s"""WITH v AS (SELECT vec_id, ($quant)[1:$MatDim] AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${Similarity.dotQSqlDuck("q.qv", "c.qv")} AS dot, q.nrm AS nq, c.nrm AS nc
         |  FROM n q, n c WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
         |s AS (SELECT qid, cid,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) AS cos_sim FROM p),
         |r AS (SELECT qid, cid, cos_sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank FROM s)
         |SELECT qid, cid, rank, cos_sim FROM r WHERE rank <= $MatK"""
        .stripMargin.replace("\n", " ")
    },

    "ann_matryoshka_recall" -> {
      val quant = Similarity.quantizeSqlDuck
      def ranked(cte: String, vecExpr: String) =
        s"""${cte}v AS (SELECT vec_id, $vecExpr AS qv FROM embeddings),
           |${cte}n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM ${cte}v),
           |${cte}r AS (SELECT qid, cid FROM (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |      CAST(${Similarity.dotQSqlDuck("q.qv", "c.qv")} AS DOUBLE)
           |        / (sqrt(CAST(q.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) DESC,
           |      c.vec_id) AS rank
           |  FROM ${cte}n q, ${cte}n c WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id)
           |  WHERE rank <= $MatK)""".stripMargin.replace("\n", " ")
      s"""WITH ${ranked("f", quant)}, ${ranked("t", s"($quant)[1:$MatDim]")},
         |cm AS (SELECT f.qid, CAST(count(*) AS BIGINT) AS n_common
         |  FROM fr f JOIN tr t ON f.qid = t.qid AND f.cid = t.cid
         |  GROUP BY f.qid)
         |SELECT q.vec_id AS qid, coalesce(cm.n_common, 0) AS n_common,
         |  coalesce(cm.n_common, 0) * 1000 // $MatK AS recall_permille
         |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 50) q
         |LEFT JOIN cm ON q.vec_id = cm.qid""".stripMargin.replace("\n", " ")
    },

    "mix_epoch_plan" -> {
      val isq = Sampling.isqrtSqlDuck("n_tokens")
      s"""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (SELECT source, n_docs, n_tokens, ISQ AS w_sqrt FROM per),
         |t AS (SELECT CAST(sum(w_sqrt) AS BIGINT) AS w_total FROM w),
         |m AS (SELECT source, n_docs, n_tokens, w_sqrt,
         |    CAST(w_sqrt * 1000 // w_total AS BIGINT) AS mix_permille,
         |    CAST(least(1000, ($EpochBudget * w_sqrt // w_total) * 1000 // n_tokens) AS BIGINT)
         |      AS rate_permille
         |  FROM w, t)
         |SELECT source, n_docs, n_tokens, w_sqrt, mix_permille, rate_permille,
         |  CAST($EpochBudget * mix_permille // 1000 AS BIGINT) AS target_tokens,
         |  CAST(($EpochBudget * mix_permille // 1000) * 1000 // n_tokens AS BIGINT)
         |    AS epochs_permille
         |FROM m""".stripMargin.replace("\n", " ").replace("ISQ", isq)
    },

    "source_reputation_filter" ->
      s"""WITH sc AS (SELECT doc_id, source,
         |    CAST(len(list_distinct(string_split(text, ' '))) * 1000
         |      // len(string_split(text, ' ')) AS BIGINT) AS doc_score
         |  FROM documents),
         |bs AS (SELECT source,
         |    CAST(sum(doc_score) // count(*) AS BIGINT) AS src_score
         |  FROM sc GROUP BY source HAVING sum(doc_score) // count(*) >= $MinSrcPermille)
         |SELECT sc.doc_id, sc.source, sc.doc_score, bs.src_score
         |FROM sc JOIN bs ON sc.source = bs.source"""
        .stripMargin.replace("\n", " "),

    // the winnow-pairs CTEs + a Jaccard leg over the same distinct
    // n-gram postings
    "dedup_winnow_verified" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, i AS pos,
        |    CAST(concat('0x', substr(md5(concat_ws(' ', t[i], t[i+1], t[i+2])), 1, 8)) AS BIGINT) AS h
        |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |win AS (SELECT doc_id, pos,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    max(pos) OVER (PARTITION BY doc_id) AS maxpos FROM sh),
        |fps AS (SELECT DISTINCT doc_id, fp FROM win WHERE pos <= maxpos - 3),
        |kept AS (SELECT doc_id, fp FROM fps WHERE fp IN
        |  (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50)),
        |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |post AS (SELECT DISTINCT doc_id, h FROM sh),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM post GROUP BY doc_id),
        |intr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (SELECT i.doc_a, i.doc_b,
        |    i.inter * 1000 // (sa.n_sh + sb.n_sh - i.inter) AS jac_permille
        |  FROM intr i JOIN sz sa ON i.doc_a = sa.doc_id
        |  JOIN sz sb ON i.doc_b = sb.doc_id)
        |SELECT p.doc_a, p.doc_b, p.n_shared, j.jac_permille
        |FROM pr p JOIN jac j ON p.doc_a = j.doc_a AND p.doc_b = j.doc_b
        |WHERE p.n_shared >= 2 AND j.jac_permille >= 200"""
        .stripMargin.replace("\n", " "),

    "vocab_edit_pairs" ->
      """WITH wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents) WHERE regexp_matches(word, '^[a-z]+$')
        |  GROUP BY word HAVING count(*) >= 1),
        |a AS (SELECT word AS word_a, freq AS freq_a, length(word) AS len_a,
        |    u.b AS blk
        |  FROM wf, UNNEST(range(length(word) - 2, length(word) + 1)) u(b)),
        |b AS (SELECT word AS word_b, freq AS freq_b, length(word) AS len_b
        |  FROM wf)
        |SELECT word_a, word_b, freq_a, freq_b,
        |  CAST(levenshtein(word_a, word_b) AS INTEGER) AS dist
        |FROM a JOIN b ON a.blk = b.len_b
        |WHERE (len_a > len_b OR (len_a = len_b AND word_a < word_b))
        |  AND levenshtein(word_a, word_b) <= 2"""
        .stripMargin.replace("\n", " "),

    // the phash-pair CTEs (multimodal_phash_dedup) + recursive closure
    "multimodal_frame_clusters" -> {
      val hash = graft.llm.Multimodal.aHashSqlDuck("text", "u.i", "n_px")
      s"""WITH RECURSIVE meta AS (SELECT doc_id, text, length(text) AS n_px,
         |    length(text) % 30 + 1 AS n_frames
         |  FROM documents WHERE length(text) % 3 = 2),
         |fr AS (SELECT doc_id * 64 + u.i AS fkey, $hash AS phash
         |  FROM meta, UNNEST(range(0, n_frames, 5)) u(i)),
         |bl AS (SELECT fkey, phash, 0 AS ci, phash % 32 AS cv FROM fr
         |  UNION ALL SELECT fkey, phash, 1, (phash // 32) % 32 FROM fr
         |  UNION ALL SELECT fkey, phash, 2, phash // 1024 FROM fr),
         |pr AS (SELECT DISTINCT a.fkey AS frame_a, a.phash AS pa,
         |    b.fkey AS frame_b, b.phash AS pb
         |  FROM bl a JOIN bl b ON a.ci = b.ci AND a.cv = b.cv
         |    AND a.fkey < b.fkey
         |  WHERE a.fkey // 64 <> b.fkey // 64),
         |pp AS (SELECT frame_a, frame_b FROM pr
         |  WHERE bit_count(xor(pa, pb)) <= 2),
         |edges AS (SELECT frame_a AS src, frame_b AS dst FROM pp
         |  UNION ALL SELECT frame_b, frame_a FROM pp),
         |reach(v, r) AS (SELECT src, src FROM edges
         |  UNION SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.v = e.dst),
         |lab AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
         |SELECT cluster_id, count(*) AS n_frames FROM lab GROUP BY cluster_id"""
        .stripMargin.replace("\n", " ")
    },

    // lm_fluency's score CTEs + lang attach + integer tercile window
    "ccnet_lang_buckets" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |big AS (SELECT doc_id, source,
        |  CAST(concat('0x', substr(md5(t[i]), 1, 8)) AS BIGINT) AS h1,
        |  CAST(concat('0x', substr(md5(concat_ws(' ', t[i], t[i+1])), 1, 8)) AS BIGINT) AS h12
        |  FROM toks, UNNEST(range(1, len(t))) AS r(i) WHERE len(t) >= 2),
        |ref AS (SELECT h1, h12 FROM big WHERE source = 'src0'),
        |c12 AS (SELECT h12, count(*) AS c12 FROM ref GROUP BY h12),
        |c1 AS (SELECT h1, count(*) AS c1 FROM ref GROUP BY h1),
        |sc AS (SELECT doc_id,
        |  coalesce(c12.c12, 0) * 1000 // (coalesce(c1.c1, 0) + 1) AS p_permille
        |  FROM big LEFT JOIN c12 USING (h12) LEFT JOIN c1 USING (h1)
        |  WHERE big.source <> 'src0'),
        |fl AS (SELECT doc_id, CAST(sum(p_permille) AS BIGINT) // count(*) AS score_permille
        |  FROM sc GROUP BY doc_id),
        |rk AS (SELECT d.lang, fl.doc_id, fl.score_permille,
        |    CAST(row_number() OVER (PARTITION BY d.lang
        |      ORDER BY fl.score_permille DESC, fl.doc_id) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT) AS n_lang
        |  FROM fl JOIN documents d ON fl.doc_id = d.doc_id),
        |bk AS (SELECT lang, score_permille,
        |    CASE WHEN rnk * 3 <= n_lang THEN 'head'
        |         WHEN rnk * 3 <= n_lang * 2 THEN 'middle'
        |         ELSE 'tail' END AS bucket FROM rk)
        |SELECT lang, bucket, count(*) AS n_docs,
        |  min(score_permille) AS min_score, max(score_permille) AS max_score
        |FROM bk GROUP BY lang, bucket""".stripMargin.replace("\n", " ")
  )
}
