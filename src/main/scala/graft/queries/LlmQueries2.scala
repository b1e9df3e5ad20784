package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Curation, Decontam, Packing, Retrieval, Sampling, Shuffling, TextAnalysis}

/** Second tranche of LLM-training-data pipeline gates: train/eval
  * decontamination, corpus mixing weights, sequence packing, TF-IDF
  * retrieval, deterministic corpus shuffling/sharding, and the composite
  * quality filter. Same oracle discipline as [[LlmQueries]]:
  * integer-exact arithmetic shared constant-for-constant with the DuckDB
  * SQL.
  */
object LlmQueries2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decontamination: docs from the training split (source <> src0)
    // sharing any word-3-gram with the held-out split (source = src0);
    // eval-side grams present in >20 eval docs dropped as boilerplate
    "decontam_overlap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Decontam.overlapReport(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3, maxGramEvalDf = 20)
    }),

    // Bloom pre-filter for the overlap join (5-grams, where real
    // contamination is rare): the eval gram set compressed to a 2^20-bit
    // filter probes every corpus gram map-side — per source, candidate
    // docs next to the exact contaminated count. Candidates ⊇
    // contaminated ALWAYS (no false negatives); the FP column is the
    // price of never broadcasting the raw gram set.
    "decontam_bloom_prefilter" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Decontam.bloomPrefilterAudit(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 5, groupCol = "source")
    }),

    // mixing: cap every source at 800 tokens → per-source keep rates
    // (sources run ~1.3k tokens at sf0.01, so the cap genuinely binds)
    "mix_token_weights" -> ((s, dir) =>
      Sampling.mixWeights(Tables.documents(s, dir), "source",
        TextAnalysis.tokenCount(col("text")), tokenBudget = 800L)),

    // packing: greedy first-fit into 128-token bins per source, id order
    "pack_sequences" -> ((s, dir) =>
      Packing.packGreedy(Tables.documents(s, dir), "doc_id", "source",
        TextAnalysis.tokenCount(col("text")), tokenBudget = 128L)
        .select(col("doc_id"), col("grp").as("source"),
          col("n_tokens"), col("bin_idx"))),

    // retrieval: integer TF-IDF top-10 per probe doc; probes are a
    // deterministic fifth of the held-out split (doc_id % 100 — probe
    // sets are small by design and the 31-term vocabulary means every
    // probe matches ~every doc). No df cap: with near-corpus-wide terms
    // IDF itself is the discriminator; the maxDf guard is spec-tested.
    "text_tfidf_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Retrieval.tfidfTopK(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0" && col("doc_id") % 100 === 0),
        "doc_id", "text", k = 10)
    }),

    // integer BM25 over the same corpus/probe split: per-mille k1/b
    // saturation + integer IDF, hash-oracle-exact (the float bm25TopK
    // is the spec-gated production default)
    "text_bm25i_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Retrieval.bm25iTopK(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0" && col("doc_id") % 100 === 0),
        "doc_id", "text", k = 10)
    }),

    // Retrieval-effectiveness audit: self-retrieval MRR / hit@k — each
    // query is a sampled doc's own first 8 tokens, metric = the rank at
    // which int-BM25 returns that doc (hit@1 3/10, MRRx1e6 325000 at
    // sf0.01 — an honest mid score on a 31-word-vocab synthetic corpus
    // where prefixes barely discriminate). The labeled-data-free IR
    // sanity number that makes index/tokenizer changes comparable.
    "text_self_retrieval_mrr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Retrieval.selfRetrievalAudit(docs,
        docs.filter(col("doc_id") % 50 === 0), "doc_id", "text",
        queryTokens = 8, k = 10)
    }),

    // deterministic training-order shuffle + 8-way round-robin sharding
    "corpus_shuffle" -> ((s, dir) =>
      Shuffling.deterministicShuffle(Tables.documents(s, dir), "doc_id",
        numShards = 8)),

    // per-shard integrity manifest over the same permutation — the
    // verify-after-copy artifact (count + order-independent content sum)
    "corpus_shard_manifest" -> ((s, dir) =>
      Shuffling.shardManifest(Tables.documents(s, dir), "doc_id",
        col("text"), numShards = 8)),

    // composite quality filter: C4/Gopher-style keep/drop with first
    // failing rule as the reason (thresholds chosen to bind on the
    // fixture: tokens in [20,90], >=350‰ unique, <=150‰ top token)
    "corpus_quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(Tables.documents(s, dir), "doc_id", "text",
        minTokens = 20, maxTokens = 90, minUniqPermille = 350,
        maxTopTokPermille = 150)),

    // per-source corpus health: docs/tokens/quality-kept/exact-dup counts
    // (same thresholds as corpus_quality_filter)
    "corpus_report" -> ((s, dir) =>
      Curation.corpusReport(Tables.documents(s, dir), "doc_id", "text",
        "source", minTokens = 20, maxTokens = 90, minUniqPermille = 350,
        maxTopTokPermille = 150)),

    // bin utilization of the pack_sequences run: fill + pad per bin
    "pack_bin_stats" -> ((s, dir) =>
      Packing.binStats(
        Packing.packGreedy(Tables.documents(s, dir), "doc_id", "source",
          TextAnalysis.tokenCount(col("text")), tokenBudget = 128L),
        tokenBudget = 128L)
        .select(col("grp").as("source"), col("bin_idx"), col("n_docs"),
          col("fill_tokens"), col("pad_tokens"))),

    // the clean training split after decontamination at 100‰ containment
    "decontam_clean" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Decontam.decontaminate(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3, minHitPermille = 100, maxGramEvalDf = 20)
        .select("doc_id", "source")
    }),

    // exact-substring dedup signal: fraction of each doc's 8-token
    // windows occurring verbatim in another doc (Lee et al. 2022)
    "dedup_window_profile" -> ((s, dir) =>
      graft.llm.Dedup.windowDupProfile(Tables.documents(s, dir), "doc_id",
        "text", n = 8)),

    // tokenizer-fit vocabulary: top-20 terms by occurrence count
    "vocab_topk" -> ((s, dir) =>
      Retrieval.vocabulary(Tables.documents(s, dir), "doc_id", "text",
        k = 20)),

    // the REMOVE half of exact-substring dedup: docs with the duplicated
    // 8-token-window range cut out (contiguous-range rule)
    "dedup_trim_spans" -> ((s, dir) =>
      graft.llm.Dedup.trimDupSpans(Tables.documents(s, dir), "doc_id",
        "text", n = 8)
        .select("doc_id", "source", "text")),

    // MAXIMAL duplicated spans with true boundaries (the full Lee et al.
    // 2022 operator — round-16 verdict #3): consecutive duplicated
    // 8-token windows coalesced by gaps-and-islands
    "dedup_max_spans" -> ((s, dir) =>
      graft.llm.Dedup.maxDupSpans(Tables.documents(s, dir), "doc_id",
        "text", n = 8)),

    // the PRECISE remove half: every maximal span cut exactly, clean
    // text between spans preserved (the contiguous-range rule deletes it)
    "dedup_trim_max_spans" -> ((s, dir) =>
      graft.llm.Dedup.trimMaxSpans(Tables.documents(s, dir), "doc_id",
        "text", n = 8)
        .select("doc_id", "source", "text"))
  )

  val oracleSql: Map[String, String] = Map(
    "decontam_overlap" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |shh AS (SELECT DISTINCT doc_id, source,
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM sh),
        |corp AS (SELECT doc_id, h FROM shh WHERE source <> 'src0'),
        |ev AS (SELECT doc_id AS eval_id, h FROM shh WHERE source = 'src0'),
        |evk AS (SELECT eval_id, h FROM ev WHERE h IN
        |  (SELECT h FROM ev GROUP BY h HAVING count(*) <= 20)),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id),
        |hits AS (SELECT c.doc_id, count(DISTINCT c.h) AS n_hits,
        |    count(DISTINCT e.eval_id) AS n_eval_docs
        |  FROM corp c JOIN evk e ON c.h = e.h GROUP BY c.doc_id)
        |SELECT h.doc_id, n_hits, n_eval_docs, s.n_grams,
        |  n_hits * 1000 // s.n_grams AS hit_permille
        |FROM hits h JOIN sizes s ON h.doc_id = s.doc_id"""
        .stripMargin.replace("\n", " "),

    "decontam_bloom_prefilter" -> {
      import graft.sketch.Bloom
      val m = 1 << 20
      def pos(i: Int) = Bloom.positionSqlDuck("h", i, m)
      val bitTest = s"(w._bits & ${Bloom.shift1SqlDuck("p % 64")}) <> 0"
      val keyPs = (0 until 3)
        .map(i => s"SELECT ${pos(i)} AS p FROM ev").mkString(" UNION ALL ")
      val evPs = (0 until 3)
        .map(i => s"SELECT doc_id, source, h, ${pos(i)} AS p FROM corp")
        .mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
         |    FROM documents),
         |sh AS (SELECT doc_id, source,
         |    concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]) AS sh
         |  FROM toks, UNNEST(range(1, len(t)-3)) AS r(i) WHERE len(t) >= 5),
         |shh AS (SELECT DISTINCT doc_id, source,
         |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM sh),
         |corp AS (SELECT doc_id, source, h FROM shh WHERE source <> 'src0'),
         |ev AS (SELECT DISTINCT h FROM shh WHERE source = 'src0'),
         |ps AS ($keyPs),
         |w AS (SELECT p // 64 AS _word,
         |    bit_or(${Bloom.shift1SqlDuck("p % 64")}) AS _bits
         |  FROM ps GROUP BY 1),
         |ep AS ($evPs),
         |gb AS (SELECT doc_id, source, h,
         |    sum(CASE WHEN w._bits IS NOT NULL AND $bitTest
         |      THEN 1 ELSE 0 END) AS nb
         |  FROM ep LEFT JOIN w ON w._word = p // 64
         |  GROUP BY doc_id, source, h),
         |pd AS (SELECT doc_id, any_value(source) AS source,
         |    max(CASE WHEN nb = 3 THEN 1 ELSE 0 END) AS c
         |  FROM gb GROUP BY doc_id),
         |ct AS (SELECT doc_id,
         |    max(CASE WHEN h IN (SELECT h FROM ev) THEN 1 ELSE 0 END) AS t
         |  FROM corp GROUP BY doc_id)
         |SELECT pd.source, count(*) AS n_docs,
         |  CAST(sum(c) AS BIGINT) AS n_candidates,
         |  CAST(sum(t) AS BIGINT) AS n_contaminated,
         |  CAST(sum(c) - sum(t) AS BIGINT) AS n_false_pos
         |FROM pd JOIN ct USING (doc_id) GROUP BY pd.source"""
        .stripMargin.replace("\n", " ")
    },

    "mix_token_weights" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  least(CAST(1000 AS BIGINT),
        |    800 * 1000 // CAST(sum(len(string_split(text, ' '))) AS BIGINT)) AS rate_permille
        |FROM documents GROUP BY source""".stripMargin.replace("\n", " "),

    // the sequential first-fit fold, replayed row-by-row per source via
    // a recursive CTE stepping rn -> rn+1 carrying (bin, fill)
    "pack_sequences" ->
      """WITH RECURSIVE toks AS (SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS n_tokens FROM documents),
        |t AS (SELECT source, doc_id, n_tokens, row_number() OVER (
        |    PARTITION BY source ORDER BY doc_id) AS rn FROM toks),
        |p(source, rn, doc_id, n_tokens, bin_idx, fill) AS (
        |  SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT),
        |    CAST(n_tokens AS BIGINT) FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.source, t.rn, t.doc_id, t.n_tokens,
        |    CASE WHEN p.fill + t.n_tokens <= 128 THEN p.bin_idx ELSE p.bin_idx + 1 END,
        |    CASE WHEN p.fill + t.n_tokens <= 128 THEN p.fill + t.n_tokens
        |         ELSE CAST(t.n_tokens AS BIGINT) END
        |  FROM t JOIN p ON t.source = p.source AND t.rn = p.rn + 1)
        |SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens, bin_idx
        |FROM p""".stripMargin.replace("\n", " "),

    "text_tfidf_topk" ->
      """WITH corp AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE source <> 'src0'),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM corp GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
        |qt AS (SELECT DISTINCT doc_id AS query_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE source = 'src0' AND doc_id % 100 = 0),
        |qi AS (SELECT query_id, qt.term, n.n * 1000 // dft.df AS idf_permille
        |  FROM qt JOIN dft ON qt.term = dft.term CROSS JOIN n),
        |sc AS (SELECT query_id, tf.doc_id, CAST(sum(tf.tf * qi.idf_permille) AS BIGINT) AS score
        |  FROM tf JOIN qi ON tf.term = qi.term GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc)
        |SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= 10"""
        .stripMargin.replace("\n", " "),

    // integer BM25: tfidf's corpus/probe CTEs plus exact doc-length
    // ratio (dl*N*1000 // T) and the per-mille saturation factor; the
    // constants are interpolated from the same defaults the Spark call
    // uses (k1‰=1200, b‰=750)
    "text_bm25i_topk" -> {
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
         |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc)
         |SELECT query_id, doc_id, score, rnk FROM r WHERE rnk <= 10"""
        .stripMargin.replace("\n", " ")
    },

    "text_self_retrieval_mrr" -> {
      val k1p = 1200
      val bp = 750
      s"""WITH corp AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM corp GROUP BY 1, 2),
         |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
         |qt AS (SELECT DISTINCT doc_id AS query_id,
         |    unnest(string_split(text, ' ')[1:8]) AS term
         |  FROM documents WHERE doc_id % 50 = 0),
         |qi AS (SELECT query_id, qt.term, st.n * 1000 // dft.df AS idf_permille
         |  FROM qt JOIN dft ON qt.term = dft.term CROSS JOIN st),
         |dlr AS (SELECT doc_id, dl * n * 1000 // t AS dlr FROM dl CROSS JOIN st),
         |sc AS (SELECT query_id, tf.doc_id, CAST(sum(qi.idf_permille *
         |    ((tf.tf * ${k1p + 1000} * 1000) // (tf.tf * 1000 +
         |      ($k1p * (${1000 - bp} + $bp * dlr.dlr // 1000) // 1000)))) AS BIGINT) AS score
         |  FROM tf JOIN qi ON tf.term = qi.term
         |  JOIN dlr ON dlr.doc_id = tf.doc_id GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc),
         |self AS (SELECT query_id, rnk FROM r
         |  WHERE doc_id = query_id AND rnk <= 10),
         |nq AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries FROM qt)
         |SELECT n_queries,
         |  CAST(coalesce(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS hits_at_1,
         |  CAST(count(rnk) AS BIGINT) AS hits_at_k,
         |  CAST(coalesce(sum(1000000 // rnk), 0) // n_queries AS BIGINT)
         |    AS mrr_x1e6
         |FROM nq LEFT JOIN self ON true GROUP BY n_queries"""
        .stripMargin.replace("\n", " ")
    },

    "corpus_shard_manifest" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hh
        |  FROM documents),
        |p AS (SELECT doc_id, row_number() OVER (ORDER BY hh, doc_id) - 1 AS pos FROM h),
        |sh AS (SELECT doc_id, pos, pos % 8 AS shard FROM p),
        |c AS (SELECT doc_id,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS ch
        |  FROM documents)
        |SELECT sh.shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(c.ch) AS BIGINT) AS content_sum,
        |  min(sh.pos) AS min_pos, max(sh.pos) AS max_pos
        |FROM sh JOIN c ON sh.doc_id = c.doc_id
        |GROUP BY sh.shard""".stripMargin.replace("\n", " "),

    "corpus_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hh
        |  FROM documents),
        |p AS (SELECT doc_id, row_number() OVER (ORDER BY hh, doc_id) - 1 AS pos FROM h)
        |SELECT doc_id, pos, pos % 8 AS shard FROM p""".stripMargin.replace("\n", " "),

    "corpus_quality_filter" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_tok_n
        |  FROM tc GROUP BY 1),
        |f AS (SELECT doc_id, n_tokens,
        |  n_distinct * 1000 // n_tokens AS uniq_permille,
        |  top_tok_n * 1000 // n_tokens AS top_tok_permille FROM ts),
        |v AS (SELECT *, CASE WHEN n_tokens < 20 THEN 'too_short'
        |    WHEN n_tokens > 90 THEN 'too_long'
        |    WHEN uniq_permille < 350 THEN 'low_diversity'
        |    WHEN top_tok_permille > 150 THEN 'repetitive'
        |    ELSE 'keep' END AS reason FROM f)
        |SELECT doc_id, n_tokens, uniq_permille, top_tok_permille, reason,
        |  reason = 'keep' AS keep FROM v""".stripMargin.replace("\n", " "),

    "corpus_report" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_tok_n
        |  FROM tc GROUP BY 1),
        |f AS (SELECT doc_id, n_tokens,
        |  NOT (n_tokens < 20 OR n_tokens > 90
        |    OR n_distinct * 1000 // n_tokens < 350
        |    OR top_tok_n * 1000 // n_tokens > 150) AS keep FROM ts),
        |h AS (SELECT doc_id, source, md5(text) AS hash FROM documents),
        |cn AS (SELECT hash, min(doc_id) AS canonical FROM h GROUP BY 1),
        |j AS (SELECT h.doc_id, h.source, h.doc_id <> cn.canonical AS is_dup
        |  FROM h JOIN cn ON h.hash = cn.hash)
        |SELECT source, count(*) AS n_docs, CAST(sum(f.n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |FROM j JOIN f ON j.doc_id = f.doc_id GROUP BY source"""
        .stripMargin.replace("\n", " "),

    // the pack_sequences recursive fold, aggregated per (source, bin)
    "pack_bin_stats" ->
      """WITH RECURSIVE toks AS (SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS n_tokens FROM documents),
        |t AS (SELECT source, doc_id, n_tokens, row_number() OVER (
        |    PARTITION BY source ORDER BY doc_id) AS rn FROM toks),
        |p(source, rn, doc_id, n_tokens, bin_idx, fill) AS (
        |  SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT),
        |    CAST(n_tokens AS BIGINT) FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.source, t.rn, t.doc_id, t.n_tokens,
        |    CASE WHEN p.fill + t.n_tokens <= 128 THEN p.bin_idx ELSE p.bin_idx + 1 END,
        |    CASE WHEN p.fill + t.n_tokens <= 128 THEN p.fill + t.n_tokens
        |         ELSE CAST(t.n_tokens AS BIGINT) END
        |  FROM t JOIN p ON t.source = p.source AND t.rn = p.rn + 1)
        |SELECT source, bin_idx, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS fill_tokens,
        |  greatest(CAST(0 AS BIGINT), 128 - CAST(sum(n_tokens) AS BIGINT)) AS pad_tokens
        |FROM p GROUP BY source, bin_idx""".stripMargin.replace("\n", " "),

    "decontam_clean" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |shh AS (SELECT DISTINCT doc_id, source,
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM sh),
        |corp AS (SELECT doc_id, h FROM shh WHERE source <> 'src0'),
        |ev AS (SELECT doc_id AS eval_id, h FROM shh WHERE source = 'src0'),
        |evk AS (SELECT eval_id, h FROM ev WHERE h IN
        |  (SELECT h FROM ev GROUP BY h HAVING count(*) <= 20)),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY doc_id),
        |hits AS (SELECT c.doc_id, count(DISTINCT c.h) AS n_hits
        |  FROM corp c JOIN evk e ON c.h = e.h GROUP BY c.doc_id),
        |flagged AS (SELECT h.doc_id FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
        |  WHERE n_hits * 1000 // s.n_grams >= 100)
        |SELECT doc_id, source FROM documents
        |WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM flagged)"""
        .stripMargin.replace("\n", " "),

    "dedup_window_profile" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, i AS start, array_to_string(t[i:i+7], ' ') AS w
        |  FROM toks, UNNEST(range(1, len(t) - 6)) AS r(i) WHERE len(t) >= 8),
        |wh AS (SELECT doc_id, start,
        |  CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) AS h FROM w),
        |duph AS (SELECT h FROM wh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |tot AS (SELECT doc_id, count(*) AS n_windows FROM wh GROUP BY 1),
        |dup AS (SELECT doc_id, count(*) AS n_dup_windows,
        |    min(start) AS first_dup, max(start) AS last_dup
        |  FROM wh WHERE h IN (SELECT h FROM duph) GROUP BY 1)
        |SELECT t.doc_id, n_windows, coalesce(n_dup_windows, 0) AS n_dup_windows,
        |  first_dup, last_dup,
        |  coalesce(n_dup_windows, 0) * 1000 // n_windows AS dup_permille
        |FROM tot t LEFT JOIN dup d ON t.doc_id = d.doc_id"""
        .stripMargin.replace("\n", " "),

    "dedup_max_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, i AS start, array_to_string(t[i:i+7], ' ') AS w
        |  FROM toks, UNNEST(range(1, len(t) - 6)) AS r(i) WHERE len(t) >= 8),
        |wh AS (SELECT doc_id, start,
        |  CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) AS h FROM w),
        |duph AS (SELECT h, count(DISTINCT doc_id) AS nd FROM wh
        |  GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |dup AS (SELECT wh.doc_id, wh.start, duph.nd
        |  FROM wh JOIN duph ON wh.h = duph.h),
        |isl AS (SELECT doc_id, start, nd,
        |  start - row_number() OVER (PARTITION BY doc_id ORDER BY start) AS island
        |  FROM dup)
        |SELECT doc_id, min(start) AS span_start_tok,
        |  max(start) + 7 AS span_end_tok, min(nd) AS n_copies_ub
        |FROM isl GROUP BY doc_id, island"""
        .stripMargin.replace("\n", " "),

    "dedup_trim_max_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, i AS start, array_to_string(t[i:i+7], ' ') AS w
        |  FROM toks, UNNEST(range(1, len(t) - 6)) AS r(i) WHERE len(t) >= 8),
        |wh AS (SELECT doc_id, start,
        |  CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) AS h FROM w),
        |duph AS (SELECT h FROM wh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |isl AS (SELECT doc_id, start,
        |  start - row_number() OVER (PARTITION BY doc_id ORDER BY start) AS island
        |  FROM wh WHERE h IN (SELECT h FROM duph)),
        |spans AS (SELECT doc_id, min(start) AS s, max(start) + 7 AS e
        |  FROM isl GROUP BY doc_id, island),
        |sd AS (SELECT DISTINCT doc_id FROM spans),
        |tk AS (SELECT toks.doc_id, i AS pos, t[i] AS tok
        |  FROM toks JOIN sd ON toks.doc_id = sd.doc_id,
        |  UNNEST(range(1, len(t) + 1)) u(i)),
        |kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM tk
        |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
        |    WHERE sp.doc_id = tk.doc_id AND tk.pos BETWEEN sp.s AND sp.e)),
        |trimmed AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, d.source,
        |  CASE WHEN sd.doc_id IS NULL THEN d.text ELSE tr.text END AS text
        |FROM documents d
        |LEFT JOIN sd ON d.doc_id = sd.doc_id
        |LEFT JOIN trimmed tr ON d.doc_id = tr.doc_id
        |WHERE sd.doc_id IS NULL OR (tr.text IS NOT NULL AND length(tr.text) > 0)"""
        .stripMargin.replace("\n", " "),

    "vocab_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents)
        |SELECT term, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        |FROM tok GROUP BY term
        |ORDER BY n_occurrences DESC, term LIMIT 20""".stripMargin.replace("\n", " "),

    "dedup_trim_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, i AS start, array_to_string(t[i:i+7], ' ') AS w
        |  FROM toks, UNNEST(range(1, len(t) - 6)) AS r(i) WHERE len(t) >= 8),
        |wh AS (SELECT doc_id, start,
        |  CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) AS h FROM w),
        |duph AS (SELECT h FROM wh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |dup AS (SELECT doc_id, min(start) AS first_dup, max(start) AS last_dup
        |  FROM wh WHERE h IN (SELECT h FROM duph) GROUP BY 1),
        |trimmed AS (SELECT d.doc_id, d.source, dup.first_dup,
        |  CASE WHEN first_dup IS NULL THEN d.text
        |    ELSE array_to_string(list_concat(tk.t[1:first_dup - 1],
        |      tk.t[last_dup + 8:]), ' ') END AS text
        |  FROM documents d JOIN toks tk ON d.doc_id = tk.doc_id
        |  LEFT JOIN dup ON d.doc_id = dup.doc_id)
        |SELECT doc_id, source, text FROM trimmed
        |WHERE first_dup IS NULL OR len(text) > 0"""
        .stripMargin.replace("\n", " ")
  )
}
