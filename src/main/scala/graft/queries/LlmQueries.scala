package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators (builder brief §"beyond the
  * reference") over `documents`/`embeddings`: dedup (exact / n-gram
  * Jaccard / MinHash-LSH / SimHash / winnowing), text analysis, embedding
  * similarity search, multimodal metadata.
  *
  * Oracles are generated from the same constants as the Spark
  * implementations (MinHash coefficients, LSH plane signs), so both
  * engines compute bit-identical integer signatures.
  */
object LlmQueries {

  /** Shared oracle fragments. */
  private val tokHashDuck = "CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)"
  /** Token-hash CTE (SimHash input). */
  private val thCte =
    """th AS (SELECT DISTINCT doc_id, tok FROM
      |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |h AS (SELECT doc_id, HASHEXPR AS h FROM th)"""
      .stripMargin.replace("\n", " ").replace("HASHEXPR", tokHashDuck)

  private val shingleCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
      |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3)"""
      .stripMargin.replace("\n", " ")

  /** Shingle-hash CTE (MinHash input + Jaccard postings key). DISTINCT at
    * the HASH level, mirroring `Dedup.shingleHashPostings`: the engine
    * dedups 8-byte (doc_id, h) rows, not shingle strings, so the exchange
    * moves fixed-width rows and the md5 stays in the parallel map stage.
    */
  private val shingleHashCte =
    shingleCte +
      ", shh AS (SELECT DISTINCT doc_id, CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM sh)"

  private val minhashSigSelect: String = {
    val mins = Dedup.MinhashA.zip(Dedup.MinhashB).zipWithIndex.map { case ((a, b), i) =>
      s"min((h*$a + $b) % ${Dedup.MinhashP}) AS mh_$i"
    }.mkString(", ")
    s"SELECT doc_id, $mins FROM h GROUP BY doc_id"
  }

  /** Shared CTE chain + final select of the LSH candidate-pair oracle,
    * split so `dedup_clusters` can build its recursive closure on top of
    * the identical pair graph.
    */
  private[queries] val lshCtes: String = {
    val nBands = Dedup.MinhashA.length / Dedup.BandSize
    val bandSelects = (0 until nBands).map { j =>
      val cols = (0 until Dedup.BandSize).map(k => s"mh_${j * Dedup.BandSize + k}")
      s"SELECT doc_id, $j AS band_idx, concat_ws('_', ${cols.mkString(", ")}) AS band_val FROM sig"
    }.mkString(" UNION ALL ")
    s"$shingleHashCte, h AS (SELECT doc_id, h FROM shh), " +
      s"sig AS ($minhashSigSelect), bands AS ($bandSelects)"
  }

  private[queries] val lshPairSelect: String =
    """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM bands a JOIN bands b ON a.band_idx = b.band_idx
      |  AND a.band_val = b.band_val AND a.doc_id < b.doc_id"""
      .stripMargin.replace("\n", " ")

  private val quantDuck = Similarity.quantizeSqlDuck

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactDuplicates(Tables.documents(s, dir), "doc_id", "text")),

    // maxShingleDocFreq=50: hot-posting guard (the production knob against
    // quadratic blowup on stopword-like shingles), mirrored in the oracle.
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, thresholdNum = 7, thresholdDen = 10, maxShingleDocFreq = 50)),

    "dedup_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text")),

    "dedup_lsh_pairs" -> ((s, dir) =>
      Dedup.lshCandidatePairs(Tables.documents(s, dir), "doc_id", "text")),

    // cluster resolution over the LSH candidate graph: component id =
    // min doc id, so canonical-doc selection is `doc_id = cluster_id`
    "dedup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.lshCandidatePairs(Tables.documents(s, dir), "doc_id", "text"),
        "doc_a", "doc_b")),

    // adversarial-diameter cluster resolution: 8 path graphs (each
    // residue class of doc_id chained in id order — diameter ~N/8, far
    // past min-label's O(diameter) reach) resolved by the alternating
    // large-star/small-star algorithm in O(log n) rounds
    "dedup_clusters_chain" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("g"))
      val w = Window.partitionBy("g").orderBy("doc_id")
      val pairs = docs
        .withColumn("nxt", lead("doc_id", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("doc_id").as("doc_a"), col("nxt").as("doc_b"))
      // left join + coalesce: a residue class holding a single doc yields
      // no chain pair, but the oracle's window-min still emits that doc
      // labeled itself — singleton robustness must not depend on the
      // fixture filling every class
      docs.select("doc_id")
        .join(Dedup.connectedComponentsStars(pairs, "doc_a", "doc_b"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    }),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash16(Tables.documents(s, dir), "doc_id", "text")),

    // 64-bit/4×16-chunk pair path (replaces the 16-bit variant whose
    // constant 1/32 blocking selectivity went quadratic at scale).
    // maxChunkFreq=50 is the hot-block guard for mass-duplicated
    // template clusters (measured: keeps candidates ~linear in N on the
    // fixture corpus; exact-dup clusters are dedup_exact's job).
    "dedup_simhash64_pairs" -> ((s, dir) =>
      Dedup.simhash64Pairs(Tables.documents(s, dir), "doc_id", "text",
        maxHd = 2, maxChunkFreq = 50)),

    "doc_fingerprint" -> ((s, dir) =>
      Dedup.winnowingFingerprints(Tables.documents(s, dir), "doc_id", "text", n = 3, w = 4)),

    "text_token_count" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars"))),

    // BPE-ish pre-tokenizer count (same RE2-safe pattern both engines)
    "text_bpe_tokens" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe_tokens"))),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(Tables.documents(s, dir), "doc_id", "text")),

    "text_lang_id" -> ((s, dir) =>
      TextAnalysis.languageId(Tables.documents(s, dir), "doc_id", "text")),

    // Gopher-style repetitiousness gates (dup-token / top-n-gram counts)
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionProfile(Tables.documents(s, dir), "doc_id", "text")),

    // context-window packing: 32-token chunks, 8-token overlap
    "text_chunks" -> ((s, dir) =>
      TextAnalysis.chunkTokens(Tables.documents(s, dir), "doc_id", "text",
        chunkSize = 32, overlap = 8)),

    // deterministic curation sampling: 20% of en, 10% of everything else
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
        rates = Map("en" -> 200), defaultPermille = 100)
        .select("doc_id", "lang", "source")),

    // exact 5 exemplars per source, hash-ordered (WindowGroupLimit path)
    "sample_topk_per_source" -> ((s, dir) =>
      Sampling.exactKPerStratum(Tables.documents(s, dir), "doc_id", "source", k = 5)
        .select("doc_id", "source", "rk")),

    // Query sets are bounded ABSOLUTELY (`vec_id < 50` — 50 queries at any
    // SF), not proportionally: a fractional query set (`% 10`) makes even
    // the baseline O(N²/10).
    "ann_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 50), k = 5)
    }),

    // Hard-negative mining — per anchor, the k nearest DIFFERENT-label
    // vectors (the contrastive-training near-misses). Same broadcast +
    // WindowGroupLimit shape as ann_cosine_topk with the label-mismatch
    // predicate fused into the join filter.
    "ann_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 50),
        "label", k = 5)
    }),

    // Index-backed mining — the |anchors| ≈ |corpus| production form:
    // candidates from the IVF cell join (ann_ivf_topk geometry), the
    // label-mismatch predicate fused into the cell join, nothing
    // corpus-sized broadcast.
    "ann_hard_negatives_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegativesIvf(emb, emb.filter(col("vec_id") < 50),
        "label", k = 5, numCentroids = 16, nprobe = 3)
    }),

    "ann_lsh_bucketed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 50), k = 5)
    }),

    "ann_ivf_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 50),
        numCentroids = 16, nprobe = 3, k = 5)
    }),

    // Fifth dedup family: embedding-cosine near-dup pairs. The fixture
    // embeddings are uniform random (max pairwise cosine ≈ 0.51), so the
    // gate threshold 0.4 is what yields a non-trivial verified pair set;
    // a production near-dup run would use ~0.9+ on real embeddings.
    "dedup_embedding_cosine" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, dir), threshold = 0.4)),

    "emb_label_stats" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), Similarity.quantize(col("embedding")).as("qv"))
        .withColumn("vsum", expr("aggregate(qv, 0L, (a, v) -> a + v)"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), sum("vsum").as("sum_q"))),

    "multimodal_meta" -> ((s, dir) =>
      Multimodal.metadata(Tables.documents(s, dir), "doc_id", "text")),

    // frame-extraction fan-out: every 5th frame of each "video" payload
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSample(Tables.documents(s, dir), "doc_id", "text", stride = 5)),

    // audio leg: windowed energy + silence trim over the stub PCM —
    // (doc, n_voiced, first/last voiced window, total energy)
    "multimodal_audio_energy" -> ((s, dir) =>
      Multimodal.audioEnergyProfile(Tables.documents(s, dir), "doc_id", "text"))
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin.replace("\n", " "),

    "dedup_ngram_jaccard" ->
      s"""WITH $shingleHashCte,
         |kept AS (SELECT doc_id, h FROM shh WHERE h IN
         |  (SELECT h FROM shh GROUP BY h HAVING count(*) <= 50)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, inter, sa.n_sh + sb.n_sh - inter AS uni
         |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE inter * 10 >= (sa.n_sh + sb.n_sh - inter) * 7""".stripMargin.replace("\n", " "),

    "dedup_minhash_sig" -> s"WITH $shingleHashCte, h AS (SELECT doc_id, h FROM shh) $minhashSigSelect",

    "dedup_lsh_pairs" -> s"WITH $lshCtes $lshPairSelect",

    // transitive closure of the LSH pair graph: reach(v, r) = r reachable
    // from v; min reachable id per vertex = the component label the Spark
    // side's min-label propagation converges to
    "dedup_clusters" ->
      s"""WITH RECURSIVE $lshCtes, prs AS ($lshPairSelect),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |  UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(v, r) AS (SELECT src, src FROM edges
         |  UNION SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.v = e.dst)
         |SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v"""
        .stripMargin.replace("\n", " "),

    // the chain fixture's closed form: every doc in residue class g
    // connects (transitively) to every other, so the component label is
    // the class minimum — no recursion needed in the oracle
    "dedup_clusters_chain" ->
      """SELECT doc_id, min(doc_id) OVER (PARTITION BY doc_id % 8) AS cluster_id
        |FROM documents""".stripMargin.replace("\n", " "),

    "dedup_simhash" -> {
      val sums = (0 until 16).map { j =>
        s"sum(CASE WHEN (h // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s_$j"
      }.mkString(", ")
      val sig = (0 until 16).map { j =>
        s"(CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH $thCte, agg AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)
         |SELECT doc_id, $sig AS simhash16 FROM agg""".stripMargin.replace("\n", " ")
    },

    "dedup_simhash64_pairs" -> {
      // Same construction as Dedup.simhash64Pairs, generated from the same
      // loop bounds: 64 signed bit-sums over two 32-bit md5 words, four
      // 16-bit chunk values, chunk-equality blocking, bit_count rerank.
      val sums = (0 until 64).map { g =>
        val (src, j) = if (g < 32) ("h1", g) else ("h2", g - 32)
        s"sum(CASE WHEN ($src // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s_$g"
      }.mkString(", ")
      val chunkExprs = (0 until 4).map { c =>
        (0 until 16).map { j =>
          s"(CASE WHEN s_${c * 16 + j} > 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ") + s" AS c$c"
      }.mkString(", ")
      val blocks = (0 until 4).map { c =>
        s"SELECT doc_id, c0, c1, c2, c3, $c AS ci, c$c AS cv FROM sig"
      }.mkString(" UNION ALL ")
      val ham = (0 until 4).map(c => s"bit_count(xor(a_c$c, b_c$c))").mkString(" + ")
      s"""WITH th AS (SELECT DISTINCT doc_id, tok FROM
         |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
         |h AS (SELECT doc_id,
         |  CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h1,
         |  CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) AS h2 FROM th),
         |agg AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
         |sig AS (SELECT doc_id, $chunkExprs FROM agg),
         |blocked0 AS ($blocks),
         |blocked AS (SELECT b.* FROM blocked0 b JOIN
         |  (SELECT ci, cv FROM blocked0 GROUP BY ci, cv HAVING count(*) <= 50) ok
         |  ON b.ci = ok.ci AND b.cv = ok.cv),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.c0 AS a_c0, a.c1 AS a_c1, a.c2 AS a_c2, a.c3 AS a_c3,
         |    b.c0 AS b_c0, b.c1 AS b_c1, b.c2 AS b_c2, b.c3 AS b_c3
         |  FROM blocked a JOIN blocked b
         |    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, $ham AS hamming
         |FROM cand WHERE $ham <= 2""".stripMargin.replace("\n", " ")
    },

    "doc_fingerprint" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, i AS pos,
        |    CAST(concat('0x', substr(md5(concat_ws(' ', t[i], t[i+1], t[i+2])), 1, 8)) AS BIGINT) AS h
        |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |win AS (SELECT doc_id, pos,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    max(pos) OVER (PARTITION BY doc_id) AS maxpos FROM sh)
        |SELECT DISTINCT doc_id, fp FROM win WHERE pos <= maxpos - 3""".stripMargin.replace("\n", " "),

    "text_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS n_chars
        |FROM documents""".stripMargin.replace("\n", " "),

    // DuckDB string literals keep backslashes literal; only the embedded
    // single quote needs doubling
    "text_bpe_tokens" ->
      s"""SELECT doc_id, len(regexp_extract_all(text,
         |  '${TextAnalysis.BpeishPattern.replace("'", "''")}')) AS n_bpe_tokens
         |FROM documents""".stripMargin.replace("\n", " "),

    "text_quality" -> {
      val stopList = TextAnalysis.StopWords.map(s => s"'$s'").mkString(", ")
      s"""SELECT doc_id, length(text) AS n_chars,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  len(list_distinct(string_split(text, ' '))) AS n_unique,
         |  len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) AS n_stop,
         |  (length(text) - (len(string_split(text, ' ')) - 1)) * 100 // len(string_split(text, ' ')) AS avg_token_len_x100
         |FROM documents""".stripMargin.replace("\n", " ")
    },

    "text_lang_id" -> {
      val stopList = TextAnalysis.StopWords.map(s => s"'$s'").mkString(", ")
      s"""WITH f AS (SELECT doc_id,
         |  len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) * 1000
         |    // len(string_split(text, ' ')) AS stop_per_mille FROM documents)
         |SELECT doc_id, stop_per_mille,
         |  CASE WHEN stop_per_mille >= 50 THEN 'en' ELSE 'und' END AS predicted_lang
         |FROM f""".stripMargin.replace("\n", " ")
    },

    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
        |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_tok_n
        |  FROM tc GROUP BY doc_id),
        |bg AS (SELECT doc_id, concat_ws(' ', t[i], t[i+1]) AS bg
        |  FROM toks, UNNEST(range(1, len(t))) AS r(i) WHERE len(t) >= 2),
        |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
        |bs AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n FROM bc GROUP BY doc_id)
        |SELECT ts.doc_id, n_tokens, n_distinct, top_tok_n,
        |  coalesce(top_bigram_n, 0) AS top_bigram_n
        |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id"""
        .stripMargin.replace("\n", " "),

    "text_chunks" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (SELECT doc_id, t, unnest(range(1, greatest(1, len(t) - 32 + 24) + 1, 24)) AS s
        |  FROM toks)
        |SELECT doc_id, CAST((s - 1) // 24 AS INTEGER) AS chunk_idx,
        |  CAST(len(t[s:s+31]) AS INTEGER) AS chunk_tokens,
        |  array_to_string(t[s:s+31], ' ') AS chunk_text
        |FROM st""".stripMargin.replace("\n", " "),

    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
        |  < CASE WHEN lang = 'en' THEN 200 ELSE 100 END"""
        .stripMargin.replace("\n", " "),

    "sample_topk_per_source" ->
      """WITH r AS (SELECT doc_id, source, row_number() OVER (
        |  PARTITION BY source ORDER BY
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000,
        |    doc_id) AS rk FROM documents)
        |SELECT doc_id, source, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 5"""
        .stripMargin.replace("\n", " "),

    "ann_cosine_topk" ->
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${Similarity.dotQSqlDuck("q.qv", "c.qv")} AS dot, q.nrm AS nq, c.nrm AS nc
         |  FROM n q, n c WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
         |s AS (SELECT qid, cid,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) AS cos_sim FROM p),
         |r AS (SELECT qid, cid, cos_sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank FROM s)
         |SELECT qid, cid, rank, cos_sim FROM r WHERE rank <= 5""".stripMargin.replace("\n", " "),

    // the ann_cosine_topk CTEs with the label-mismatch predicate fused
    // into the pair join — NULL labels excluded on both sides
    "ann_hard_negatives" ->
      s"""WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |  $quantDuck AS qv FROM embeddings WHERE label IS NOT NULL),
         |n AS (SELECT vec_id, label, qv,
         |  ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |p AS (SELECT q.vec_id AS qid, q.label AS q_label,
         |    c.vec_id AS cid, c.label AS c_label,
         |    ${Similarity.dotQSqlDuck("q.qv", "c.qv")} AS dot, q.nrm AS nq, c.nrm AS nc
         |  FROM n q, n c WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id
         |    AND c.label <> q.label),
         |s AS (SELECT qid, q_label, cid, c_label,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) AS cos_sim FROM p),
         |r AS (SELECT qid, q_label, cid, c_label, cos_sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank FROM s)
         |SELECT qid, q_label, cid, c_label, rank, cos_sim FROM r
         |WHERE rank <= 5""".stripMargin.replace("\n", " "),

    // the ann_ivf_topk CTEs over the label-guarded corpus, with the
    // label-mismatch predicate fused into the cell-candidate join
    "ann_hard_negatives_ivf" -> {
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      s"""WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |  $quantDuck AS qv FROM embeddings WHERE CAST(label AS BIGINT) IS NOT NULL),
         |n AS (SELECT vec_id, label, qv,
         |  ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |cents AS (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent FROM
         |  (SELECT vec_id, qv, nrm FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
         |ca AS (SELECT vec_id, label, qv, nrm, cent_id AS cell FROM (
         |  SELECT n.vec_id, n.label, n.qv, n.nrm, c.cent_id,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("n.qv", "c.centv"), "n.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM n, cents c) WHERE crn = 1),
         |qa AS (SELECT vec_id, label, qv, nrm, cent_id AS cell FROM (
         |  SELECT nq.vec_id, nq.label, nq.qv, nq.nrm, c.cent_id,
         |    row_number() OVER (PARTITION BY nq.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("nq.qv", "c.centv"), "nq.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM (SELECT * FROM n WHERE vec_id < 50) nq, cents c) WHERE crn <= 3),
         |p AS (SELECT qa.vec_id AS qid, qa.label AS q_label,
         |    ca.vec_id AS cid, ca.label AS c_label,
         |    ${cos(Similarity.dotQSqlDuck("qa.qv", "ca.qv"), "qa.nrm", "ca.nrm")} AS cos_sim
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id
         |    AND ca.label <> qa.label),
         |r AS (SELECT qid, q_label, cid, c_label, cos_sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank FROM p)
         |SELECT qid, q_label, cid, c_label, rank, cos_sim FROM r
         |WHERE rank <= 5""".stripMargin.replace("\n", " ")
    },

    "ann_lsh_bucketed" ->
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm,
         |    ${Similarity.bucketSql("qv", spark = false)} AS bucket FROM v),
         |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid, q.bucket AS bucket,
         |    ${Similarity.dotQSqlDuck("q.qv", "c.qv")} AS dot, q.nrm AS nq, c.nrm AS nc
         |  FROM n q JOIN n c ON q.bucket = c.bucket
         |  WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
         |s AS (SELECT qid, cid, bucket,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) AS cos_sim FROM p),
         |r AS (SELECT qid, cid, bucket, cos_sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank FROM s)
         |SELECT qid, cid, bucket, rank, cos_sim FROM r WHERE rank <= 5""".stripMargin.replace("\n", " "),

    "ann_ivf_topk" -> {
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |cents AS (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent FROM
         |  (SELECT vec_id, qv, nrm FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
         |ca AS (SELECT vec_id, qv, nrm, cent_id AS cell FROM (
         |  SELECT n.vec_id, n.qv, n.nrm, c.cent_id,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("n.qv", "c.centv"), "n.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM n, cents c) WHERE crn = 1),
         |qa AS (SELECT vec_id, qv, nrm, cent_id AS cell FROM (
         |  SELECT nq.vec_id, nq.qv, nq.nrm, c.cent_id,
         |    row_number() OVER (PARTITION BY nq.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("nq.qv", "c.centv"), "nq.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM (SELECT * FROM n WHERE vec_id < 50) nq, cents c) WHERE crn <= 3),
         |p AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid, ca.cell,
         |    ${cos(Similarity.dotQSqlDuck("qa.qv", "ca.qv"), "qa.nrm", "ca.nrm")} AS cos_sim
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id),
         |r AS (SELECT qid, cid, cell, cos_sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank FROM p)
         |SELECT qid, cid, cell, rank, cos_sim FROM r WHERE rank <= 5""".stripMargin.replace("\n", " ")
    },

    "dedup_embedding_cosine" -> {
      val tables = (0 until Similarity.TablesL).map(t =>
        s"SELECT vec_id, $t AS t, ${Similarity.tableBucketSql("qv", t, spark = false)} AS b FROM n")
        .mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |tb AS ($tables),
         |cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
         |  FROM tb a JOIN tb b ON a.t = b.t AND a.b = b.b AND a.vec_id < b.vec_id),
         |s AS (SELECT doc_a, doc_b,
         |    CAST(${Similarity.dotQSqlDuck("na.qv", "nb.qv")} AS DOUBLE) /
         |      (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))) AS cos_sim
         |  FROM cand JOIN n na ON cand.doc_a = na.vec_id JOIN n nb ON cand.doc_b = nb.vec_id)
         |SELECT doc_a, doc_b, cos_sim FROM s WHERE cos_sim >= 0.4""".stripMargin.replace("\n", " ")
    },

    "emb_label_stats" ->
      s"""SELECT label, count(*) AS n,
         |  CAST(sum(CAST(list_sum($quantDuck) AS BIGINT)) AS BIGINT) AS sum_q
         |FROM embeddings GROUP BY label""".stripMargin.replace("\n", " "),

    "multimodal_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
        |  lower(hex(substr(text, 1, 8)::BLOB)) AS header_hex,
        |  octet_length(text::BLOB) % 640 + 1 AS width,
        |  octet_length(text::BLOB) * 7 % 480 + 1 AS height,
        |  octet_length(text::BLOB) % 30 + 1 AS n_frames,
        |  CASE WHEN octet_length(text::BLOB) % 3 = 0 THEN 'img'
        |       WHEN octet_length(text::BLOB) % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS media_type
        |FROM documents""".stripMargin.replace("\n", " "),

    // range(0, n, 5) exclusive-end ≡ Spark sequence(0, n-1, 5) inclusive;
    // frame_id fingerprint = first 8 md5 hex chars as a decimal bigint
    // (the established cross-engine conv/CAST '0x' idiom)
    "multimodal_frames" ->
      """WITH meta AS (SELECT doc_id, octet_length(text::BLOB) % 30 + 1 AS n_frames
        |  FROM documents WHERE octet_length(text::BLOB) % 3 = 2)
        |SELECT doc_id, n_frames, u.i AS frame_idx,
        |  CAST(concat('0x', substr(md5(concat(doc_id, ':', u.i)), 1, 8)) AS BIGINT) AS frame_id
        |FROM meta, UNNEST(range(0, n_frames, 5)) u(i)""".stripMargin.replace("\n", " "),

    "multimodal_audio_energy" -> Multimodal.audioEnergySqlDuck()
  )
}
