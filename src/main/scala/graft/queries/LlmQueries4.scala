package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Curation, Dedup, QualityRules, Retrieval, Sampling, Similarity}

/** Fourth tranche of LLM-training-data pipeline gates: the published
  * quality-filter rulesets (Gopher document rules, C4 line rules),
  * temperature-scaled mixing, and the incremental-ingest snapshot delta.
  * Same oracle discipline as the earlier tranches — integer-exact
  * arithmetic generated constant-for-constant with the DuckDB SQL
  * (the Gopher/C4 oracles are RENDERED from the same Scala constants as
  * the Spark plans, so a threshold can't drift one-sided).
  *
  * The fixture corpus is single-line punctuation-free text, so the
  * line-level C4 gate builds its multi-line documents IN-QUERY from
  * neighboring docs' texts with deterministic punctuation suffixes —
  * the identical construction in both engines (the `pii_scrub` splice
  * pattern); the operator under test sees genuine multi-line docs with
  * genuinely varying line verdicts.
  */
object LlmQueries4 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher document-level quality rules (Rae et al. 2021 §A1.1)
    "quality_gopher" -> ((s, dir) =>
      QualityRules.gopherQuality(Tables.documents(s, dir), "doc_id", "text")),

    // temperature-α=½ mixing: per-source sqrt-flattened budget shares
    "mix_temperature" -> ((s, dir) =>
      Sampling.temperatureMixWeights(Tables.documents(s, dir), "source",
        graft.llm.TextAnalysis.tokenCount(col("text")), tokenBudget = 20000L)),

    // C4 line rules over synthetic multi-line docs: doc s's lines are
    // source texts s..s+2 suffixed by (source id % 4) ∈ {'.', '!', '',
    // ' {'} — exercising the punctuation, brace, and word-count verdicts
    // — plus a spliced "lorem ipsum" line on every 50th doc (doc kill)
    "c4_line_filter" -> ((s, dir) =>
      QualityRules.c4LineFilter(builtLineDocs(Tables.documents(s, dir)),
        "doc_id", "text", minWords = 5)),

    // paragraph-level exact dedup over synthetic 3-paragraph docs (doc
    // s's paragraphs are source texts s..s+2, so neighbors share two
    // paragraphs): keep first occurrence corpus-wide, reassemble
    "dedup_paragraph" -> ((s, dir) =>
      Dedup.paragraphDedup(builtParaDocs(Tables.documents(s, dir)),
        "doc_id", "text")),

    // next-fit-decreasing packing: same fold as pack_sequences, length-
    // descending order — long sequences claim bins, short ones fill tails
    "pack_sequences_nfd" -> ((s, dir) =>
      graft.llm.Packing.packGreedyDecreasing(Tables.documents(s, dir),
        "doc_id", "source", graft.llm.TextAnalysis.tokenCount(col("text")),
        tokenBudget = 128L)
        .select(col("doc_id"), col("grp").as("source"), col("n_tokens"),
          col("bin_idx"))),

    // winnowing blocking (Schleimer et al. 2003): docs sharing >=2
    // selected fingerprints, hot fingerprints (>50 docs) dropped
    "dedup_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowCandidatePairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, w = 4, minShared = 2L, maxFpDocFreq = 50L)),

    // bin utilization of the NFD pack — the number a packing-order
    // decision is made on (vs pack_bin_stats' arrival-order fill)
    "pack_bin_stats_nfd" -> ((s, dir) =>
      graft.llm.Packing.binStats(
        graft.llm.Packing.packGreedyDecreasing(Tables.documents(s, dir),
          "doc_id", "source", graft.llm.TextAnalysis.tokenCount(col("text")),
          tokenBudget = 128L),
        tokenBudget = 128L)
        .select(col("grp").as("source"), col("bin_idx"), col("n_docs"),
          col("fill_tokens"), col("pad_tokens"))),

    // surgical decontamination: trim the contaminated 3-gram span out of
    // each training doc (eval = the src0 held-out split, boilerplate cap
    // 20 like decontam_clean) instead of dropping the whole doc
    "decontam_trim" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.llm.Decontam.trimContaminated(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3, maxGramEvalDf = 20)
        .select("doc_id", "source", "text")
    }),

    // MinHash estimator calibration: per LSH candidate pair, the
    // signature-agreement estimate (agree × 125‰ — 8 hash functions, so
    // the estimate is integer-exact) alongside the exact shingle Jaccard
    // — the quality audit a MinHash deployment runs before trusting its
    // bands at scale. Pairs with zero shingle overlap (pure band
    // collisions) are excluded by the inner exact join.
    "dedup_minhash_est" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // ONE shingle-postings scan feeds BOTH legs (the r8 version
      // tokenized the corpus twice — once for the LSH candidates, once
      // for the exact join — and was the suite's heaviest query): the
      // materialized postings derive the MinHash signatures (→ bands →
      // candidates → agreement estimate) and the exact Jaccard join.
      val postings = graft.util.Materialize.stable(
        Dedup.shingleHashPostings(docs, "doc_id", "text", Dedup.MinhashShingleN))
      val sig = graft.util.Materialize.stable(
        Dedup.minhashSignaturesFromShingles(postings))
      val agree = (0 until Dedup.MinhashA.length)
        .map(i => when(col(s"sa.mh_$i") === col(s"sb.mh_$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      val est = graft.util.Materialize.stable(
        Dedup.lshCandidatePairsFromSignatures(sig)
          .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
          .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
          .select(col("doc_a"), col("doc_b"),
            (agree * lit(1000L / Dedup.MinhashA.length)).as("est_permille")))
      // exact leg CANDIDATE-BOUNDED (Dedup.jaccardForPairs): intersections
      // only for the LSH candidate pairs, never the corpus-wide postings
      // self-join; zero-overlap band collisions drop out of the inner
      // join exactly as before (jaccardForPairs omits inter-0 pairs)
      est.join(
        Dedup.jaccardForPairs(postings, est.select("doc_a", "doc_b")),
        Seq("doc_a", "doc_b"))
    }),

    // tumbling-window event rates via Spark's native window() — the
    // per-minute ingest-rate panel; the oracle is the equivalent integer
    // floor-bucket arithmetic (window() aligns to the epoch in UTC, so
    // unix_micros(start) == (ts_us div 60e6) * 60e6 for positive ts)
    "events_tumbling_rate" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(
        window(timestamp_micros(col("ts_us")), "1 minute").as("w"),
        col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(value*100, 0) AS BIGINT)")).as("cents"))
        .select(unix_micros(col("w.start")).as("bucket_us"),
          col("event_type"), col("n"), col("cents"))
    }),

    // round-8 composed curation: Gopher rules (fixture-tuned stop list)
    // → paragraph dedup → exact dedup → temperature budget, end to end
    // over the synthetic 3-paragraph corpus, vs ONE composed oracle
    "corpus_curated_v2" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val built = builtParaDocs(docs)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      Curation.curateV2(built, "doc_id", "text", "source",
        tokenBudget = 20000L, stopWords = Seq("the", "a"))
    }),

    // per-dimension embedding statistics — the feature-drift monitor for
    // an embedding pipeline: explode inflates rows ×Dim but partial
    // aggregation collapses each task to ≤Dim rows before the exchange,
    // so the shuffle carries tasks×Dim rows at any corpus size
    "emb_dim_stats" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir)
        .select(Similarity.quantize(col("embedding")).as("qv"))
      Dedup.widen(v)
        .select(posexplode(col("qv")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), sum("x").as("sum_q"),
          min("x").as("min_q"), max("x").as("max_q"),
          sum(when(col("x") > 0, 1L).otherwise(0L)).as("n_pos"))
    }),

    // incremental ingest dedup: the "new crawl" (every 2nd doc, re-keyed
    // +100000 so content dups exist across snapshots) admits only docs
    // whose hash is absent from the prior corpus AND first within itself
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val prior = docs.filter(col("doc_id") % 3 =!= 0)
      val fresh = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
      Dedup.incrementalDedup(fresh, prior, "doc_id", "text")
    }),

    // MMR diversification: brute-force top-10 per query, then 5 greedy
    // λ=0.7 selection rounds trading relevance against redundancy with
    // the already-picked set (unrolled declarative rounds, qid-keyed)
    "rerank_mmr" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cands = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 50), k = 10)
        .select(col("qid"), col("cid"), col("cos_sim").as("rel"))
      val vn = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
        .withColumn("nrm", Similarity.dotQ("qv", "qv"))
      val ps = cands.select(col("qid"), col("cid").as("cid_a"))
        .join(cands.select(col("qid"), col("cid").as("cid_b")), Seq("qid"))
        .filter(col("cid_a") =!= col("cid_b"))
        .join(vn.select(col("vec_id").as("cid_a"), col("qv").as("va"),
          col("nrm").as("na")), Seq("cid_a"))
        .join(vn.select(col("vec_id").as("cid_b"), col("qv").as("vb"),
          col("nrm").as("nb")), Seq("cid_b"))
        .withColumn("sim",
          Similarity.cosineFromInts(Similarity.dotQ("va", "vb"), col("na"), col("nb")))
        .select("qid", "cid_a", "cid_b", "sim")
      Retrieval.mmrRerank(cands, ps, k = 5, lambdaPermille = 700)
    }),

    // binary-hash ANN: 32-bit sign codes, Hamming-distance candidate
    // scan (bit_count(xor) over one long per vector), exact integer-
    // cosine rerank of the 4k survivors per query
    "ann_hamming_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hammingTopK(emb, emb.filter(col("vec_id") < 50), k = 5,
        nBits = 32, candMult = 4)
    }),

    // keep-best-per-cluster over the LSH near-dup graph: every cluster
    // (singletons included) elects its highest-n_chars member, ties to
    // the smallest id — the FineWeb-style canonical-doc selection
    "dedup_cluster_rep" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val labels = docs.select("doc_id")
        .join(Dedup.connectedComponents(
          Dedup.lshCandidatePairs(docs, "doc_id", "text"), "doc_a", "doc_b"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      Dedup.clusterRepresentatives(labels, docs, "doc_id", "n_chars")
    }),

    // incremental-ingest delta between two synthetic snapshots: old =
    // ids ∤ 7, new = ids ∤ 5 with every 11th text uppercased (changed)
    "corpus_delta" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, upper(col("text")))
            .otherwise(col("text")))
      Curation.snapshotDelta(oldSnap, newSnap, "doc_id", "text")
    }))

  /** Synthetic multi-line docs for the C4 gate: line i of doc s is the
    * text of source doc s+i (i = 0..2) suffixed by source-id-determined
    * punctuation, plus a "lorem ipsum" line on every 50th doc. The
    * IDENTICAL construction runs as CTEs in the oracle.
    */
  private def builtLineDocs(docs: DataFrame): DataFrame = {
    val suffix = expr(
      "CASE doc_id % 4 WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN '' ELSE ' {' END")
    val shifted = (0 to 2).map { i =>
      docs.select((col("doc_id") - i).as("doc_id"), lit(i).as("line_no"),
        concat(col("text"), suffix).as("line"))
    }.reduce(_ union _)
    val lorem = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), lit(3).as("line_no"),
        lit("lorem ipsum dolor sit amet.").as("line"))
    shifted.union(lorem).filter(col("doc_id") >= 0)
      .groupBy("doc_id")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(line_no, line))), x -> x.line)"),
        "\n").as("text"))
  }

  /** Synthetic 3-paragraph docs for the paragraph-dedup gate: paragraph
    * i of doc s is the text of source doc s+i, so neighboring docs
    * genuinely share paragraphs.
    */
  private def builtParaDocs(docs: DataFrame): DataFrame =
    (0 to 2).map { i =>
      docs.select((col("doc_id") - i).as("doc_id"), lit(i).as("para_no"),
        col("text").as("para"))
    }.reduce(_ union _)
      .filter(col("doc_id") >= 0)
      .groupBy("doc_id")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(para_no, para))), x -> x.para)"),
        "\n\n").as("text"))

  private val lineDocsCtes =
    """sh AS (SELECT d.doc_id - s.i AS doc_id, s.i AS line_no,
      |    d.text || CASE d.doc_id % 4 WHEN 0 THEN '.' WHEN 1 THEN '!'
      |      WHEN 2 THEN '' ELSE ' {' END AS line
      |  FROM documents d, (SELECT unnest([0, 1, 2]) AS i) s
      |  UNION ALL
      |  SELECT doc_id, 3, 'lorem ipsum dolor sit amet.' FROM documents
      |  WHERE doc_id % 50 = 0),
      |built AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
      |  FROM sh WHERE doc_id >= 0 GROUP BY doc_id), """
      .stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "quality_gopher" -> QualityRules.gopherSqlDuck("documents"),

    "mix_temperature" -> {
      val isq = Sampling.isqrtSqlDuck("n_tokens")
      """WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_docs, n_tokens, ISQ AS w_sqrt FROM per),
        |t AS (SELECT CAST(sum(w_sqrt) AS BIGINT) AS w_total FROM w)
        |SELECT source, n_docs, n_tokens, w_sqrt,
        |  CAST(w_sqrt * 1000 // w_total AS BIGINT) AS mix_permille,
        |  CAST(least(1000, (20000 * w_sqrt // w_total) * 1000 // n_tokens) AS BIGINT)
        |    AS rate_permille
        |FROM w, t""".stripMargin.replace("\n", " ").replace("ISQ", isq)
    },

    "c4_line_filter" ->
      QualityRules.c4SqlDuck("built", minWords = 5, withCtes = lineDocsCtes),

    "dedup_paragraph" ->
      """WITH sh AS (SELECT d.doc_id - s.i AS doc_id, s.i AS para_no, d.text AS para
        |  FROM documents d, (SELECT unnest([0, 1, 2]) AS i) s),
        |built AS (SELECT doc_id,
        |    string_agg(para, chr(10) || chr(10) ORDER BY para_no) AS text
        |  FROM sh WHERE doc_id >= 0 GROUP BY doc_id),
        |paras AS (SELECT doc_id,
        |    generate_subscripts(string_split(text, chr(10) || chr(10)), 1) AS para_no,
        |    unnest(string_split(text, chr(10) || chr(10))) AS para
        |  FROM built),
        |r AS (SELECT doc_id, para_no, para,
        |    row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, para_no) AS rn
        |  FROM paras),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    string_agg(CASE WHEN rn = 1 THEN para END, chr(10) || chr(10)
        |      ORDER BY para_no) AS text_kept
        |  FROM r GROUP BY doc_id)
        |SELECT doc_id, n_paras, n_kept, text_kept FROM agg WHERE n_kept >= 1"""
        .stripMargin.replace("\n", " "),

    "pack_sequences_nfd" ->
      """WITH RECURSIVE toks AS (SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS n_tokens FROM documents),
        |t AS (SELECT source, doc_id, n_tokens, row_number() OVER (
        |    PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS rn FROM toks),
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

    "dedup_winnow_pairs" ->
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
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_shared FROM pr WHERE n_shared >= 2"""
        .stripMargin.replace("\n", " "),

    "pack_bin_stats_nfd" ->
      """WITH RECURSIVE toks AS (SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS n_tokens FROM documents),
        |t AS (SELECT source, doc_id, n_tokens, row_number() OVER (
        |    PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS rn FROM toks),
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

    "decontam_trim" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, source, i AS start, array_to_string(t[i:i+2], ' ') AS w
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i) WHERE len(t) >= 3),
        |wh AS (SELECT doc_id, source, start,
        |  CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) AS h FROM w),
        |evg AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM wh WHERE source = 'src0')
        |  GROUP BY h HAVING count(*) <= 20),
        |hit AS (SELECT doc_id, min(start) AS first_hit, max(start) AS last_hit
        |  FROM wh WHERE source <> 'src0' AND h IN (SELECT h FROM evg) GROUP BY 1),
        |trimmed AS (SELECT d.doc_id, d.source, hit.first_hit,
        |  CASE WHEN first_hit IS NULL THEN d.text
        |    ELSE array_to_string(list_concat(tk.t[1:first_hit - 1],
        |      tk.t[last_hit + 3:]), ' ') END AS text
        |  FROM documents d JOIN toks tk ON d.doc_id = tk.doc_id
        |  LEFT JOIN hit ON d.doc_id = hit.doc_id
        |  WHERE d.source <> 'src0')
        |SELECT doc_id, source, text FROM trimmed
        |WHERE first_hit IS NULL OR len(text) > 0"""
        .stripMargin.replace("\n", " "),

    "dedup_minhash_est" -> {
      val perHash = 1000 / graft.llm.Dedup.MinhashA.length
      val agreeSum = (0 until graft.llm.Dedup.MinhashA.length)
        .map(i => s"(CASE WHEN a.mh_$i = b.mh_$i THEN $perHash ELSE 0 END)")
        .mkString(" + ")
      s"""WITH ${LlmQueries.lshCtes}, prs AS (${LlmQueries.lshPairSelect}),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY doc_id),
         |ip AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS (SELECT ip.doc_a, ip.doc_b,
         |    CAST(ip.inter * 1000 // (sa.n_sh + sb.n_sh - ip.inter) AS BIGINT)
         |      AS jac_permille
         |  FROM ip JOIN sizes sa ON sa.doc_id = ip.doc_a
         |    JOIN sizes sb ON sb.doc_id = ip.doc_b),
         |est AS (SELECT p.doc_a, p.doc_b, CAST($agreeSum AS BIGINT) AS est_permille
         |  FROM prs p JOIN sig a ON a.doc_id = p.doc_a
         |    JOIN sig b ON b.doc_id = p.doc_b)
         |SELECT est.doc_a, est.doc_b, est.est_permille, ex.jac_permille
         |FROM est JOIN ex ON est.doc_a = ex.doc_a AND est.doc_b = ex.doc_b"""
        .stripMargin.replace("\n", " ")
    },

    "events_tumbling_rate" ->
      """SELECT (epoch_us(ts) // 60000000) * 60000000 AS bucket_us, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1, 2""".stripMargin.replace("\n", " "),

    "corpus_curated_v2" -> {
      val pd = "chr(10) || chr(10)"
      val isq = Sampling.isqrtSqlDuck("n_tokens")
      val gopherPass = QualityRules.gopherPassSqlDuck("bs", Seq("the", "a"))
      s"""WITH sh AS (SELECT d.doc_id - s.i AS doc_id, s.i AS para_no, d.text AS para
         |  FROM documents d, (SELECT unnest([0, 1, 2]) AS i) s),
         |built AS (SELECT doc_id, string_agg(para, $pd ORDER BY para_no) AS text
         |  FROM sh WHERE doc_id >= 0 GROUP BY doc_id),
         |bs AS (SELECT b.doc_id, b.text, d.source FROM built b
         |  JOIN documents d ON b.doc_id = d.doc_id),
         |gp AS ($gopherPass),
         |keep AS (SELECT bs.* FROM bs JOIN gp ON bs.doc_id = gp.doc_id),
         |paras AS (SELECT doc_id,
         |    generate_subscripts(string_split(text, $pd), 1) AS para_no,
         |    unnest(string_split(text, $pd)) AS para FROM keep),
         |pr AS (SELECT doc_id, para_no, para,
         |    row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, para_no) AS rn
         |  FROM paras),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
         |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    string_agg(CASE WHEN rn = 1 THEN para END, $pd ORDER BY para_no) AS text_kept
         |  FROM pr GROUP BY doc_id),
         |pd2 AS (SELECT * FROM agg WHERE n_kept >= 1),
         |ex AS (SELECT pd2.*, row_number() OVER (PARTITION BY md5(text_kept)
         |    ORDER BY doc_id) AS xrn FROM pd2),
         |uq AS (SELECT e.doc_id, e.n_paras, e.n_kept, e.text_kept, k.source
         |  FROM ex e JOIN keep k ON e.doc_id = k.doc_id WHERE e.xrn = 1),
         |per AS (SELECT source, CAST(sum(len(string_split(text_kept, ' '))) AS BIGINT)
         |    AS n_tokens FROM uq GROUP BY source),
         |wt AS (SELECT source, n_tokens, $isq AS w_sqrt FROM per),
         |tt AS (SELECT CAST(sum(w_sqrt) AS BIGINT) AS w_total FROM wt),
         |rt AS (SELECT source,
         |    CAST(least(1000, (20000 * w_sqrt // w_total) * 1000 // n_tokens) AS BIGINT)
         |      AS rate FROM wt, tt)
         |SELECT uq.doc_id, uq.source, uq.n_paras, uq.n_kept,
         |  md5(uq.text_kept) AS text_hash
         |FROM uq JOIN rt ON uq.source = rt.source
         |WHERE CAST(concat('0x', substr(md5(CAST(uq.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |  % 1000 < rt.rate""".stripMargin.replace("\n", " ")
    },

    "emb_dim_stats" ->
      s"""WITH v AS (SELECT ${Similarity.quantizeSqlDuck} AS qv FROM embeddings),
         |e AS (SELECT generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS x FROM v)
         |SELECT dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sum_q,
         |  min(x) AS min_q, max(x) AS max_q,
         |  CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |FROM e GROUP BY dim""".stripMargin.replace("\n", " "),

    // coalesce mirrors incrementalDedup's NULL-text sentinel
    "dedup_incremental" ->
      """WITH prior AS (SELECT DISTINCT coalesce(md5(text), '<null>') AS text_hash
        |    FROM documents WHERE doc_id % 3 <> 0),
        |fresh AS (SELECT doc_id + 100000 AS doc_id,
        |    coalesce(md5(text), '<null>') AS text_hash
        |    FROM documents WHERE doc_id % 2 = 0),
        |nov AS (SELECT f.doc_id, f.text_hash FROM fresh f
        |    LEFT JOIN prior p ON f.text_hash = p.text_hash
        |    WHERE p.text_hash IS NULL),
        |r AS (SELECT doc_id, text_hash,
        |    row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
        |  FROM nov)
        |SELECT doc_id, text_hash FROM r WHERE rn = 1"""
        .stripMargin.replace("\n", " "),

    "rerank_mmr" -> {
      val quant = Similarity.quantizeSqlDuck
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      val ctes =
        s"""v AS (SELECT vec_id, $quant AS qv FROM embeddings),
           |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
           |bf AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
           |    ${cos(Similarity.dotQSqlDuck("q.qv", "c.qv"), "q.nrm", "c.nrm")} AS cos_sim
           |  FROM n q, n c WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
           |cands AS (SELECT qid, cid, cos_sim AS rel FROM
           |  (SELECT qid, cid, cos_sim, row_number() OVER (PARTITION BY qid
           |     ORDER BY cos_sim DESC, cid) AS rnk FROM bf) WHERE rnk <= 10),
           |ps AS (SELECT a.qid, a.cid AS cid_a, b.cid AS cid_b,
           |    ${cos(Similarity.dotQSqlDuck("na.qv", "nb.qv"), "na.nrm", "nb.nrm")} AS sim
           |  FROM cands a JOIN cands b ON a.qid = b.qid AND a.cid <> b.cid
           |  JOIN n na ON na.vec_id = a.cid JOIN n nb ON nb.vec_id = b.cid), """
          .stripMargin.replace("\n", " ")
      Retrieval.mmrSqlDuck("cands", "ps", k = 5, lambdaPermille = 700, withCtes = ctes)
    },

    "ann_hamming_topk" -> {
      val quant = Similarity.quantizeSqlDuck
      val code = Similarity.bucketSql("qv", spark = false, nPlanes = 32)
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      s"""WITH v AS (SELECT vec_id, $quant AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm,
         |    $code AS code FROM v),
         |q AS (SELECT * FROM n WHERE vec_id < 50),
         |cand AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    bit_count(xor(q.code, c.code)) AS hd,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY bit_count(xor(q.code, c.code)), c.vec_id) AS hrank
         |  FROM q, n c WHERE c.vec_id <> q.vec_id),
         |cl AS (SELECT qid, cid, hd FROM cand WHERE hrank <= 20),
         |p AS (SELECT cl.qid, cl.cid, cl.hd,
         |    ${Similarity.dotQSqlDuck("qn.qv", "cn.qv")} AS dot,
         |    qn.nrm AS nq, cn.nrm AS nc
         |  FROM cl JOIN n cn ON cl.cid = cn.vec_id JOIN n qn ON cl.qid = qn.vec_id),
         |s AS (SELECT qid, cid, hd, ${cos("dot", "nq", "nc")} AS cos_sim FROM p),
         |r AS (SELECT qid, cid, hd, cos_sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank
         |  FROM s)
         |SELECT qid, cid, hd, rank, cos_sim FROM r WHERE rank <= 5"""
        .stripMargin.replace("\n", " ")
    },

    "dedup_cluster_rep" ->
      s"""WITH RECURSIVE ${LlmQueries.lshCtes}, prs AS (${LlmQueries.lshPairSelect}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
         |  UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(v, r) AS (SELECT src, src FROM edges
         |  UNION SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.v = e.dst),
         |lab0 AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
         |lab AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN lab0 l ON d.doc_id = l.doc_id),
         |j AS (SELECT lab.cluster_id, lab.doc_id, CAST(d.n_chars AS BIGINT) AS q
         |  FROM lab JOIN documents d ON lab.doc_id = d.doc_id),
         |rk AS (SELECT cluster_id, doc_id, q,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rn
         |  FROM j),
         |st AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |    CAST(sum(q) AS BIGINT) AS total_quality
         |  FROM j GROUP BY cluster_id)
         |SELECT st.cluster_id, st.n_members, st.total_quality,
         |  rk.doc_id AS rep_doc_id, rk.q AS rep_quality
         |FROM st JOIN rk ON st.cluster_id = rk.cluster_id AND rk.rn = 1"""
        .stripMargin.replace("\n", " "),

    // coalesce mirrors snapshotDelta's NULL-text sentinel (no nulls in
    // the fixture, but the two engines must share the convention)
    "corpus_delta" ->
      """WITH o AS (SELECT doc_id, coalesce(md5(text), '<null>') AS old_hash
        |    FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |    coalesce(md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END),
        |      '<null>') AS new_hash
        |    FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash <> new_hash THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id"""
        .stripMargin.replace("\n", " "))
}
