package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Curation, Decontam, Retrieval, Sampling, Similarity, TextAnalysis}

/** Third tranche of LLM-training-data pipeline gates: DSIR importance
  * weighting, bigram-LM fluency scoring, SemDeDup semantic dedup (plain
  * + sampled-codebook), the PQ family (`ann_pq_topk`, IVF-PQ, residual
  * IVF-PQ), hybrid RRF retrieval, canonical text normalization, the
  * token-length histogram, and the end-to-end composed curation gate.
  * Same oracle discipline as [[LlmQueries]] / [[LlmQueries2]] —
  * integer-exact arithmetic shared constant-for-constant with the DuckDB
  * SQL. `semantic_dedup` gates the Lloyd-REFINED codebook end to end:
  * with `iters` fixed at 2 the refinement has a closed SQL form (each
  * round unrolls to an assign-by-cosine CTE + a per-dimension integer
  * mean, `//` and Spark's `div` both truncating toward zero), so the
  * gate seeds with the hash-sampled codebook ([[Similarity.sampledCentroids]],
  * the closed-form seed) and oracles assignment, both Lloyd rounds, and
  * the within-cell prune. The production default
  * [[Similarity.semanticDedup]] differs only in seeding policy
  * (greedy farthest-point, spec-proven in `DedupSimilaritySpec` incl.
  * parity with the distributed variant); Lloyd and the prune are the
  * SAME code path the oracle gates.
  */
object LlmQueries3 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DSIR: weight the whole corpus toward the held-out split's hashed
    // unigram+bigram distribution (target = src0, the decontam split's
    // quality-reference role)
    "dsir_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Sampling.importanceWeights(docs, docs.filter(col("source") === "src0"),
        "doc_id", "text", numBuckets = 4096)
    }),

    // bigram-LM fluency (the KenLM/CCNet-filter shape): LM trained on
    // the held-out split (src0 = the clean-reference role), scoring the
    // training split
    "lm_fluency" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.lmFluency(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text")
    }),

    // SemDeDup at 16 cells, 2 Lloyd rounds, cosine >= 0.4 (the fixture's
    // non-trivial threshold — see dedup_embedding_cosine's rationale).
    // Hash-sampled seeds (the closed-form policy) so the ENTIRE pipeline
    // — seeding, both Lloyd rounds, assignment, within-cell prune — is
    // hash-oracled; the farthest-point-seeded production default runs
    // the identical kmeansCentroidsWith/semanticDedupWith path.
    "semantic_dedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticDedupWith(emb,
        Similarity.kmeansCentroidsWith(emb,
          Similarity.sampledCentroids(emb, 16), iters = 2),
        threshold = 0.4)
    }),

    // PQ asymmetric-distance ANN (Jégou et al.): 8 subspaces x 16 codes,
    // all-integer distances — the compressed-candidate 100 TB search path
    "ann_pq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 50), k = 5)
    }),

    // SQ8 scalar-quantization ANN (the FAISS QT_8bit tier): per-dim
    // min/max train, one-byte codes, asymmetric integer L2 — the
    // full-dimension middle tier between exact int64 and PQ codes
    "ann_sq8_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 50), k = 5)
    }),

    // eval-integrity view: per held-out doc, leakage into the train split
    "decontam_eval_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Decontam.evalContaminationReport(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3)
    }),

    // packing-budget sizing: power-of-two token-length histogram
    "pack_length_histogram" -> ((s, dir) =>
      graft.llm.Packing.lengthHistogram(Tables.documents(s, dir), "doc_id",
        TextAnalysis.tokenCount(col("text")))),

    // canonical normalization (the dedup-robustness pre-stage)
    "text_normalize" -> ((s, dir) =>
      TextAnalysis.normalized(Tables.documents(s, dir), "doc_id", "text")),

    // PII scrub + per-class report, fully hash-oracled. The fixture is
    // word-only (zero natural regex hits — verified), so the query
    // splices deterministic synthetic PII into every doc INSIDE the
    // query — one value per class, derived from doc_id — with the
    // identical concat in the DuckDB oracle. Both engines then run the
    // same sequential class order, so the scrubbed text AND the
    // attribution counts are gated end to end.
    "pii_scrub" -> ((s, dir) => {
      val spliced = Tables.documents(s, dir).select(col("doc_id"), concat(
        col("text"),
        lit(" contact "), col("doc_id").cast("string"), lit("@example.com"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"),
        lit(" call +1 (555) 123-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ssn 123-45-6789 end")).as("text"))
      val rep = graft.llm.PiiScrub.piiReport(spliced, "doc_id", "text")
      graft.llm.PiiScrub.scrubbed(spliced, "text")
        .join(rep, Seq("doc_id"))
        .select(col("doc_id") +: col("text") +:
          (graft.llm.PiiScrub.Patterns.map(_._1) :+ "pii").map(n =>
            col(s"n_$n").cast("long").as(s"n_$n")): _*)
    }),

    // Hybrid retrieval: TF-IDF lexical top-10 fused with brute-force
    // embedding-cosine top-10 by reciprocal-rank fusion — the RAG-stack
    // standard. RRF consumes only ranks, so the fused gate stays
    // integer-exact even over the float-scored semantic list.
    "hybrid_rrf_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val probes = docs.filter(col("source") === "src0" && col("doc_id") % 100 === 0)
      val corpusDocs = docs.filter(col("source") =!= "src0")
      val lex = Retrieval.tfidfTopK(corpusDocs, probes, "doc_id", "text", k = 10)
        .select("query_id", "doc_id", "rnk")
      val emb = Tables.embeddings(s, dir)
      val sem = Similarity.bruteForceTopK(
        emb.join(corpusDocs.select(col("doc_id").as("vec_id")), Seq("vec_id")),
        emb.join(probes.select(col("doc_id").as("vec_id")), Seq("vec_id")), k = 10)
        .select(col("qid").as("query_id"), col("cid").as("doc_id"), col("rank").as("rnk"))
      Retrieval.rrfFuse(Seq(lex, sem), k = 10)
    }),

    // IVF-PQ: coarse cells bound candidates, PQ codes score them — the
    // billion-scale composition, hash-oracled end to end
    "ann_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 50), k = 5)
    }),

    // residual IVF-PQ (the FAISS default encoding): codes quantize
    // x - centroid(cell), spending codebook resolution on within-cell
    // variation
    "ann_ivfpq_residual_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqResidualTopK(emb, emb.filter(col("vec_id") < 50), k = 5)
    }),

    // SemDeDup against the hash-sampled codebook (no Lloyd): the variant
    // with a closed SQL form, so the whole prune is hash-oracle-gated —
    // the oracle reuses ann_ivf_topk's centroid/assignment CTEs
    "semantic_dedup_sampled" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticDedupWith(emb,
        graft.util.Materialize.stable(Similarity.sampledCentroids(emb, 16)),
        threshold = 0.4)
    }),

    // the FULL composed curation recipe, oracle-exact end to end:
    // quality -> exact dedup -> decontam (vs src0) -> per-source budget.
    // Same thresholds as corpus_quality_filter / corpus_report so the
    // stage oracles and the composition oracle share constants.
    "corpus_curated" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Curation.curate(docs, docs.filter(col("source") === "src0"),
        "doc_id", "text", "source", minTokens = 20, maxTokens = 90,
        minUniqPermille = 350, maxTopTokPermille = 150, decontamN = 3,
        minHitPermille = 100, tokenBudgetPerSource = 400L)
        .select("doc_id", "source")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "dsir_weights" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT doc_id, source, unnest(t) AS f FROM toks),
        |big AS (SELECT doc_id, source, concat_ws(' ', t[i], t[i+1]) AS f
        |  FROM toks, UNNEST(range(1, len(t))) AS r(i) WHERE len(t) >= 2),
        |feats AS (SELECT doc_id, source,
        |  CAST(concat('0x', substr(md5(f), 1, 8)) AS BIGINT) % 4096 AS b
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
        |p AS (SELECT b, count(*) AS pc FROM feats GROUP BY b),
        |q AS (SELECT b, count(*) AS qc FROM feats WHERE source = 'src0' GROUP BY b),
        |ratio AS (SELECT p.b,
        |  (coalesce(qc, 0) + 1) * 1000000 // (pc + 1) AS r
        |  FROM p LEFT JOIN q USING (b)),
        |w AS (SELECT doc_id, count(*) AS n_feats, CAST(sum(r) AS BIGINT) AS weight
        |  FROM feats JOIN ratio USING (b) GROUP BY doc_id)
        |SELECT doc_id, n_feats, weight, weight // n_feats AS weight_per_feat
        |FROM w""".stripMargin.replace("\n", " "),

    "lm_fluency" ->
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
        |  WHERE big.source <> 'src0')
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(p_permille) AS BIGINT) // count(*) AS score_permille
        |FROM sc GROUP BY doc_id""".stripMargin.replace("\n", " "),

    "ann_pq_topk" -> {
      val m = 8
      val w = Similarity.Dim / m
      val quantDuck = Similarity.quantizeSqlDuck
      // per-subspace slices generated from the same loop bounds as the
      // Spark side (DuckDB slices are 1-based inclusive)
      def slices(src: String, out: String) = (0 until m).map { i =>
        s"SELECT vec_id, $i AS m, $src[${i * w + 1}:${(i + 1) * w}] AS $out FROM n"
      }.mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv FROM v),
         |cents AS (SELECT vec_id, qv FROM n
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
         |cb AS (SELECT vec_id AS code, m, cv FROM (
         |  ${(0 until m).map(i =>
             s"SELECT vec_id, $i AS m, qv[${i * w + 1}:${(i + 1) * w}] AS cv FROM cents")
             .mkString(" UNION ALL ")})),
         |subs AS (${slices("qv", "sv")}),
         |enc AS (SELECT vec_id, m, code FROM (
         |  SELECT s.vec_id, s.m, cb.code, row_number() OVER (
         |    PARTITION BY s.vec_id, s.m
         |    ORDER BY ${Similarity.l2SqlDuck("s.sv", "cb.cv")} ASC, cb.code) AS rn
         |  FROM subs s JOIN cb ON s.m = cb.m) WHERE rn = 1),
         |qd AS (SELECT s.vec_id AS qid, cb.m, cb.code,
         |    ${Similarity.l2SqlDuck("s.sv", "cb.cv")} AS d
         |  FROM subs s JOIN cb ON s.m = cb.m WHERE s.vec_id < 50),
         |approx AS (SELECT qd.qid, enc.vec_id AS cid,
         |    CAST(sum(qd.d) AS BIGINT) AS approx_dist
         |  FROM enc JOIN qd ON enc.m = qd.m AND enc.code = qd.code
         |  WHERE enc.vec_id <> qd.qid GROUP BY 1, 2),
         |r AS (SELECT qid, cid, approx_dist, row_number() OVER (
         |    PARTITION BY qid ORDER BY approx_dist ASC, cid) AS rank FROM approx)
         |SELECT qid, cid, rank, approx_dist FROM r WHERE rank <= 5"""
        .stripMargin.replace("\n", " ")
    },

    "ann_sq8_topk" -> {
      val quantDuck = Similarity.quantizeSqlDuck
      // identical constant-for-constant arithmetic: clamp((v-mn)*255 //
      // (mx-mn)) encode, mn + code*(mx-mn) // 255 decode (both engines
      // truncate toward zero on non-negative operands), asymmetric L2
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |d AS (SELECT i, min(qv[i]) AS mn, max(qv[i]) AS mx
         |  FROM v, UNNEST(range(1, ${Similarity.Dim + 1})) AS r(i) GROUP BY i),
         |st AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM d),
         |enc AS (SELECT vec_id, list_transform(list_zip(qv, mn, mx), s ->
         |    greatest(0, least(255, CASE WHEN s[3] = s[2] THEN 0
         |      ELSE ((s[1] - s[2]) * 255) // (s[3] - s[2]) END))) AS codes
         |  FROM v, st),
         |dec AS (SELECT vec_id AS cid, list_transform(list_zip(codes, mn, mx), s ->
         |    s[2] + (s[1] * (s[3] - s[2])) // 255) AS vhat
         |  FROM enc, st),
         |q AS (SELECT vec_id AS qid, qv FROM v WHERE vec_id < 50),
         |sc AS (SELECT qid, cid, ${Similarity.l2SqlDuck("qv", "vhat")} AS approx_dist
         |  FROM dec, q WHERE cid <> qid),
         |r AS (SELECT qid, cid, approx_dist, row_number() OVER (
         |    PARTITION BY qid ORDER BY approx_dist ASC, cid) AS rank FROM sc)
         |SELECT qid, cid, rank, approx_dist FROM r WHERE rank <= 5"""
        .stripMargin.replace("\n", " ")
    },

    "decontam_eval_report" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        |  FROM toks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |shh AS (SELECT DISTINCT doc_id, source,
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM sh),
        |corp AS (SELECT doc_id, h FROM shh WHERE source <> 'src0'),
        |ev AS (SELECT doc_id AS eval_id, h FROM shh WHERE source = 'src0'),
        |sizes AS (SELECT eval_id, count(*) AS n_grams FROM ev GROUP BY eval_id),
        |hits AS (SELECT e.eval_id, count(DISTINCT e.h) AS n_leaked,
        |    count(DISTINCT c.doc_id) AS n_train_docs
        |  FROM corp c JOIN ev e ON c.h = e.h GROUP BY e.eval_id)
        |SELECT h.eval_id, n_leaked, n_train_docs, s.n_grams,
        |  n_leaked * 1000 // s.n_grams AS leak_permille
        |FROM hits h JOIN sizes s ON h.eval_id = s.eval_id"""
        .stripMargin.replace("\n", " "),

    "pack_length_histogram" -> {
      val bucket = graft.llm.Packing.bucketSql("len(string_split(text, ' '))")
      s"""SELECT $bucket AS bucket, count(*) AS n_docs,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY 1""".stripMargin.replace("\n", " ")
    },

    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS norm_text,
        |  len(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS n_tokens
        |FROM documents""".stripMargin.replace("\n", " "),

    // the same splice + sequential scrub as the Spark side, CTE per
    // class in PiiScrub.Patterns order (patterns interpolated from the
    // SAME Seq, constant-for-constant); counts on the earlier-classes-
    // already-replaced text so attribution matches the scrub
    "pii_scrub" -> {
      val splice = "text || ' contact ' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com' || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || " +
        "'.7' || ' call +1 (555) 123-' || " +
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ssn 123-45-6789 end'"
      val steps = graft.llm.PiiScrub.Patterns.zipWithIndex.map {
        case ((name, pat), i) =>
          val prev = if (i == 0) "d" else s"s$i"
          s"""s${i + 1} AS (SELECT doc_id,${
            (0 until i).map(j =>
              s" n_${graft.llm.PiiScrub.Patterns(j)._1},").mkString}
             |  CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_$name,
             |  regexp_replace(t, '$pat', '[${name.toUpperCase}]', 'g') AS t
             |  FROM $prev)""".stripMargin
      }
      val names = graft.llm.PiiScrub.Patterns.map(n => s"n_${n._1}")
      s"""WITH d AS (SELECT doc_id, $splice AS t FROM documents),
         |${steps.mkString(",\n")}
         |SELECT doc_id, t AS text, ${names.mkString(", ")},
         |  ${names.mkString(" + ")} AS n_pii
         |FROM s${graft.llm.PiiScrub.Patterns.size}"""
        .stripMargin.replace("\n", " ")
    },

    "hybrid_rrf_topk" -> {
      val quantDuck = Similarity.quantizeSqlDuck
      s"""WITH corp AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE source <> 'src0'),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM corp GROUP BY 1, 2),
         |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |nn AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
         |qt AS (SELECT DISTINCT doc_id AS query_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE source = 'src0' AND doc_id % 100 = 0),
         |qi AS (SELECT query_id, qt.term, nn.n * 1000 // dft.df AS idf_permille
         |  FROM qt JOIN dft ON qt.term = dft.term CROSS JOIN nn),
         |sc AS (SELECT query_id, tf.doc_id, sum(tf.tf * qi.idf_permille) AS score
         |  FROM tf JOIN qi ON tf.term = qi.term GROUP BY 1, 2),
         |lex AS (SELECT query_id, doc_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc),
         |v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |ce AS (SELECT n.* FROM n JOIN documents d ON n.vec_id = d.doc_id
         |  AND d.source <> 'src0'),
         |qe AS (SELECT n.* FROM n JOIN documents d ON n.vec_id = d.doc_id
         |  AND d.source = 'src0' AND d.doc_id % 100 = 0),
         |ss AS (SELECT qe.vec_id AS query_id, ce.vec_id AS doc_id,
         |    CAST(${Similarity.dotQSqlDuck("qe.qv", "ce.qv")} AS DOUBLE) /
         |      (sqrt(CAST(qe.nrm AS DOUBLE)) * sqrt(CAST(ce.nrm AS DOUBLE))) AS cos
         |  FROM qe, ce WHERE ce.vec_id <> qe.vec_id),
         |sem AS (SELECT query_id, doc_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rnk FROM ss),
         |contrib AS (
         |  SELECT query_id, doc_id, 1000000 // (60 + rnk) AS c FROM lex WHERE rnk <= 10
         |  UNION ALL
         |  SELECT query_id, doc_id, 1000000 // (60 + rnk) AS c FROM sem WHERE rnk <= 10),
         |fused AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_score
         |  FROM contrib GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, rrf_score, row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rnk FROM fused)
         |SELECT query_id, doc_id, rrf_score, rnk FROM r WHERE rnk <= 10"""
        .stripMargin.replace("\n", " ")
    },

    "ann_ivfpq_residual_topk" -> {
      val m = 8
      val w = Similarity.Dim / m
      val quantDuck = Similarity.quantizeSqlDuck
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      val resid = "list_transform(list_zip(b.qv, c.centv), s -> s[1] - s[2])"
      def slices(src: String, idOut: String, rvCol: String, extra: String) =
        (0 until m).map(i =>
          s"SELECT vec_id AS $idOut$extra, $i AS m, $rvCol[${i * w + 1}:${(i + 1) * w}] AS sv FROM SRC")
          .mkString(" UNION ALL ").replace("SRC", src)
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |cents AS (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent FROM
         |  (SELECT vec_id, qv, nrm FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
         |cb2 AS (SELECT vec_id, qv, nrm FROM n
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16 OFFSET 16),
         |cbc AS (SELECT vec_id, rv FROM (
         |  SELECT b.vec_id, $resid AS rv, row_number() OVER (
         |    PARTITION BY b.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("b.qv", "c.centv"), "b.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS rn
         |  FROM cb2 b, cents c) WHERE rn = 1),
         |cb AS (SELECT vec_id AS code, m, sv AS cv FROM (${slices("cbc", "vec_id", "rv", "")})
         |  ),
         |ra AS (SELECT vec_id, cell, rv FROM (
         |  SELECT b.vec_id, c.cent_id AS cell, $resid AS rv, row_number() OVER (
         |    PARTITION BY b.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("b.qv", "c.centv"), "b.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS rn
         |  FROM n b, cents c) WHERE rn = 1),
         |qa AS (SELECT vec_id, cell, rv FROM (
         |  SELECT b.vec_id, c.cent_id AS cell, $resid AS rv, row_number() OVER (
         |    PARTITION BY b.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("b.qv", "c.centv"), "b.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS rn
         |  FROM (SELECT * FROM n WHERE vec_id < 50) b, cents c) WHERE rn <= 3),
         |rsubs AS (${slices("ra", "cid", "rv", ", cell")}),
         |qsubs AS (${slices("qa", "qid", "rv", ", cell")}),
         |enc AS (SELECT cid, cell, m, code FROM (
         |  SELECT s.cid, s.cell, s.m, cb.code, row_number() OVER (
         |    PARTITION BY s.cid, s.m
         |    ORDER BY ${Similarity.l2SqlDuck("s.sv", "cb.cv")} ASC, cb.code) AS rn
         |  FROM rsubs s JOIN cb ON s.m = cb.m) WHERE rn = 1),
         |qd AS (SELECT s.qid, s.cell, cb.m, cb.code,
         |    ${Similarity.l2SqlDuck("s.sv", "cb.cv")} AS d
         |  FROM qsubs s JOIN cb ON s.m = cb.m),
         |approx AS (SELECT qd.qid, enc.cid, CAST(sum(qd.d) AS BIGINT) AS approx_dist
         |  FROM enc JOIN qd ON enc.cell = qd.cell AND enc.m = qd.m AND enc.code = qd.code
         |  WHERE enc.cid <> qd.qid GROUP BY 1, 2),
         |r AS (SELECT qid, cid, approx_dist, row_number() OVER (
         |    PARTITION BY qid ORDER BY approx_dist ASC, cid) AS rank FROM approx)
         |SELECT qid, cid, rank, approx_dist FROM r WHERE rank <= 5"""
        .stripMargin.replace("\n", " ")
    },

    "ann_ivfpq_topk" -> {
      val m = 8
      val w = Similarity.Dim / m
      val quantDuck = Similarity.quantizeSqlDuck
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |cents AS (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent FROM
         |  (SELECT vec_id, qv, nrm FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
         |ca AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT n.vec_id, c.cent_id, row_number() OVER (
         |    PARTITION BY n.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("n.qv", "c.centv"), "n.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM n, cents c) WHERE crn = 1),
         |qa AS (SELECT vec_id, cent_id AS cell FROM (
         |  SELECT nq.vec_id, c.cent_id, row_number() OVER (
         |    PARTITION BY nq.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("nq.qv", "c.centv"), "nq.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM (SELECT * FROM n WHERE vec_id < 50) nq, cents c) WHERE crn <= 3),
         |cb AS (SELECT cent_id AS code, m, cv FROM (
         |  ${(0 until m).map(i =>
             s"SELECT cent_id, $i AS m, centv[${i * w + 1}:${(i + 1) * w}] AS cv FROM cents")
             .mkString(" UNION ALL ")})),
         |subs AS (${(0 until m).map(i =>
             s"SELECT vec_id, $i AS m, qv[${i * w + 1}:${(i + 1) * w}] AS sv FROM n")
             .mkString(" UNION ALL ")}),
         |enc AS (SELECT vec_id, m, code FROM (
         |  SELECT s.vec_id, s.m, cb.code, row_number() OVER (
         |    PARTITION BY s.vec_id, s.m
         |    ORDER BY ${Similarity.l2SqlDuck("s.sv", "cb.cv")} ASC, cb.code) AS rn
         |  FROM subs s JOIN cb ON s.m = cb.m) WHERE rn = 1),
         |qd AS (SELECT s.vec_id AS qid, cb.m, cb.code,
         |    ${Similarity.l2SqlDuck("s.sv", "cb.cv")} AS d
         |  FROM subs s JOIN cb ON s.m = cb.m WHERE s.vec_id < 50),
         |approx AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid,
         |    CAST(sum(qd.d) AS BIGINT) AS approx_dist
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.vec_id
         |  JOIN enc ON enc.vec_id = ca.vec_id
         |  JOIN qd ON qd.qid = qa.vec_id AND qd.m = enc.m AND qd.code = enc.code
         |  GROUP BY 1, 2),
         |r AS (SELECT qid, cid, approx_dist, row_number() OVER (
         |    PARTITION BY qid ORDER BY approx_dist ASC, cid) AS rank FROM approx)
         |SELECT qid, cid, rank, approx_dist FROM r WHERE rank <= 5"""
        .stripMargin.replace("\n", " ")
    },

    // the Lloyd-refined SemDeDup gate: hash-sampled seed codebook, then
    // the 2 configured Lloyd rounds UNROLLED — per round, one
    // assign-to-nearest CTE (exact-int cosine, ties by cent_id) and one
    // per-dimension integer mean (DuckDB `//` and Spark `div` both
    // truncate toward zero — verified on negatives; sums stay in int64:
    // |coord| <= 1e5 so even 1e13 rows fit). Cells that lose every
    // vector keep their previous centroid (the coalesce), mirroring
    // kmeansCentroidsWith. The prune CTEs are semantic_dedup_sampled's.
    "semantic_dedup" -> {
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      val quantDuck = Similarity.quantizeSqlDuck
      def lloydRound(i: Int, cin: String, cout: String) =
        s"""a$i AS (SELECT vec_id, qv, cell FROM (
           |  SELECT n.vec_id, n.qv, c.cent_id AS cell, row_number() OVER (
           |    PARTITION BY n.vec_id ORDER BY
           |      ${cos(Similarity.dotQSqlDuck("n.qv", "c.centv"), "n.nrm", "c.ncent")} DESC,
           |      c.cent_id) AS rn
           |  FROM n, $cin c) WHERE rn = 1),
           |e$i AS (SELECT cell, i AS pos, CAST(sum(qv[i]) AS BIGINT) AS s,
           |    count(*) AS cnt
           |  FROM a$i, UNNEST(range(1, ${Similarity.Dim + 1})) AS r(i) GROUP BY 1, 2),
           |m$i AS (SELECT cell, list(s // cnt ORDER BY pos) AS centv FROM e$i GROUP BY cell),
           |x$i AS (SELECT p.cent_id, coalesce(m$i.centv, p.centv) AS centv
           |  FROM $cin p LEFT JOIN m$i ON m$i.cell = p.cent_id),
           |$cout AS (SELECT cent_id, centv,
           |  ${Similarity.dotQSqlDuck("centv", "centv")} AS ncent FROM x$i)""".stripMargin
      s"""WITH v AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv, ${Similarity.dotQSqlDuck("qv", "qv")} AS nrm FROM v),
         |c0 AS (SELECT vec_id AS cent_id, qv AS centv, nrm AS ncent FROM
         |  (SELECT vec_id, qv, nrm FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
         |${lloydRound(1, "c0", "c1")},
         |${lloydRound(2, "c1", "c2")},
         |ca AS (SELECT vec_id, qv, nrm, cell FROM (
         |  SELECT n.vec_id, n.qv, n.nrm, c.cent_id AS cell,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      ${cos(Similarity.dotQSqlDuck("n.qv", "c.centv"), "n.nrm", "c.ncent")} DESC,
         |      c.cent_id) AS crn
         |  FROM n, c2 c) WHERE crn = 1),
         |dropped AS (SELECT DISTINCT b.vec_id FROM ca a JOIN ca b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cos(Similarity.dotQSqlDuck("a.qv", "b.qv"), "a.nrm", "b.nrm")} >= 0.4)
         |SELECT ca.vec_id, ca.cell,
         |  ca.vec_id IN (SELECT vec_id FROM dropped) AS is_dup
         |FROM ca""".stripMargin.replace("\n", " ")
    },

    "semantic_dedup_sampled" -> {
      def cos(dot: String, n1: String, n2: String) =
        s"CAST($dot AS DOUBLE) / (sqrt(CAST($n1 AS DOUBLE)) * sqrt(CAST($n2 AS DOUBLE)))"
      val quantDuck = Similarity.quantizeSqlDuck
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
         |dropped AS (SELECT DISTINCT b.vec_id FROM ca a JOIN ca b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cos(Similarity.dotQSqlDuck("a.qv", "b.qv"), "a.nrm", "b.nrm")} >= 0.4)
         |SELECT ca.vec_id, ca.cell,
         |  ca.vec_id IN (SELECT vec_id FROM dropped) AS is_dup
         |FROM ca""".stripMargin.replace("\n", " ")
    },

    // the four stage oracles (corpus_quality_filter, dedup_exact,
    // decontam_clean, mix_token_weights + sample_stratified) composed in
    // curate()'s order, constants shared line for line
    "corpus_curated" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |tstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_tok_n FROM tc GROUP BY 1),
        |kept AS (SELECT doc_id, n_tokens FROM tstats
        |  WHERE NOT (n_tokens < 20 OR n_tokens > 90
        |    OR n_distinct * 1000 // n_tokens < 350
        |    OR top_tok_n * 1000 // n_tokens > 150)),
        |kd AS (SELECT d.doc_id, d.source, d.text, k.n_tokens
        |  FROM documents d JOIN kept k USING (doc_id)),
        |canon AS (SELECT min(doc_id) AS doc_id FROM kd GROUP BY md5(text)),
        |dd AS (SELECT kd.* FROM kd JOIN canon USING (doc_id)),
        |toks3 AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
        |sh AS (SELECT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        |  FROM toks3, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |shh AS (SELECT DISTINCT doc_id,
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM sh),
        |etoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE source = 'src0'),
        |esh AS (SELECT concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        |  FROM etoks, UNNEST(range(1, len(t)-1)) AS r(i) WHERE len(t) >= 3),
        |eshh AS (SELECT DISTINCT
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h FROM esh),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM shh GROUP BY 1),
        |hits AS (SELECT s.doc_id, count(*) AS n_hits FROM shh s JOIN eshh e USING (h) GROUP BY 1),
        |flagged AS (SELECT h.doc_id FROM hits h JOIN sizes s USING (doc_id)
        |  WHERE n_hits * 1000 // s.n_grams >= 100),
        |clean AS (SELECT dd.* FROM dd
        |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
        |rates AS (SELECT source, least(CAST(1000 AS BIGINT),
        |    400 * 1000 // CAST(sum(n_tokens) AS BIGINT)) AS rate
        |  FROM clean GROUP BY source)
        |SELECT c.doc_id, c.source FROM clean c JOIN rates r USING (source)
        |WHERE CAST(concat('0x', substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |  % 1000 < r.rate""".stripMargin.replace("\n", " ")
  )
}
