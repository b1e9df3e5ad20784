package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates", arXiv:1804.10959 §3 — the SentencePiece `unigram` model):
  * score a fixed subword vocabulary with piece probabilities, EM-update
  * the probabilities from the corpus's best segmentations, and segment by
  * Viterbi. Next to [[Bpe]] this is the OTHER tokenizer family modern
  * pipelines actually ship (SentencePiece defaults to it); BPE alone is
  * half the story.
  *
  * Variant implemented: HARD (Viterbi) EM — the E-step counts pieces from
  * each word's single best segmentation instead of the full
  * forward-backward expectation (Kudo §3.2 notes the one-best
  * approximation; deterministic and oracle-expressible). Laplace +1
  * smoothing keeps every vocabulary piece alive across rounds, so the
  * vocabulary is FIXED at selection and only probabilities move — the
  * iterative-pruning refinement changes which pieces survive, not the
  * plan shape.
  *
  * Exactness strategy: piece probabilities live as FIXED-POINT INTEGER
  * COSTS `floor(1e6 · ln(total/cnt))` (the negative log-likelihood ×1e6),
  * so the Viterbi DP compares exact int64 path sums — identical in both
  * engines; the one double op (`ln` over the exact integer ratio) is
  * floor-quantized immediately, so an ulp of libm disagreement would
  * have to land exactly on an integer boundary to flip anything. Path
  * ties break on the lexicographically smallest pipe-joined piece string,
  * applied per DP position identically in both engines.
  *
  * Why this shape at 100 TB (the [[Bpe]] argument verbatim): the corpus
  * collapses ONCE to the word-frequency dict (map-side-combined groupBy —
  * vocabulary-sized); candidate counting, EM rounds and Viterbi all run
  * on that bounded table. Piece costs are a ≤(TopPieces+chars)-row table
  * BROADCAST into the edge join; the DP is a per-row expression over each
  * word's ≤ MaxWordLen·MaxPieceLen candidate edges — no shuffle at all
  * beyond the vocab-sized groupBys. The inherently-sequential EM rounds
  * are unrolled with per-round materialization (the [[Bpe]] round-loop
  * discipline), and [[trainSqlDuck]]/[[segmentSqlDuck]] render the
  * IDENTICAL unrolled rounds + DP positions for the DuckDB oracle from
  * the same constants, so the engines cannot drift.
  */
object Ulm {

  /** Max subword piece length — bounds the DP fan-in per position. */
  val MaxPieceLen = 4
  /** Max dict word length admitted to the tokenizer (SentencePiece's
    * max-length discipline); longer words are excluded from training
    * AND segmentation output, identically in both engines.
    */
  val MaxWordLen = 16
  /** Multi-char vocabulary size (single chars always included). */
  val TopPieces = 256
  /** Hard-EM probability-update rounds. */
  val EmRounds = 2
  /** Fixed-point scale for the integer NLL costs. */
  val CostScale = 1000000L
  private val Inf = 1000000000000000L

  /** Corpus → bounded-length word-frequency dict: the ONLY corpus-sized
    * scan in ULM training ([[Bpe.wordFreqs]] + the length cap).
    */
  def dict(docs: DataFrame, textCol: String): DataFrame =
    Bpe.wordFreqs(docs, textCol).filter(length(col("word")) <= MaxWordLen)

  /** All candidate (start, end, piece) substrings of a dict word, with
    * 0-based DP boundaries: i = start, j = end, 1 ≤ j − i ≤ MaxPieceLen.
    */
  private def pieceSpans(wf: DataFrame): DataFrame =
    wf.select(col("word"), col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)), i ->
             |  transform(sequence(1, least($MaxPieceLen, length(word) - i + 1)), l ->
             |    named_struct('i', i - 1, 'j', i + l - 1,
             |      'piece', substring(word, i, l)))))"""
            .stripMargin.replace("\n", " "))).as("e"))
      .select(col("word"), col("freq"), col("e.i").as("i"),
        col("e.j").as("j"), col("e.piece").as("piece"))

  /** Occurrence-weighted candidate piece counts (a piece repeated inside
    * one word counts each time, per the substring-count convention).
    */
  def candidateCounts(wf: DataFrame): DataFrame =
    pieceSpans(wf).groupBy("piece").agg(sum("freq").as("cnt"))

  /** The fixed vocabulary: top `TopPieces` multi-char candidates by
    * (cnt DESC, piece) — a TakeOrdered, never a full sort — plus EVERY
    * single-char candidate (coverage guarantee: all dict words stay
    * segmentable, so the DP never needs an unknown-piece escape).
    */
  def selectVocab(cand: DataFrame): DataFrame = {
    val multi = cand.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(TopPieces)
    val single = cand.filter(length(col("piece")) === 1)
    multi.unionByName(single)
  }

  /** (piece, cnt) → (piece, cnt, cost) with the fixed-point NLL cost
    * against the table's own total. The 1-row total broadcasts.
    */
  def withCosts(vocabCnt: DataFrame): DataFrame = {
    val total = vocabCnt.agg(sum("cnt").as("_total"))
    vocabCnt.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        floor(lit(CostScale.toDouble) *
          log(col("_total").cast("double") / col("cnt").cast("double")))
          .cast("long").as("cost"))
  }

  /** Per-word candidate-edge assembly under a given cost table: the
    * vocab-cost table broadcasts into the span join; edges collect to
    * one bounded array per word (≤ MaxWordLen·MaxPieceLen structs).
    */
  private def edgeTable(wf: DataFrame, costs: DataFrame): DataFrame =
    pieceSpans(wf)
      .join(broadcast(costs.select(col("piece"), col("cost"))), Seq("piece"))
      .groupBy("word", "freq")
      .agg(collect_list(struct(col("i"), col("j"), col("piece"), col("cost")))
        .as("edges"))

  /** The Viterbi DP as ONE per-row expression: positions 1..m in order,
    * each taking the (cost, path)-minimal extension over its incoming
    * edges; state = array of (c, p) structs indexed by position. All
    * integer comparisons; tie-break on the path string. Bounded by
    * construction: m ≤ MaxWordLen, fan-in ≤ MaxPieceLen.
    */
  private val dpExpr: String =
    s"""aggregate(
       |  sequence(1, length(word)),
       |  transform(sequence(0, length(word)), p ->
       |    IF(p = 0, named_struct('c', CAST(0 AS BIGINT), 'p', ''),
       |              named_struct('c', CAST($Inf AS BIGINT), 'p', ''))),
       |  (acc, jj) -> transform(acc, (s, idx) -> IF(idx <> jj, s,
       |    aggregate(
       |      filter(edges, e -> e.j = jj AND acc[e.i].c < CAST($Inf AS BIGINT)),
       |      named_struct('c', CAST($Inf AS BIGINT), 'p', ''),
       |      (best, e) -> CASE
       |        WHEN acc[e.i].c + e.cost < best.c
       |          OR (acc[e.i].c + e.cost = best.c AND
       |              (CASE WHEN acc[e.i].p = '' THEN e.piece
       |                    ELSE concat(acc[e.i].p, '|', e.piece) END) < best.p)
       |        THEN named_struct('c', acc[e.i].c + e.cost,
       |          'p', CASE WHEN acc[e.i].p = '' THEN e.piece
       |                    ELSE concat(acc[e.i].p, '|', e.piece) END)
       |        ELSE best END))))
       |[CAST(length(word) AS INT)]""".stripMargin.replace("\n", " ")

  /** Viterbi-segment every dict word under `costs`:
    * (word, freq, pieces, n_pieces, cost).
    */
  def viterbiSegment(wf: DataFrame, costs: DataFrame): DataFrame =
    edgeTable(wf, costs)
      .withColumn("_best", expr(dpExpr))
      .select(col("word"), col("freq"),
        col("_best.p").as("pieces"),
        size(split(col("_best.p"), "\\|")).cast("long").as("n_pieces"),
        col("_best.c").as("cost"))

  /** One hard-EM round: Viterbi under the current costs, re-count pieces
    * from the best segmentations (freq-weighted, +1 smoothed over the
    * FULL vocabulary), re-derive costs.
    */
  private def emRound(wf: DataFrame, vocab: DataFrame,
      costs: DataFrame): DataFrame = {
    val used = viterbiSegment(wf, costs)
      .select(col("freq"), explode(split(col("pieces"), "\\|")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("_used"))
    withCosts(
      vocab.select("piece").join(used, Seq("piece"), "left")
        .select(col("piece"),
          (lit(1L) + coalesce(col("_used"), lit(0L))).as("cnt")))
  }

  /** Train: candidate counts → fixed vocab → initial costs → `EmRounds`
    * hard-EM updates. Returns the final (piece, cnt, cost) table.
    */
  def train(docs: DataFrame, textCol: String): DataFrame = {
    val wf = graft.util.Materialize.stable(dict(docs, textCol))
    val vocab = graft.util.Materialize.stable(
      selectVocab(candidateCounts(wf)))
    var costs = graft.util.Materialize.stable(withCosts(vocab))
    for (_ <- 1 to EmRounds)
      costs = graft.util.Materialize.stable(emRound(wf, vocab, costs))
    costs
  }

  /** The EM → PRUNE → EM refinement the real SentencePiece trainer
    * loops (Kudo 2018 §3.2 step 3: "remove the top-level subwords that
    * do not help the likelihood"): after the [[train]] rounds, drop
    * every multi-char piece the best segmentations never used (its
    * count is the +1 smoothing alone — keeping it only dilutes the
    * probability mass), keep ALL single chars (the coverage guarantee),
    * renormalize costs over the pruned vocabulary, and run one more
    * hard-EM round. Same bounded plan shapes throughout; the pruned
    * vocabulary is strictly smaller, so every later pass gets cheaper.
    * Output: the refined (piece, cnt, cost) table.
    */
  def trainPruned(docs: DataFrame, textCol: String): DataFrame = {
    val wf = graft.util.Materialize.stable(dict(docs, textCol))
    val trained = graft.util.Materialize.stable(train(docs, textCol))
    val vocabP = graft.util.Materialize.stable(
      trained.filter(col("cnt") > 1 || length(col("piece")) === 1)
        .select("piece", "cnt"))
    emRound(wf, vocabP, graft.util.Materialize.stable(withCosts(vocabP)))
  }

  /** Segment the dict under the trained model — the tokenizer's
    * segmentation table, and the dict a corpus encoder broadcasts.
    */
  def segment(docs: DataFrame, textCol: String): DataFrame =
    viterbiSegment(graft.util.Materialize.stable(dict(docs, textCol)),
      train(docs, textCol))

  /** Encode the corpus under the trained model: per-doc ULM token
    * accounting — the packing/budget number, under THIS tokenizer
    * family (the [[Bpe.encodeCorpus]] twin). The (word → n_pieces)
    * dict is vocabulary-sized and BROADCASTS onto the corpus word
    * stream: one corpus scan + a map-side join. Only dictionary words
    * count — the same `[a-z]+`/length-cap admission the model trained
    * under. Output: (id, n_words, n_ulm_tokens).
    */
  def encodeCorpus(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val dict = segment(docs, textCol).select("word", "n_pieces")
    docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .join(broadcast(dict), Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_ulm_tokens"))
  }

  // ---------------------------------------------------------------- soft EM

  /** Probability fixed-point scale for the soft-EM lattice: 2^30. */
  val PScale = 1073741824L
  /** Soft-count fixed point: expected counts in millionths. */
  val GammaScale = 1000000L

  /** (piece, p) fixed-point probability table from a count table:
    * `p = max(1, (cnt·2^30) div total)` — the max keeps a rare piece's
    * lattice edge alive instead of quantizing it to an impossible path.
    * `shift` pre-divides counts AND total by 2^shift so the product
    * stays in int64 when counts are themselves fixed-point (the
    * micro-count tables); the distortion is deterministic and identical
    * in both engines. Callers must keep `total div 2^shift < 2^33`.
    */
  def probsFromCounts(counts: DataFrame, cntCol: String,
      shift: Int = 0): DataFrame = {
    require(shift >= 0 && shift <= 32, s"shift 0..32, got $shift")
    val den = 1L << shift
    val sc = counts.select(col("piece"),
      expr(s"CAST($cntCol AS BIGINT) div ${den}L").as("_c"))
    val total = sc.agg(sum("_c").as("_t"))
    sc.crossJoin(broadcast(total))
      .select(col("piece"),
        greatest(lit(1L), expr(s"(_c * ${PScale}L) div _t")).as("p"))
  }

  /** Per-word lattice edges with fixed-point probabilities attached —
    * the soft-EM twin of [[edgeTable]] (same broadcast join, same
    * bounded array: ≤ MaxWordLen·MaxPieceLen structs of (i, j, piece, p)).
    */
  private def softEdgeTable(wf: DataFrame, probs: DataFrame): DataFrame =
    pieceSpans(wf)
      .join(broadcast(probs.select(col("piece"), col("p"))), Seq("piece"))
      .groupBy("word", "freq")
      .agg(collect_list(struct(col("i"), col("j"), col("piece"), col("p")))
        .as("edges"))

  /** The mantissa/exponent renormalized lattice sum at one position —
    * shared text between the forward and backward DPs. `incoming`
    * selects this position's edges; `prevPos` indexes the predecessor
    * state. Values are `m · 2^e` with m held in [2^20, 2^32) (sum of ≤
    * MaxPieceLen contributions < 2^34, renormalized by power-of-two
    * shifts only — every op exact int64, reproduced verbatim by the
    * DuckDB CTEs). The single-element `transform(array(…), v -> …)`
    * wrappers are let-bindings: emax and the raw sum evaluate once.
    */
  private def latticeStep(incoming: String, prevPos: String): String =
    s"""element_at(transform(array(
       |  aggregate(edges, -999999, (mx, x) ->
       |    IF($incoming AND acc[$prevPos].m > 0
       |         AND (acc[$prevPos].m * x.p) div ${PScale}L > 0,
       |       greatest(mx, acc[$prevPos].e), mx))),
       |  mxv -> element_at(transform(array(
       |    aggregate(edges, CAST(0 AS BIGINT), (sm, x) ->
       |      IF($incoming AND acc[$prevPos].m > 0,
       |         sm + IF((acc[$prevPos].m * x.p) div ${PScale}L = 0
       |                   OR mxv - acc[$prevPos].e >= 40,
       |                 CAST(0 AS BIGINT),
       |                 ((acc[$prevPos].m * x.p) div ${PScale}L)
       |                   div CAST(pow(2, greatest(0, mxv - acc[$prevPos].e)) AS BIGINT)),
       |         sm))),
       |    rm -> CASE
       |      WHEN rm >= 4294967296L THEN named_struct('m', rm div 4096L, 'e', mxv + 12)
       |      WHEN rm >= 1048576L THEN named_struct('m', rm, 'e', mxv)
       |      WHEN rm >= 256L THEN named_struct('m', rm * 4096L, 'e', mxv - 12)
       |      WHEN rm >= 1L THEN named_struct('m', rm * 16777216L, 'e', mxv - 24)
       |      ELSE named_struct('m', CAST(0 AS BIGINT), 'e', 0) END), 1)), 1)"""
      .stripMargin.replace("\n", " ")

  /** Forward pass: alpha[0] = 1 (m = 2^30, e = −30); alpha[j] =
    * Σ_{edges (i,j)} alpha[i] · p. One bounded per-row DP.
    */
  private val forwardExpr: String =
    s"""aggregate(
       |  sequence(1, length(word)),
       |  transform(sequence(0, length(word)), p ->
       |    IF(p = 0, named_struct('m', CAST(${PScale} AS BIGINT), 'e', -30),
       |              named_struct('m', CAST(0 AS BIGINT), 'e', 0))),
       |  (acc, jj) -> transform(acc, (s, idx) -> IF(idx <> jj, s,
       |    ${latticeStep("x.j = jj", "x.i")})))"""
      .stripMargin.replace("\n", " ")

  /** Backward pass: beta[len] = 1; beta[i] = Σ_{edges (i,j)} p · beta[j],
    * positions visited end-to-start (idx = len − kk).
    */
  private val backwardExpr: String =
    s"""aggregate(
       |  sequence(1, length(word)),
       |  transform(sequence(0, length(word)), p ->
       |    IF(p = length(word),
       |       named_struct('m', CAST(${PScale} AS BIGINT), 'e', -30),
       |       named_struct('m', CAST(0 AS BIGINT), 'e', 0))),
       |  (acc, kk) -> transform(acc, (s, idx) ->
       |    IF(idx <> length(word) - kk, s,
       |    ${latticeStep("x.i = idx", "x.j")})))"""
      .stripMargin.replace("\n", " ")

  /** Edge-posterior micro-gamma: γ = α_i·p·β_j / Z in millionths, via
    * the bounded-product ladder (A = α_i·p/2^30; g1 = (A/2^10)·1e6 /
    * (Z.m/2^10) = A·1e6/Z.m up to truncation; times β_j.m/2^10 leaves
    * the 2^10 to the exponent term d = e_α + e_β − e_Z + 10). Every
    * intermediate < 2^54; the d-branches clamp shift magnitudes so no
    * multiplication can overflow int64 — DuckDB THROWS on bigint
    * overflow, so structural safety here is oracle-liveness, not
    * pedantry. Output per row: array of (piece, gam).
    */
  private val gammaExpr: String =
    s"""transform(edges, x -> named_struct('piece', x.piece, 'gam',
       |  IF(_z.m <= 0 OR _alpha[x.i].m <= 0 OR _beta[x.j].m <= 0,
       |     CAST(0 AS BIGINT),
       |     element_at(transform(array(named_struct(
       |         'g2', ((((_alpha[x.i].m * x.p) div ${PScale}L) div 1024L)
       |                  * ${GammaScale}L div (_z.m div 1024L))
       |                * (_beta[x.j].m div 1024L),
       |         'd', _alpha[x.i].e + _beta[x.j].e - _z.e + 10)),
       |       v -> CASE
       |         WHEN v.d >= 0 THEN least(CAST(${GammaScale} AS BIGINT),
       |           least(v.g2, CAST(${GammaScale} AS BIGINT))
       |             * CAST(pow(2, least(v.d, 20)) AS BIGINT))
       |         ELSE least(CAST(${GammaScale} AS BIGINT),
       |           v.g2 div CAST(pow(2, least(-v.d, 62)) AS BIGINT)) END), 1))))"""
      .stripMargin.replace("\n", " ")

  /** Forward/backward over every dict word under `probs`: one row per
    * lattice edge with its expected-count mass. Output:
    * (word, freq, piece, gam) — gam in millionths.
    */
  def softGammas(wf: DataFrame, probs: DataFrame): DataFrame =
    softEdgeTable(wf, probs)
      .withColumn("_alpha", expr(forwardExpr))
      .withColumn("_beta", expr(backwardExpr))
      .withColumn("_z", expr("_alpha[CAST(length(word) AS INT)]"))
      .select(col("word"), col("freq"),
        explode(expr(gammaExpr)).as("_pg"))
      .select(col("word"), col("freq"),
        col("_pg.piece").as("piece"), col("_pg.gam").as("gam"))

  /** Marginal Z per word (m · 2^e) under `probs` — the forward pass
    * alone; the spec's likelihood comparison reads −ln Z off this.
    */
  def marginalZ(wf: DataFrame, probs: DataFrame): DataFrame =
    softEdgeTable(wf, probs)
      .withColumn("_z", expr(s"($forwardExpr)[CAST(length(word) AS INT)]"))
      .select(col("word"), col("freq"),
        col("_z.m").as("m"), col("_z.e").as("e"))

  /** One SOFT-EM round (Kudo 2018 §3.2's actual E-step — the full
    * forward-backward expectation the hard-EM [[train]] approximates
    * with the one-best path): expected piece counts in millionths,
    * +1-smoothed over the full vocabulary (1e6 micro-units = the hard
    * round's +1), costs re-derived against the micro total with the
    * same floor(1e6·ln) quantization. Same bounded shapes as
    * [[emRound]]: the corpus was already collapsed to the dict, the DP
    * is per-row, probs/costs broadcast, aggregates vocab-sized.
    * Output: (piece, cnt_micro, cost).
    *
    * INT64 BOUND: the expected-count mass is `sum(freq * gam)` with
    * `gam <= GammaScale = 10^6`, so the per-piece sum needs
    * `sum(freq) < 2^63 / 10^6 ~ 9.2e12` over the dict — a corpus of
    * under ~9 trillion occurrences of any one piece. Spark wraps
    * silently past that while the DuckDB oracle throws; at larger
    * corpora pre-scale `freq` (divide by a power of two and carry the
    * shift, exactly as [[probsFromCounts]]'s shift parameter does)
    * before this round.
    */
  def softEmRound(wf: DataFrame, vocab: DataFrame,
      probs: DataFrame): DataFrame = {
    val mass = softGammas(wf, probs)
      .groupBy("piece").agg(sum(col("freq") * col("gam")).as("_mass"))
    val cnts = vocab.select("piece").join(mass, Seq("piece"), "left")
      .select(col("piece"),
        (lit(GammaScale) + coalesce(col("_mass"), lit(0L))).as("cnt"))
    withCosts(cnts)
      .select(col("piece"), col("cnt").as("cnt_micro"), col("cost"))
  }

  /** Soft-EM training gate: the fixed vocabulary's candidate counts
    * seed the probability table, then ONE forward-backward round
    * (unrolling more soft rounds squares the oracle's CTE volume; the
    * one-round gate pins the whole lattice arithmetic, and further
    * rounds reuse it unchanged). Output: (piece, cnt_micro, cost).
    */
  def trainSoft(docs: DataFrame, textCol: String): DataFrame = {
    val wf = graft.util.Materialize.stable(dict(docs, textCol))
    val vocab = graft.util.Materialize.stable(
      selectVocab(candidateCounts(wf)))
    softEmRound(wf, vocab,
      graft.util.Materialize.stable(probsFromCounts(vocab, "cnt")))
  }

  // ---------------------------------------------------------------- oracle

  /** wf + cand + vocab0 + cost0 + spans CTEs. */
  private def baseCtesDuck(table: String, textCol: String): String =
    s"""wf AS MATERIALIZED (SELECT word, freq FROM (
       |    SELECT word, count(*) AS freq FROM (
       |      SELECT unnest(string_split_regex(lower($textCol), '\\s+')) AS word
       |      FROM $table) WHERE regexp_matches(word, '^[a-z]+$$')
       |    GROUP BY word) WHERE length(word) <= $MaxWordLen),
       |spans AS MATERIALIZED (SELECT word, freq, i - 1 AS i, i + l - 1 AS j,
       |    word[i:i+l-1] AS piece
       |  FROM wf, UNNEST(range(1, length(word) + 1)) u(i),
       |    UNNEST(range(1, ${MaxPieceLen + 1})) v(l)
       |  WHERE i + l - 1 <= length(word)),
       |cand AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM spans GROUP BY piece),
       |vocab0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM (SELECT piece, cnt,
       |      row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM cand WHERE length(piece) >= 2) WHERE rn <= $TopPieces
       |  UNION ALL
       |  SELECT piece, cnt FROM cand WHERE length(piece) = 1),
       |cost0 AS MATERIALIZED (SELECT piece, cnt, CAST(floor($CostScale *
       |    ln(CAST((SELECT sum(cnt) FROM vocab0) AS DOUBLE)
       |       / CAST(cnt AS DOUBLE))) AS BIGINT) AS cost FROM vocab0)"""
      .stripMargin.replace("\n", " ")

  /** One Viterbi pass under cost CTE `costCte`, CTE-prefixed `tag`:
    * emits e$tag (edges), b${tag}_0..b${tag}_M (DP positions — each
    * position takes the (cost, path)-minimal extension via a per-word
    * row_number, exactly the engine's per-position argmin), and
    * best$tag (each word read at its own length).
    */
  private def viterbiCtesDuck(tag: String, costCte: String): String = {
    val edges =
      s"""e$tag AS MATERIALIZED (SELECT s.word, s.freq, s.i, s.j, s.piece, c.cost
         |  FROM spans s JOIN $costCte c ON s.piece = c.piece)"""
        .stripMargin.replace("\n", " ")
    val b0 = s"b${tag}_0 AS MATERIALIZED (SELECT word, freq, CAST(0 AS BIGINT) AS c, '' AS p FROM wf)"
    val bs = (1 to MaxWordLen).map { j =>
      val prevs = (math.max(0, j - MaxPieceLen) until j).map(i =>
        s"SELECT word, freq, $i AS i, c, p FROM b${tag}_$i").mkString(" UNION ALL ")
      s"""b${tag}_$j AS MATERIALIZED (SELECT word, freq, c, p FROM (
         |  SELECT e.word, pr.freq, pr.c + e.cost AS c,
         |    CASE WHEN pr.p = '' THEN e.piece ELSE pr.p || '|' || e.piece END AS p,
         |    row_number() OVER (PARTITION BY e.word ORDER BY pr.c + e.cost,
         |      CASE WHEN pr.p = '' THEN e.piece ELSE pr.p || '|' || e.piece END) AS rn
         |  FROM e$tag e JOIN ($prevs) pr
         |    ON pr.word = e.word AND e.i = pr.i AND e.j = $j
         |  ) WHERE rn = 1)""".stripMargin.replace("\n", " ")
    }.mkString(", ")
    val best = (1 to MaxWordLen).map(j =>
      s"SELECT word, freq, c, p FROM b${tag}_$j WHERE length(word) = $j")
      .mkString(s"best$tag AS MATERIALIZED (", " UNION ALL ", ")")
    s"$edges, $b0, $bs, $best"
  }

  /** EM-round count + cost CTEs from best$tag under the +1 smoothing
    * over `vocabCte` (vocab0 for the main rounds; the pruned vocabulary
    * for the refinement pass).
    */
  private def emCtesDuck(round: Int, tag: String,
      vocabCte: String = "vocab0"): String =
    s"""cnt$round AS MATERIALIZED (SELECT v.piece,
       |    1 + COALESCE(CAST(sum(t.freq) AS BIGINT), 0) AS cnt
       |  FROM $vocabCte v LEFT JOIN (
       |    SELECT unnest(string_split(p, '|')) AS piece, freq FROM best$tag) t
       |  ON v.piece = t.piece GROUP BY v.piece),
       |cost$round AS MATERIALIZED (SELECT piece, cnt, CAST(floor($CostScale *
       |    ln(CAST((SELECT sum(cnt) FROM cnt$round) AS DOUBLE)
       |       / CAST(cnt AS DOUBLE))) AS BIGINT) AS cost FROM cnt$round)"""
      .stripMargin.replace("\n", " ")

  /** The full unrolled training chain: base + EmRounds × (Viterbi + EM). */
  private def trainChainDuck(table: String, textCol: String): String = {
    val rounds = (1 to EmRounds).map { r =>
      s"${viterbiCtesDuck(s"r$r", s"cost${r - 1}")}, ${emCtesDuck(r, s"r$r")}"
    }.mkString(", ")
    s"WITH ${baseCtesDuck(table, textCol)}, $rounds"
  }

  /** Oracle for [[train]]: the round-`EmRounds` (piece, cnt, cost). */
  def trainSqlDuck(table: String, textCol: String): String =
    s"${trainChainDuck(table, textCol)} SELECT piece, cnt, cost FROM cost$EmRounds"

  /** The training chain + one more Viterbi pass under the trained
    * costs (CTE `bestf`) — shared by the segment and encode oracles.
    */
  private def segmentedChainDuck(table: String, textCol: String): String =
    s"${trainChainDuck(table, textCol)}, ${viterbiCtesDuck("f", s"cost$EmRounds")}"

  /** Oracle for [[segment]]: `bestf` read at each word's length. */
  def segmentSqlDuck(table: String, textCol: String): String =
    s"""${segmentedChainDuck(table, textCol)}
       |SELECT word, freq, p AS pieces,
       |  CAST(len(string_split(p, '|')) AS BIGINT) AS n_pieces, c AS cost
       |FROM bestf""".stripMargin.replace("\n", " ")

  /** Oracle for [[trainPruned]]: the training chain + the prune filter
    * + renormalized costs + one more unrolled Viterbi/EM pass over the
    * pruned vocabulary.
    */
  def trainPrunedSqlDuck(table: String, textCol: String): String = {
    val r = EmRounds + 1
    s"""${trainChainDuck(table, textCol)},
       |vocabp AS MATERIALIZED (SELECT piece, cnt FROM cost$EmRounds
       |  WHERE cnt > 1 OR length(piece) = 1),
       |costp0 AS MATERIALIZED (SELECT piece, cnt, CAST(floor($CostScale *
       |    ln(CAST((SELECT sum(cnt) FROM vocabp) AS DOUBLE)
       |       / CAST(cnt AS DOUBLE))) AS BIGINT) AS cost FROM vocabp),
       |${viterbiCtesDuck("p", "costp0")},
       |${emCtesDuck(r, "p", "vocabp")}
       |SELECT piece, cnt, cost FROM cost$r""".stripMargin.replace("\n", " ")
  }

  /** The mantissa/exponent lattice position as a DuckDB CTE body —
    * verbatim twin of [[latticeStep]]: contributions mc = (m·p)//2^30
    * at exponent ec, aligned to the word's max live exponent, summed,
    * renormalized by the same power-of-two CASE. `joinCond` pins the
    * edge/predecessor geometry (forward: e.i = pr.i AND e.j = pos;
    * backward: e.i = len−k AND len−e.j = pr.kk).
    */
  private def latticeCteDuck(name: String, prevs: String,
      joinCond: String): String =
    s"""$name AS MATERIALIZED (SELECT word, freq,
       |  CASE WHEN rm >= 4294967296 THEN rm // 4096
       |       WHEN rm >= 1048576 THEN rm
       |       WHEN rm >= 256 THEN rm * 4096
       |       WHEN rm >= 1 THEN rm * 16777216
       |       ELSE CAST(0 AS BIGINT) END AS m,
       |  CASE WHEN rm >= 4294967296 THEN mx + 12
       |       WHEN rm >= 1048576 THEN mx
       |       WHEN rm >= 256 THEN mx - 12
       |       WHEN rm >= 1 THEN mx - 24
       |       ELSE 0 END AS e
       |FROM (
       |  SELECT word, freq, CAST(sum(CASE WHEN mc = 0 OR mx - ec >= 40 THEN 0
       |      ELSE mc // CAST(2**greatest(0, mx - ec) AS BIGINT) END) AS BIGINT)
       |    AS rm, mx
       |  FROM (
       |    SELECT e.word, pr.freq, (pr.m * e.p) // $PScale AS mc, pr.e AS ec,
       |      max(CASE WHEN (pr.m * e.p) // $PScale > 0 THEN pr.e END)
       |        OVER (PARTITION BY e.word) AS mx
       |    FROM se e JOIN ($prevs) pr ON pr.word = e.word AND $joinCond
       |    WHERE pr.m > 0)
       |  GROUP BY word, freq, mx))""".stripMargin.replace("\n", " ")

  /** Oracle for [[trainSoft]]: base CTEs + probability table + the
    * unrolled forward (by position) and backward (by distance-from-end)
    * lattice CTEs + edge posteriors + smoothed micro counts + costs —
    * every integer op the engine's per-row DP performs, rendered from
    * the same constants.
    */
  def trainSoftSqlDuck(table: String, textCol: String): String = {
    val p0 =
      s"""p0 AS MATERIALIZED (SELECT piece, greatest(1, (cnt * $PScale)
         |  // (SELECT CAST(sum(cnt) AS BIGINT) FROM vocab0)) AS p
         |  FROM vocab0)""".stripMargin.replace("\n", " ")
    val se = "se AS MATERIALIZED (SELECT s.word, s.freq, s.i, s.j, " +
      "s.piece, c.p FROM spans s JOIN p0 c ON s.piece = c.piece)"
    val fs0 = s"fs_0 AS MATERIALIZED (SELECT word, freq, " +
      s"CAST($PScale AS BIGINT) AS m, -30 AS e FROM wf)"
    val fss = (1 to MaxWordLen).map { j =>
      val prevs = (math.max(0, j - MaxPieceLen) until j).map(i =>
        s"SELECT word, freq, $i AS i, m, e FROM fs_$i").mkString(" UNION ALL ")
      latticeCteDuck(s"fs_$j", prevs, s"e.i = pr.i AND e.j = $j")
    }.mkString(", ")
    val gs0 = s"gs_0 AS MATERIALIZED (SELECT word, freq, " +
      s"CAST($PScale AS BIGINT) AS m, -30 AS e FROM wf)"
    val gss = (1 to MaxWordLen).map { k =>
      val prevs = (math.max(0, k - MaxPieceLen) until k).map(kk =>
        s"SELECT word, freq, $kk AS kk, m, e FROM gs_$kk").mkString(" UNION ALL ")
      latticeCteDuck(s"gs_$k", prevs,
        s"e.i = length(e.word) - $k AND length(e.word) - e.j = pr.kk")
    }.mkString(", ")
    val fa = (0 to MaxWordLen).map(j =>
      s"SELECT word, $j AS pos, m, e FROM fs_$j")
      .mkString("fa AS MATERIALIZED (", " UNION ALL ", ")")
    val gb = (0 to MaxWordLen).map(k =>
      s"SELECT word, $k AS k, m, e FROM gs_$k")
      .mkString("gb AS MATERIALIZED (", " UNION ALL ", ")")
    val zf = (1 to MaxWordLen).map(j =>
      s"SELECT word, freq, m, e FROM fs_$j WHERE length(word) = $j")
      .mkString("zf AS MATERIALIZED (", " UNION ALL ", ")")
    val gm =
      s"""gm AS MATERIALIZED (SELECT e.piece, e.freq,
         |  CASE WHEN d >= 0 THEN least($GammaScale,
         |      least(g2, $GammaScale) * CAST(2**least(d, 20) AS BIGINT))
         |    ELSE least($GammaScale, g2 // CAST(2**least(-d, 62) AS BIGINT)) END
         |    AS gam
         |  FROM (
         |    SELECT e.piece, e.freq,
         |      ((((fa.m * e.p) // $PScale) // 1024) * $GammaScale
         |        // (z.m // 1024)) * (gb.m // 1024) AS g2,
         |      fa.e + gb.e - z.e + 10 AS d
         |    FROM se e
         |    JOIN fa ON fa.word = e.word AND fa.pos = e.i AND fa.m > 0
         |    JOIN gb ON gb.word = e.word AND gb.k = length(e.word) - e.j
         |      AND gb.m > 0
         |    JOIN zf z ON z.word = e.word AND z.m > 0) e)"""
        .stripMargin.replace("\n", " ")
    val cnts =
      s"""cntS AS MATERIALIZED (SELECT v.piece,
         |  $GammaScale + COALESCE(CAST(sum(t.freq * t.gam) AS BIGINT), 0)
         |    AS cnt_micro
         |  FROM vocab0 v LEFT JOIN gm t ON v.piece = t.piece
         |  GROUP BY v.piece),
         |costS AS MATERIALIZED (SELECT piece, cnt_micro, CAST(floor($CostScale *
         |    ln(CAST((SELECT sum(cnt_micro) FROM cntS) AS DOUBLE)
         |       / CAST(cnt_micro AS DOUBLE))) AS BIGINT) AS cost FROM cntS)"""
        .stripMargin.replace("\n", " ")
    s"WITH ${baseCtesDuck(table, textCol)}, $p0, $se, $fs0, $fss, " +
      s"$gs0, $gss, $fa, $gb, $zf, $gm, $cnts " +
      "SELECT piece, cnt_micro, cost FROM costS"
  }

  /** Oracle for [[encodeCorpus]]: the trained dict joined back onto the
    * corpus word stream (the [[Bpe.encodeCorpusSqlDuck]] shape).
    */
  def encodeCorpusSqlDuck(table: String, idCol: String,
      textCol: String): String =
    s"""${segmentedChainDuck(table, textCol)},
       |dict AS MATERIALIZED (SELECT word,
       |  CAST(len(string_split(p, '|')) AS BIGINT) AS n_pieces FROM bestf),
       |ws AS (SELECT $idCol, unnest(string_split_regex(lower($textCol),
       |  '\\s+')) AS word FROM $table)
       |SELECT ws.$idCol, count(*) AS n_words,
       |  CAST(sum(d.n_pieces) AS BIGINT) AS n_ulm_tokens
       |FROM ws JOIN dict d ON ws.word = d.word GROUP BY ws.$idCol"""
      .stripMargin.replace("\n", " ")
}
