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
