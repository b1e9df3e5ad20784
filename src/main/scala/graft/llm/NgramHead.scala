package graft.llm

/** A REAL (non-stub) model for the classifier seam: an integer n-gram
  * logistic head with frozen weights — the fastText/DCLM filter shape
  * (hash n-grams into a fixed bucket table, sum the bucket weights,
  * squash) with the weights FROZEN so the scorer is deterministic and
  * the DuckDB oracle can reproduce it bit-for-bit. Where
  * [[QualityRules.stubEduScore]] proves the seam's plumbing with a
  * formula any engine can inline, this exercises what an actual model
  * needs at 100 TB:
  *
  *  - REAL PER-PARTITION STATE: the weight table ships as ONE Spark
  *    broadcast (driver serializes it once, every executor fetches it
  *    once — never a per-row or per-task copy), and the per-partition
  *    init materializes `bc.value` + a reusable MD5 instance exactly
  *    once per partition ([[scorerFactory]] through
  *    [[QualityRules.classifierScoresInit]] — the seam spec counts the
  *    inits). A fastText-class model swaps the array for its matrix;
  *    the plumbing is identical.
  *  - The scoring stage stays a PURE MAP — embarrassingly parallel,
  *    no exchange of its own, NULL text scores NULL.
  *
  * Model definition (all exact int64, oracle-parity by construction):
  *  - token buckets: `uint32(md5(token)[0:8 hex]) % 4096` — the
  *    engine-wide md5-prefix hashing convention
  *    ([[Sampling.hashPermille]]), reproduced in DuckDB as
  *    `CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 4096`.
  *  - base weights: `(b · 2654435761) % 17 − 8` ∈ [−8, 8] — the
  *    Knuth-multiplicative mix as a frozen pseudo-random init.
  *  - "learned" adjustments: each bucket hit by an English stopword
  *    ([[TextAnalysis.StopWords]]) gets +12 once (distinct buckets —
  *    matching the oracle's `IN` set semantics, not per-word).
  *  - squash: `clamp(500 + 25·Σw div n_tokens, 0, 1000)` — a hard
  *    sigmoid in integer per-mille. Negative sums divide
  *    truncating-toward-zero on BOTH engines (Spark `div` == DuckDB
  *    `//`, the repo-verified parity rule).
  *
  * Tokens are space-split KEEPING trailing empties (`split(s, " ", -1)`
  * == DuckDB `string_split`), the stub's convention.
  */
object NgramHead {

  val Buckets = 4096
  val Mixer = 2654435761L
  val StopBonus = 12L

  /** uint32 of the md5 hex prefix — the first 4 digest bytes — mod
    * [[Buckets]]. One reusable digest instance per partition (single
    * threaded over the partition iterator); pass a fresh one per call
    * site on the driver.
    */
  private def bucketOf(token: String,
      md: java.security.MessageDigest): Int = {
    md.reset()
    val d = md.digest(token.getBytes("UTF-8"))
    val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u32 % Buckets).toInt
  }

  /** The frozen weight table — deterministic, built once on the driver
    * and shipped by broadcast. Stopword buckets are deduplicated before
    * the bonus so a bucket collision between two stopwords still adds
    * +12 once (the oracle's `IN (SELECT …)` semantics).
    */
  def weights: Array[Long] = {
    val w = Array.tabulate(Buckets)(b => (b * Mixer) % 17 - 8)
    val md = java.security.MessageDigest.getInstance("MD5")
    TextAnalysis.StopWords.map(bucketOf(_, md)).distinct
      .foreach(b => w(b) += StopBonus)
    w
  }

  /** Integer per-mille head score of one document against a weight
    * table.
    */
  def score(text: String, w: Array[Long],
      md: java.security.MessageDigest): Long = {
    val toks = text.split(" ", -1) // keep trailing empties: string_split does
    var raw = 0L
    var i = 0
    while (i < toks.length) { raw += w(bucketOf(toks(i), md)); i += 1 }
    math.max(0L, math.min(1000L, 500L + raw * 25L / toks.length))
  }

  /** The per-partition init factory for
    * [[QualityRules.classifierScoresInit]]: broadcasts the frozen
    * weights ONCE (here, on the driver), and each partition's init
    * fetches the broadcast value and allocates its reusable digest —
    * the model-session shape a real classifier needs.
    */
  def scorerFactory(
      spark: org.apache.spark.sql.SparkSession): () => String => Long = {
    val bc = spark.sparkContext.broadcast(weights)
    () => {
      val w = bc.value
      val md = java.security.MessageDigest.getInstance("MD5")
      (text: String) => score(text, w, md)
    }
  }

  /** The head as a DuckDB CTE chain over a `(doc_id, text)` relation —
    * `(SELECT doc_id, score_permille FROM …)`-shaped, NULL-text rows
    * excluded upstream by the caller's filter.
    */
  def scoresSqlDuck(src: String): String = {
    val swVals = TextAnalysis.StopWords.map(s => s"('$s')").mkString(", ")
    s"""(WITH _nh_tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM $src),
       |  _nh_bk AS (SELECT doc_id,
       |    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % $Buckets
       |      AS b FROM _nh_tk),
       |  _nh_sw AS (SELECT DISTINCT
       |    CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % $Buckets
       |      AS b FROM (VALUES $swVals) _sw(s)),
       |  _nh_w AS (SELECT doc_id, (b * $Mixer) % 17 - 8 +
       |    (CASE WHEN b IN (SELECT b FROM _nh_sw) THEN $StopBonus
       |     ELSE 0 END) AS wt FROM _nh_bk)
       |SELECT doc_id, greatest(0, least(1000,
       |    500 + CAST(sum(wt) AS BIGINT) * 25 // count(*)))
       |  AS score_permille
       |FROM _nh_w GROUP BY doc_id)""".stripMargin.replace("\n", " ")
  }
}
