package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter (Bloom 1970) — the semi-join PRUNER of the
  * sketch family: where KMV/HLL/CMS summarize, the Bloom filter answers
  * "might this key be in the set?" with no false negatives, so a 100 TB
  * corpus scan can drop rows that cannot possibly match a (much smaller)
  * key set BEFORE any shuffle — decontamination pre-filters, GDPR delete
  * sweeps, dedup-against-prior-corpus all reduce to this shape. Spark's
  * own runtime-filter machinery injects the same construction
  * internally; this is the explicit, cross-engine-checkable version.
  *
  * Discipline (the KMV/HLL/CMS contract): DETERMINISTIC — the k probe
  * positions come from salted md5 prefixes, the filter is integer
  * register words end-to-end, and the gate reports the Bloom candidate
  * count NEXT TO the exact semi-join count, so the oracle rebuilds the
  * filter bit-for-bit AND the gate doubles as a false-positive audit.
  *
  * Mergeable artifact: the word table (word index → int64 of 64 bits),
  * merged by BIT_OR — shards/deltas build independently and OR together
  * into exactly the one-pass filter (the HLL-register discipline; see
  * [[mergeWords]] and the BloomSpec merge property).
  *
  * Scale shapes: build = one explode(k) + one (word)-keyed partial-agg
  * BIT_OR over the KEY SET (small side — never the corpus); probe = a
  * collected ≤ [[MaxBits]]-bit array as a literal (the broadcast a
  * runtime filter would ship) tested by pure codegen'd bit arithmetic —
  * the corpus side has ZERO shuffle and k md5s per row.
  */
object Bloom {

  /** Upper bound on filter size: 2²² bits = 512 KiB collected to the
    * driver / embedded in the plan — the same order as a broadcast
    * runtime filter. Size for ~m/10 keys at k=3 (FP ≈ 1.7%).
    */
  val MaxBits: Int = 1 << 22

  private def requireParams(mBits: Int, k: Int): Unit = {
    require(mBits >= 64 && mBits <= MaxBits && mBits % 64 == 0,
      s"mBits must be in [64, $MaxBits] and a multiple of 64, got $mBits")
    require(k >= 1 && k <= 8, s"k must be in 1..8, got $k")
  }

  /** Probe position i of a key: the first 15 hex chars (60 bits) of
    * md5(key:i), mod m — salted variant of [[graft.llm.Dedup.tokenHash]]
    * (8 chars would alias positions above 2³² filters; 15 keeps the
    * value positive int64 at any allowed m).
    */
  def position(key: Column, i: Int, mBits: Int): Column =
    pmod(graft.llm.Dedup.md5Slice(
      concat(key.cast("string"), lit(s":$i")), 1, 15), lit(mBits.toLong))

  /** The DuckDB rendering of [[position]] over a key SQL expression. */
  def positionSqlDuck(keySql: String, i: Int, mBits: Int): String =
    s"(CAST(concat('0x', substr(md5(CAST($keySql AS VARCHAR) || ':$i'), " +
      s"1, 15)) AS BIGINT) % $mBits)"

  /** DuckDB rendering of `1L << bit` for a bit index expression in
    * [0, 64): DuckDB raises on `1 << 63` where Spark wraps to
    * Long.MinValue, so the sign bit is special-cased to the same
    * two's-complement value.
    */
  def shift1SqlDuck(bitSql: String): String =
    s"(CASE WHEN ($bitSql) = 63 " +
      "THEN CAST(-9223372036854775807 - 1 AS BIGINT) " +
      s"ELSE CAST(1 AS BIGINT) << CAST(($bitSql) AS INT) END)"

  /** The mergeable word table of the key set: (_word INT, _bits BIGINT)
    * with `_word = pos div 64` and `_bits = BIT_OR(1 << (pos mod 64))`
    * over all k positions of all keys. Absent words are all-zero (the
    * probe treats a missing word as 0). One explode(k) over the KEY SET
    * plus one partial-aggregated BIT_OR — ≤ m/64 output rows.
    */
  def buildWords(keys: DataFrame, keyCol: Column, mBits: Int,
      k: Int): DataFrame = {
    requireParams(mBits, k)
    keys.select(keyCol.as("_key")).distinct()
      .select(explode(array((0 until k).map(i =>
        position(col("_key"), i, mBits)): _*)).as("_pos"))
      .select((col("_pos") / 64).cast("int").as("_word"),
        col("_pos").cast("int").as("_p"))
      .groupBy("_word")
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), _p % 64)")).as("_bits"))
  }

  /** BIT_OR-merge word tables built over shards or deltas — the result
    * is bit-identical to one build over the union of the key sets
    * (set-union is what BIT_OR of indicator bits computes).
    */
  def mergeWords(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy("_word").agg(bit_or(col("_bits")).as("_bits"))

  /** Collect a word table into the dense Array[Long] the probe embeds —
    * bounded by [[MaxBits]]/64 = 65,536 longs (512 KiB), the explicit
    * version of shipping a runtime filter to every task.
    */
  def collectWords(words: DataFrame, mBits: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits <= MaxBits)
    val dense = new Array[Long](mBits / 64)
    words.select(col("_word"), col("_bits")).collect().foreach { r =>
      dense(r.getInt(0)) = r.getLong(1)
    }
    dense
  }

  /** Membership probe against a collected filter: AND over the k bit
    * tests, pure codegen (array literal + element_at + bitwise AND —
    * the 64 masks come from a literal power table, so no variable-shift
    * expression is needed). No false negatives; false positives are the
    * audited price.
    */
  def mightContain(words: Array[Long], mBits: Int, k: Int,
      key: Column): Column = {
    requireParams(mBits, k)
    require(words.length == mBits / 64,
      s"words must have ${mBits / 64} entries, got ${words.length}")
    val arr = typedlit(words.toSeq)
    val pow2 = typedlit((0 until 64).map(b => 1L << b))
    (0 until k).map { i =>
      val pos = position(key, i, mBits)
      val word = element_at(arr, (pos / 64).cast("int") + 1)
      val mask = element_at(pow2, pmod(pos, lit(64L)).cast("int") + 1)
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** The DuckDB rendering of the probe as a JOIN against a rebuilt word
    * CTE (the oracle has no collected array): key is a candidate iff
    * all k of its positions land on set bits. `wordsCte` must expose
    * (_word, _bits); returns a boolean SQL expression usable in a
    * lateral-free HAVING via the provided per-key aggregation — here as
    * a scalar: k correlated EXISTS checks ANDed.
    */
  def mightContainSqlDuck(keySql: String, mBits: Int, k: Int,
      wordsCte: String): String =
    (0 until k).map { i =>
      val pos = positionSqlDuck(keySql, i, mBits)
      // DuckDB raises on 1 << 63 where Spark wraps to Long.MinValue —
      // special-case the sign bit to the same two's-complement value
      val mask = s"(CASE WHEN ($pos) % 64 = 63 " +
        "THEN CAST(-9223372036854775807 - 1 AS BIGINT) " +
        s"ELSE CAST(1 AS BIGINT) << (($pos) % 64) END)"
      s"EXISTS (SELECT 1 FROM $wordsCte ww WHERE ww._word = $pos // 64 " +
        s"AND (ww._bits & $mask) <> 0)"
    }.mkString("(", " AND ", ")")
}
