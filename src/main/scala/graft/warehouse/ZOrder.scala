package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — the multi-dimensional data-skipping
  * complement to [[Bucketing]]: sorting files by the bit-interleave of
  * two bounded dimensions keeps rows that are close in BOTH dimensions
  * close on disk, so min/max footer pruning cuts scans for 2-D
  * predicates (user × time, key × date) where a lexicographic sort only
  * helps its leading column. The curve value is plain integer
  * arithmetic — the classic magic-bits spread — so it is exact,
  * engine-portable (the DuckDB oracle runs the identical shifts), and
  * codegen-friendly (no UDF, no custom expression needed).
  *
  * Scale shape: `layout` is `repartitionByRange` + in-partition sort on
  * the z value — the standard write-side pattern (one range exchange at
  * ingest, amortized over every pruned read); the key computation
  * itself is shuffle-free.
  */
object ZOrder {

  val Bits = 16 // per-dimension input width; z values fit in 32 bits

  /** Spread the low 16 bits of `v` into the even bit positions —
    * 0b1111 → 0b01010101 (Morton "part1by1").
    */
  private def part1by1(v: Column): Column = {
    val masked = v.bitwiseAND(lit(0xFFFFL))
    val s1 = masked.bitwiseOR(shiftleft(masked, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** The 32-bit Morton value of two 16-bit dimensions (x in the even
    * bits, y in the odd). Inputs are masked to 16 bits — callers bucket
    * wider domains down first (`pmod`, `div`).
    */
  def zValue(x: Column, y: Column): Column =
    part1by1(x.cast("long"))
      .bitwiseOR(shiftleft(part1by1(y.cast("long")), 1))

  /** DuckDB closed form of [[zValue]] — rendered from the same mask and
    * shift constants so the two engines cannot drift one-sided.
    */
  def zValueSqlDuck(x: String, y: String): String = {
    def part(v: String): String = {
      val m = s"(CAST($v AS BIGINT) & 65535)"
      val s1 = s"(($m | ($m << 8)) & 16711935)"
      val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
      val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
      s"(($s3 | ($s3 << 1)) & 1431655765)"
    }
    s"(${part(x)} | (${part(y)} << 1))"
  }

  /** Write-side layout: range-partition and sort by the z value of the
    * two dimension columns. The exchange is a RangePartitioning on the
    * curve value (asserted in the spec) — each output file then covers a
    * compact z range, i.e. a compact rectangle-ish region of (x, y), the
    * property footer-based skipping prunes on.
    */
  def layout(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    // fresh temp name: a caller column literally named "_z" must survive
    // the round trip, not be clobbered then dropped
    val zc = Iterator.from(0).map(i => if (i == 0) "_z" else s"_z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zc, zValue(x, y))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
