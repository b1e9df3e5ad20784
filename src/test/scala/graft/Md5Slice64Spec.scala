package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftExpressionBridge.expression

/** [[graft.functions.Md5Slice64]]: the native digest-slice hash must be
  * bit-identical to the composed `conv(substring(md5(x), start, len),
  * 16, 10)` form it replaced in the tokenHash / simhash64 / Bloom-probe
  * hot paths — including null propagation and md5()'s implicit
  * cast-to-binary input contract.
  */
class Md5Slice64Spec extends SparkSpecBase {

  private def native(c: org.apache.spark.sql.Column, start: Int, len: Int) =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.Md5Slice64(expression(c.cast("binary")), start, len))
  private def composed(c: org.apache.spark.sql.Column, start: Int, len: Int) =
    conv(substring(md5(c), start, len), 16, 10).cast("long")

  test("matches the composed conv/substring/md5 form on every slice and input shape") {
    import spark.implicits._
    val rows = Seq(
      "", "a", "hello world", "the quick brown fox", " leading",
      "trailing ", "naïve café", "日本語のテキスト", "emoji 🜁🝪 astral",
      "a" * 10000, "tab\tsep", null
    ).toDF("s")
    for ((st, ln) <- Seq((1, 8), (9, 8), (1, 15), (18, 15), (25, 8), (32, 1))) {
      val bad = rows
        .select(native(col("s"), st, ln).as("n"),
          composed(col("s"), st, ln).as("c"))
        .filter(!(col("n") <=> col("c")))
        .count()
      assert(bad == 0L, s"slice ($st, $ln) diverged from the composed form")
    }
    // null input propagates (never hashes to a value)
    val nulls = rows.filter(col("s").isNull)
      .select(native(col("s"), 1, 8).as("n")).head()
    assert(nulls.isNullAt(0))
  }

  test("non-string input is rejected at analysis on BOTH forms (ANSI forbids bigint->binary)") {
    // the composed md5(bigint) form never resolved under this engine's
    // ANSI mode either, so every existing call site feeds strings; the
    // native form must fail the same way, not silently hash a different
    // byte rendering
    import spark.implicits._
    val rows = Seq(1L, 0L, -7L, Long.MaxValue).toDF("v")
    intercept[org.apache.spark.sql.AnalysisException](
      rows.select(native(col("v"), 1, 8)).head())
    intercept[org.apache.spark.sql.AnalysisException](
      rows.select(composed(col("v"), 1, 8)).head())
    // explicit string cast is byte-identical on both forms
    val bad = rows
      .select(native(col("v").cast("string"), 1, 8).as("n"),
        composed(col("v").cast("string"), 1, 8).as("c"))
      .filter(!(col("n") <=> col("c"))).count()
    assert(bad == 0L)
  }

  test("rejects slices that could exceed a positive int64 or the digest") {
    intercept[IllegalArgumentException](
      graft.functions.Md5Slice64(expression(lit("x")), 1, 16))
    intercept[IllegalArgumentException](
      graft.functions.Md5Slice64(expression(lit("x")), 26, 8))
    intercept[IllegalArgumentException](
      graft.functions.Md5Slice64(expression(lit("x")), 0, 8))
  }
}
