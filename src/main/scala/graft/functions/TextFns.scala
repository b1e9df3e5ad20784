package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace token count: `token_count(s)` ==
  * `size(split(s, ' '))` for non-null input — the single-space `split`
  * keeps trailing empty strings (limit −1), so the token count is
  * EXACTLY (number of 0x20 bytes) + 1, and the whole-array
  * materialization `split` pays (one UTF8String slice per token, an
  * ArrayData, then a size read that throws it all away) collapses to a
  * one-pass byte scan. 0x20 cannot occur inside a UTF-8 multi-byte
  * sequence (continuation bytes have the high bit set), so the byte scan
  * is correct for any Unicode input.
  *
  * The token-count idiom sits under the packing weights, budget
  * selection, epoch planning, and quality-feature paths — everywhere the
  * array itself is NOT otherwise needed. NULL input returns NULL (the
  * ANSI `size` contract this engine runs under); the legacy
  * `size(NULL) = -1` variant is reproduced by [[graft.plans.RewriteTokenCount]]
  * where it rewrites a legacy-flagged `Size`.
  */
case class TokenCount(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val n = u.numBytes()
    var c = 1
    var i = 0
    while (i < n) {
      if (u.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $s.numBytes();
         |int $c = 1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($s.getByte($i) == 0x20) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Static seam for [[NfcNormalize]]'s codegen (a Scala object method gets
  * a static forwarder Janino can call). Two allocation-free fast paths
  * cover the 100 TB-dominant cases: pure-ASCII bytes are NFC by
  * definition (one byte scan, no String round-trip), and already-NFC
  * text (JDK `isNormalized`) returns the input UTF8String untouched.
  * Only text that actually changes pays the String → normalize →
  * UTF8String conversion.
  */
object NfcUtil {
  def nfc(u: UTF8String): UTF8String = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if ((u.getByte(i) & 0x80) != 0) {
        val s = u.toString
        return if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
        else UTF8String.fromString(
          java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    u
  }
}

/** Unicode NFC normalization as a native codegen'd expression:
  * `nfc_normalize(s)` — canonical composition (é == e +​ U+0301, jamo →
  * Hangul syllables, U+212B Å → U+00C5), the precondition every
  * multilingual text operator needs before hashing or segmenting (two
  * byte-distinct spellings of the same text must dedup/tokenize
  * identically). Matches DuckDB's `nfc_normalize` — both sides implement
  * the same Unicode canonical composition, which is what makes the
  * unicode gates oracle-exact. No UDF: a unary Expression whose codegen
  * is one static call, so the text pipelines stay inside whole-stage
  * codegen.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcUtil.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextFns {
  /** Idempotent per-session registration; exposes `token_count(s)` and
    * `nfc_normalize(s)` to SQL, `expr(...)`, and `call_function`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_count", exprs => TokenCount(exprs.head), "internal")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "internal")
  }
}
