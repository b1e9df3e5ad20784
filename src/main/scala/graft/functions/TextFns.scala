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

/** Static seam for [[Md5Slice64]]: md5 the input bytes and return the
  * unsigned integer value of hex chars [start, start+len) of the
  * 32-char lowercase hex rendering — exactly
  * `CAST(conv(substring(md5(x), start, len), 16, 10) AS BIGINT)` for
  * len ≤ 15 (≤ 60 bits, always a positive int64) — WITHOUT materializing
  * the hex string, the substring slice, or conv's string→BigInteger
  * parse: hex char i (0-based) is nibble i of the digest, read directly.
  * A thread-local MessageDigest amortizes instance construction across
  * every row of a task.
  */
object Md5Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def slice64(bytes: Array[Byte], start: Int, len: Int): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(bytes)
    var v = 0L
    var i = start - 1 // 0-based first nibble
    val end = start - 1 + len
    while (i < end) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** Native md5-hex-slice hash: `Md5Slice64(x, start, len)` ==
  * `CAST(conv(substring(md5(x), start, len), 16, 10) AS BIGINT)` — the
  * engine-wide [[graft.llm.Dedup.tokenHash]] idiom (start=1, len=8), the
  * simhash64 second word (9, 8), and the Bloom probe hash (1, 15),
  * without the per-row detour the composed form pays: a 32-char hex
  * STRING materialization (commons-codec encode), a substring slice, and
  * conv's string→number parse. The digest math is unchanged, so values
  * (and therefore every oracle-shared signature) are bit-identical; the
  * input contract mirrors `md5(x)` exactly via the same implicit
  * cast-to-binary. Sits under every shingle/minhash/bucket hash — the
  * CPU-dominant expression of the explode-head pipelines.
  */
case class Md5Slice64(child: Expression, start: Int, len: Int)
    extends UnaryExpression {
  require(start >= 1 && len >= 1 && len <= 15 && start - 1 + len <= 32,
    s"md5_slice64 needs 1-based hex range within the digest and len <= 15 " +
      s"(int64-positive), got start=$start len=$len")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_slice64 expects binary (cast at the call site, mirroring " +
        s"md5()'s implicit cast), got ${child.dataType.simpleString}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_slice64"

  override def nullSafeEval(b: Any): Any =
    Md5Util.slice64(b.asInstanceOf[Array[Byte]], start, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.Md5Util.slice64($b, $start, $len);")

  override protected def withNewChildInternal(newChild: Expression): Md5Slice64 =
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
