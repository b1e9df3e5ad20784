package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{LongArrayDot, LongArrayL2, TokenCount}
import graft.plans.{RewriteHofDotProduct, RewriteTokenCount}

/** The engine's `SparkSessionExtensions` entry point — the no-code
  * deployment hook:
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`)
  * installs, for every session of the application:
  *
  *  - `long_dot(array<bigint>, array<bigint>) -> bigint` and
  *    `long_l2(array<bigint>, array<bigint>) -> bigint` as catalog SQL
  *    functions (the codegen'd integer dot product / squared-L2 behind
  *    the similarity and PQ operators), and
  *  - [[RewriteHofDotProduct]], so the declarative
  *    `aggregate(zip_with(...))` dot-product idiom is rewritten to the
  *    same fused loop automatically,
  *  - `token_count(string) -> int` (the one-pass whitespace token
  *    counter) and [[RewriteTokenCount]], so `size(split(s, ' '))` —
  *    the token-count idiom all over text curation SQL — skips the
  *    array materialization.
  *
  * `ArrayFns.register` remains the per-session programmatic equivalent
  * for hosts that cannot set the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // analysis-time arity check: without it long_dot(a) dies with a
        // raw IndexOutOfBounds and long_dot(a,b,c) silently drops args
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"long_dot(array<bigint>, array<bigint>) takes exactly 2 " +
              s"arguments, got ${exprs.length}")
        LongArrayDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("long_l2"),
      new ExpressionInfo(classOf[LongArrayL2].getName, "long_l2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"long_l2(array<bigint>, array<bigint>) takes exactly 2 " +
              s"arguments, got ${exprs.length}")
        LongArrayL2(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"token_count(string) takes exactly 1 argument, got ${exprs.length}")
        TokenCount(exprs.head)
      }))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectOptimizerRule(_ => RewriteTokenCount)
  }
}
