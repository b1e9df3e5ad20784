package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 removed the public `new Column(expr)` constructor (Column is
  * a ColumnNode wrapper shared with Connect); the classic-session
  * conversion lives in the `private[sql]` `ExpressionUtils`. This
  * forwarder — placed in `org.apache.spark.sql` for access, the standard
  * extension-library idiom — lets graft's native expressions
  * ([[graft.functions.TokenCount]], [[graft.functions.LongArrayDot]], …)
  * build Columns DIRECTLY, with no per-session function-registry
  * registration and therefore no dependence on `SparkSession.active`
  * pointing at the session that will analyze the plan (a multi-session
  * driver can interleave builds).
  */
object GraftExpressionBridge {
  /** Wrap a catalyst expression as a Column (classic sessions). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its catalyst expression (unresolved is fine —
    * analysis resolves it once the Column lands in a plan).
    */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
