package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TokenCount

/** Optimizer rule: rewrite the token-count idiom
  * {{{ size(split(s, ' ')) }}}
  * into [[TokenCount]] — a one-pass byte scan — whenever the split
  * pattern is EXACTLY the literal single space and the limit is the
  * default −1 (trailing empties kept, so count = spaces + 1 holds). Any
  * other pattern ("\\s+", multi-char, computed) changes semantics and is
  * left untouched.
  *
  * Null contract preserved exactly: ANSI `size(NULL)` is NULL, which
  * [[TokenCount]] propagates natively; a legacy-flagged `Size`
  * (`size(NULL) = -1`) is rewritten to `coalesce(token_count(s), -1)` —
  * token_count yields NULL ONLY for NULL input, so the coalesce is
  * exactly the legacy contract while evaluating `s` ONCE (an
  * `if(isnull(s), …)` guard would evaluate it twice: wrong for a
  * non-deterministic child, 2× the cost for an expensive one).
  */
object RewriteTokenCount extends Rule[LogicalPlan] {

  private def isSpaceLiteral(e: Expression): Boolean = e match {
    case Literal(p: UTF8String, StringType) => p.toString == " "
    case _ => false
  }

  private def isDefaultLimit(e: Expression): Boolean = e match {
    case Literal(-1, IntegerType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, pat, limit), legacy)
          if str.dataType == StringType && isSpaceLiteral(pat) &&
            isDefaultLimit(limit) =>
        if (legacy)
          Coalesce(Seq(TokenCount(str), Literal(-1, IntegerType)))
        else TokenCount(str)
    }
}
