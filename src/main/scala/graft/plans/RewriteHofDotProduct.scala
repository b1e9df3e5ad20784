package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.{LongArrayDot, LongArrayL2}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v) }}}
  * into [[LongArrayDot]], and the squared-L2 idiom
  * {{{ aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v) }}}
  * into [[LongArrayL2]] — the codegen'd tight loops — whenever both
  * arrays are `array<bigint>`.
  *
  * Spark evaluates HOF lambdas interpreted, per element, with variable
  * binding on every step (measured ~250× slower than the fused loop on
  * the brute-force cosine scan). Users writing the natural declarative
  * form — including `spark.sql` text — get the fast path without knowing
  * the engine functions exist. The match is strictly structural: exact
  * multiply / squared-difference lambda over the two zip variables
  * (either order), exact add-merge over (acc, element), identity finish,
  * literal zero seed — anything else (floats, min/max merges, custom
  * finishes) is left untouched.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  /** Only nullless element types are eligible: a NULL element makes the
    * declarative form return NULL (null propagates through the lambda),
    * which the fused loop cannot reproduce — skip statically rather than
    * change results.
    */
  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  /** f(x, y) == x * y over exactly the lambda's own two variables. */
  private def isMultiplyOfVars(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (a.exprId == x.exprId && b.exprId == y.exprId) ||
        (a.exprId == y.exprId && b.exprId == x.exprId)
    case _ => false
  }

  /** f(x, y) == (x − y) * (x − y) over the lambda's own two variables —
    * both factors the SAME subtraction; (y − x)² matches too since the
    * square is direction-independent.
    */
  private def isSquaredDiffOfVars(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(
        Subtract(a1: NamedLambdaVariable, b1: NamedLambdaVariable, _),
        Subtract(a2: NamedLambdaVariable, b2: NamedLambdaVariable, _), _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      a1.exprId == a2.exprId && b1.exprId == b2.exprId &&
        ((a1.exprId == x.exprId && b1.exprId == y.exprId) ||
          (a1.exprId == y.exprId && b1.exprId == x.exprId))
    case _ => false
  }

  private def isAddOfVars(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (a.exprId == x.exprId && b.exprId == y.exprId) ||
        (a.exprId == y.exprId && b.exprId == x.exprId)
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(x: NamedLambdaVariable), _) =>
      v.exprId == x.exprId
    case _ => false
  }

  private def isZeroSeed(e: Expression): Boolean = e match {
    case Literal(0L, LongType) => true
    case Literal(0, _) => true
    case Cast(Literal(0, _), LongType, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, zip: LambdaFunction), seed, merge: LambdaFunction,
          finish: LambdaFunction)
        if isLongArray(a) && isLongArray(b) && isZeroSeed(seed) &&
          isMultiplyOfVars(zip) && isAddOfVars(merge) && isIdentity(finish) =>
        // zip_with pads the shorter array with NULLs, so the declarative
        // form returns NULL on a length mismatch; preserve that exactly —
        // the fused loop only answers when lengths agree
        If(EqualTo(Size(a), Size(b)),
          LongArrayDot(a, b),
          Literal(null, LongType))
      case ArrayAggregate(
          ZipWith(a, b, zip: LambdaFunction), seed, merge: LambdaFunction,
          finish: LambdaFunction)
        if isLongArray(a) && isLongArray(b) && isZeroSeed(seed) &&
          isSquaredDiffOfVars(zip) && isAddOfVars(merge) && isIdentity(finish) =>
        If(EqualTo(Size(a), Size(b)),
          LongArrayL2(a, b),
          Literal(null, LongType))
    }
}
