package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (p, q) -> p + q) }}}
  *
  * and its self-dot (squared-norm) form
  *
  * {{{ aggregate(transform(a, x -> x * x), 0D, (p, q) -> p + q) }}}
  *
  * to the native codegen'd [[graft.functions.DotProduct]] expression — so a
  * user who writes the natural HOF formulation gets the fused whole-stage-
  * codegen kernel the graft entries use by hand (the HOF path interprets
  * two lambda invocations per element; PlanSpec pins that the pair
  * kernels stay on the native expression).
  *
  * The rewrite is semantics-preserving BIT-FOR-BIT, not approximately:
  * both sides fold in ascending index order over doubles
  * (SimilaritySpec "native CosineSimilarity equals the HOF formulation
  * bit-for-bit" pins the arithmetic), both yield NULL on mismatched
  * lengths (zip_with pads with null → null product → null sum; DotProduct
  * returns null by contract) and on null elements, and element casts to
  * double inside the lambda match DotProduct's internal double
  * accumulation over float/double arrays. Matching is deliberately
  * conservative: only the exact shapes above (modulo commuted operands
  * and element casts), only over float/double arrays, only with a 0.0
  * double seed and an identity finish — anything else is left alone.
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`, so a
  * cluster configured with `spark.sql.extensions=graft.GraftExtensions`
  * applies it to every session. */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case x: NamedLambdaVariable => x.exprId == v.exprId
      case _ => false
    }

  /** (x, y) -> x * y, operands in either order, casts tolerated. */
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      stripCast(body) match {
        case Multiply(l, r, _) =>
          (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
        case _ => false
      }
    case _ => false
  }

  /** x -> x * x, casts tolerated. */
  private def isSquare(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable), _) =>
      stripCast(body) match {
        case Multiply(l, r, _) => isVar(l, x) && isVar(r, x)
        case _ => false
      }
    case _ => false
  }

  /** (p, q) -> p + q, operands in either order. */
  private def isSum(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      stripCast(body) match {
        case Add(l, r, _) =>
          (isVar(l, p) && isVar(r, q)) || (isVar(l, q) && isVar(r, p))
        case _ => false
      }
    case _ => false
  }

  /** acc -> acc (the finish the two-argument aggregate() fills in). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(a: NamedLambdaVariable), _) => isVar(body, a)
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(ZipWith(a, b, mul), zero, merge, finish)
          if isPairProduct(mul) && isZeroD(zero) && isSum(merge) &&
            isIdentity(finish) && isNumericArray(a) && isNumericArray(b) =>
        DotProduct(a, b)
      case ArrayAggregate(ArrayTransform(a, sq), zero, merge, finish)
          if isSquare(sq) && isZeroD(zero) && isSum(merge) &&
            isIdentity(finish) && isNumericArray(a) =>
        DotProduct(a, a)
    }
}
