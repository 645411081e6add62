package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{DotProduct, SquaredL2}

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
  * returns null by contract) and on null elements, and the rewrite only
  * fires when the lambda's product is computed in DOUBLE — which matches
  * DotProduct's internal widen-to-double-then-multiply exactly. Double
  * arrays qualify by construction; float arrays qualify only when the
  * lambda casts both elements to double (an uncast float multiply rounds
  * each product to float before summing, so it is left alone). Matching
  * is deliberately conservative: only the exact shapes above (modulo
  * commuted operands and element casts), only with a 0.0 double seed and
  * an identity finish, and the self-dot form only over a deterministic,
  * cheap-to-duplicate child — anything else is left alone.
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

  /** (x, y) -> x * y, operands in either order, casts tolerated — but the
    * product itself must be computed in DOUBLE ([[DotProduct]] widens each
    * element to double and multiplies exactly; a float-typed Multiply over
    * uncast float-array elements rounds the product to float first, so
    * rewriting it would silently change low-order bits). Over double arrays
    * the multiply is double-typed by construction; over float arrays it is
    * double-typed only when both operands carry a cast to double. */
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      stripCast(body) match {
        case m @ Multiply(l, r, _) if m.dataType == DoubleType =>
          (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
        case _ => false
      }
    case _ => false
  }

  /** (x, y) -> (x − y) * (x − y), casts tolerated, both factors in the
    * SAME orientation ((y−x)*(y−x) also qualifies — an exact negation
    * squares to the identical double — but mixed orientations are
    * −(x−y)² and are left alone); subtract and multiply must both be
    * DOUBLE-typed, the same bit-identity requirement as
    * [[isPairProduct]] ([[SquaredL2]] widens each element to double
    * before subtracting). */
  private def isPairSquaredDiff(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      stripCast(body) match {
        case m @ Multiply(l, r, _) if m.dataType == DoubleType =>
          def orient(e: Expression): Option[Boolean] = stripCast(e) match {
            case s @ Subtract(a, b, _) if s.dataType == DoubleType =>
              if (isVar(a, x) && isVar(b, y)) Some(true)
              else if (isVar(a, y) && isVar(b, x)) Some(false)
              else None
            case _ => None
          }
          (orient(l), orient(r)) match {
            case (Some(o1), Some(o2)) => o1 == o2
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  /** x -> x * x, casts tolerated; same double-product requirement as
    * [[isPairProduct]]. */
  private def isSquare(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable), _) =>
      stripCast(body) match {
        case m @ Multiply(l, r, _) if m.dataType == DoubleType =>
          isVar(l, x) && isVar(r, x)
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

  /** Safe to evaluate twice: column references, constants, and shallow
    * constructors/arithmetic over them (the shapes CollapseProject inlines
    * into the aggregate). Anything with a nested HOF, UDF, or other
    * potentially expensive node blocks the self-dot rewrite — evaluating
    * it twice could cost more than the native kernel saves. */
  private def isCheap(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case c: Cast => isCheap(c.child)
    case CreateArray(children, _) => children.forall(isCheap)
    case b: BinaryArithmetic => isCheap(b.left) && isCheap(b.right)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(ZipWith(a, b, mul), zero, merge, finish)
          if isPairProduct(mul) && isZeroD(zero) && isSum(merge) &&
            isIdentity(finish) && isNumericArray(a) && isNumericArray(b) =>
        DotProduct(a, b)
      // the squared-L2 spelling (the pre-r19 PQ fold): same seed/merge/
      // finish contract, the element lambda is a same-orientation
      // squared difference → the native SquaredL2 kernel
      case ArrayAggregate(ZipWith(a, b, sqd), zero, merge, finish)
          if isPairSquaredDiff(sqd) && isZeroD(zero) && isSum(merge) &&
            isIdentity(finish) && isNumericArray(a) && isNumericArray(b) =>
        SquaredL2(a, b)
      // The self-dot rewrite duplicates `a` into both DotProduct slots, so
      // it is only safe/profitable when `a` is deterministic (two
      // evaluations must agree) and cheap to evaluate twice (an attribute
      // or literal — not an arbitrary subexpression re-run per row).
      case ArrayAggregate(ArrayTransform(a, sq), zero, merge, finish)
          if isSquare(sq) && isZeroD(zero) && isSum(merge) &&
            isIdentity(finish) && isNumericArray(a) &&
            a.deterministic && isCheap(a) =>
        DotProduct(a, a)
    }
}
