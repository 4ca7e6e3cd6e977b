package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Catalyst optimizer rule (injected via GraftExtensions): rewrite the
  * portable higher-order-function dot-product spelling
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[graft.functions.DotProduct]] kernel. The
  * HOF form is what users write in engine-agnostic SQL (it is also this
  * repo's own oracle spelling, `list_sum(list_transform(...))` on the
  * DuckDB side) — and on Spark it is CodegenFallback: per row it
  * materializes the zipped array and interprets two lambdas per element.
  * The kernel is the identical sequential left fold (bit-identical
  * doubles — VectorExpressionsSpec pins `dot == dotHof`) as one fused
  * loop inside WholeStageCodegen.
  *
  * Soundness guards (the rewrite must be SEMANTICS-preserving for every
  * query, not just the vector tier's):
  *  - both inputs are `array<double>` with `containsNull = false` —
  *    with a null element the HOF form returns null (null product
  *    poisons the fold) while the kernel reads primitives; nullable
  *    element types are left untouched;
  *  - the zero literal is exactly 0.0d (a different seed changes the
  *    fold);
  *  - multiply/add operand order is checked by lambda-variable exprId —
  *    either order matches, since IEEE multiply and two-operand add are
  *    commutative (associativity is NOT assumed: the kernel folds left
  *    to right exactly like ArrayAggregate);
  *  - the finish lambda is the identity.
  *
  * A null ARRAY (vs element) stays null in both forms. ANSI eval modes
  * on Multiply/Add don't change double arithmetic (no overflow error
  * path for doubles), so the match ignores `evalMode`.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  import RewriteRules.{nonNullDoubleArray, posZeroSeed, sameVars}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(mx, my, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(ax, av, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fv: NamedLambdaVariable), _))
          if posZeroSeed(zero) && nonNullDoubleArray(l) && nonNullDoubleArray(r) &&
            sameVars(mx, my, zx, zy) && sameVars(ax, av, acc, v) &&
            fin.exprId == fv.exprId =>
        DotProduct(l, r)
    }
}

/** Sibling of [[RewriteHofDot]] for the plain-sum HOF spelling
  *
  *   aggregate(arr, 0.0d, (acc, x) -> acc + x)
  *
  * → the codegen'd [[graft.functions.ArraySum]] kernel. Same soundness
  * guards: non-null `array<double>` elements (a null element nulls the
  * HOF fold but reads as a primitive in the kernel), exact 0.0d seed,
  * strict `acc + x` add in either operand order (IEEE two-operand add
  * is commutative; the kernel keeps the left-to-right fold order so
  * doubles stay bit-identical), identity finish lambda.
  */
object RewriteHofSum extends Rule[LogicalPlan] {

  import RewriteRules.{nonNullDoubleArray, posZeroSeed, sameVars}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            arr,
            Literal(zero, DoubleType),
            LambdaFunction(Add(ax, av, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fv: NamedLambdaVariable), _))
          if posZeroSeed(zero) && nonNullDoubleArray(arr) &&
            // leave zip_with inputs to RewriteHofDot — the fused
            // DotProduct beats sum-over-materialized-products
            // regardless of which rule the optimizer tries first
            !arr.isInstanceOf[ZipWith] &&
            sameVars(ax, av, acc, v) && fin.exprId == fv.exprId =>
        graft.functions.ArraySum(arr)
    }
}

/** Shared soundness guards for the HOF-rewrite rules. */
private[plans] object RewriteRules {

  def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  /** Accepts ONLY a +0.0 seed, by raw bits: Scala numeric equality makes
    * `-0.0 == 0.0` true, but `aggregate(arr, -0.0d, ...)` returns -0.0
    * for an empty array while the kernels return +0.0 — a bit-identical
    * violation the `==` guard would have let through.
    */
  def posZeroSeed(zero: Any): Boolean = zero match {
    case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }

  def sameVars(a: Expression, b: Expression,
      va: NamedLambdaVariable, vb: NamedLambdaVariable): Boolean =
    (a, b) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        (x.exprId == va.exprId && y.exprId == vb.exprId) ||
          (x.exprId == vb.exprId && y.exprId == va.exprId)
      case _ => false
    }
}
