package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the composable dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, z) -> acc + z)
  *
  * into the native codegen'd [[DotF64]]. The HOF form is what a user
  * naturally writes (and what this repo's similarity tier used before
  * round 3), but higher-order functions are CodegenFallback — the
  * innermost |pairs|·dim multiply loop runs as interpreted per-element
  * lambda dispatch. With this rule injected (via [[graft.GraftExtensions]]
  * or `spark.experimental.extraOptimizations`) the user keeps the
  * portable spelling and still gets the tight generated loop.
  *
  * The rewrite is semantics-preserving on ALL inputs since round 13:
  * sequential accumulation in index order (bit-identical to the fold),
  * and null array elements / mismatched lengths propagate NULL exactly
  * like the fold does ([[ArrayFoldKernel]]'s contract — before r13 a
  * null slot read as 0.0 natively, a documented caveat this rule
  * inherited).
  * Guards: zero literal must be exactly 0.0 double, both arrays must be
  * array<double>, the multiply/add bodies must be exactly the two
  * lambda variables (either order), and the finish lambda must be the
  * identity.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def varIds(args: Seq[Expression]): Set[Long] =
    args.collect { case v: NamedLambdaVariable => v.exprId.id }.toSet

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), mulArgs, _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _), addArgs, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
        if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) &&
          Set(x.exprId.id, y.exprId.id) == varIds(mulArgs) &&
          Set(l.exprId.id, r.exprId.id) == varIds(addArgs) &&
          fin.exprId == finArg.exprId =>
      DotF64(a, b)
  }
}
