package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotF64, DotProductRewrite}
import graft.plans.Sketches

/** Library integration point: register graft's native Catalyst
  * functions through the standard extensions mechanism —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — so every session (incl. SQL-only users and thrift/connect fronts)
  * resolves them without per-call registry code. The in-repo operators
  * also self-register defensively ([[graft.functions.NativeFunctions]],
  * Sketches' registerBottomK) so the library works when the user did
  * not configure extensions; both paths install identical expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "dot_f64"),
      (exprs: Seq[Expression]) => DotF64(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bottom_k_sketch"),
      new ExpressionInfo(Sketches.getClass.getName, "bottom_k_sketch"),
      (exprs: Seq[Expression]) => Sketches.bottomK(exprs.head)))
    // users keep the portable HOF spelling of a dot product; the
    // optimizer swaps in the codegen'd DotF64 (same bits, tight loop)
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // grouped top-k: the row_number()<=k window spelling plans as the
    // bounded-heap TopKPerGroupExec (logical node + strategy + exec)
    ext.injectOptimizerRule(_ => graft.plans.TopK.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopK.TopKStrategy)
  }
}
