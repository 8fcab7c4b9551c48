package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: recognize the interpreted HOF dot-product
  * pattern `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) ->
  * acc+x)` and replace it with the codegen'd [[DotProduct]]. Safe
  * because both fold left-to-right over the same doubles (bit-identical
  * results — asserted in NativeFunctionSpec).
  *
  * The match binds the lambda variables and requires the Multiply/Add
  * operands to be exactly those bound variables (in either order —
  * IEEE-754 `*` and `+` are commutative) and the finish lambda to be
  * the identity; anything else — `(x,y) -> x*x`, `(x,y) -> x*2`, a
  * non-identity finish — is left untouched. */
object DotProductRewrite extends Rule[LogicalPlan] {

  /** operands {l, r} are exactly the bound variables {x, y}, either order */
  private def exactlyTheVars(
      l: Expression, r: Expression, x: Expression, y: Expression): Boolean =
    (l.semanticEquals(x) && r.semanticEquals(y)) ||
      (l.semanticEquals(y) && r.semanticEquals(x))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _), Seq(x, y), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(al, ar, _), Seq(acc, el), _),
            LambdaFunction(finBody, Seq(finArg), _))
          if zero == 0.0 &&
            exactlyTheVars(ml, mr, x, y) &&
            exactlyTheVars(al, ar, acc, el) &&
            finBody.semanticEquals(finArg) =>
        DotProduct(a, b)
    }
}

/** Session extension entry point — enables the SQL function
  * `dot_native(a, b)`, the automatic HOF→native rewrite, and the
  * planner strategy for the custom as-of operator
  * ([[graft.plans.AsofJoinNode]] → [[graft.plans.AsofJoinExec]]):
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  *   // or .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_native"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_native"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_native"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_native"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectOptimizerRule(_ => CosineRewrite)
    ext.injectOptimizerRule(_ => graft.plans.AsofRangePushdown)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectResolutionRule(_ => graft.plans.ResolveAsofJoin)
    // SQL surface for the custom operator:
    //   SELECT * FROM asof_join('probe_view', 'build_view', 'ts',
    //                           'by1,by2', 'payload1,payload2'
    //                           [, tolerance_micros
    //                           [, direction            -- backward|forward|nearest
    //                           [, allow_exact_matches]]])
    // tolerance_micros < 0 means "no tolerance" (SQL has no named
    // optional args, so the positional slot needs an explicit skip
    // value). The relations start unresolved; ResolveAsofJoin fills the
    // output attrs once the analyzer resolves them.
    ext.injectTableFunction((
      new FunctionIdentifier("asof_join"),
      new ExpressionInfo(classOf[graft.plans.AsofJoinNode].getName, "asof_join"),
      (args: Seq[Expression]) => {
        require(args.length >= 5 && args.length <= 8,
          "asof_join(probe, build, on, by_csv, payload_csv" +
            "[, tolerance_micros[, direction[, allow_exact_matches]]])")
        def str(e: Expression): String = e.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => String.valueOf(other)
        }
        val by = str(args(3)).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val payload = str(args(4)).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(by.nonEmpty, "asof_join requires a non-empty by key list")
        val tol = args.lift(5).map(e => e.eval().asInstanceOf[Number].longValue())
          .filter(_ >= 0L)
        val dir = args.lift(6).map(str).getOrElse("backward")
        val allowExact = args.lift(7).forall(e => e.eval() match {
          case b: java.lang.Boolean => b.booleanValue()
          case other => String.valueOf(other).toBoolean
        })
        graft.plans.AsofJoinNode(
          org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(Seq(str(args(0)))),
          org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(Seq(str(args(1)))),
          str(args(2)), by, payload, tol, Nil, dir, allowExact)
      }))
  }
}
