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
  * results — asserted in NativeFunctionSpec). */
object DotProductRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(_, _, _), _, _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(_, _, _), _, _),
            LambdaFunction(_, _, _)) if zero == 0.0 =>
        DotProduct(a, b)
    }
}

/** Session extension entry point — enables both the SQL function
  * `dot_native(a, b)` and the automatic HOF→native rewrite:
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
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
