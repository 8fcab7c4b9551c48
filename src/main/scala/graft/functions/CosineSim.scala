package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Divide, Expression, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen cosine similarity of two double arrays — the fused
  * form of `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`.
  *
  * Why it exists: after [[DotProductRewrite]], the composed cosine
  * still evaluates its array children five times (a ×3, b ×2 across
  * the three dot products) and walks a three-node arithmetic tree per
  * row. This expression evaluates each child ONCE and runs the three
  * accumulations in tight fused loops — on a 100 TB embedding scan the
  * array materialization is the dominant per-row cost, so halving the
  * child evaluations matters more than the arithmetic.
  *
  * Bit-exactness contract (what makes [[CosineRewrite]] safe): each
  * accumulator folds left-to-right exactly like its standalone
  * [[DotProduct]] twin — `ab` over min(|a|,|b|) elements, `aa` over
  * all of a, `bb` over all of b — and the final combine spells the
  * SAME expression tree `ab / (sqrt(aa) * sqrt(bb))`. A zero
  * denominator follows the MATCHED Divide's eval mode, which the
  * rewrite captures into `failOnError`: ANSI (the Spark 4 default)
  * throws the engine's divide-by-zero error, non-ANSI/TRY returns
  * NULL — asserted against the composed form in NativeFunctionSpec,
  * including the zero-vector row. (The SQL-registered
  * `cosine_native(a, b)` defaults to the NULL behavior, like
  * `try_divide`.)
  */
case class CosineSim(left: Expression, right: Expression,
    failOnError: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_native expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // zero-norm input → NULL
  override def prettyName: String = "cosine_native"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val n = math.min(na, nb)
    var ab = 0.0
    var i = 0
    while (i < n) { ab += x.getDouble(i) * y.getDouble(i); i += 1 }
    var aa = 0.0
    i = 0
    while (i < na) { val v = x.getDouble(i); aa += v * v; i += 1 }
    var bb = 0.0
    i = 0
    while (i < nb) { val v = y.getDouble(i); bb += v * v; i += 1 }
    val den = math.sqrt(aa) * math.sqrt(bb)
    if (den == 0.0) {
      if (failOnError)
        throw org.apache.spark.sql.graftshim.GraftShims
          .divideByZeroError(origin.context)
      null
    } else ab / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val v = ctx.freshName("v")
      val den = ctx.freshName("den")
      val zeroCode =
        if (failOnError) {
          val errCtx = ctx.addReferenceObj("errCtx", origin.context,
            classOf[org.apache.spark.QueryContext].getName)
          s"throw org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError($errCtx);"
        } else s"${ev.isNull} = true;"
      s"""
         |int $na = $x.numElements();
         |int $nb = $y.numElements();
         |int $n = java.lang.Math.min($na, $nb);
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $ab += $x.getDouble($i) * $y.getDouble($i);
         |}
         |for (int $i = 0; $i < $na; $i++) {
         |  double $v = $x.getDouble($i); $aa += $v * $v;
         |}
         |for (int $i = 0; $i < $nb; $i++) {
         |  double $v = $y.getDouble($i); $bb += $v * $v;
         |}
         |double $den = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |if ($den == 0.0) {
         |  $zeroCode
         |} else {
         |  ${ev.value} = $ab / $den;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Second-stage rewrite: once [[DotProductRewrite]] has produced
  * [[DotProduct]] nodes, recognize the full cosine composition
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` and fuse it into
  * [[CosineSim]]. Both rules sit in the optimizer's fixed-point
  * operator-optimization batch, so the two stages converge in one
  * optimize call. The denominator factors may appear in either order
  * (IEEE multiply commutes exactly); anything else — a cross-term
  * denominator, a squared norm, an extra factor — is left untouched.
  */
object CosineRewrite extends Rule[LogicalPlan] {

  private def isNormOf(v: Expression, p: Expression, q: Expression): Boolean =
    p.semanticEquals(v) && q.semanticEquals(v)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(DotProduct(a, b),
            Multiply(Sqrt(DotProduct(a1, a2)), Sqrt(DotProduct(b1, b2)), _), _)
          if (isNormOf(a, a1, a2) && isNormOf(b, b1, b2)) ||
            (isNormOf(b, a1, a2) && isNormOf(a, b1, b2)) =>
        CosineSim(a, b, failOnError =
          d.evalMode == org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
    }
}
