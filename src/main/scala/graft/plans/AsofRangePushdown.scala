package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Cross-operator optimizer rule for the custom as-of operator
  * (SURVEY §7's optional "optimizer rule showcase", M6): a constant
  * time bound on the PROBE side above an [[AsofJoinNode]] implies the
  * same bound on the BUILD side —
  *
  *  - backward: every matched build row has `b.on <= p.on`, so a probe
  *    upper bound `p.on <= hi` means build rows past `hi` can never be
  *    matched by any surviving probe;
  *  - forward: mirrored — a probe lower bound `p.on >= lo` floors the
  *    build.
  *
  * Spark's own PushDownPredicates cannot see through the custom node
  * (it only knows Join/Project/etc.), so without this rule a
  * `asof(...).filter(ts <= hi)` pipeline scans and shuffles the entire
  * build table. With it, the transferred bound reaches the build-side
  * parquet scan as a pushed filter — at 100 TB that is the difference
  * between shuffling the whole history and shuffling the queried
  * window. `nearest` transfers nothing (matches on both sides of the
  * probe); tolerance could tighten the opposite bound too but is left
  * untransferred (strictly conservative is still correct).
  *
  * The probe-side Filter itself stays where it is — the rule only ADDS
  * the implied build-side Filter, and skips nodes whose build subtree
  * already carries a semantically-equal conjunct (fixed-point safe).
  */
object AsofRangePushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def alreadyPushed(plan: LogicalPlan, t: Expression): Boolean =
    plan.collectFirst {
      case Filter(c, _) if conjuncts(c).exists(_.semanticEquals(t)) => ()
    }.isDefined

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, n: AsofJoinNode) if n.resolved =>
      (n.left.output.find(_.name == n.on), n.right.output.find(_.name == n.on)) match {
        case (Some(p), Some(b)) =>
          val transferred = conjuncts(cond).collect {
            // backward: probe upper bounds cap the build
            case LessThanOrEqual(a: Attribute, l: Literal)
                if n.direction == "backward" && a.semanticEquals(p) => LessThanOrEqual(b, l)
            case LessThan(a: Attribute, l: Literal)
                if n.direction == "backward" && a.semanticEquals(p) => LessThan(b, l)
            case GreaterThanOrEqual(l: Literal, a: Attribute)
                if n.direction == "backward" && a.semanticEquals(p) => LessThanOrEqual(b, l)
            case GreaterThan(l: Literal, a: Attribute)
                if n.direction == "backward" && a.semanticEquals(p) => LessThan(b, l)
            // forward: probe lower bounds floor the build
            case GreaterThanOrEqual(a: Attribute, l: Literal)
                if n.direction == "forward" && a.semanticEquals(p) => GreaterThanOrEqual(b, l)
            case GreaterThan(a: Attribute, l: Literal)
                if n.direction == "forward" && a.semanticEquals(p) => GreaterThan(b, l)
            case LessThanOrEqual(l: Literal, a: Attribute)
                if n.direction == "forward" && a.semanticEquals(p) => GreaterThanOrEqual(b, l)
            case LessThan(l: Literal, a: Attribute)
                if n.direction == "forward" && a.semanticEquals(p) => GreaterThan(b, l)
          }
          val todo = transferred.filterNot(alreadyPushed(n.right, _))
          if (todo.isEmpty) f
          else f.copy(child = n.copy(right = Filter(todo.reduce(And), n.right)))
        case _ => f
      }
  }
}
