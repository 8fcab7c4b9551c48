package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, TimestampType}
import org.apache.spark.sql.DataFrame

/** Whole-operator Catalyst tier for the as-of join (SURVEY §4.2 tier 3):
  * a custom logical node, a planner [[SparkStrategy]], and a physical
  * [[AsofJoinExec]] whose distribution/ordering REQUIREMENTS let Spark's
  * own EnsureRequirements plan the shuffles and sorts — unlike the
  * `zipPartitions` form in [[graft.ts.AsofMergeJoin]], nothing here
  * hand-schedules an exchange, so AQE and reuse apply to the inputs.
  *
  * Covers all three pandas merge_asof directions (backward / forward /
  * nearest) and `allow_exact_matches=false` (strict inequality) in one
  * streaming two-pointer merge per co-partition pair.
  *
  * The node is planned by [[AsofJoinStrategy]], registered either via
  * `GraftExtensions` (injectPlannerStrategy) or
  * `spark.experimental.extraStrategies`. Equivalence to the declared
  * union-and-window form is proved in AsofPhysicalPlanSpec.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    on: String,
    by: Seq[String],
    payload: Seq[String],
    toleranceMicros: Option[Long],
    matchedAttrs: Seq[AttributeReference],
    direction: String = "backward",
    allowExactMatches: Boolean = true)
  extends BinaryNode {
  require(by.nonEmpty, "as-of operator requires a non-empty by key (keyed shape)")
  require(Set("backward", "forward", "nearest")(direction),
    s"as-of direction must be backward|forward|nearest, got '$direction'")
  // empty matchedAttrs marks a node from the SQL TVF surface whose
  // output dtypes aren't known until the children resolve;
  // ResolveAsofJoin fills them exactly once (stable exprIds thereafter)
  override lazy val resolved: Boolean =
    childrenResolved && matchedAttrs.nonEmpty && expressions.forall(_.resolved)
  override def output: Seq[Attribute] = left.output ++ matchedAttrs
  // matchedAttrs originate HERE, not from a child — exempt them from
  // the analyzer's missing-input check
  override def producedAttributes: AttributeSet = AttributeSet(matchedAttrs)
  // the operator consumes (by, on) from the left and (by, on, payload)
  // from the right even though it carries them as names, not
  // expressions. Declaring them keeps ColumnPruning from stripping the
  // key columns out of the children (and still lets it prune left
  // columns nobody references — output follows left.output).
  override def references: AttributeSet = AttributeSet(
    left.output.filter(a => a.name == on || by.contains(a.name)) ++
      right.output.filter(a => a.name == on || by.contains(a.name) || payload.contains(a.name)))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule for the SQL TVF surface: once the (initially
  * unresolved) relations under an [[AsofJoinNode]] resolve, derive the
  * matched-output attributes from the build side's schema. Runs exactly
  * once per node (guarded on matchedAttrs.isEmpty) so exprIds stay
  * stable through later plan copies. */
object ResolveAsofJoin extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case n: AsofJoinNode if n.childrenResolved && n.matchedAttrs.isEmpty =>
      def rAttr(name: String) = n.right.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof_join: column '$name' not found in build side ${n.right.output.map(_.name)}"))
      val matched =
        AttributeReference("matched_ts", rAttr(n.on).dataType, nullable = true)() +:
          n.payload.map(p => AttributeReference(p, rAttr(p).dataType, nullable = true)())
      n.copy(matchedAttrs = matched)
  }
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.on, n.by, n.payload, n.toleranceMicros, n.output,
        n.direction, n.allowExactMatches) :: Nil
    case _ => Nil
  }
}

/** Physical as-of: both children are required to be clustered on `by`
  * and sorted by (by, on) — EnsureRequirements inserts the
  * exchanges/sorts — then each co-partition pair streams through one
  * two-pointer merge. One shuffle + sort per side, no unioned
  * intermediate, probe payload never travels through build rows.
  *
  * All three directions share the pass: build rows at-or-before the
  * probe are consumed into a running backward candidate, the forward
  * candidate is the (unconsumed) head of the build iterator, and
  * `nearest` picks the closer of the two (ties backward, the pandas
  * tie-break). Strict mode shifts every comparison from ≤/≥ to </>;
  * under strict `nearest`, equal-ts build rows are parked in a one-row
  * stash — invalid for the current probe ts but the backward match of
  * any later, strictly-greater probe ts. */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    on: String,
    by: Seq[String],
    payload: Seq[String],
    toleranceMicros: Option[Long],
    output: Seq[Attribute],
    direction: String = "backward",
    allowExactMatches: Boolean = true)
  extends BinaryExecNode {

  private def attrsOf(side: SparkPlan, names: Seq[String]): Seq[Attribute] =
    names.map(n => side.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column '$n' missing from ${side.output.map(_.name)}")))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(attrsOf(left, by)), ClusteredDistribution(attrsOf(right, by)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    attrsOf(left, by :+ on).map(a => SortOrder(a, Ascending)),
    attrsOf(right, by :+ on).map(a => SortOrder(a, Ascending)))

  override def producedAttributes: AttributeSet =
    AttributeSet(output.drop(left.output.size))

  // output rows are the left child's rows 1:1 (in order, with matched
  // columns appended), so the left's partitioning and ordering survive —
  // a downstream groupBy/window on the by-key plans NO extra exchange
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lOnIdx = lOut.indexWhere(_.name == on)
    val rOnIdx = rOut.indexWhere(_.name == on)
    val lByIdx = by.map(n => lOut.indexWhere(_.name == n)).toArray
    val rByIdx = by.map(n => rOut.indexWhere(_.name == n)).toArray
    val byTypes = lByIdx.map(lOut(_).dataType)
    byTypes.zipWithIndex.foreach { case (t, i) =>
      require(t == rOut(rByIdx(i)).dataType && supportedKey(t),
        s"as-of by-column '${by(i)}' has unsupported/mismatched type $t")
    }
    require(lOut(lOnIdx).dataType == TimestampType && rOut(rOnIdx).dataType == TimestampType,
      s"as-of on-column '$on' must be timestamp on both sides")
    val payIdx = payload.map(n => rOut.indexWhere(_.name == n)).toArray
    val payTypes = payIdx.map(rOut(_).dataType)
    val lTypes = lOut.map(_.dataType).toArray
    val outTypes = output.map(_.dataType).toArray
    val nLeft = lOut.size
    val tol = toleranceMicros
    val dir = direction
    val exact = allowExactMatches

    left.execute().zipPartitions(right.execute()) { (probes, builds) =>
      val proj = UnsafeProjection.create(outTypes)
      val bIt = builds.buffered

      // probe-vs-build key compare over the validated scalar key types
      def cmpKeys(p: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < lByIdx.length) {
          val c = byTypes(i) match {
            case LongType    => java.lang.Long.compare(p.getLong(lByIdx(i)), b.getLong(rByIdx(i)))
            case IntegerType => Integer.compare(p.getInt(lByIdx(i)), b.getInt(rByIdx(i)))
            case StringType  => p.getUTF8String(lByIdx(i)).compareTo(b.getUTF8String(rByIdx(i)))
            case t           => throw new IllegalStateException(s"unreachable key type $t")
          }
          if (c != 0) return c
          i += 1
        }
        0
      }
      def sameProbeKey(a: InternalRow, b: InternalRow): Boolean = {
        var i = 0
        while (i < lByIdx.length) {
          val eq = byTypes(i) match {
            case LongType    => a.getLong(lByIdx(i)) == b.getLong(lByIdx(i))
            case IntegerType => a.getInt(lByIdx(i)) == b.getInt(lByIdx(i))
            case StringType  => a.getUTF8String(lByIdx(i)) == b.getUTF8String(lByIdx(i))
            case t           => throw new IllegalStateException(s"unreachable key type $t")
          }
          if (!eq) return false
          i += 1
        }
        true
      }

      var prevProbe: InternalRow = null
      var lastMatch: InternalRow = null // latest consumed backward candidate
      var stash: InternalRow = null     // strict nearest: equal-ts build, pending
      var stashTs: Long = 0L
      probes.map { p =>
        if (prevProbe == null || !sameProbeKey(prevProbe, p)) {
          lastMatch = null; stash = null
        }
        val pTs = p.getLong(lOnIdx)
        // a stashed equal-ts build row becomes strictly-before once the
        // probe ts moves past it
        if (stash != null && stashTs < pTs) { lastMatch = stash; stash = null }
        var advance = true
        while (advance && bIt.hasNext) {
          val h = bIt.head
          val c = cmpKeys(p, h)
          if (c > 0) { bIt.next(); lastMatch = null; stash = null } // stale key
          else if (c < 0) advance = false
          else {
            val hTs = h.getLong(rOnIdx)
            // consume at-or-before rows; equal-ts rows are consumed when
            // they can never again be a forward candidate (backward /
            // nearest-exact as the match itself, forward-strict as
            // discard) and stashed under strict nearest
            if (hTs < pTs) lastMatch = bIt.next().copy()
            else if (hTs == pTs) {
              if (dir == "forward" && exact) advance = false      // the forward match
              else if (dir == "forward") { bIt.next() }            // strict: stale
              else if (exact) lastMatch = bIt.next().copy()        // backward/nearest
              else if (dir == "nearest") { stash = bIt.next().copy(); stashTs = hTs }
              else advance = false                                 // strict backward: leave
            } else advance = false
          }
        }
        prevProbe = p.copy()

        // forward candidate: the unconsumed head, same key, at/after pTs
        def fwdCand: InternalRow =
          if (bIt.hasNext && cmpKeys(p, bIt.head) == 0) {
            val hTs = bIt.head.getLong(rOnIdx)
            if (if (exact) hTs >= pTs else hTs > pTs) bIt.head else null
          } else null

        val chosen: InternalRow = dir match {
          case "backward" => lastMatch
          case "forward"  => fwdCand
          case "nearest" =>
            val f = fwdCand
            if (lastMatch == null) f
            else if (f == null) lastMatch
            else { // tie → backward (pandas)
              if (pTs - lastMatch.getLong(rOnIdx) <= f.getLong(rOnIdx) - pTs) lastMatch else f
            }
        }
        val vals = new Array[Any](nLeft + 1 + payIdx.length)
        var i = 0
        while (i < nLeft) { vals(i) = p.get(i, lTypes(i)); i += 1 }
        val ok = chosen != null && tol.forall { t =>
          val mTs = chosen.getLong(rOnIdx)
          dir match {
            case "backward" => pTs - mTs <= t
            case "forward"  => mTs - pTs <= t
            case "nearest"  => math.abs(mTs - pTs) <= t
          }
        }
        if (ok) {
          vals(nLeft) = chosen.getLong(rOnIdx)
          var j = 0
          while (j < payIdx.length) {
            vals(nLeft + 1 + j) = chosen.get(payIdx(j), payTypes(j)); j += 1
          }
        }
        proj(new GenericInternalRow(vals))
      }
    }
  }

  private def supportedKey(t: DataType): Boolean =
    t == LongType || t == IntegerType || t == StringType
}

object AsofJoinPlan {

  /** As-of join through the custom-operator tier. The session must
    * have [[AsofJoinStrategy]] registered (GraftExtensions or
    * `spark.experimental.extraStrategies`). `by` must be non-empty —
    * the keyed, 100 TB-scalable shape. */
  def asof(
      probe: DataFrame,
      build: DataFrame,
      on: String,
      by: Seq[String],
      payload: Seq[String],
      toleranceMicros: Option[Long] = None,
      direction: String = "backward",
      allowExactMatches: Boolean = true): DataFrame = {
    require(by.nonEmpty, "physical as-of requires a by-key; use AsofJoin for global")
    require(!probe.columns.contains("matched_ts"), "probe already has matched_ts")
    val spark = probe.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val slimBuild = build.select((by :+ on) ++ payload map org.apache.spark.sql.functions.col: _*)
    val lPlan = probe.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    val rPlan = slimBuild.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    val matched =
      AttributeReference("matched_ts", slimBuild.schema(on).dataType, nullable = true)() +:
        payload.map(p =>
          AttributeReference(p, slimBuild.schema(p).dataType, nullable = true)())
    org.apache.spark.sql.graftshim.GraftShims.ofRows(spark,
      AsofJoinNode(lPlan, rPlan, on, by, payload, toleranceMicros, matched,
        direction, allowExactMatches))
  }
}
