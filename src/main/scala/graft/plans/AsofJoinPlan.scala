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
    matchedAttrs: Seq[AttributeReference])
  extends BinaryNode {
  require(by.nonEmpty, "as-of operator requires a non-empty by key (keyed shape)")
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
        n.on, n.by, n.payload, n.toleranceMicros, n.output) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of: both children are required to be clustered
  * on `by` and sorted by (by, on) — EnsureRequirements inserts the
  * exchanges/sorts — then each co-partition pair streams through one
  * two-pointer merge. One shuffle + sort per side, no unioned
  * intermediate, probe payload never travels through build rows. */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    on: String,
    by: Seq[String],
    payload: Seq[String],
    toleranceMicros: Option[Long],
    output: Seq[Attribute])
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
      var lastMatch: InternalRow = null
      probes.map { p =>
        if (prevProbe == null || !sameProbeKey(prevProbe, p)) lastMatch = null
        var advance = true
        while (advance && bIt.hasNext) {
          val h = bIt.head
          val c = cmpKeys(p, h)
          if (c > 0) { bIt.next(); lastMatch = null } // build key < probe key: stale
          else if (c == 0 && h.getLong(rOnIdx) <= p.getLong(lOnIdx)) {
            lastMatch = bIt.next().copy() // backward: latest build at-or-before
          } else advance = false
        }
        prevProbe = p.copy()
        val vals = new Array[Any](nLeft + 1 + payIdx.length)
        var i = 0
        while (i < nLeft) { vals(i) = p.get(i, lTypes(i)); i += 1 }
        val ok = lastMatch != null &&
          tol.forall(t => p.getLong(lOnIdx) - lastMatch.getLong(rOnIdx) <= t)
        if (ok) {
          vals(nLeft) = lastMatch.getLong(rOnIdx)
          var j = 0
          while (j < payIdx.length) {
            vals(nLeft + 1 + j) = lastMatch.get(payIdx(j), payTypes(j)); j += 1
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

  /** Backward as-of through the custom-operator tier. The session must
    * have [[AsofJoinStrategy]] registered (GraftExtensions or
    * `spark.experimental.extraStrategies`). `by` must be non-empty —
    * the keyed, 100 TB-scalable shape. */
  def asof(
      probe: DataFrame,
      build: DataFrame,
      on: String,
      by: Seq[String],
      payload: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
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
      AsofJoinNode(lPlan, rPlan, on, by, payload, toleranceMicros, matched))
  }
}
