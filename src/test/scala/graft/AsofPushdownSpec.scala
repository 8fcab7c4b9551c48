package graft

import graft.plans.{AsofJoinNode, AsofJoinPlan}
import graft.ts.AsofJoin
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsofRangePushdown: a constant probe-side time bound above the
  * custom as-of node must transfer to the build side (where Spark's
  * own PushDownPredicates cannot see through the custom operator), and
  * must NOT change results. */
class AsofPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark // built withExtensions(GraftExtensions)

  private def purchases = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts", "value")

  private def clicks = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    .filter(col("event_type") === "click")
    .select(col("user_id"), col("ts"), col("value").as("click_value"))

  private val hi = "2024-01-03 00:00:00"

  private def buildSideFilters(df: org.apache.spark.sql.DataFrame): Seq[Filter] = {
    val opt = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan
    val node = opt.collectFirst { case n: AsofJoinNode => n }
    assert(node.isDefined, s"no AsofJoinNode survived optimization:\n$opt")
    node.get.right.collect { case f: Filter => f }
  }

  test("backward: probe upper bound transfers to the build side") {
    val df = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .filter(col("ts") <= lit(hi).cast("timestamp"))
    val fs = buildSideFilters(df)
    assert(fs.exists(_.condition.toString.contains("ts")),
      s"no transferred ts bound on the build side: $fs")
  }

  test("backward: results with the rule equal the union-and-window reference") {
    val a = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .filter(col("ts") <= lit(hi).cast("timestamp"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.backward(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .filter(col("ts") <= lit(hi).cast("timestamp"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("forward: probe lower bound transfers; upper bound does not") {
    val df = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        direction = "forward")
      .filter(col("ts") >= lit(hi).cast("timestamp"))
    assert(buildSideFilters(df).exists(_.condition.toString.contains(">=")),
      "forward lower bound not transferred")

    val dfUpper = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        direction = "forward")
      .filter(col("ts") <= lit(hi).cast("timestamp"))
    assert(!buildSideFilters(dfUpper).exists(_.condition.toString.contains("<=")),
      "a forward as-of must NOT transfer a probe UPPER bound (build matches are at-or-after)")
  }

  test("nearest transfers nothing (matches lie on both sides of the probe)") {
    val df = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        direction = "nearest")
      .filter(col("ts") <= lit(hi).cast("timestamp"))
    // the build side keeps its own source filter (event_type = click);
    // what must NOT appear is any transferred range bound
    assert(!buildSideFilters(df).exists(f =>
        f.condition.toString.contains("<=") || f.condition.toString.contains(">=")),
      "nearest direction must not transfer bounds")
  }

  test("forward: results with the transferred floor equal the reference") {
    val a = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        direction = "forward")
      .filter(col("ts") >= lit(hi).cast("timestamp"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.forward(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .filter(col("ts") >= lit(hi).cast("timestamp"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }
}
