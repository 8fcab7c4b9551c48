package graft

import graft.plans.{AsofJoinPlan, AsofJoinStrategy}
import graft.ts.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom-operator tier (logical node + SparkStrategy + physical
  * AsofJoinExec) must produce exactly the rows of the oracle-verified
  * union-and-window form, and its shuffles/sorts must come from
  * EnsureRequirements (declared requirements), not hand-scheduling. */
class AsofPhysicalPlanSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraStrategies ++= Seq(AsofJoinStrategy)
    s
  }

  private def purchases = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts", "value")

  private def clicks = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    .filter(col("event_type") === "click")
    .select(col("user_id"), col("ts"), col("value").as("click_value"))

  test("physical as-of equals the union-and-window as-of on events") {
    val a = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.backward(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("tolerance misses are NULLed identically") {
    val tol = Some(3600L * 1000000L)
    val a = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        toleranceMicros = tol)
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.backward(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        toleranceMicros = tol)
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // tolerance actually fires on this data
    val nulls = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        toleranceMicros = Some(1L))
      .filter(col("matched_ts").isNull).count()
    assert(nulls > 0)
  }

  test("physical forward as-of equals the union-and-window forward form") {
    val a = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        direction = "forward")
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.forward(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("physical nearest as-of equals the union-and-window nearest form") {
    val a = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
        direction = "nearest")
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.nearest(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("physical strict as-of: all three directions on hand-built equal-ts data") {
    import spark.implicits._
    // key 5: builds at 100, 200, 600; probes hit 200 exactly
    val probe = Seq((1L, 5L, 200L), (2L, 5L, 590L), (3L, 5L, 50L)).toDF("id", "k", "us")
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val build = Seq((5L, 100L, 1.0), (5L, 200L, 2.0), (5L, 600L, 3.0)).toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    def got(dir: String) =
      AsofJoinPlan.asof(probe, build, on = "ts", by = Seq("k"), payload = Seq("v"),
          direction = dir, allowExactMatches = false)
        .select("id", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    // strict backward: 200 → 100's 1.0; 590 → 2.0; 50 → none
    assert(got("backward") == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None))
    // strict forward: 200 → 600's 3.0; 590 → 3.0; 50 → 1.0
    assert(got("forward") == Map(1L -> Some(3.0), 2L -> Some(3.0), 3L -> Some(1.0)))
    // strict nearest: 200 → back 100 (gap 100) vs fwd 600 (400) → 1.0;
    // 590 → fwd 600 (10) → 3.0; 50 → fwd 100 → 1.0
    assert(got("nearest") == Map(1L -> Some(1.0), 2L -> Some(3.0), 3L -> Some(1.0)))
  }

  test("physical strict equals window strict on real events (both directions)") {
    for (dir <- Seq("backward", "forward")) {
      val a = AsofJoinPlan.asof(purchases, clicks,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
          direction = dir, allowExactMatches = false)
        .select("event_id", "matched_ts", "click_value")
        .collect().map(_.toString).sorted.toSeq
      val b = (if (dir == "backward")
          AsofJoin.backward(purchases, clicks, on = "ts", by = Seq("user_id"),
            payload = Seq("click_value"), allowExactMatches = false)
        else
          AsofJoin.forward(purchases, clicks, on = "ts", by = Seq("user_id"),
            payload = Seq("click_value"), allowExactMatches = false))
        .select("event_id", "matched_ts", "click_value")
        .collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty && a == b, s"direction $dir diverged")
    }
  }

  test("plan: AsofJoinExec with EnsureRequirements-planned exchanges and sorts") {
    val df = AsofJoinPlan.asof(purchases, clicks,
      on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin ts"), plan) // nodeName strips the Exec suffix
    // the shuffles and per-partition sorts were inserted by Spark from
    // the declared requirements — both must appear below the operator
    assert(plan.contains("Exchange hashpartitioning(user_id"), plan)
    assert(plan.contains("Sort [user_id"), plan)
  }

  test("downstream per-key agg reuses the as-of's partitioning (no third exchange)") {
    val df = AsofJoinPlan.asof(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .groupBy("user_id").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // exactly the two input exchanges below AsofJoin — the groupBy on
    // user_id must reuse the operator's declared outputPartitioning
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(plan.contains("AsofJoin ts"), plan)
    assert(exchanges == 2, s"expected 2 exchanges (inputs only), got $exchanges:\n$plan")
  }

  test("probe rows with no prior build row keep NULLs (left-join semantics)") {
    import spark.implicits._
    val probe = Seq((1L, 5L, 100L), (2L, 5L, 300L)).toDF("id", "k", "us")
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val build = Seq((5L, 200L, 7.0)).toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val got = AsofJoinPlan.asof(probe, build, on = "ts", by = Seq("k"), payload = Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(1L -> None, 2L -> Some(7.0)))
  }

  test("mismatched by-key dtypes are rejected at execution") {
    import spark.implicits._
    val probe = Seq((1L, 5, 100L)).toDF("id", "k", "us") // k int
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val build = Seq((5L, 50L, 1.0)).toDF("k", "us", "v") // k bigint
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val e = intercept[Exception] {
      AsofJoinPlan.asof(probe, build, on = "ts", by = Seq("k"), payload = Seq("v")).collect()
    }
    assert(e.getMessage.contains("unsupported/mismatched"))
  }
}
