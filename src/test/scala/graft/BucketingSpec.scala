package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables co-locate join keys at write time, so the join
  * plans WITHOUT a shuffle on either side — the pre-partitioning
  * discipline that makes repeated 100 TB joins affordable. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("physical as-of over bucketed tables plans ZERO exchanges") {
    // Both event streams bucketed by user_id: the AsofJoinExec's
    // ClusteredDistribution requirement is already satisfied by the
    // bucketed scan, so EnsureRequirements inserts no shuffle at all —
    // repeated as-of enrichment over a 100 TB bucketed store is a
    // scan + sort + merge, never an exchange.
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      cs.experimental.extraStrategies ++= Seq(graft.plans.AsofJoinStrategy)
    val ev = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
      .write.mode("overwrite").bucketBy(8, "user_id").saveAsTable("b_purch")
    ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
      .write.mode("overwrite").bucketBy(8, "user_id").saveAsTable("b_click")
    try {
      val asof = graft.plans.AsofJoinPlan.asof(
        spark.table("b_purch"), spark.table("b_click"),
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      val plan = asof.queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin ts"), plan)
      assert(!plan.contains("Exchange"), s"bucketed as-of still shuffles:\n$plan")
      // rows match the shuffled (non-bucketed) form
      val expected = graft.ts.AsofJoin.backward(
          ev.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts", "value"),
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("value").as("click_value")),
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
        .select("event_id", "matched_ts", "click_value")
        .collect().map(_.toString).sorted.toSeq
      val got = asof.select("event_id", "matched_ts", "click_value")
        .collect().map(_.toString).sorted.toSeq
      assert(got.nonEmpty && got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_purch")
      spark.sql("DROP TABLE IF EXISTS b_click")
    }
  }

  test("bucketed-by-key tables join without a shuffle exchange") {
    val orders = graft.core.Tables.orders(spark, TestSpark.sfSmoke)
      .select("o_orderkey", "o_totalprice")
    val li = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    li.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_lineitem")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        orders.join(li, "o_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
