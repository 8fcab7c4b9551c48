package graft

import graft.udaf.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap UDAF must equal the window top-k on every key and
  * stay deterministic under repartitioning (merge associativity). */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def input = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    .select(col("user_id").as("key"), col("value").as("v"), col("event_id").as("id"))

  private def windowed = {
    val w = Window.partitionBy("key").orderBy(desc("v"), asc("id"))
    input.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
      .select("key", "rank", "id", "v")
  }

  test("UDAF top-3 equals the window row_number form") {
    val a = TopK.topKPerKey(input, 3).collect().map(_.toString).sorted
    val b = windowed.collect().map(_.toString).sorted
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("result is invariant under repartitioning (merge associativity)") {
    val a = TopK.topKPerKey(input.repartition(13), 3).collect().map(_.toString).sorted
    val b = TopK.topKPerKey(input.repartition(2), 3).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("partial aggregation is present (map-side combine before shuffle)") {
    val plan = TopK.topKPerKey(input, 3).queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg") || plan.toLowerCase.contains("partial"), plan)
  }
}
