package graft

import graft.ts.MergeOrdered
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pandas merge_ordered semantics: union of ordered keys, per-column
  * forward fill, group isolation via `by`. */
class MergeOrderedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq((1L, 10L, 1.0), (1L, 30L, 3.0), (2L, 10L, 9.0))
    .toDF("k", "us", "lv")
    .select(col("k"), timestamp_micros(col("us")).as("ts"), col("lv"))
  private def right = Seq((1L, 20L, 2.5), (1L, 30L, 3.5))
    .toDF("k", "us", "rv")
    .select(col("k"), timestamp_micros(col("us")).as("ts"), col("rv"))

  test("ordered union of keys with per-column ffill") {
    val got = MergeOrdered.merge(left, right, on = "ts", by = Seq("k"), ffill = true)
      .select(col("k"), unix_micros(col("ts")).as("us"), col("lv"), col("rv"))
      .orderBy("k", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got == Seq(
      (1L, 10L, Some(1.0), None),       // no right row yet: rv stays NULL
      (1L, 20L, Some(1.0), Some(2.5)),  // lv carried from ts=10
      (1L, 30L, Some(3.0), Some(3.5)),  // both sides present at ts=30
      (2L, 10L, Some(9.0), None)))      // group 2 never sees group 1's rv
  }

  test("ffill=false keeps the raw outer-join NULLs") {
    val got = MergeOrdered.merge(left, right, on = "ts", by = Seq("k"), ffill = false)
      .select(col("k"), unix_micros(col("ts")).as("us"), col("lv"), col("rv"))
      .orderBy("k", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2), r.isNullAt(3))).toSeq
    assert(got == Seq(
      (1L, 10L, false, true), (1L, 20L, true, false),
      (1L, 30L, false, false), (2L, 10L, false, true)))
  }

  test("overlapping value column names are rejected") {
    val e = intercept[IllegalArgumentException] {
      MergeOrdered.merge(left, left, on = "ts", by = Seq("k"), ffill = true)
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
