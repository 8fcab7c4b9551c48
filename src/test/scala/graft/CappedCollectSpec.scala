package graft

import graft.udaf.CappedCollect
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded distinct-collect: duplicates dedup inside the buffer
  * (callers feed RAW exploded rows — no upstream distinct), groups
  * beyond the cap saturate at cap+1 distinct elements, and outcomes
  * are invariant to partitioning (merge order). */
class CappedCollectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def collect(rows: Seq[(Long, Long)], cap: Int, parts: Int): Map[Long, Seq[Long]] = {
    val agg = udaf(new CappedCollect.CappedCollectAgg(cap),
      org.apache.spark.sql.Encoders.scalaLong)
    rows.toDF("k", "v").repartition(parts)
      .groupBy("k").agg(agg(col("v")).as("c"))
      .select(col("k"), sort_array(col("c.items")).as("items"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
  }

  test("duplicates collapse: a group with <= cap distinct values yields the complete set") {
    val rows = Seq.tabulate(60)(i => (1L, (i % 10).toLong)) ++ Seq((2L, 7L), (2L, 7L))
    for (parts <- Seq(1, 7)) {
      val got = collect(rows, cap = 50, parts)
      assert(got(1L) == (0L until 10L))
      assert(got(2L) == Seq(7L))
    }
  }

  test("groups beyond the cap saturate at cap+1 distinct elements, any partitioning") {
    val rows = (0L until 80L).flatMap(v => Seq((1L, v), (1L, v))) // 80 distinct, each twice
    for (parts <- Seq(1, 3, 16)) {
      val got = collect(rows, cap = 10, parts)(1L)
      assert(got.length == 11, s"expected saturation at cap+1, got ${got.length}")
      assert(got.distinct.length == got.length, "saturated buffer must hold distinct values")
    }
  }

  test("boundary: exactly cap distinct values survive complete") {
    val rows = (0L until 10L).map(v => (1L, v))
    val got = collect(rows, cap = 10, parts = 4)(1L)
    assert(got == (0L until 10L))
  }
}
