package graft

import graft.ops.Registry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one declared query with no SQL oracle (HLL sketches differ
  * between engines, SURVEY §2.D): its promised accuracy contract is
  * asserted here instead — within 5% of the exact distinct count. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("agg_approx_distinct is within 5% of the exact distinct count") {
    val approx = Registry.queries("agg_approx_distinct")(spark, TestSpark.sfSmoke)
      .head().getLong(0)
    val exact = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
      .agg(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(exact > 0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.05, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("accuracy holds at sf0.01 too (10x the keys)") {
    val d = "/root/testdata/sf0.01"
    val approx = Registry.queries("agg_approx_distinct")(spark, d)
      .head().getLong(0)
    val exact = graft.core.Tables.lineitem(spark, d)
      .agg(countDistinct(col("l_partkey"))).head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.05, s"approx=$approx exact=$exact relErr=$relErr")
  }
}
