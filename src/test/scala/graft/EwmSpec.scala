package graft

import graft.udaf.Ewm
import org.scalatest.funsuite.AnyFunSuite

/** Ties the general EWM implementation to the oracle-checked surface:
  * adjusted EWM must match the closed-form window query `ts_ewm`
  * (DuckDB-verified) on the same data. */
class EwmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("adjusted EWM matches the declared ts_ewm closed form") {
    val viaQuery = ops.Registry.queries("ts_ewm")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val df = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(org.apache.spark.sql.functions.col("user_id") < 10)
    val viaUdaf = Ewm.ewmDf(df, alpha = 0.5, adjusted = true)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(viaQuery.keySet == viaUdaf.keySet)
    viaQuery.foreach { case (id, v) =>
      // ts_ewm is rounded to 4 dp — allow half-ulp of that rounding
      assert(math.abs(viaUdaf(id) - v) <= 5.1e-5, s"event $id: $v vs ${viaUdaf(id)}")
    }
  }

  test("unadjusted EWM satisfies the recursive definition") {
    import spark.implicits._
    val pts = (1L to 50L).map(i => Ewm.Point(1L, i, (i % 7).toDouble)).toDS()
    val got = Ewm.ewm(pts, alpha = 0.3, adjusted = false)
      .collect().sortBy(_.order).map(_.ewm)
    var y = Double.NaN
    val want = (1L to 50L).map { i =>
      val x = (i % 7).toDouble
      y = if (y.isNaN) x else 0.3 * x + 0.7 * y
      y
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }
}
