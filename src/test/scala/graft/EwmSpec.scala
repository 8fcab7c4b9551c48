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

  test("Holt-Winters fold equals the plain-Scala recursion bit-for-bit") {
    import org.apache.spark.sql.functions._
    val xs = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7).orderBy("event_id")
      .select("value").collect().map(_.getDouble(0))
    assert(xs.length >= 30, "fixture series too short to exercise the seasonal slot")
    // the exact update order of the declared expression, in plain doubles
    var l = xs.head; var b = 0.0; var sv = Array.fill(24)(0.0)
    val want = Vector.newBuilder[(Double, Double, Double, Double)]
    want += ((l, b, sv(0), l + b + sv(0)))
    xs.tail.foreach { x =>
      val l2 = 0.3 * (x - sv(0)) + 0.7 * (l + b)
      val b2 = 0.1 * (l2 - l) + 0.9 * b
      val s2 = 0.05 * (x - l2) + 0.95 * sv(0)
      sv = sv.drop(1) :+ s2; l = l2; b = b2
      want += ((l, b, sv(0), l + b + sv(0)))
    }
    val got = ops.Registry.queries("ts_holt_winters")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.result(), "HW chain diverged from the Scala recursion")
    // third implementation: the keyed flatMapGroups path must agree
    // with the prefix fold bit-for-bit on the shared series
    val keyed = ops.Registry.queries("ts_holt_winters_keyed")(spark, TestSpark.sfSmoke)
      .collect().filter(_.getLong(0) == 7L)
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(keyed.toSeq == got.toSeq, "keyed HW diverged from the fold on user 7")
  }

  test("backtest MAEs equal a plain-Scala replay of both recursions") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val xs = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7).orderBy("event_id")
      .select("value").collect().map(_.getDouble(0))
    // forecasts after each step, exactly the declared op's order
    var hl = xs.head; var hb = 0.0
    var wl = xs.head; var wb = 0.0; var sv = Array.fill(24)(0.0)
    val fNaive = xs.toBuffer
    val fHolt = scala.collection.mutable.Buffer(hl + hb)
    val fHw = scala.collection.mutable.Buffer(wl + wb + sv(0))
    xs.tail.foreach { x =>
      val hl2 = 0.3 * x + 0.7 * (hl + hb)
      hb = 0.1 * (hl2 - hl) + 0.9 * hb; hl = hl2
      fHolt += hl + hb
      val wl2 = 0.3 * (x - sv(0)) + 0.7 * (wl + wb)
      wb = 0.1 * (wl2 - wl) + 0.9 * wb
      val s2 = 0.05 * (x - wl2) + 0.95 * sv(0)
      sv = sv.drop(1) :+ s2; wl = wl2
      fHw += wl + wb + sv(0)
    }
    def mae(fs: Seq[Double]) =
      r4(xs.tail.zip(fs.dropRight(1)).map { case (x, f) => math.abs(f - x) }.sum
        / (xs.length - 1).toDouble)
    val want = Map("naive" -> mae(fNaive.toSeq), "holt" -> mae(fHolt.toSeq),
      "hw" -> mae(fHw.toSeq))
    val got = ops.Registry.queries("ts_backtest_report")(spark, TestSpark.sfSmoke)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == want, s"$got != $want")
  }
}
