package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Capability-tier coverage with no portable DuckDB oracle:
  *  - MapType surface (from_json → map, keys/values/lookup) — DuckDB's
  *    MAP is awkward in portable SQL (SURVEY §2.I capability row);
  *  - skewness/kurtosis — Spark uses population moments, pandas uses
  *    bias-corrected G1/G2, so cross-engine hashing is impossible
  *    (SURVEY §2.D); asserted against hand-computed values instead. */
class MapAndStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("from_json to MapType: keys, values, lookup") {
    val df = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .limit(100)
      .select(col("event_id"), col("props"),
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
    val rows = df.select(col("event_id"),
      map_keys(col("m")).as("ks"),
      element_at(col("m"), "k").as("k_val"),
      get_json_object(col("props"), "$.k").cast("bigint").as("k_ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == Seq("k"))
      assert(r.getLong(2) == r.getLong(3)) // map lookup == json path
    }
  }

  test("skewness/kurtosis match hand-computed population moments") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 2.0, 3.0, 9.0)
    val df = xs.toDF("x")
    val (sk, ku) = df.agg(skewness(col("x")), kurtosis(col("x")))
      .as[(Double, Double)].head()
    val n = xs.size
    val mean = xs.sum / n
    val m2 = xs.map(v => math.pow(v - mean, 2)).sum / n
    val m3 = xs.map(v => math.pow(v - mean, 3)).sum / n
    val m4 = xs.map(v => math.pow(v - mean, 4)).sum / n
    assert(math.abs(sk - m3 / math.pow(m2, 1.5)) < 1e-9)
    assert(math.abs(ku - (m4 / (m2 * m2) - 3.0)) < 1e-9) // excess kurtosis
  }

  test("win_rolling_kurt matches hand-computed excess kurtosis; min_periods guard") {
    val out = graft.ops.Registry.queries("win_rolling_kurt")(spark, TestSpark.sfSmoke)
      .collect()
    // source frame in the same (user, event_id) order the window sees
    val src = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") < 10)
      .select("event_id", "user_id", "value")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.sortBy(_._2).map(_._3) }
    val byKey = out.map(r => (r.getLong(1), r.getLong(0)) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val ids = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") < 10).select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).sorted }
    var checked = 0
    ids.foreach { case (u, eids) =>
      val vals = src(u)
      eids.zipWithIndex.foreach { case (eid, i) =>
        val got = byKey((u, eid))
        if (i < 4) assert(got.isEmpty, s"user $u row $i should be null (min_periods)")
        else {
          val w = vals.slice(i - 4, i + 1)
          val mean = w.sum / 5
          val m2 = w.map(v => math.pow(v - mean, 2)).sum / 5
          val m4 = w.map(v => math.pow(v - mean, 4)).sum / 5
          val want = m4 / (m2 * m2) - 3.0
          assert(math.abs(got.get - want) < 1e-3,
            s"user $u eid $eid: got ${got.get}, want $want")
          checked += 1
        }
      }
    }
    assert(checked > 50)
  }

  test("describe() composes from declared aggregates") {
    val d = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
      .select("l_quantity").describe()
    assert(d.count() == 5) // count/mean/stddev/min/max
  }

  test("olsNormalEq recovers an exact-fit plane bit-exactly") {
    import spark.implicits._
    // y = 3 + 2·x1 − x2 on a 5×3 grid: every moment is a small exact
    // integer, the Cramer determinants stay inside 2^53, and the
    // solution divides out exactly — the recovered coefficients must
    // be EXACTLY (3, 2, −1), no tolerance
    val rows = for (x1 <- 0L to 4L; x2 <- 0L to 2L)
      yield ("g", x1, x2, (3 + 2 * x1 - x2).toDouble)
    val df = rows.toDF("grp", "x1", "x2", "y")
    val out = graft.ops.Aggs.olsNormalEqOf(df, "grp", "x1", "x2", "y").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 15L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 2.0 && r.getDouble(4) == -1.0,
      s"got (${r.getDouble(2)}, ${r.getDouble(3)}, ${r.getDouble(4)})")
    // exact fit: SSE is exactly 0 in exact moment arithmetic ⇒ R² == 1
    assert(r.getDouble(5) == 1.0, s"r2 ${r.getDouble(5)} != 1.0")
  }

  test("burstiness: metronomic key has CV exactly 0; bursty key matches hand math") {
    import spark.implicits._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:00:10", 2L),
      (1L, "2024-01-01 00:00:20", 3L), (1L, "2024-01-01 00:00:30", 4L),
      (2L, "2024-01-01 00:00:00", 5L), (2L, "2024-01-01 00:00:01", 6L),
      (2L, "2024-01-01 00:01:41", 7L))
      .toDF("user_id", "ts_s", "event_id")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("event_id"))
    val out = graft.ops.TimeSeries.burstinessOf(df, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((3L, 10.0, 0.0)))
    // key 2: gaps (1, 100) — mean 50.5, sample var (sq − sg²/n)/(n−1)
    val (sg, sq) = (101.0, 10001.0)
    val cv = math.sqrt((sq - sg * sg / 2) / 1) / (sg / 2)
    assert(out(2L) == ((2L, 50.5, r4(cv))))
  }

  test("seasonal strengths are in [0,1] and replay from the decompose output") {
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val dec = graft.ops.Registry.queries("ts_seasonal_decompose")(spark, TestSpark.sfSmoke)
      .collect().filter(!_.isNullAt(2)) // full-window rows only
      .sortBy(_.getAs[java.time.LocalDateTime](0)
        .toEpochSecond(java.time.ZoneOffset.UTC))
      .map(r => (r.getDouble(2) + r.getDouble(4), // trend + resid
        r.getDouble(3) + r.getDouble(4),          // seasonal + resid
        r.getDouble(4)))
    def varOf(xs: Array[Double]) = {
      val n = xs.length.toDouble
      var s = 0.0; var q = 0.0
      xs.foreach { x => s += x; q += x * x } // h-order fold, as the op
      (q - s * s / n) / (n - 1)
    }
    val (vtr, vsr, vrr) =
      (varOf(dec.map(_._1)), varOf(dec.map(_._2)), varOf(dec.map(_._3)))
    val want = (dec.length.toLong,
      r4(math.max(0.0, 1.0 - vrr / vtr)), r4(math.max(0.0, 1.0 - vrr / vsr)))
    val row = graft.ops.Registry.queries("ts_seasonal_strength")(spark, TestSpark.sfSmoke)
      .head()
    val got = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(got == want, s"$got != $want")
    assert(got._2 >= 0.0 && got._2 <= 1.0 && got._3 >= 0.0 && got._3 <= 1.0)
  }

  test("Page CUSUM equals the plain-Scala recursion; alarms localize and reset") {
    import org.apache.spark.sql.functions._
    val xs = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7).orderBy("event_id")
      .select("value").collect().map(_.getDouble(0))
    // exact decimal mean, then the exact fold order of the declared op
    val cents = xs.map(x => java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact())
    val mu = java.math.BigDecimal.valueOf(cents.sum, 2).doubleValue / xs.length
    var sp = 0.0; var sn = 0.0
    val want = xs.map { x =>
      sp = math.max(0.0, sp + (x - mu) - 5.0)
      sn = math.max(0.0, sn - (x - mu) - 5.0)
      (sp, sn, sp > 50.0 || sn > 50.0)
    }
    val got = graft.ops.Registry.queries("ts_cusum_page")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == want.toSeq, "Page chain diverged from the Scala recursion")
    // resetting property: any non-alarm zero row fully forgets history
    assert(got.exists(g => g._1 == 0.0 || g._2 == 0.0),
      "a Page accumulator should touch zero somewhere on a stationary series")
  }

  test("EWMA chart equals the plain-Scala recursion; warm-up limits widen monotonically") {
    import org.apache.spark.sql.functions._
    val xs = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7).orderBy("event_id")
      .select("value").collect().map(_.getDouble(0))
    def cents(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val nd = xs.length.toDouble
    val sy = java.math.BigDecimal.valueOf(xs.map(cents).sum, 2).doubleValue
    val syy = java.math.BigDecimal.valueOf(xs.map(x => cents(x) * cents(x)).sum, 4).doubleValue
    val mu = sy / nd
    val sd = math.sqrt((syy - sy * sy / nd) / (nd - 1))
    var z = mu; var q = 1.0
    val want = xs.map { x =>
      z = 0.3 * x + 0.7 * z
      q = q * (0.7 * 0.7)
      val cl = 3.0 * sd * math.sqrt(0.3 / (2.0 - 0.3) * (1.0 - q))
      (z, cl, math.abs(z - mu) > cl)
    }
    val got = graft.ops.Registry.queries("ts_ewma_chart")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == want.toSeq, "EWMA chart diverged from the Scala recursion")
    // warm-up property: limits widen monotonically toward the
    // asymptote (and reach it exactly once q underflows past 1 ulp)
    got.map(_._2).toSeq.sliding(2).foreach { w => assert(w(1) >= w(0)) }
    assert(got.last._2 > got.head._2)
  }

  test("partial correlation equals a plain-Scala moment replay") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val rows = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select(col("event_type"), hour(col("ts")).cast("long").as("x1"),
        weekday(col("ts")).cast("long").as("x2"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = rows.groupBy(_._1).map { case (et, g) =>
      val nd = g.length.toDouble
      val (s1, s2) = (g.map(_._2).sum.toDouble, g.map(_._3).sum.toDouble)
      val (s11, s22, s12) = (g.map(r => r._2 * r._2).sum.toDouble,
        g.map(r => r._3 * r._3).sum.toDouble, g.map(r => r._2 * r._3).sum.toDouble)
      def cents(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
      val sy = java.math.BigDecimal.valueOf(g.map(r => cents(r._4)).sum, 2).doubleValue
      val syy = java.math.BigDecimal.valueOf(
        g.map(r => cents(r._4) * cents(r._4)).sum, 4).doubleValue
      val s1y = java.math.BigDecimal.valueOf(g.map(r => r._2 * cents(r._4)).sum, 2).doubleValue
      val s2y = java.math.BigDecimal.valueOf(g.map(r => r._3 * cents(r._4)).sum, 2).doubleValue
      def corr(sab: Double, sa: Double, sb: Double, saa: Double, sbb: Double) =
        (nd * sab - sa * sb) / (math.sqrt(nd * saa - sa * sa) * math.sqrt(nd * sbb - sb * sb))
      val (rvh, rvw, rhw) = (corr(s1y, s1, sy, s11, syy),
        corr(s2y, s2, sy, s22, syy), corr(s12, s1, s2, s11, s22))
      et -> ((r4(rvh), r4(rvw), r4(rhw),
        r4((rvh - rvw * rhw) / math.sqrt((1.0 - rvw * rvw) * (1.0 - rhw * rhw)))))
    }
    val got = graft.ops.Registry.queries("agg_partial_corr")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got == want, s"$got != $want")
  }

  test("PACF: Durbin-Levinson replay matches; PACF(1) == ACF(1)") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cents(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val xs = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7).orderBy("event_id")
      .select("value").collect().map(_.getDouble(0))
    val mu = java.math.BigDecimal.valueOf(xs.map(cents).sum, 2).doubleValue / xs.length
    def c(k: Int) = {
      var acc = 0.0
      (0 until xs.length - k).foreach(t => acc += (xs(t) - mu) * (xs(t + k) - mu))
      acc
    }
    val r = (1 to 5).map(k => c(k) / c(0))
    // the dlSteps cascade, op order preserved
    val a1 = r(0)
    val a2 = (r(1) - a1 * r(0)) / (1.0 - a1 * r(0))
    val p21 = a1 - a2 * a1
    val a3 = (r(2) - (p21 * r(1) + a2 * r(0))) / (1.0 - (p21 * r(0) + a2 * r(1)))
    val p31 = p21 - a3 * a2; val p32 = a2 - a3 * p21
    val a4 = (r(3) - (p31 * r(2) + p32 * r(1) + a3 * r(0))) /
      (1.0 - (p31 * r(0) + p32 * r(1) + a3 * r(2)))
    val p41 = p31 - a4 * a3; val p42 = p32 - a4 * p32; val p43 = a3 - a4 * p31
    val a5 = (r(4) - (p41 * r(3) + p42 * r(2) + p43 * r(1) + a4 * r(0))) /
      (1.0 - (p41 * r(0) + p42 * r(1) + p43 * r(2) + a4 * r(3)))
    val want = Seq(a1, a2, a3, a4, a5).zip(r).zipWithIndex
      .map { case ((a, rk), i) => (i + 1L, r4(rk), r4(a)) }
    val got = graft.ops.Registry.queries("ts_pacf")(spark, TestSpark.sfSmoke)
      .collect().map(row => (row.getLong(0), row.getDouble(1), row.getDouble(2)))
    assert(got.toSeq == want, s"${got.toSeq} != $want")
    assert(got.head._2 == got.head._3, "PACF(1) must equal ACF(1)")
  }

  test("ADF test replays from daily cents via the Cramer/cofactor formulas") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val daily = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .groupBy(dayofmonth(col("ts")).cast("long").as("i"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("yc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val reg = daily.sliding(3).map { w =>
      (w(1), w(1) - w(0), w(2) - w(1)) // x1 = x_{t-1}, x2 = dx_{t-1}, y = dx_t
    }.toSeq
    val n = reg.length.toDouble
    def sOf(f: ((Long, Long, Long)) => Long) = reg.map(r => BigInt(f(r))).sum.toDouble
    val s1 = sOf(_._1); val s2 = sOf(_._2)
    val s11 = reg.map(r => BigInt(r._1) * BigInt(r._1)).sum.toDouble
    val s22 = reg.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble
    val s12 = reg.map(r => BigInt(r._1) * BigInt(r._2)).sum.toDouble
    val sy = sOf(_._3)
    val syy = reg.map(r => BigInt(r._3) * BigInt(r._3)).sum.toDouble
    val s1y = reg.map(r => BigInt(r._1) * BigInt(r._3)).sum.toDouble
    val s2y = reg.map(r => BigInt(r._2) * BigInt(r._3)).sum.toDouble
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
             f: Double, g: Double, h: Double, i: Double) =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    val beta = det1 / det
    val sse = syy - (det0 / det * sy + det1 / det * s1y + det2 / det * s2y)
    val stat = r4(beta / math.sqrt(sse / (n - 3) * (n * s22 - s2 * s2) / det))
    val row = graft.ops.Registry.queries("ts_adf_test")(spark, TestSpark.sfSmoke).head()
    assert((row.getLong(0), row.getDouble(1), row.getDouble(2))
      == ((reg.length.toLong, beta, stat)))
  }

  test("Ljung-Box and Jarque-Bera replay from the same exact primitives") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cents(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    // Ljung-Box over user 7 from the PACF machinery
    val xs = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7).orderBy("event_id")
      .select("value").collect().map(_.getDouble(0))
    val mu = java.math.BigDecimal.valueOf(xs.map(cents).sum, 2).doubleValue / xs.length
    def c(k: Int) = {
      var acc = 0.0
      (0 until xs.length - k).foreach(t => acc += (xs(t) - mu) * (xs(t + k) - mu))
      acc
    }
    val nd = xs.length.toDouble
    val q = r4(nd * (nd + 2.0) *
      (1 to 5).map(k => { val r = c(k) / c(0); r * r / (nd - k) }).sum)
    val lb = graft.ops.Registry.queries("ts_ljung_box")(spark, TestSpark.sfSmoke).head()
    assert((lb.getLong(0), lb.getDouble(1), lb.getLong(2)) == ((xs.length.toLong, q, 5L)))
    // Jarque-Bera per type from exact cents moments
    val rows = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val want = rows.groupBy(_._1).map { case (et, g) =>
      val n = g.length.toDouble
      val xsc = g.map(_._2)
      def s(p: Int) = xsc.map(x => BigInt(x).pow(p)).sum.toDouble
      val (s1, s2, s3, s4) = (s(1), s(2), s(3), s(4))
      val mean = s1 / n
      val m2 = s2 / n - mean * mean
      val m3 = s3 / n - 3 * mean * s2 / n + 2 * mean * mean * mean
      val m4 = s4 / n - 4 * mean * s3 / n + 6 * mean * mean * s2 / n -
        3 * mean * mean * mean * mean
      val sk = m3 / (m2 * math.sqrt(m2)); val ku = m4 / (m2 * m2) - 3
      et -> ((g.length.toLong, r4(sk), r4(ku),
        r4(n / 6.0 * (sk * sk + ku * ku / 4.0))))
    }
    val got = graft.ops.Registry.queries("agg_jarque_bera")(spark, TestSpark.sfSmoke)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == want, s"$got != $want")
  }

  test("Grubbs statistic replays from exact moments; argmax id deterministic") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cents(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val rows = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select("event_type", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = rows.groupBy(_._1).map { case (et, g) =>
      val nd = g.length.toDouble
      val sy = java.math.BigDecimal.valueOf(g.map(r => cents(r._3)).sum, 2).doubleValue
      val syy = java.math.BigDecimal.valueOf(
        g.map(r => cents(r._3) * cents(r._3)).sum, 4).doubleValue
      val mu = sy / nd
      val sd = math.sqrt((syy - sy * sy / nd) / (nd - 1))
      val devs = g.map { case (_, id, v) => (id, math.abs(v - mu) / sd) }
      val gMax = devs.map(_._2).max
      et -> ((g.length.toLong, r4(gMax),
        devs.filter(_._2 == gMax).map(_._1).min))
    }
    val got = graft.ops.Registry.queries("agg_grubbs_stat")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == want, s"$got != $want")
  }

  test("Mann-Kendall replays from daily cents; S and tie sums are exact integers") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val daily = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .groupBy(dayofmonth(col("ts")).cast("long").as("i"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("yc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sStat = (for { (ia, ya) <- daily; (ib, yb) <- daily if ia < ib }
      yield java.lang.Long.signum(yb - ya).toLong).sum
    val n = daily.length.toLong
    val tieSum = daily.groupBy(_._2).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val v = (n * (n - 1) * (2 * n + 5) - tieSum).toDouble / 18.0
    val z = r4(if (sStat > 0) (sStat - 1) / math.sqrt(v)
      else if (sStat < 0) (sStat + 1) / math.sqrt(v) else 0.0)
    val row = graft.ops.Registry.queries("ts_mann_kendall")(spark, TestSpark.sfSmoke).head()
    assert((row.getLong(0), row.getLong(1), row.getDouble(2)) == ((n, sStat, z)))
  }

  test("Theil-Sen replays from daily sums; pair accounting exact") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def medCont(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val idx = (s.length - 1) * 0.5
      val (lo, hi) = (s(idx.toInt), s(math.ceil(idx).toInt))
      lo + (hi - lo) * (idx - idx.toInt)
    }
    val daily = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .groupBy(dayofmonth(col("ts")).cast("long").as("i"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val slopes = for {
      (ia, ya) <- daily; (ib, yb) <- daily if ia < ib
    } yield (yb - ya) / (ib - ia).toDouble
    val m = medCont(slopes.toSeq)
    val b = medCont(daily.map { case (i, y) => y - m * i.toDouble }.toSeq)
    val row = graft.ops.Registry.queries("ts_theil_sen")(spark, TestSpark.sfSmoke).head()
    assert(row.getLong(0) == daily.length && row.getLong(1) == slopes.length)
    assert((row.getDouble(2), row.getDouble(3)) == ((r4(m), r4(b))),
      s"(${row.getDouble(2)}, ${row.getDouble(3)}) != (${r4(m)}, ${r4(b)})")
  }

  test("Hampel filter: identity off-flag, median-replacement on-flag, warm-up NULLs") {
    val rows = graft.ops.Registry.queries("win_hampel_filter")(spark, TestSpark.sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    var warm = 0
    rows.foreach { r =>
      if (r.isNullAt(3)) { assert(r.isNullAt(4)); warm += 1 }
      else if (r.getInt(3) == 0) assert(r.getDouble(4) == r.getDouble(2),
        s"event ${r.getLong(0)}: non-outlier must pass through")
      else assert(r.getDouble(4) != r.getDouble(2),
        s"event ${r.getLong(0)}: outlier must be replaced by the window median")
    }
    // exactly 4 warm-up rows per user (the 5-row frame's min_periods)
    val nUsers = rows.map(_.getLong(1)).distinct.length
    assert(warm == 4 * nUsers)
  }

  test("runs test replays from sorted cents; IVF cell stats tile the corpus") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val cents = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7).orderBy("event_id")
      .selectExpr("cast(cast(value as decimal(18,2)) * 100 as bigint) AS c")
      .collect().map(_.getLong(0))
    // interpolated median over exact ints, then runs over the
    // median-dropped sign sequence in event order
    val sorted = cents.sorted
    val idx = (sorted.length - 1) * 0.5
    val (lo, hi) = (sorted(idx.toInt), sorted(math.ceil(idx).toInt))
    val med = lo + (hi - lo) * (idx - idx.toInt)
    val ups = cents.filter(_.toDouble != med).map(c => c > med)
    val n1 = ups.count(identity).toLong; val n2 = ups.length - n1
    val runs = 1L + ups.sliding(2).count { w => w.length == 2 && w(0) != w(1) }
    val nd = (n1 + n2).toDouble; val p = (2 * n1 * n2).toDouble
    val z = r4((runs - (p / nd + 1.0)) /
      math.sqrt(p * (p - nd) / (nd * nd * (nd - 1.0))))
    val row = graft.ops.Registry.queries("ts_runs_test")(spark, TestSpark.sfSmoke).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
      == ((n1, n2, runs, z)))
    val cellRows = graft.ops.Registry.queries("vec_ivf_cell_stats")(spark, TestSpark.sfSmoke)
      .collect()
    val total = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke).count()
    assert(cellRows.map(_.getLong(1)).sum == total)
    cellRows.foreach { r =>
      assert(r.getDouble(3) ==
        ((r.getLong(1) * 20000L + total) / (2L * total)).toDouble / 10000.0)
    }
  }

  test("ANOVA, Kruskal-Wallis and Cohen's d replay from exact cents") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cents(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val rows = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val byG = rows.groupBy(_._1).toSeq.sortBy(_._1)
    // one-way ANOVA from group moments, T1 folded in event_type order
    val k = byG.length.toDouble
    val n = rows.length.toDouble
    val s = rows.map(r => BigInt(r._2)).sum.toDouble
    val s2 = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble
    var t1 = 0.0
    byG.foreach { case (_, g) =>
      val sj = g.map(r => BigInt(r._2)).sum.toDouble
      t1 += sj * sj / g.length.toDouble
    }
    val fStat = r4(((t1 - s * s / n) / (k - 1.0)) / ((s2 - t1) / (n - k)))
    val av = graft.ops.Registry.queries("agg_anova_oneway")(spark, TestSpark.sfSmoke).head()
    assert((av.getLong(0), av.getLong(1), av.getDouble(4))
      == ((byG.length.toLong, rows.length.toLong, fStat)))
    // Kruskal-Wallis from doubled average ranks over the cents grid
    val grid = rows.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val sortedV = grid.keys.toSeq.sorted
    val cum = sortedV.scanLeft(0L)((acc, v) => acc + grid(v)).tail
    val dr = sortedV.zip(cum).map { case (v, c) => v -> (2 * c - grid(v) + 1) }.toMap
    var tt = 0.0
    byG.foreach { case (_, g) =>
      val r2j = g.map(r => dr(r._2)).sum.toDouble
      tt += (r2j / 2.0) * (r2j / 2.0) / g.length.toDouble
    }
    val h = 12.0 / (n * (n + 1.0)) * tt - 3.0 * (n + 1.0)
    val tieSum = grid.values.map(t => BigInt(t) * t * t - t).sum.toDouble
    val hAdj = r4(h / (1.0 - tieSum / (n * n * n - n)))
    val kw = graft.ops.Registry.queries("agg_kruskal_wallis")(spark, TestSpark.sfSmoke).head()
    assert((kw.getLong(0), kw.getLong(1), kw.getDouble(2), kw.getDouble(3))
      == ((byG.length.toLong, rows.length.toLong, r4(h), hAdj)))
    // Cohen's d for the lexicographically first pair
    val (ta, ga) = byG(0); val (tb, gb) = byG(1)
    def mom(g: Seq[(String, Long)]) = (g.length.toDouble,
      g.map(r => BigInt(r._2)).sum.toDouble,
      g.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble)
    val (na, sa, s2a) = mom(ga); val (nb, sb, s2b) = mom(gb)
    val dWant = r4((sa / na - sb / nb) /
      math.sqrt((s2a - sa * sa / na + s2b - sb * sb / nb) / (na + nb - 2.0)))
    val cd = graft.ops.Registry.queries("agg_cohens_d")(spark, TestSpark.sfSmoke)
      .collect()
    assert(cd.length == byG.length * (byG.length - 1) / 2)
    val first = cd.head
    assert((first.getString(0), first.getString(1), first.getDouble(4))
      == ((ta, tb, dWant)))
  }

  test("Kendall tau-b and KPSS replay from the daily series") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cents(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val ev = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    // Kendall over daily view/click masses
    val vc = ev.filter(col("event_type").isin("view", "click"))
      .select(dayofmonth(col("ts")).cast("long").as("i"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), cents(r.getDouble(2))))
    val daily = vc.groupBy(_._1).toSeq.sortBy(_._1).map { case (i, g) =>
      (i, g.filter(_._2 == "view").map(_._3).sum, g.filter(_._2 == "click").map(_._3).sum)
    }
    var (c, dd, n1, n2, n0) = (0L, 0L, 0L, 0L, 0L)
    for (a <- daily.indices; b <- a + 1 until daily.length) {
      val (_, xa, ya) = daily(a); val (_, xb, yb) = daily(b)
      val sgn = math.signum((xb - xa).toDouble) * math.signum((yb - ya).toDouble)
      if (sgn == 1.0) c += 1 else if (sgn == -1.0) dd += 1
      if (xa == xb) n1 += 1
      if (ya == yb) n2 += 1
      n0 += 1
    }
    val tau = r4((c - dd).toDouble / math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble))
    val kt = graft.ops.Registry.queries("agg_kendall_tau")(spark, TestSpark.sfSmoke).head()
    assert((kt.getLong(0), kt.getLong(1), kt.getLong(2), kt.getLong(3), kt.getDouble(4))
      == ((daily.length.toLong, n0, c, dd, tau)))
    // KPSS from the full daily series via the exact n·y − S demeaning
    val all = ev.select(dayofmonth(col("ts")).cast("long").as("i"), col("value"))
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
    val ys = all.groupBy(_._1).toSeq.sortBy(_._1).map(g => g._2.map(_._2).sum)
    val nD = ys.length
    val sy = ys.map(BigInt(_)).sum
    val e = ys.map(y => BigInt(nD) * y - sy)
    val st = e.scanLeft(BigInt(0))(_ + _).tail
    val ss2 = st.map(x => x * x).sum.toDouble
    val se2 = e.map(x => x * x).sum.toDouble
    def gl(l: Int) = (l until nD).map(t => e(t) * e(t - l)).sum.toDouble
    val eta = r4(ss2 / (nD.toDouble * (se2 +
      2.0 * (0.8 * gl(1) + 0.6 * gl(2) + 0.4 * gl(3) + 0.2 * gl(4)))))
    val kp = graft.ops.Registry.queries("ts_kpss")(spark, TestSpark.sfSmoke).head()
    assert((kp.getLong(0), kp.getDouble(1)) == ((nD.toLong, eta)))
  }

  test("histogram2d cells tile the events table exactly") {
    val rows = graft.ops.Registry.queries("agg_histogram2d")(spark, TestSpark.sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    val events = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    assert(rows.map(_.getLong(2)).sum == events.count())
    // exact value mass: cells sum to the table's decimal(18,2) total
    val total = events.agg(
      sum(col("value").cast("decimal(18,2)")).cast("double")).head().getDouble(0)
    val cellSum = rows.map(r => BigDecimal(r.getDouble(3))).sum
    assert(cellSum == BigDecimal(total), s"$cellSum != $total")
    rows.foreach { r =>
      val h = r.getLong(0)
      assert(h >= 0 && h <= 23 && r.getLong(1) >= 0)
    }
  }
}
