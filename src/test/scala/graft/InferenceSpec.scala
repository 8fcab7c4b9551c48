package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plain-Scala replays of the round-13 batch-6 inference panel
  * (graft.ops.Inference): Bartlett, Brown–Forsythe, Friedman,
  * Durbin–Watson, Granger F, phase-binned period detection, and the
  * two-proportion z-test. Each test recomputes the statistic from
  * collected raw ingredients with BigInt/Double arithmetic in the SAME
  * operation order as the shared formula texts, so a drifted formula
  * or a broken fold fails here before the DuckDB gate sees it. */
class InferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def r4(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  private def cents(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()

  /** (event_type, cents) rows of the smoke corpus. */
  private lazy val rows: Array[(String, Long)] = {
    graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
  }

  test("Bartlett B replays from exact group moments with ordered folds") {
    val byG = rows.groupBy(_._1).toSeq.sortBy(_._1).filter(_._2.length >= 2)
    var (t1, ls, si) = (0.0, 0.0, 0.0)
    var (n, s2) = (BigInt(0), BigInt(0))
    byG.foreach { case (_, g) =>
      val njd = g.length.toDouble
      val sj = g.map(r => BigInt(r._2)).sum
      val s2j = g.map(r => BigInt(r._2) * BigInt(r._2)).sum
      n += g.length; s2 += s2j
      t1 += sj.toDouble * sj.toDouble / njd
      ls += (njd - 1.0) * math.log((s2j.toDouble - sj.toDouble * sj.toDouble / njd) / (njd - 1.0))
      si += 1.0 / (njd - 1.0)
    }
    val (nd, kd) = (n.toDouble, byG.length.toDouble)
    val want = r4(((nd - kd) * math.log((s2.toDouble - t1) / (nd - kd)) - ls) /
      (1.0 + (si - 1.0 / (nd - kd)) / (3.0 * (kd - 1.0))))
    val got = graft.ops.Registry.queries("agg_bartlett_test")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getLong(1), got.getDouble(2))
      == ((byG.length.toLong, n.toLong, want)))
  }

  test("Brown-Forsythe W replays from the doubled-median z deviations") {
    val byG = rows.groupBy(_._1).toSeq.sortBy(_._1)
    // doubled median from the sorted per-group values (1-based positions
    // lo = floor((n+1)/2), hi = floor(n/2)+1 — v[lo] + v[hi])
    val dmed = byG.map { case (t, g) =>
      val v = g.map(_._2).sorted
      val n = v.length
      t -> (v((n + 1) / 2 - 1) + v(n / 2))
    }.toMap
    var t1 = 0.0
    var (n, s, s2) = (BigInt(0), BigInt(0), BigInt(0))
    byG.foreach { case (t, g) =>
      val z = g.map(r => BigInt((2 * r._2 - dmed(t)).abs))
      val sj = z.sum
      n += z.length; s += sj; s2 += z.map(x => x * x).sum
      t1 += sj.toDouble * sj.toDouble / z.length.toDouble
    }
    val (nd, kd) = (n.toDouble, byG.length.toDouble)
    val want = r4(((t1 - s.toDouble * s.toDouble / nd) / (kd - 1.0)) /
      ((s2.toDouble - t1) / (nd - kd)))
    val got = graft.ops.Registry.queries("agg_levene_bf")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getLong(1), got.getDouble(2))
      == ((byG.length.toLong, n.toLong, want)))
  }

  /** (day, event_type, cents) with Spark-extracted day-of-month, so the
    * replay shares the engine's calendar exactly. */
  private lazy val dayRows: Array[(Long, String, Long)] =
    graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select(dayofmonth(col("ts")).cast("long").as("i"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), cents(r.getDouble(2))))

  test("Friedman Q replays from per-day doubled ranks over complete days") {
    val ktot = dayRows.map(_._2).distinct.length
    val masses = dayRows.groupBy(r => (r._1, r._2))
      .map { case ((i, t), g) => (i, t, g.map(r => BigInt(r._3)).sum) }.toSeq
    val completeDays = masses.groupBy(_._1).filter(_._2.length == ktot).keySet
    val cc = masses.filter(r => completeDays(r._1))
    // doubled average ranks within each day (ties by grid cum counts)
    val dr = cc.groupBy(_._1).flatMap { case (i, g) =>
      val grid = g.groupBy(_._3).map { case (m, gg) => m -> gg.length.toLong }
      val sortedM = grid.keys.toSeq.sorted
      val cum = sortedM.scanLeft(0L)((acc, m) => acc + grid(m)).tail
      val drOf = sortedM.zip(cum).map { case (m, c) => m -> (2 * c - grid(m) + 1) }.toMap
      g.map(r => (i, r._2) -> drOf(r._3))
    }
    val rj = cc.groupBy(_._2).map { case (t, g) =>
      (t, g.map(r => BigInt(dr((r._1, t)))).sum, g.length)
    }.toSeq
    val k = rj.length.toDouble
    val nB = rj.map(_._3).min
    val sd2 = rj.map(r => r._2 * r._2).sum
    val want = r4(3.0 * sd2.toDouble / (nB.toDouble * k * (k + 1.0))
      - 3.0 * nB.toDouble * (k + 1.0))
    val got = graft.ops.Registry.queries("agg_friedman_test")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getLong(1), got.getDouble(2))
      == ((rj.length.toLong, nB.toLong, want)))
  }

  /** The daily cents series in day order. */
  private lazy val dailySeries: Seq[(Long, BigInt)] =
    dayRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (i, g) => (i, g.map(r => BigInt(r._3)).sum) }

  test("Durbin-Watson replays from the exact-scaled residual cascade") {
    val n = BigInt(dailySeries.length)
    val st = dailySeries.map(r => BigInt(r._1)).sum
    val stt = dailySeries.map(r => BigInt(r._1) * BigInt(r._1)).sum
    val sy = dailySeries.map(_._2).sum
    val sty = dailySeries.map(r => BigInt(r._1) * r._2).sum
    val dd = n * stt - st * st
    val nb = n * sty - st * sy
    val e = dailySeries.map { case (i, yc) => dd * n * yc - n * nb * i - dd * sy + nb * st }
    val sdd = e.sliding(2).map { case Seq(a, b) => (b - a) * (b - a) }.sum
    val se2 = e.map(x => x * x).sum
    val got = graft.ops.Registry.queries("ts_dw_stat")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getDouble(1), got.getDouble(2))
      == ((dailySeries.length.toLong,
        r4(nb.toDouble / dd.toDouble / 100.0),
        r4(sdd.toDouble / se2.toDouble))))
  }

  test("Granger F replays from exact moments through the det3 cascade") {
    val vc = dayRows.filter(r => r._2 == "view" || r._2 == "click")
    val daily = vc.groupBy(_._1).toSeq.sortBy(_._1).map { case (i, g) =>
      (i, g.filter(_._2 == "view").map(r => BigInt(r._3)).sum,
        g.filter(_._2 == "click").map(r => BigInt(r._3)).sum)
    }
    val lg = daily.sliding(2).collect { case Seq((_, v0, c0), (_, v1, _)) =>
      (v1, v0, c0) // (y, y1, x1)
    }.toSeq
    val n = lg.length.toDouble
    val s1 = lg.map(_._2).sum.toDouble; val s2 = lg.map(_._3).sum.toDouble
    val s11 = lg.map(r => r._2 * r._2).sum.toDouble
    val s12 = lg.map(r => r._2 * r._3).sum.toDouble
    val s22 = lg.map(r => r._3 * r._3).sum.toDouble
    val sy = lg.map(_._1).sum.toDouble
    val syy = lg.map(r => r._1 * r._1).sum.toDouble
    val s1y = lg.map(r => r._2 * r._1).sum.toDouble
    val s2y = lg.map(r => r._3 * r._1).sum.toDouble
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
             f: Double, g: Double, h: Double, i: Double) =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    val ssru = syy - (det0 * sy + det1 * s1y + det2 * s2y) / det
    val ssrr = syy - ((sy * s11 - s1 * s1y) * sy + (n * s1y - s1 * sy) * s1y) /
      (n * s11 - s1 * s1)
    val f = (ssrr - ssru) * (n - 3.0) / ssru
    val got = graft.ops.Registry.queries("ts_granger_f")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getDouble(1), got.getDouble(2), got.getDouble(3))
      == ((lg.length.toLong, r4(ssrr), r4(ssru), r4(f))))
  }

  test("phase-binned period detection replays the per-candidate ANOVA F") {
    val hourRows = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select(((dayofmonth(col("ts")) - 1) * 24 + hour(col("ts"))).cast("long").as("h"),
        col("value"))
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
    val hourly = hourRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (h, g) => (h, g.map(r => BigInt(r._2)).sum) }
    val got = graft.ops.Registry.queries("ts_period_detect")(spark, TestSpark.sfSmoke)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(2L, 3L, 4L, 6L, 8L, 12L, 24L, 48L, 168L))
    Seq(2L, 24L, 168L).foreach { p =>
      val cell = hourly.groupBy(_._1 % p).toSeq.sortBy(_._1)
      var t1 = 0.0
      var (n, s, s2) = (BigInt(0), BigInt(0), BigInt(0))
      cell.foreach { case (_, g) =>
        val sj = g.map(_._2).sum
        n += g.length; s += sj; s2 += g.map(r => r._2 * r._2).sum
        t1 += sj.toDouble * sj.toDouble / g.length.toDouble
      }
      val (nd, kd) = (n.toDouble, cell.length.toDouble)
      val want = r4(((t1 - s.toDouble * s.toDouble / nd) / (kd - 1.0)) /
        ((s2.toDouble - t1) / (nd - kd)))
      assert(got(p) == ((cell.length.toLong, hourly.length.toLong, want)), s"period $p")
    }
  }

  test("Kalman local-level filter replays the predict/update recursion") {
    val xs = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7)
      .select("event_id", "value")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(xs.length > 10)
    var l = xs(0)._2; var p = 100.0
    val want = scala.collection.mutable.ArrayBuffer((xs(0)._1, l, p))
    xs.drop(1).foreach { case (id, x) =>
      val k = (p + 4.0) / (p + 4.0 + 16.0)
      l = l + k * (x - l)
      p = (1.0 - k) * (p + 4.0)
      want += ((id, l, p))
    }
    val got = graft.ops.Registry.queries("ts_kalman_level")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == xs.length)
    got.zip(want).foreach { case ((gid, gl, gp, gk), (wid, wl, wp)) =>
      assert(gid == wid && gl == wl && gp == wp, s"event $gid")
      assert(gk == (wp + 4.0) / (wp + 4.0 + 16.0))
    }
    // the error variance starts at the diffuse init and contracts
    // toward its fixed point p* = (−q + √(q² + 4rq))/2 ≈ 6.2462
    // (monotone up to ulp wobble once converged)
    val ps = got.map(_._3)
    assert(ps.head == 100.0 && ps.last < 10.0 &&
      ps.sliding(2).forall { case Array(a, b) => b <= a + 1e-9 })
  }

  test("kalmanLevel excludes null key/order/value rows on both paths (ADVICE round 16)") {
    // the integral fast path's primitive encoder NPE'd on nulls where
    // the fold path juggled them — both now share one explicit
    // contract: null rows are excluded, non-null series unchanged
    import spark.implicits._
    val withNulls = Seq(
      (Option(1L), Option(1L), Option(10.0)),
      (Option(1L), Option(2L), Option(12.0)),
      (Option(1L), Option(3L), None), // null value
      (Option(1L), None, Option(9.0)), // null order
      (None, Option(1L), Option(7.0)), // null key
      (Option(2L), Option(1L), Option(5.0)))
      .toDF("k", "o", "v")
    val got = graft.ops.Inference.kalmanLevelOf(withNulls, "k", "o", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val clean = Seq((1L, 1L, 10.0), (1L, 2L, 12.0), (2L, 1L, 5.0))
    val want = graft.ops.Inference.kalmanLevelOf(clean.toDF("k", "o", "v"), "k", "o", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    // string key → the type-generic fold path; same null contract
    val gotFold = graft.ops.Inference.kalmanLevelOf(
      Seq((Option("a"), Option(1L), Option(10.0)),
        (Option("a"), Option(2L), None),
        (None: Option[String], Option(1L), Option(3.0))).toDF("k", "o", "v"),
      "k", "o", "v").collect()
    assert(gotFold.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 1L)))
  }

  test("Cochran's Q replays from the heavy-use incidence matrix") {
    val ut = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val k = ut.map(_._2).distinct.length.toDouble
    val inc = ut.groupBy(identity).filter(_._2.length >= 15).keys.toSeq
    val n = inc.length.toDouble
    val sc2 = inc.groupBy(_._2).values.map(g => BigInt(g.length) * g.length).sum.toDouble
    val rGroups = inc.groupBy(_._1).values.toSeq
    val sr2 = rGroups.map(g => BigInt(g.length) * g.length).sum.toDouble
    val q = r4((k - 1.0) * (k * sc2 - n * n) / (k * n - sr2))
    val got = graft.ops.Registry.queries("agg_cochran_q")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3))
      == ((k.toLong, rGroups.length.toLong, n.toLong, q)))
  }

  test("Wilcoxon signed-rank replays from the doubled-rank |d| grid") {
    val vc = dayRows.filter(r => r._2 == "view" || r._2 == "click")
    val dz = vc.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) =>
      g.filter(_._2 == "view").map(r => BigInt(r._3)).sum -
        g.filter(_._2 == "click").map(r => BigInt(r._3)).sum
    }.filter(_ != 0)
    val grid = dz.map(_.abs).groupBy(identity).map { case (a, g) => a -> g.length.toLong }
    val sortedA = grid.keys.toSeq.sorted
    val cum = sortedA.scanLeft(0L)((acc, a) => acc + grid(a)).tail
    val dr = sortedA.zip(cum).map { case (a, c) => a -> (2 * c - grid(a) + 1) }.toMap
    val n = dz.length.toDouble
    val wp = dz.filter(_ > 0).map(d => dr(d.abs)).sum.toDouble / 2.0
    val wm = dz.filter(_ < 0).map(d => dr(d.abs)).sum.toDouble / 2.0
    val tieSum = grid.values.map(t => BigInt(t) * t * t - t).sum.toDouble
    val z = r4((wp - n * (n + 1.0) / 4.0) /
      math.sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - tieSum / 48.0))
    val got = graft.ops.Registry.queries("agg_wilcoxon_signed")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getDouble(1), got.getDouble(2), got.getDouble(3))
      == ((dz.length.toLong, wp, wm, z)))
  }

  test("lexical-diversity totals replay from plain string splits") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val per = g.map { case (_, t) =>
        val counts = t.split(" ", -1).groupBy(identity).map(_._2.length)
        (counts.sum.toLong, counts.size.toLong, counts.count(_ == 1).toLong)
      }
      val (tok, typ, hap) = (per.map(_._1).sum, per.map(_._2).sum, per.map(_._3).sum)
      (src, g.length.toLong, tok, typ, hap,
        r4(typ.toDouble / tok.toDouble), r4(hap.toDouble / tok.toDouble))
    }
    val got = graft.ops.Registry.queries("text_ttr")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == want)
  }

  test("per-day proportion z + Benjamini-Hochberg replays end to end") {
    val daily = dayRows.groupBy(_._1).toSeq.sortBy(_._1).map { case (i, g) =>
      (i, g.length.toLong, g.count(_._2 == "click").toLong)
    }
    val n = daily.map(_._2).sum.toDouble
    val x = daily.map(_._3).sum.toDouble
    val withP = daily.map { case (i, nd, xd) =>
      val z = (xd.toDouble / nd - (x - xd) / (n - nd)) /
        math.sqrt(x / n * (1.0 - x / n) * (1.0 / nd + 1.0 / (n - nd)))
      val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
      val p = r4(2.0 * 0.3989422804014327 * math.exp(-(math.abs(z) * math.abs(z)) / 2.0)
        * (((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
            - 0.356563782) * t + 0.319381530) * t))
      (i, nd, xd, r4(z), p)
    }
    val m = withP.length
    val ranked = withP.sortBy(r => (r._5, r._1)).zipWithIndex
    val cands = ranked.map { case (r, idx) => (r._1, r._5 * m / (idx + 1).toDouble) }
    // reverse running min of the BH candidates in (p, day) order,
    // clipped at 1 (BH adjusted p is a probability — ADVICE r13 item 1)
    val adj = cands.scanRight(Double.MaxValue)((c, acc) => math.min(c._2, acc)).init
    val pBh = cands.map(_._1).zip(adj.map(v => r4(math.min(1.0, v)))).toMap
    val got = graft.ops.Registry.queries("agg_prop_ztest_bh")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toSeq
    val want = withP.map { case (i, nd, xd, z, p) =>
      (i, nd, xd, z, p, pBh(i), pBh(i) <= 0.1)
    }
    assert(got == want)
    // p-value sanity: two-sided, so z = 0 would map to p = 1; all in (0, 1]
    assert(got.forall(r => r._5 > 0.0 && r._5 <= 1.0))
    // BH never decreases a raw p and is monotone in the p-order
    assert(got.forall(r => r._6 >= r._5 - 1e-12))
  }

  test("one-sample and paired t replay from exact moments") {
    // one-sample vs mu0 = 25000 cents, per event_type
    val byG = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val want1 = byG.map { case (tname, g) =>
      val n = g.length.toDouble
      val sj = g.map(r => BigInt(r._2)).sum.toDouble
      val s2j = g.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble
      (tname, g.length.toLong, r4(sj / n / 100.0),
        r4((sj / n - 25000.0) / math.sqrt((s2j - sj * sj / n) / (n - 1.0) / n)))
    }
    val got1 = graft.ops.Registry.queries("agg_ttest_1samp")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got1 == want1)
    // paired over daily view-click diffs
    val vc = dayRows.filter(r => r._2 == "view" || r._2 == "click")
    val dz = vc.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) =>
      g.filter(_._2 == "view").map(r => BigInt(r._3)).sum -
        g.filter(_._2 == "click").map(r => BigInt(r._3)).sum
    }
    val n = dz.length.toDouble
    val sd = dz.sum.toDouble
    val s2d = dz.map(d => d * d).sum.toDouble
    val tP = r4(sd / n / math.sqrt((s2d - sd * sd / n) / (n - 1.0) / n))
    val got2 = graft.ops.Registry.queries("agg_ttest_paired")(spark, TestSpark.sfSmoke).head()
    assert((got2.getLong(0), got2.getDouble(1), got2.getDouble(2))
      == ((dz.length.toLong, r4(sd / n / 100.0), tP)))
  }

  test("McNemar replays from the heavy-click half-month cells") {
    val rowsU = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select(col("user_id"), col("event_type"), dayofmonth(col("ts")).as("dd"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val cells = rowsU.groupBy(_._1).values.map { g =>
      val x1 = if (g.count(r => r._2 == "click" && r._3 <= 15) >= 7) 1 else 0
      val x2 = if (g.count(r => r._2 == "click" && r._3 > 15) >= 7) 1 else 0
      (x1, x2)
    }.toSeq
    val b = cells.count(_ == ((1, 0))).toDouble
    val c = cells.count(_ == ((0, 1))).toDouble
    val got = graft.ops.Registry.queries("agg_mcnemar")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getLong(2), got.getLong(3))
      == ((cells.length.toLong, b.toLong, c.toLong)))
    assert(got.getLong(1) + got.getLong(2) + got.getLong(3) + got.getLong(4)
      == cells.length.toLong)
    if (b + c > 0) {
      assert(got.getDouble(5) == r4((b - c) * (b - c) / (b + c)))
      assert(got.getDouble(6) ==
        r4((math.abs(b - c) - 1.0) * (math.abs(b - c) - 1.0) / (b + c)))
    }
  }

  test("bigram perplexity replays the smoothed LM end to end") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val bi = docs.flatMap { case (id, w) =>
      if (w.length < 2) Nil
      else w.sliding(2).map(p => (id, p(0) + " " + p(1), p(0))).toSeq
    }
    val cb = bi.groupBy(_._2).map { case (bg, g) => bg -> g.length.toLong }
    val cu = bi.groupBy(_._3).map { case (w1, g) => w1 -> g.length.toLong }
    val v = docs.flatMap(_._2).distinct.length.toDouble
    val want = bi.filter(_._1 < 20).groupBy(_._1).toSeq.sortBy(_._1).map { case (id, g) =>
      val tf = g.groupBy(_._2).map { case (bg, gg) => bg -> gg.length.toLong }
      val n = g.length.toDouble
      var s = 0.0
      tf.toSeq.sortBy(_._1).foreach { case (bg, t) =>
        s += -t.toDouble * math.log((cb(bg).toDouble + 1.0) /
          (cu(bg.split(" ")(0)).toDouble + v))
      }
      val nll = s / n
      (id, g.length.toLong, r4(nll), r4(math.exp(nll)))
    }
    val got = graft.ops.Registry.queries("text_bigram_perplexity")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == want)
    // self-perplexity over a |V|-word vocab must land in (1, V+1)
    assert(got.forall(r => r._4 > 1.0 && r._4 < v + 1.0))
  }

  test("generalized ESD replays three argmax-remove-recompute rounds") {
    var cur = dailySeries.map { case (i, yc) => (i, yc) }
    val want = (1 to 3).map { it =>
      val n = cur.length.toDouble
      val sv = cur.map(_._2).sum.toDouble
      val s2 = cur.map(r => r._2 * r._2).sum.toDouble
      val scored = cur.map { case (i, yc) =>
        val g = math.abs(yc.toDouble - sv / n) /
          math.sqrt((s2 - sv * sv / n) / (n - 1.0))
        (i, yc, g)
      }
      val top = scored.minBy(r => (-r._3, r._1))
      cur = cur.filterNot(_._1 == top._1)
      (it.toLong, top._1, r4(top._2.toDouble / 100.0), r4(top._3), (n + 0.5).toLong)
    }
    val got = graft.ops.Registry.queries("ts_esd_outliers")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want)
    // rounds remove distinct days and n_remaining steps down by one
    assert(got.map(_._2).distinct.length == 3)
    assert(got.map(_._5) == Seq(got.head._5, got.head._5 - 1, got.head._5 - 2))
  }

  test("ESD skips NULL values instead of poisoning the packed moments (ADVICE r14)") {
    // the packed fold computes 'a.sv + p.yc' — before the fix one NULL
    // value nulled sv/s2 for the whole series, so every round's G was
    // NULL and rounds degenerated to remove-smallest-i. With the NULL
    // row filtered out pre-pack, the result equals running on the
    // non-null subset.
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("yc",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val base: Seq[(Long, java.lang.Long)] =
      (1L to 12L).map(i => (i, java.lang.Long.valueOf(i * 100))) :+
        (13L, java.lang.Long.valueOf(99999L))
    val withNull = spark.createDataFrame(
      (base :+ ((14L, null: java.lang.Long)))
        .map { case (i, v) => org.apache.spark.sql.Row(i, v) }.asJava, schema)
    val noNull = spark.createDataFrame(
      base.map { case (i, v) => org.apache.spark.sql.Row(i, v) }.asJava, schema)
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Inference.esdOutliersOf(df, "i", "yc", k = 2)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4))).toSeq
    val got = run(withNull)
    assert(got == run(noNull))
    // and the genuine outlier is still round 1's pick, with a real G
    assert(got.head._2 == 13L && !got.head._4.isNaN)
  }

  test("two-proportion z replays from the four weekend/weekday counts") {
    val wk = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select(weekday(col("ts")).cast("long").as("w"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n1 = wk.count(_._1 >= 5).toDouble
    val x1 = wk.count(r => r._1 >= 5 && r._2 == "click").toDouble
    val n2 = wk.count(_._1 < 5).toDouble
    val x2 = wk.count(r => r._1 < 5 && r._2 == "click").toDouble
    val pp = (x1 + x2) / (n1 + n2)
    val z = (x1 / n1 - x2 / n2) / math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    val got = graft.ops.Registry.queries("agg_prop_ztest")(spark, TestSpark.sfSmoke).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
        got.getDouble(4), got.getDouble(5), got.getDouble(6))
      == ((n1.toLong, x1.toLong, n2.toLong, x2.toLong,
        r4(x1 / n1), r4(x2 / n2), r4(z))))
  }
}
