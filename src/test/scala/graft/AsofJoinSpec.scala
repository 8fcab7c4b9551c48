package graft

import graft.ts.AsofJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the union-and-window as-of join against hand-computed
  * and brute-force expectations (pandas merge_asof behavior: backward,
  * allow_exact_matches=True, left-join, tolerance-miss → NULL). */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def probeDf(rows: (Long, Long)*) = // (id, ts_us)
    rows.toSeq.toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))

  private def buildDf(rows: (Long, Double)*) = // (ts_us, v)
    rows.toSeq.toDF("us", "v")
      .select(timestamp_micros(col("us")).as("ts"), col("v"))

  private def run(probe: org.apache.spark.sql.DataFrame,
                  build: org.apache.spark.sql.DataFrame,
                  tol: Option[Long] = None): Map[Long, Option[Double]] =
    AsofJoin.backward(probe, build, on = "ts", by = Nil,
        payload = Seq("v"), toleranceMicros = tol)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  test("backward picks the latest build row at-or-before each probe row") {
    val m = run(
      probeDf((1L, 100L), (2L, 250L), (3L, 500L)),
      buildDf((50L, 1.0), (200L, 2.0), (600L, 3.0)))
    assert(m == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(2.0)))
  }

  test("exact timestamp match is taken (allow_exact_matches=True)") {
    val m = run(probeDf((1L, 200L)), buildDf((200L, 9.0)))
    assert(m == Map(1L -> Some(9.0)))
  }

  test("probe rows before any build row get NULL (left-join semantics)") {
    val m = run(probeDf((1L, 10L), (2L, 300L)), buildDf((200L, 2.0)))
    assert(m == Map(1L -> None, 2L -> Some(2.0)))
  }

  test("tolerance: stale matches are NULLed, not dropped") {
    val m = run(
      probeDf((1L, 1000L), (2L, 5000L)),
      buildDf((900L, 1.0), (1500L, 2.0)),
      tol = Some(1000L))
    assert(m == Map(1L -> Some(1.0), 2L -> None)) // 5000-1500=3500 > 1000
  }

  test("by-groups never match across keys") {
    val probe = Seq((1L, 5L, 100L), (2L, 6L, 100L)).toDF("id", "k", "us")
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val build = Seq((5L, 50L, 1.0)).toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val m = AsofJoin.backward(probe, build, on = "ts", by = Seq("k"), payload = Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(m == Map(1L -> Some(1.0), 2L -> None))
  }

  test("NULL payload columns do not tear: all matched fields come from ONE build row") {
    // build row at ts=200 has v legitimately NULL; the old per-column
    // last(ignoreNulls) carried v from the OLDER ts=100 row while
    // matched_ts/w came from ts=200 — a torn row. The struct carry must
    // deliver (matched_ts=200, v=NULL, w="b") atomically.
    val probe = probeDf((1L, 300L))
    val build = Seq((100L, Some(1.0), "a"), (200L, None, "b"))
      .toDF("us", "v", "w")
      .select(timestamp_micros(col("us")).as("ts"), col("v"), col("w"))
    val r = AsofJoin.backward(probe, build, on = "ts", by = Nil,
        payload = Seq("v", "w"))
      .select(unix_micros(col("matched_ts")).as("mts"), col("v"), col("w"))
      .head()
    assert(r.getLong(0) == 200L, "matched_ts must be the newest build row")
    assert(r.isNullAt(1), "v must be the newest build row's NULL, not an older row's value")
    assert(r.getString(2) == "b")
  }

  test("forward picks the earliest build row at-or-after each probe row") {
    val probe = probeDf((1L, 100L), (2L, 250L), (3L, 700L), (4L, 200L))
    val build = buildDf((50L, 1.0), (200L, 2.0), (600L, 3.0))
    val m = AsofJoin.forward(probe, build, on = "ts", by = Nil, payload = Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // 100→200, 250→600, 700→none (past the last build), 200→200 (exact)
    assert(m == Map(1L -> Some(2.0), 2L -> Some(3.0), 3L -> None, 4L -> Some(2.0)))
  }

  test("forward tolerance NULLs matches farther than tol ahead") {
    val m = AsofJoin.forward(
        probeDf((1L, 100L), (2L, 550L)), buildDf((200L, 2.0), (600L, 3.0)),
        on = "ts", by = Nil, payload = Seq("v"), toleranceMicros = Some(80L))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(m == Map(1L -> None, 2L -> Some(3.0))) // 200-100=100 > 80; 600-550=50 ≤ 80
  }

  test("nearest picks the closer side; exact ties go backward") {
    val probe = probeDf((1L, 120L), (2L, 430L), (3L, 200L), (4L, 10L))
    val build = buildDf((100L, 1.0), (300L, 2.0), (600L, 3.0))
    val m = AsofJoin.nearest(probe, build, on = "ts", by = Nil, payload = Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // 120: back gap 20 < fwd gap 180 → 1.0; 430: back 130 vs fwd 170 → 2.0
    // 200: back 100 == fwd 100 → tie → backward → 1.0
    // 10: no backward candidate → forward → 1.0
    assert(m == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(1.0), 4L -> Some(1.0)))
  }

  test("backwardGlobal equals backward and runs range-partitioned (>1 partition)") {
    val rnd = new scala.util.Random(11)
    val probe = probeDf((1L to 500L).map(i => (i, rnd.nextInt(100000).toLong)): _*)
    val build = buildDf((1 to 300).map(_ =>
      (rnd.nextInt(100000).toLong, rnd.nextDouble())).groupBy(_._1)
      .map(_._2.head).toSeq: _*) // unique build ts
    val global = AsofJoin.backwardGlobal(probe, build, on = "ts",
      payload = Seq("v"), numPartitions = 8)
    // the window must be partitioned by the ts bucket id (parallel), not
    // a single global partition
    val plan = global.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_pid"), plan)
    val a = global.select("id", "matched_ts", "v").collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.backward(probe, build, on = "ts", by = Nil, payload = Seq("v"))
      .select("id", "matched_ts", "v").collect().map(_.toString).sorted.toSeq
    assert(a == b && a.size == 500)
    // with tolerance too
    val at = AsofJoin.backwardGlobal(probe, build, on = "ts",
        payload = Seq("v"), toleranceMicros = Some(500L), numPartitions = 8)
      .select("id", "v").collect().map(_.toString).sorted.toSeq
    val bt = AsofJoin.backward(probe, build, on = "ts", by = Nil,
        payload = Seq("v"), toleranceMicros = Some(500L))
      .select("id", "v").collect().map(_.toString).sorted.toSeq
    assert(at == bt)
  }

  test("strict backward excludes equal-ts build rows (allow_exact_matches=false)") {
    // probe at 200 has builds at exactly 200 and at 100: strict takes 100
    val probe = probeDf((1L, 200L), (2L, 250L), (3L, 50L))
    val build = buildDf((100L, 1.0), (200L, 2.0))
    val m = AsofJoin.backward(probe, build, on = "ts", by = Nil,
        payload = Seq("v"), allowExactMatches = false)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // 200 → strictly-before → 1.0; 250 → 2.0 (200 < 250); 50 → none
    assert(m == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None))
  }

  test("strict forward excludes equal-ts build rows") {
    val probe = probeDf((1L, 200L), (2L, 150L), (3L, 600L))
    val build = buildDf((200L, 2.0), (600L, 3.0))
    val m = AsofJoin.forward(probe, build, on = "ts", by = Nil,
        payload = Seq("v"), allowExactMatches = false)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // 200 → strictly-after → 600→3.0; 150 → 200→2.0; 600 → none
    assert(m == Map(1L -> Some(3.0), 2L -> Some(2.0), 3L -> None))
  }

  test("strict nearest excludes the exact hit and picks the closer strict side") {
    val probe = probeDf((1L, 200L), (2L, 590L))
    val build = buildDf((100L, 1.0), (200L, 2.0), (600L, 3.0))
    val m = AsofJoin.nearest(probe, build, on = "ts", by = Nil,
        payload = Seq("v"), allowExactMatches = false)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // 200: exact 200 excluded → back 100 (gap 100) vs fwd 600 (gap 400) → 1.0
    // 590: back 200 (gap 390) vs fwd 600 (gap 10) → 3.0
    assert(m == Map(1L -> Some(1.0), 2L -> Some(3.0)))
  }

  test("strict property: matched_ts is the max build ts strictly below each probe") {
    val rnd = new scala.util.Random(7)
    val probeRows = (1L to 200L).map(i => (i, rnd.nextInt(500).toLong))
    val uniq = (1 to 120).map(_ => (rnd.nextInt(500).toLong, rnd.nextInt(100).toDouble))
      .groupBy(_._1).map(_._2.head).toSeq
    val got = AsofJoin.backward(probeDf(probeRows: _*), buildDf(uniq: _*),
        on = "ts", by = Nil, payload = Seq("v"), allowExactMatches = false)
      .select(col("id"), unix_micros(col("matched_ts")).as("mts"))
      .collect()
    val probeTs = probeRows.toMap
    assert(got.length == 200)
    got.foreach { r =>
      val pts = probeTs(r.getLong(0))
      val expected = uniq.map(_._1).filter(_ < pts).sorted.lastOption
      val mts = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(mts == expected, s"probe ts $pts: got $mts expected $expected")
    }
  }

  test("strict + tolerance compose: the strictly-before match is then tolerance-checked") {
    // probe 200: strict match is 100 (not the exact-ts 200); gap 100 µs.
    // tol 150 keeps it; tol 50 NULLs it (the exact-ts build must never
    // sneak back in as a 0-gap match).
    val probe = probeDf((1L, 200L))
    val build = buildDf((100L, 1.0), (200L, 2.0))
    def run(tol: Long) =
      AsofJoin.backward(probe, build, on = "ts", by = Nil, payload = Seq("v"),
          toleranceMicros = Some(tol), allowExactMatches = false)
        .select("v").head()
    assert(run(150L).getDouble(0) == 1.0)
    assert(run(50L).isNullAt(0))
  }

  test("strict backwardGlobal equals strict backward (boundary carry incl. last build row)") {
    val rnd = new scala.util.Random(23)
    val probe = probeDf((1L to 400L).map(i => (i, rnd.nextInt(50000).toLong)): _*)
    val build = buildDf((1 to 250).map(_ =>
      (rnd.nextInt(50000).toLong, rnd.nextDouble())).groupBy(_._1)
      .map(_._2.head).toSeq: _*)
    val a = AsofJoin.backwardGlobal(probe, build, on = "ts", payload = Seq("v"),
        numPartitions = 8, allowExactMatches = false)
      .select("id", "matched_ts", "v").collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.backward(probe, build, on = "ts", by = Nil,
        payload = Seq("v"), allowExactMatches = false)
      .select("id", "matched_ts", "v").collect().map(_.toString).sorted.toSeq
    assert(a == b && a.size == 400)
  }

  test("randomized: matches a brute-force reference implementation") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val probe = (1L to 30L).map(i => (i, rnd.nextInt(1000).toLong))
      val build = (1 to 20).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
      // brute force: latest build ts <= probe ts; ties on build ts take
      // either (values equal only if same row — make ts unique)
      val uniq = build.groupBy(_._1).map(_._2.maxBy(_._2)).toSeq
      val expected = probe.map { case (id, pts) =>
        val cand = uniq.filter(_._1 <= pts)
        id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._1)._2))
      }.toMap
      val got = run(probeDf(probe: _*), buildDf(uniq: _*))
      assert(got == expected)
    }
  }

  test("randomized forward and nearest match brute force") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 3) {
      val probe = (1L to 30L).map(i => (i, rnd.nextInt(1000).toLong))
      val uniq = (1 to 20).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
        .groupBy(_._1).map(_._2.head).toSeq // unique build ts
      val pDf = probeDf(probe: _*); val bDf = buildDf(uniq: _*)

      val fwdExp = probe.map { case (id, pts) =>
        val cand = uniq.filter(_._1 >= pts)
        id -> (if (cand.isEmpty) None else Some(cand.minBy(_._1)._2))
      }.toMap
      val fwdGot = AsofJoin.forward(pDf, bDf, on = "ts", by = Nil, payload = Seq("v"))
        .select("id", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(fwdGot == fwdExp)

      val nearExp = probe.map { case (id, pts) =>
        val back = uniq.filter(_._1 <= pts).sortBy(_._1).lastOption
        val fwd = uniq.filter(_._1 >= pts).sortBy(_._1).headOption
        val pick = (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (pts - b._1 <= f._1 - pts) Some(b._2) else Some(f._2) // tie → backward
          case (b, f) => b.orElse(f).map(_._2)
        }
        id -> pick
      }.toMap
      val nearGot = AsofJoin.nearest(pDf, bDf, on = "ts", by = Nil, payload = Seq("v"))
        .select("id", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(nearGot == nearExp)
    }
  }
}
