package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Fault-tolerance evidence for the stateful streaming tier (SURVEY
  * §2.K): a transformWithState query is STOPPED mid-stream and a new
  * query is started from the same checkpoint. Exactly-once resumption
  * means (a) no pre-stop output is re-emitted, and (b) the recovered
  * RocksDB state continues the recursion — the first post-restart EWM
  * value depends on every pre-restart row, so losing state is
  * detectable in the values, not just the counts.
  *
  * The sink is foreachBatch (checkpoint-recoverable, unlike the memory
  * sink StreamingSpec uses for its semantics-only tests); each run
  * collects into its own buffer, so run-1 and run-2 emissions are
  * separable by construction.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("transformWithState EWM restarted from checkpoint == one-shot run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString

    // 3 users x 30 rows, deterministic values; interleaved arrival
    val rows = (0 until 90).map { i =>
      StreamOps.EventRow(event_id = i, user_id = i % 3, value = (i * 7 % 23) + 0.5)
    }
    val (before, after) = rows.splitAt(45)

    val ms = MemoryStream[StreamOps.EventRow]
    def start(sink: scala.collection.mutable.ArrayBuffer[StreamOps.RunOut]) =
      StreamOps.runningEwm(ms.toDS(), alpha = 0.3)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamOps.RunOut], _: Long) =>
          sink.synchronized { sink ++= batch.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val run1 = scala.collection.mutable.ArrayBuffer[StreamOps.RunOut]()
    val q1 = start(run1)
    ms.addData(before); q1.processAllAvailable()
    q1.stop() // simulated failure point

    val run2 = scala.collection.mutable.ArrayBuffer[StreamOps.RunOut]()
    val q2 = start(run2) // new query instance, same checkpoint
    ms.addData(after); q2.processAllAvailable()
    q2.stop()

    // (a) exactly-once: restart emitted only the post-stop rows
    assert(run1.map(_.event_id).toSet == before.map(_.event_id).toSet)
    assert(run2.map(_.event_id).toSet == after.map(_.event_id).toSet)

    // (b) state recovered: combined output equals the sequential
    // recursion over the FULL series (per user)
    val got = (run1 ++ run2).map(o => o.event_id -> (o.n, o.ewm)).toMap
    for (u <- 0 until 3) {
      var y = Double.NaN; var n = 0L
      rows.filter(_.user_id == u).foreach { r =>
        y = if (n == 0) r.value else 0.3 * r.value + 0.7 * y
        n += 1
        val (gn, gy) = got(r.event_id)
        assert(gn == n, s"user $u event ${r.event_id}: n")
        assert(math.abs(gy - y) < 1e-9, s"user $u event ${r.event_id}: ewm")
      }
      // the recovered run's first row for this user must continue the
      // count (n > 1), i.e. the state genuinely crossed the restart
      val firstAfter = after.filter(_.user_id == u).map(_.event_id).min
      assert(got(firstAfter)._1 > 1, s"user $u: state lost across restart")
    }
  }

  test("Holt-Winters vector state restarted from checkpoint == one-shot recursion") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_hw").toString
    // 2 keys x 30 in-order points; m=3 so seasonal slots wrap several
    // times BEFORE the failure point — the recovered array must carry
    // mid-rotation contents, not just level/trend
    val rows = (0 until 60).map { i =>
      StreamOps.HwIn(user_id = i % 2, event_id = i, value = (i * 11 % 17) + 0.25)
    }
    val (before, after) = rows.splitAt(30)
    val ms = MemoryStream[StreamOps.HwIn]
    def start(sink: scala.collection.mutable.ArrayBuffer[StreamOps.HwPoint]) =
      StreamOps.streamingHoltWinters(ms.toDS(), m = 3)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamOps.HwPoint], _: Long) =>
          sink.synchronized { sink ++= batch.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    val run1 = scala.collection.mutable.ArrayBuffer[StreamOps.HwPoint]()
    val q1 = start(run1)
    ms.addData(before); q1.processAllAvailable()
    q1.stop() // simulated failure point
    val run2 = scala.collection.mutable.ArrayBuffer[StreamOps.HwPoint]()
    val q2 = start(run2)
    ms.addData(after); q2.processAllAvailable()
    q2.stop()
    assert(run1.map(_.event_id).toSet == before.map(_.event_id).toSet)
    assert(run2.map(_.event_id).toSet == after.map(_.event_id).toSet)
    // recovered state ⇒ combined output == one sequential recursion
    val got = (run1 ++ run2).map(o => o.event_id -> o).toMap
    for (u <- 0L until 2L) {
      var l = Double.NaN; var b = 0.0; var sv = Array.fill(3)(0.0)
      rows.filter(_.user_id == u).foreach { r =>
        if (l.isNaN) { l = r.value; b = 0.0 }
        else {
          val s1 = sv(0)
          val ln = 0.3 * (r.value - s1) + 0.7 * (l + b)
          b = 0.1 * (ln - l) + 0.9 * b
          sv = sv.drop(1) :+ (0.05 * (r.value - ln) + 0.95 * s1)
          l = ln
        }
        val o = got(r.event_id)
        assert(o.level == l && o.trend == b && o.seasonal_next == sv(0),
          s"user $u event ${r.event_id}: recovered chain diverged")
      }
    }
  }

  test("streaming dedup restarted from checkpoint still drops pre-restart keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_d").toString

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long) = Ev(id, base, id % 5, "click", id.toDouble)
    val ms = MemoryStream[Ev]
    def start(sink: scala.collection.mutable.ArrayBuffer[Long]) =
      StreamOps.dedupEvents(ms.toDF(), watermark = "30 days")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = batch.select("event_id").collect().map(_.getLong(0))
          sink.synchronized { sink ++= ids }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val run1 = scala.collection.mutable.ArrayBuffer[Long]()
    val q1 = start(run1)
    ms.addData((0L until 10L).map(ev)); q1.processAllAvailable()
    q1.stop()

    val run2 = scala.collection.mutable.ArrayBuffer[Long]()
    val q2 = start(run2)
    // replay 0..4 (must be dropped via RECOVERED dedup state) + 5 new
    ms.addData(((0L until 5L) ++ (10L until 15L)).map(ev)); q2.processAllAvailable()
    q2.stop()

    assert(run1.toSet == (0L until 10L).toSet)
    assert(run2.toSet == (10L until 15L).toSet,
      s"recovered dedup state failed: emitted ${run2.toSet}")
  }

  test("MapState heavy hitters restarted from checkpoint == one-shot counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_hh").toString

    // 2 shards x 4 items, counts must ACCUMULATE across the restart:
    // losing the MapState would reset every counter to 1
    val rows = (0 until 120).map { i =>
      StreamOps.HhIn(shard = i % 2, item = s"it${i % 4}")
    }
    val (before, after) = rows.splitAt(60)

    val ms = MemoryStream[StreamOps.HhIn]
    def start(sink: scala.collection.mutable.ArrayBuffer[StreamOps.HhOut]) =
      StreamOps.streamingHeavyHitters(ms.toDS(), k = 8)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamOps.HhOut], _: Long) =>
          sink.synchronized { sink ++= batch.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val run1 = scala.collection.mutable.ArrayBuffer[StreamOps.HhOut]()
    val q1 = start(run1)
    ms.addData(before); q1.processAllAvailable()
    q1.stop() // simulated failure point

    val run2 = scala.collection.mutable.ArrayBuffer[StreamOps.HhOut]()
    val q2 = start(run2)
    ms.addData(after); q2.processAllAvailable()
    q2.stop()

    // counts only grow: the post-restart table continues from the
    // recovered counters, so its final counts equal the one-shot run
    val finalCounts = run2.groupBy(o => (o.shard, o.item))
      .map { case (key, os) => key -> os.map(_.cnt).max }
    val expected = rows.groupBy(r => (r.shard, r.item))
      .map { case (key, rs) => key -> rs.size.toLong }
    assert(finalCounts == expected,
      s"MapState lost across restart: $finalCounts vs $expected")
    // and the first post-restart emission already sits above the
    // pre-restart totals (state crossed the boundary, not recomputed)
    val preMax = run1.map(_.cnt).max
    assert(run2.map(_.cnt).max > preMax)
  }

  test("token-budget gate restarted from checkpoint never re-admits or over-spends") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_tb").toString

    // one source, 20 docs of 100 tokens, budget 1200 → exactly the
    // first 12 admitted; the stop lands mid-budget (after 8)
    val rows = (0 until 20).map(i =>
      StreamOps.TbIn("s0", i.toLong, 100L, i.toLong))
    val (before, after) = rows.splitAt(8)

    val ms = MemoryStream[StreamOps.TbIn]
    def start(sink: scala.collection.mutable.ArrayBuffer[StreamOps.TbOut]) =
      StreamOps.streamingTokenBudget(ms.toDS(), budget = 1200L)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamOps.TbOut], _: Long) =>
          sink.synchronized { sink ++= batch.collect() }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val run1 = scala.collection.mutable.ArrayBuffer[StreamOps.TbOut]()
    val q1 = start(run1)
    ms.addData(before); q1.processAllAvailable()
    q1.stop() // failure mid-budget: 800 of 1200 tokens spent

    val run2 = scala.collection.mutable.ArrayBuffer[StreamOps.TbOut]()
    val q2 = start(run2)
    ms.addData(after); q2.processAllAvailable()
    q2.stop()

    // recovered spend: docs 8-11 admitted (cum 900..1200), 12+ rejected
    assert(run1.map(_.doc_id).sorted == (0L until 8L))
    assert(run2.map(_.doc_id).sorted == (8L until 12L),
      s"budget state lost or over-spent across restart: ${run2.map(_.doc_id).sorted}")
    assert((run1 ++ run2).map(_.n_tok).sum == 1200L)
  }
}
