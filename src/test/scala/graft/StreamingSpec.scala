package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming tier oracle (SURVEY §2.K): replay the events table through
  * MemoryStream and assert the incremental result equals the batch
  * result of the same transform on the same data. */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    // transformWithState (EWM / funnel / LSH / as-of processors)
    // requires the RocksDB state store provider
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private lazy val eventRows: Seq[Ev] = {
    import spark.implicits._
    graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq.sortBy(_.event_id)
  }

  /** Run a streaming transform over the replayed events, return the
    * complete/append result collected from a memory sink. */
  private def replay(name: String, outputMode: String)
                    (f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = f(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode(outputMode).start()
    // two micro-batches to exercise incremental state
    val (first, second) = eventRows.splitAt(eventRows.size / 2)
    ms.addData(first); q.processAllAvailable()
    ms.addData(second); q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling window agg == batch resample on the same data") {
    val streamed = replay("t_tumbling", "complete")(StreamOps.tumblingAgg(_, watermark = "30 days"))
      .select("h", "n", "sum_value").collect().map(_.toString).sorted
    import spark.implicits._
    val batch = eventRows.toDF()
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("h"), col("n"), col("sum_value"))
      .collect().map(_.toString).sorted
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming quality-model scoring equals the declared batch query (stateless row-local)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ms = MemoryStream[(Long, String)]
    val q = graft.text.TextOps
      .qualityModelScoreOf(ms.toDS().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("t_qm").outputMode("append").start()
    val (a, b) = docs.splitAt(docs.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_qm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val batch = graft.ops.Registry.queries("text_quality_model")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(streamed.nonEmpty && streamed == batch) // bit-exact
  }

  test("row-local curation passes stream bit-exactly: PII redact, lang-id, quality score") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    def roundTrip(name: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : (Seq[String], Seq[String]) = {
      val ms = MemoryStream[(Long, String)]
      val q = f(ms.toDS().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      val (a, b) = docs.splitAt(docs.size / 2)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      q.stop()
      import spark.implicits._
      val streamed = spark.table(name).collect().map(_.toString).sorted.toSeq
      val batch = f(docs.toDF("doc_id", "text")).collect().map(_.toString).sorted.toSeq
      (streamed, batch)
    }
    val (sPii, bPii) = roundTrip("t_pii")(df =>
      graft.ops.LlmOps.piiRedactOf(df, "doc_id", "text"))
    assert(sPii.nonEmpty && sPii == bPii)
    val (sLang, bLang) = roundTrip("t_lang")(df =>
      graft.text.TextOps.langIdOf(df, "doc_id", "text"))
    assert(sLang.nonEmpty && sLang == bLang)
    val (sQ, bQ) = roundTrip("t_qual")(df =>
      graft.text.TextOps.qualityOf(df, "doc_id", "text"))
    assert(sQ.nonEmpty && sQ == bQ)
    // round-15 row-local op: NFKC+casefold fuses into the stream the
    // same way (stateless select — stream == batch bit-exactly)
    val (sN, bN) = roundTrip("t_nfkc") { df =>
      import graft.api.syntax._
      df.normalizeNfkc("text", "nt").select("doc_id", "nt")
    }
    assert(sN.nonEmpty && sN == bN)
  }

  test("streaming WAV decode profile equals the batch transform bit-exactly") {
    // round 17 (round-16 verdict item 6): the decode stage of the
    // declared multimodal_wav_decode is the stateless wavProfileOf —
    // reconstructed PCM-16 samples, (n_frames, Σx², peak) int64s.
    // Stream the doc ids, build the same deterministic payload on the
    // stream, profile it, and compare against the identical batch
    // transform across a micro-batch boundary.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    def profiled(df: org.apache.spark.sql.DataFrame) =
      graft.ops.LlmOps.wavProfileOf(
        df.select(col("doc_id"),
          expr(graft.ops.LlmOps.wavPayloadSqlExpr).as("payload")),
        "doc_id", "payload")
    val ms = MemoryStream[Long]
    val q = profiled(ms.toDS().toDF("doc_id"))
      .writeStream.format("memory").queryName("t_wav").outputMode("append").start()
    val (a, b) = ids.splitAt(ids.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_wav").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val batch = profiled(ids.toDF("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // non-degenerate: real frames decoded, nonzero energy
    assert(streamed.exists(_._2 > 0) && streamed.exists(_._3 > 0))
  }

  test("streaming dedup drops the duplicate, keeps the original") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps.dedupEvents(ms.toDF(), watermark = "30 days")
      .writeStream.format("memory").queryName("t_dedup").outputMode("append").start()
    val rows = eventRows.take(10)
    ms.addData(rows); q.processAllAvailable()
    ms.addData(rows.take(3)); q.processAllAvailable() // replayed duplicates
    q.stop()
    assert(spark.table("t_dedup").count() == 10)
  }

  test("session windows equal the batch sessionize session count") {
    val streamed = replay("t_session", "complete")(
      df => StreamOps.sessionAgg(df.filter(col("user_id") < 10), gap = "30 minutes", watermark = "30 days"))
    // batch twin: declared ts_sessionize (oracle-checked) on same sf
    val batch = ops.Registry.queries("ts_sessionize")(spark, TestSpark.sfSmoke)
    assert(streamed.count() == batch.count())
    // and per-user event totals agree
    val sCounts = streamed.groupBy("user_id").agg(sum("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bCounts = batch.groupBy("user_id").agg(sum("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sCounts == bCounts)
  }

  test("stream-stream interval join matches the batch join") {
    val streamed = replay("t_ssjoin", "append")(StreamOps.purchaseClickJoin)
      .select("p_id", "c_ts").collect().map(_.toString).sorted
    import spark.implicits._
    val ev = eventRows.toDF()
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value").as("click_value"))
    val batch = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select("p_id", "c_ts").collect().map(_.toString).sorted
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming as-of equals the batch as-of join (state across batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def usOf(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val inRows = eventRows
      .filter(e => e.event_type == "purchase" || e.event_type == "click")
      .map(e => StreamOps.AsofIn(e.user_id, usOf(e.ts),
        if (e.event_type == "click") 0 else 1, e.event_id, e.value))
      .sortBy(r => (r.ts_us, r.tag)) // event-time arrival order
    val ms = MemoryStream[StreamOps.AsofIn]
    val q = StreamOps.streamingAsof(ms.toDS())
      .writeStream.format("memory").queryName("t_asof").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // frontier must survive the batch boundary
    q.stop()
    val streamed = spark.table("t_asof").collect()
      .map(r => r.getLong(1) -> (
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
      .toMap

    val ev = eventRows.toDF()
    val batch = graft.ts.AsofJoin.backward(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value")),
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .select(col("event_id"), unix_micros(col("matched_ts")).as("mts"), col("click_value"))
      .collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming funnel final state equals the batch per-user stage mins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def usOf(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val inRows = eventRows.map(e => StreamOps.FunnelIn(e.user_id, e.event_type, usOf(e.ts)))
    val ms = MemoryStream[StreamOps.FunnelIn]
    val q = StreamOps.streamingFunnel(ms.toDS())
      .writeStream.format("memory").queryName("t_funnel").outputMode("append").start()
    // deliberately shuffled arrival order: min-state needs no ordering
    val shuffled = new scala.util.Random(3).shuffle(inRows)
    val (a, b) = shuffled.splitAt(shuffled.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    q.stop()
    // LAST emission per user = final state
    val streamed = spark.table("t_funnel").collect().zipWithIndex
      .groupBy(_._1.getLong(0)).map { case (u, rs) =>
        val r = rs.maxBy(_._2)._1
        u -> (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
      }
    val batch = eventRows.toDF()
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("s"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("c"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("p"))
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
      }.toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming LSH candidates equal the batch LSH candidate pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val banded = graft.text.NearDup.bandedSignatures(spark, TestSpark.sfSmoke)
      .collect().map(r => StreamOps.SigIn(r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(_.doc_id)
    val ms = MemoryStream[StreamOps.SigIn]
    val q = StreamOps.streamingLshCandidates(ms.toDS())
      .writeStream.format("memory").queryName("t_lsh").outputMode("append").start()
    val (a, b) = banded.splitAt(banded.length / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // bucket state crosses the batch boundary
    q.stop()
    val streamed = spark.table("t_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bandsDf = graft.text.NearDup.bandedSignatures(spark, TestSpark.sfSmoke)
    val batch = bandsDf.select(col("doc_id").as("a"), col("band"), col("bucket"))
      .join(bandsDf.select(col("doc_id").as("b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming substring candidates equal the batch digest-sharing pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // raw documents stream in; digests explode row-locally inside the
    // transform — with the cap above every bucket's occupancy, the
    // emitted pair set must equal the UNCAPPED batch candidate set
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
    val inRows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val ms = MemoryStream[(Long, String)]
    val q = StreamOps.streamingSubstringCandidates(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        k = 10, maxPerBucket = 10000)
      .writeStream.format("memory").queryName("t_sub").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // bucket occupants cross the boundary
    q.stop()
    val streamed = spark.table("t_sub").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.ops.CurationOps
      .substringDupsOf(docs, "doc_id", "text", k = 10, maxDf = 10000)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("the funnel StatefulProcessor runs as a BATCH query and equals the batch agg") {
    import spark.implicits._
    spark.streams.active // StateStoreCoordinator endpoint (batch tWS needs it)
    val in = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[StreamOps.FunnelIn]
    val got = StreamOps.streamingFunnel(in).toDF().collect()
      .map(r => r.getLong(0) ->
        (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      .toMap
    val expected = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("s"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("c"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("p"))
      .collect().map(r => r.getLong(0) ->
        (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      .toMap
    assert(got.nonEmpty && got == expected)
  }

  test("event-time timer evicts idle as-of state; active keys match the non-evicting processor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // b1: user 1 click then purchase (matches). b2/b3: user 2 activity
    // ~115 days later pushes the watermark far past user 1's idle timer
    // (1 h). b4: user 1 purchase after the gap.
    val b1 = Seq(StreamOps.AsofInT(1L, ts(1000000L), 0, 0L, 5.0),
                 StreamOps.AsofInT(1L, ts(1060000L), 1, 100L, 0.0))
    val b2 = Seq(StreamOps.AsofInT(2L, ts(10000000000L), 0, 0L, 9.0))
    val b3 = Seq(StreamOps.AsofInT(2L, ts(10000100000L), 0, 0L, 9.5))
    val b4 = Seq(StreamOps.AsofInT(1L, ts(11000000000L), 1, 200L, 0.0))
    val ms1 = MemoryStream[StreamOps.AsofInT]
    val q = StreamOps.streamingAsofEvicting(ms1.toDS(), "0 seconds", 3600000L)
      .writeStream.format("memory").queryName("t_asof_evict").outputMode("append").start()
    Seq(b1, b2, b3, b4).foreach { b => ms1.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("t_asof_evict").collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // while the key is active, frontier semantics are unchanged
    assert(got(100L) == Some(1000000L * 1000))
    // after the idle gap the frontier was evicted: NULL, not the stale click
    assert(got(200L) == None)

    // the SAME rows through the non-evicting processor keep the stale match
    val ms2 = MemoryStream[StreamOps.AsofIn]
    val q2 = StreamOps.streamingAsof(ms2.toDS())
      .writeStream.format("memory").queryName("t_asof_noevict").outputMode("append").start()
    Seq(b1, b2, b3, b4).foreach { b =>
      ms2.addData(b.map(r =>
        StreamOps.AsofIn(r.user_id, r.ts.getTime * 1000, r.tag, r.event_id, r.value)))
      q2.processAllAvailable()
    }
    q2.stop()
    val got2 = spark.table("t_asof_noevict").collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got2(100L) == Some(1000000L * 1000))
    assert(got2(200L) == Some(1000000L * 1000))
  }

  test("transformWithState running EWM carries state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamOps.EventRow]
    val rows = eventRows.filter(_.user_id == 7).map(e =>
      StreamOps.EventRow(e.event_id, e.user_id, e.value))
    val q = StreamOps.runningEwm(ms.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("t_ewm").outputMode("append").start()
    val (a, b) = rows.splitAt(rows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_ewm").collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // reference: sequential recursive EWM over the full series
    var y = Double.NaN
    val expected = rows.map { r =>
      y = if (y.isNaN) r.value else 0.5 * r.value + 0.5 * y
      r.event_id -> y
    }.toMap
    assert(streamed.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(math.abs(streamed(k) - v) < 1e-9, s"event $k") }
  }

  test("streaming gap report equals the declared batch ts_gap_report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def usOf(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val inRows = eventRows.filter(_.user_id < 10)
      .map(e => StreamOps.GapIn(e.user_id, e.event_id, usOf(e.ts)))
      .sortBy(r => (r.ts_us, r.event_id)) // event-time arrival order
    val ms = MemoryStream[StreamOps.GapIn]
    val q = StreamOps.streamingGapReport(ms.toDS(), thresholdUs = 3600000000L)
      .writeStream.format("memory").queryName("t_gaps").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // frontier must survive the batch boundary
    q.stop()
    val streamed = spark.table("t_gaps")
      .select("event_id", "gap_start_us", "gap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = graft.ops.Registry.queries("ts_gap_report")(spark, TestSpark.sfSmoke)
      .select(col("event_id"), unix_micros(col("gap_start").cast("timestamp")).as("gs"),
        col("gap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming rolling-20 anomaly equals the declared batch ts_anomaly_flag EXACTLY") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val inRows = eventRows.filter(_.user_id < 10)
      .map(e => StreamOps.AnomIn(e.user_id, e.event_id, e.value))
      .sortBy(_.event_id)
    val ms = MemoryStream[StreamOps.AnomIn]
    val q = StreamOps.streamingAnomaly(ms.toDS())
      .writeStream.format("memory").queryName("t_anom").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // ring buffer crosses the batch boundary
    q.stop()
    val streamed = spark.table("t_anom")
      .select("event_id", "z", "is_anomaly").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val batch = ops.Registry.queries("ts_anomaly_flag")(spark, TestSpark.sfSmoke)
      .select("event_id", "z", "is_anomaly").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed.nonEmpty && streamed == batch) // bit-exact, incl. the r4'd z
  }

  test("streaming burstiness snapshots converge to the declared batch ts_burstiness") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val inRows = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS tsUs")
      .as[StreamOps.BurstIn].collect().toSeq
      .sortBy(r => (r.tsUs, r.event_id)) // per-key in-order feed = the contract
    val ms = MemoryStream[StreamOps.BurstIn]
    val q = StreamOps.streamingBurstiness(ms.toDS())
      .writeStream.format("memory").queryName("t_burst").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // gap state crosses the boundary
    q.stop()
    // n_gaps grows monotonically: each key's max-n_gaps emission is final
    val streamed = spark.table("t_burst").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    val batch = graft.ops.Registry.queries("ts_burstiness")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(streamed.nonEmpty && streamed == batch) // bit-exact incl. both r4s
  }

  test("streaming Page CUSUM equals the declared batch query row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch op runs on user 7 with the exact-decimal series mean
    val mu = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") === 7)
      .agg((org.apache.spark.sql.functions.sum(
          col("value").cast("decimal(18,2)")).cast("double") /
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).as("mu"))
      .head().getDouble(0)
    val inRows = eventRows.filter(_.user_id == 7)
      .map(e => StreamOps.PageIn(e.user_id, e.event_id, e.value))
      .sortBy(_.event_id)
    val ms = MemoryStream[StreamOps.PageIn]
    val q = StreamOps.streamingPageCusum(ms.toDS(), Map(7L -> mu))
      .writeStream.format("memory").queryName("t_page").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // S+/S- cross the boundary
    q.stop()
    val streamed = spark.table("t_page").collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    val batch = graft.ops.Registry.queries("ts_cusum_page")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(streamed.nonEmpty && streamed == batch) // bit-exact
  }

  test("streaming Holt-Winters equals the declared batch keyed query row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val inRows = eventRows.filter(_.user_id < 10)
      .map(e => StreamOps.HwIn(e.user_id, e.event_id, e.value))
      .sortBy(_.event_id) // per-key in-order feed = the contract
    val ms = MemoryStream[StreamOps.HwIn]
    val q = StreamOps.streamingHoltWinters(ms.toDS())
      .writeStream.format("memory").queryName("t_hw").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // vector state crosses the boundary
    q.stop()
    val streamed = spark.table("t_hw").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val batch = graft.ops.Registry.queries("ts_holt_winters_keyed")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(streamed.nonEmpty && streamed == batch) // bit-exact, all four columns
  }

  test("streaming Kalman local-level equals the declared batch query bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val inRows = eventRows.filter(_.user_id == 7)
      .map(e => StreamOps.KalIn(e.user_id, e.event_id, e.value))
      .sortBy(_.event_id) // per-key in-order feed = the contract
    val ms = MemoryStream[StreamOps.KalIn]
    val q = StreamOps.streamingKalmanLevel(ms.toDS())
      .writeStream.format("memory").queryName("t_kal").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // (l, p) crosses the boundary
    q.stop()
    val streamed = spark.table("t_kal").collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val batch = graft.ops.Registry.queries("ts_kalman_level")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(streamed.nonEmpty && streamed == batch) // bit-exact
  }

  test("streaming CUSUM drift detector equals the declared batch ts_cusum_flag EXACTLY") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch-computed baseline the processor would get broadcast
    val baseline = graft.ops.Registry.queries("ts_cusum_flag") // warm the same path
    val stats = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("value").cast("decimal(18,2)"))
          .as("s_dec"), // kept DECIMAL: the processor needs exact cents
        org.apache.spark.sql.functions.sum(
          (org.apache.spark.sql.functions.col("value").cast("decimal(18,2)") *
            org.apache.spark.sql.functions.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,4)")).cast("double").as("q"))
      .collect().map { r =>
        val n = r.getLong(1)
        val sDec = r.getDecimal(2)
        val sCents = sDec.movePointRight(2).longValueExact()
        val s = sDec.doubleValue
        val q = r.getDouble(3)
        r.getLong(0) -> StreamOps.CusumBase(
          n, sCents, math.sqrt((q - s * s / n) / (n - 1)))
      }.toMap
    val inRows = eventRows.map(e => StreamOps.CusumIn(e.user_id, e.event_id, e.value))
    val ms = MemoryStream[StreamOps.CusumIn]
    val q = StreamOps.streamingCusum(ms.toDS(), stats)
      .writeStream.format("memory").queryName("t_cusum").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // state crosses the batch boundary
    q.stop()
    val streamed = spark.table("t_cusum").collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val batch = baseline(spark, TestSpark.sfSmoke).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(streamed.nonEmpty && streamed == batch) // bit-exact incl. the r4'd dev
  }

  test("streaming token-budget gate == batch sample_token_budget when fed in the batch order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch query's admission order IS the contract: feed the
    // stream in (shuf, doc_id) order and assert the identical set
    val inRows = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tok"),
        ((col("doc_id") * 2654435761L) % 4294967296L).as("shuf"))
      .as[StreamOps.TbIn].collect().toSeq.sortBy(r => (r.shuf, r.doc_id))
    val ms = MemoryStream[StreamOps.TbIn]
    val q = StreamOps.streamingTokenBudget(ms.toDS(), budget = 1500L)
      .writeStream.format("memory").queryName("t_tb").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // running totals cross the boundary
    q.stop()
    val streamed = spark.table("t_tb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.ops.Registry.queries("sample_token_budget")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming BPE token-budget gate == batch sample_token_budget_bpe in batch order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // raw documents stream in the batch's admission order; the gate
    // computes BPE counts ROW-LOCALLY (Bpe.docTokExpr — no join on a
    // stream) and must admit exactly the batch query's set
    val inRows = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .select(col("source"), col("doc_id"), col("text"),
        ((col("doc_id") * 2654435761L) % 4294967296L).as("shuf"))
      .as[(String, Long, String, Long)].collect().toSeq
      .sortBy { case (_, id, _, shuf) => (shuf, id) }
    val ms = MemoryStream[(String, Long, String, Long)]
    val q = StreamOps.streamingBpeTokenBudget(
        ms.toDF().toDF("source", "doc_id", "text", "shuf"),
        "source", "doc_id", "text", budget = 5000L)
      .writeStream.format("memory").queryName("t_tbb").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // spend crosses the boundary
    q.stop()
    val streamed = spark.table("t_tbb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.ops.Registry.queries("sample_token_budget_bpe")(spark, TestSpark.sfSmoke)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming heavy hitters (MapState space-saving, k >= distinct) == batch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val inRows = eventRows
      .map(e => StreamOps.HhIn(e.user_id % 4, e.event_type))
    val ms = MemoryStream[StreamOps.HhIn]
    val q = StreamOps.streamingHeavyHitters(ms.toDS(), k = 8)
      .writeStream.format("memory").queryName("t_hh").outputMode("append").start()
    val (a, b) = inRows.splitAt(inRows.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable() // counters persist across batches
    q.stop()
    // counts only grow: max per (shard, item) over all emissions = final
    val streamed = spark.table("t_hh").groupBy("shard", "item")
      .agg(max("cnt").as("cnt")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = inRows.groupBy(r => (r.shard, r.item))
      .map { case (key, rs) => key -> rs.size.toLong }
    assert(streamed == batch) // 5 distinct items < k=8 -> sketch is exact
  }

  test("space-saving eviction keeps the true top item with k < distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one shard, skewed: 'hot' = 60% of the stream, 4 cold items
    val items = (0 until 200).map { i =>
      StreamOps.HhIn(0L, if (i % 5 < 3) "hot" else s"cold${i % 4}")
    }
    val ms = MemoryStream[StreamOps.HhIn]
    val q = StreamOps.streamingHeavyHitters(ms.toDS(), k = 3)
      .writeStream.format("memory").queryName("t_hh_evict").outputMode("append").start()
    ms.addData(items); q.processAllAvailable()
    q.stop()
    val finalTable = spark.table("t_hh_evict").groupBy("item")
      .agg(max("cnt").as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the space-saving guarantee: an item with true count > n/k stays
    assert(finalTable.contains("hot"), s"hot item evicted: $finalTable")
    // overestimate bound: tracked count >= true count
    assert(finalTable("hot") >= 120L, s"hot undercounted: ${finalTable("hot")}")
  }
}
