package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** §2.K Structured Streaming surface: the TSDB ingest/derive loop
  * expressed as incremental queries. Every transform here is defined on
  * a plain DataFrame so the SAME function serves batch and streaming
  * inputs — StreamingSpec replays the `events` table through
  * MemoryStream and asserts stream output == the batch result, which is
  * this tier's oracle (the driver's Verify loop is batch-only).
  *
  * Scale: streaming state lives in per-partition state stores keyed by
  * the groupBy key — the same shuffle key discipline as the batch ops;
  * watermarks bound state size for out-of-order data.
  */
object StreamOps {

  /** File-source ingest of an events directory (TSDB append stream). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(
      spark.read.parquet(dir).schema).parquet(dir)

  /** Streaming INGEST into the TSDB store layout: append the stream to
    * a day-partitioned parquet store — exactly-once via the file
    * sink's commit log + `checkpointLocation`, so a crashed/restarted
    * query never duplicates a batch. Partitions by `event_date =
    * to_date(tsCol)` (the graft.store.TsdbStore layout: the day
    * directory is the index; batch readers prune on it), so continuous
    * ingest appends only to the current day's directory while
    * [[graft.store.TsdbStore.latestByKey]]/compact resolve versions
    * downstream. Returns the started query; StoreSpec proves the
    * landed layout equals the batch write of the same rows. */
  def ingestToStore(events: DataFrame, tsCol: String, path: String,
                    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("event_date", org.apache.spark.sql.functions.to_date(col(tsCol)))
      .writeStream.format("parquet")
      .partitionBy("event_date")
      .option("path", path).option("checkpointLocation", checkpoint)
      .outputMode("append").start()

  /** Tumbling-window count/sum — the incremental twin of
    * ts_resample_agg. */
  def tumblingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("h"), col("n"), col("sum_value"))

  /** Sliding 1h window every 15 min. */
  def slidingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** Gap-based session windows (streaming twin of ts_sessionize). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("t_start"),
        col("n_events"), col("sum_value"))

  /** Exactly-once-per-key semantics of TSDB append. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases enriched with clicks from
    * the preceding hour (watermarked on both sides so state is bounded). */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("click_value"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
  }

  /** Per-key running state (count + EWM) — the custom-stateful
    * extension point (§2.K "stateful custom") on Spark 4's
    * `transformWithState` API ([[StatefulProcessor]] + typed
    * [[ValueState]]; requires the RocksDB state store provider,
    * `spark.sql.streaming.stateStore.providerClass`). */
  case class EventRow(event_id: Long, user_id: Long, value: Double)
  case class RunState(n: Long, ewm: Double)
  case class RunOut(user_id: Long, event_id: Long, n: Long, ewm: Double)

  private class EwmProcessor(alpha: Double)
      extends StatefulProcessor[Long, EventRow, RunOut] {
    @transient private var state: ValueState[RunState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunState](
        "run", Encoders.product[RunState], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[EventRow], tv: TimerValues): Iterator[RunOut] = {
      // event-time order within the group: micro-batches preserve
      // arrival order; tests feed data in event_id order
      var st = if (state.exists()) state.get() else RunState(0L, 0.0)
      val out = rows.toSeq.sortBy(_.event_id).map { r =>
        val ewm = if (st.n == 0) r.value else alpha * r.value + (1 - alpha) * st.ewm
        st = RunState(st.n + 1, ewm)
        RunOut(user, r.event_id, st.n, st.ewm)
      }
      state.update(st)
      out.iterator
    }
  }

  def runningEwm(events: Dataset[EventRow], alpha: Double): Dataset[RunOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new EwmProcessor(alpha), TimeMode.None(), OutputMode.Append())
  }

  /** Streaming funnel state: per-user FIRST timestamp of each stage,
    * updated incrementally (min is idempotent/commutative, so arrival
    * order never matters — no ordering assumption unlike the asof).
    * Emits the user's current stage row on every update; the LAST
    * emission per user equals the batch ts_funnel per-user aggregate.
    * One state row per user. */
  case class FunnelIn(user_id: Long, event_type: String, ts_us: Long)
  case class FunnelState(signup: Option[Long], click: Option[Long], purchase: Option[Long])
  case class FunnelOut(user_id: Long,
      t_signup: Option[Long], t_click: Option[Long], t_purchase: Option[Long])

  private class FunnelProcessor
      extends StatefulProcessor[Long, FunnelIn, FunnelOut] {
    @transient private var state: ValueState[FunnelState] = _
    private def minOpt(a: Option[Long], b: Option[Long]): Option[Long] = (a, b) match {
      case (Some(x), Some(y)) => Some(math.min(x, y))
      case _ => a.orElse(b)
    }
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState](
        "funnel", Encoders.product[FunnelState], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[FunnelIn], tv: TimerValues): Iterator[FunnelOut] = {
      var st = if (state.exists()) state.get() else FunnelState(None, None, None)
      rows.foreach { r =>
        val t = Some(r.ts_us)
        r.event_type match {
          case "signup"   => st = st.copy(signup = minOpt(st.signup, t))
          case "click"    => st = st.copy(click = minOpt(st.click, t))
          case "purchase" => st = st.copy(purchase = minOpt(st.purchase, t))
          case _          => ()
        }
      }
      state.update(st)
      Iterator.single(FunnelOut(user, st.signup, st.click, st.purchase))
    }
  }

  def streamingFunnel(events: Dataset[FunnelIn]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Streaming LSH near-dup candidates: the incremental half of the
    * MinHash+LSH dedup plan ("dedup the incoming crawl against
    * everything seen so far"). Keyed by (band, bucket); state = the doc
    * ids already seen in that bucket (capped — a pathological bucket
    * stops emitting pairs instead of exploding state); each arriving
    * doc emits a candidate pair against every prior occupant. Exact
    * verification stays downstream, identical to the batch path.
    * One state row per non-empty bucket — the same O(docs·bands)
    * budget as the batch shuffle. */
  case class SigIn(doc_id: Long, band: Int, bucket: String)
  case class CandPair(a: Long, b: Long)

  private class LshProcessor(maxPerBucket: Int)
      extends StatefulProcessor[(Int, String), SigIn, CandPair] {
    // the bucket's occupants as a typed ListState — element-level state
    // the old GroupState API had to round-trip through one blob
    @transient private var seenState: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seenState = getHandle.getListState[Long](
        "seen", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        key: (Int, String), rows: Iterator[SigIn], tv: TimerValues): Iterator[CandPair] = {
      var seen: List[Long] = if (seenState.exists()) seenState.get().toList else Nil
      val out = List.newBuilder[CandPair]
      var changed = false
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (!seen.contains(r.doc_id)) {
          if (seen.size < maxPerBucket)
            seen.foreach(s => out += CandPair(math.min(s, r.doc_id), math.max(s, r.doc_id)))
          seen = (r.doc_id :: seen).take(maxPerBucket) // full bucket rotates, stops emitting
          changed = true
        }
      }
      if (changed) seenState.put(seen.toArray)
      out.result().iterator
    }
  }

  def streamingLshCandidates(sigs: Dataset[SigIn],
                             maxPerBucket: Int = 64): Dataset[CandPair] = {
    import sigs.sparkSession.implicits._
    sigs.groupByKey(r => (r.band, r.bucket))
      .transformWithState(new LshProcessor(maxPerBucket),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming EXACT-substring near-dup candidates — the live twin of
    * the declared dedup_substring_exact's candidate stage: each
    * arriving document explodes its stride-1 `k`-word window digests
    * ROW-LOCALLY (no shuffle before the keyBy), and every digest
    * bucket runs the same capped-occupants [[LshProcessor]] (the
    * digest IS the bucket — band 0), emitting each digest-sharing doc
    * pair exactly once across micro-batch boundaries. State: ≤
    * `maxPerBucket` int64 occupants per live digest. Exact Jaccard /
    * span verification stays a batch job over candidates, as in the
    * batch pipeline. */
  def streamingSubstringCandidates(docs: DataFrame, idCol: String,
                                   textCol: String, k: Int = 10,
                                   maxPerBucket: Int = 50): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    require(k >= 2, s"k must be >= 2, got $k")
    val sigs = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_ws"))
      .filter(size(col("_ws")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(_ws) - ${k - 1}), i -> array_join(slice(_ws, i, $k), ' '))"))
        .as("_kg"))
      .select(col("doc_id"), lit(0).as("band"),
        expr(graft.text.TextOps.tokenNumExpr60("_kg")).cast("string").as("bucket"))
      .as[SigIn]
    streamingLshCandidates(sigs, maxPerBucket)
  }

  /** Streaming backward as-of: the flagship TSDB enrichment running
    * incrementally. Build rows (tag 0) update per-key state (latest
    * build ts + payload); probe rows (tag 1) emit themselves enriched
    * with the CURRENT state — exactly merge_asof backward semantics
    * when rows arrive in event-time order per key (within a micro-batch
    * the group is sorted by (ts, tag), so build-before-probe at equal
    * ts holds; across batches the state store carries the frontier).
    * State is one row per key — bounded regardless of stream length. */
  case class AsofIn(user_id: Long, ts_us: Long, tag: Int, event_id: Long, value: Double)
  case class AsofState(ts_us: Long, value: Double)
  case class AsofOut(user_id: Long, event_id: Long,
      matched_ts_us: Option[Long], matched_value: Option[Double])

  private class AsofProcessor
      extends StatefulProcessor[Long, AsofIn, AsofOut] {
    @transient private var state: ValueState[AsofState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[AsofState](
        "frontier", Encoders.product[AsofState], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[AsofIn], tv: TimerValues): Iterator[AsofOut] = {
      var st = if (state.exists()) state.get() else null
      val out = Seq.newBuilder[AsofOut]
      rows.toSeq.sortBy(r => (r.ts_us, r.tag)).foreach { r =>
        if (r.tag == 0) st = AsofState(r.ts_us, r.value)
        else out += AsofOut(user, r.event_id,
          Option(st).map(_.ts_us), Option(st).map(_.value))
      }
      if (st != null) state.update(st)
      out.result().iterator
    }
  }

  def streamingAsof(events: Dataset[AsofIn]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new AsofProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Timestamped variant of [[AsofIn]] for the evicting as-of (event
    * time must be a real column so the query can carry a watermark). */
  case class AsofInT(user_id: Long, ts: java.sql.Timestamp, tag: Int,
      event_id: Long, value: Double)

  /** As-of frontier with IDLE-STATE EVICTION — the bounded-state form
    * for unbounded key spaces (at 100 TB of stream history, keys that
    * went quiet must leave the store). An event-time timer is re-armed
    * on every update at watermark + idleTimeout; when it fires,
    * [[StatefulProcessor.handleExpiredTimer]] clears the key's state,
    * so a probe arriving after a long gap matches NULL instead of a
    * stale frontier. Equivalence with the non-evicting processor while
    * keys stay active — and the NULL-after-eviction divergence — are
    * both asserted in StreamingSpec. */
  private class EvictingAsofProcessor(idleTimeoutMs: Long)
      extends StatefulProcessor[Long, AsofInT, AsofOut] {
    @transient private var state: ValueState[AsofState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[AsofState](
        "frontier", Encoders.product[AsofState], TTLConfig.NONE)
    private def usOf(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    override def handleInputRows(
        user: Long, rows: Iterator[AsofInT], tv: TimerValues): Iterator[AsofOut] = {
      var st = if (state.exists()) state.get() else null
      val out = Seq.newBuilder[AsofOut]
      rows.toSeq.sortBy(r => (usOf(r.ts), r.tag)).foreach { r =>
        if (r.tag == 0) st = AsofState(usOf(r.ts), r.value)
        else out += AsofOut(user, r.event_id,
          Option(st).map(_.ts_us), Option(st).map(_.value))
      }
      if (st != null) state.update(st)
      // re-arm the idle timer relative to the stream's event-time
      // frontier: one live timer per key
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(tv.getCurrentWatermarkInMs() + idleTimeoutMs)
      out.result().iterator
    }
    override def handleExpiredTimer(
        user: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[AsofOut] = {
      state.clear()
      Iterator.empty
    }
  }

  def streamingAsofEvicting(events: Dataset[AsofInT], watermarkDelay: String,
                            idleTimeoutMs: Long): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay).as[AsofInT]
      .groupByKey(_.user_id)
      .transformWithState(new EvictingAsofProcessor(idleTimeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class GapIn(user_id: Long, event_id: Long, ts_us: Long)
  case class GapOut(user_id: Long, event_id: Long,
      gap_start_us: Long, gap_end_us: Long, gap_us: Long)

  /** Streaming twin of the declared `ts_gap_report`: the per-key state
    * is ONE int64 (the last-seen event time); each arriving event
    * whose distance from that frontier exceeds the threshold emits a
    * gap row — live data-quality monitoring of an ingest stream.
    * In-order per key (TimeMode.None, the streamingAsof discipline);
    * the EvictingAsofProcessor's event-time-timer device applies
    * unchanged when idle keys must leave the store. Intra-batch rows
    * sort by event_id — the SAME order the declared batch twin's
    * lag() window uses — so stream==batch holds by construction even
    * if event-time order ever diverges from event_id order. */
  private class GapProcessor(thresholdUs: Long)
      extends StatefulProcessor[Long, GapIn, GapOut] {
    @transient private var last: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long](
        "last_ts", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[GapIn], tv: TimerValues): Iterator[GapOut] = {
      var prev = if (last.exists()) last.get() else Long.MinValue
      val out = Seq.newBuilder[GapOut]
      rows.toSeq.sortBy(_.event_id).foreach { r =>
        if (prev != Long.MinValue && r.ts_us - prev > thresholdUs)
          out += GapOut(user, r.event_id, prev, r.ts_us, r.ts_us - prev)
        prev = r.ts_us
      }
      if (prev != Long.MinValue) last.update(prev)
      out.result().iterator
    }
  }

  def streamingGapReport(events: Dataset[GapIn], thresholdUs: Long): Dataset[GapOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new GapProcessor(thresholdUs),
        TimeMode.None(), OutputMode.Append())
  }

  /** Rolling-window custom state: the incremental twin of the declared
    * ts_anomaly_flag (rolling-20 z-score anomaly). State per key is a
    * bounded ring buffer — the last 19 values as a [[ListState]] — so
    * state size is O(window), not O(stream). The arithmetic replicates
    * the batch op's §2.0 determinism device bit-for-bit: per-window
    * sums as exact scale-2/scale-4 BigDecimals (== the batch
    * decimal(18,2)/decimal(38,4) window sums), then the identical
    * IEEE mean/std/z expressions, HALF_UP 4-dp on z (== Spark round).
    * StreamingSpec asserts stream output == batch output EXACTLY. */
  case class AnomIn(user_id: Long, event_id: Long, value: Double)
  case class AnomOut(user_id: Long, event_id: Long, z: Double, is_anomaly: Boolean)

  private class AnomalyProcessor
      extends StatefulProcessor[Long, AnomIn, AnomOut] {
    @transient private var buf: ListState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[Double](
        "win", Encoders.scalaDouble, TTLConfig.NONE)
    private def d2(v: Double) =
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(2, java.math.RoundingMode.HALF_UP)
    override def handleInputRows(
        user: Long, rows: Iterator[AnomIn], tv: TimerValues): Iterator[AnomOut] = {
      var window: Vector[Double] = buf.get().toVector // ≤19 prior values
      val out = rows.toSeq.sortBy(_.event_id).flatMap { r =>
        val full = window :+ r.value
        window = full.takeRight(19)
        if (full.size < 20) None
        else {
          val sx = full.map(d2).reduce(_ add _).doubleValue
          val sxx = full.map { x => val d = d2(x); d.multiply(d) }
            .reduce(_ add _).doubleValue
          val m = sx / 20.0
          val sd = math.sqrt((sxx - sx * sx / 20.0) / 19.0)
          val z = (r.value - m) / sd
          val zr = new java.math.BigDecimal(java.lang.Double.toString(z))
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
          Some(AnomOut(user, r.event_id, zr, math.abs(r.value - m) > 3.0 * sd))
        }
      }
      buf.clear()
      if (window.nonEmpty) buf.put(window.toArray)
      out.iterator
    }
  }

  def streamingAnomaly(events: Dataset[AnomIn]): Dataset[AnomOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Streaming CUSUM drift detector — the live twin of the declared
    * ts_cusum_flag: per key ONE (count, cumsum) pair of int64s as
    * ValueState (the cumsum in exact 2-dp CENTS, so state is 16 bytes
    * per key forever and the sum is order/batch-boundary-independent
    * — the streaming spelling of the batch op's exact-decimal cumsum
    * device). The baseline (n, Σvalue in cents, σ) is batch-computed
    * and passed in (a real deployment broadcasts yesterday's stats).
    * Deviation replicates the batch op's EXACT-NUMERATOR device: dev
    * = (cusum·n − i·Σ)/n with the numerator in exact int64 cents →
    * one BigDecimal→double conversion (== the batch decimal cast) →
    * one double division — bit-identical to the batch plan, no
    * rounding anywhere (§2.0: rounding identical doubles is what
    * SPLITS engines on half-ties). StreamingSpec asserts stream ==
    * batch EXACTLY. */
  case class CusumIn(user_id: Long, event_id: Long, value: Double)
  case class CusumOut(user_id: Long, event_id: Long, cusum_dev: Double, drift: Boolean)
  case class CusumState(n: Long, cents: Long)
  case class CusumBase(n: Long, sumCents: Long, sd: Double)

  private class CusumProcessor(baseline: Map[Long, CusumBase])
      extends StatefulProcessor[Long, CusumIn, CusumOut] {
    @transient private var st: ValueState[CusumState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState](
        "cusum", Encoders.product[CusumState], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[CusumIn], tv: TimerValues): Iterator[CusumOut] = {
      val base = baseline(user)
      var s = Option(st.get()).getOrElse(CusumState(0L, 0L))
      val out = rows.toSeq.sortBy(_.event_id).map { r =>
        val cents = new java.math.BigDecimal(java.lang.Double.toString(r.value))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        s = CusumState(s.n + 1, s.cents + cents)
        // exact int64 numerator in cents == the batch decimal(·,2)
        // numerator; one conversion + one division, as in the plan
        val numCents = s.cents * base.n - s.n * base.sumCents
        val dev = java.math.BigDecimal.valueOf(numCents, 2).doubleValue / base.n.toDouble
        CusumOut(user, r.event_id, dev,
          math.abs(dev) > 3.0 * base.sd * math.sqrt(s.n.toDouble))
      }
      st.update(s)
      out.iterator
    }
  }

  def streamingCusum(events: Dataset[CusumIn],
                     baseline: Map[Long, CusumBase]): Dataset[CusumOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new CusumProcessor(baseline),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming BURSTINESS — live twin of the declared ts_burstiness:
    * per key, 32 bytes of state forever (last-arrival µs + gap count +
    * Σgap + Σgap², all int64 — gaps in whole seconds stay EXACT). Each
    * batch emits the key's current (n_gaps, mean_gap_s, cv_gap)
    * snapshot through the declared query's closed form (same HALF_UP
    * 4-dp rounds). Fed per-key in (ts, event_id) order — the
    * deployment contract, as for the token-budget gate — n_gaps grows
    * monotonically, so each key's max-n_gaps emission equals the
    * batch ts_burstiness row bit-for-bit (StreamingSpec). */
  case class BurstIn(user_id: Long, event_id: Long, tsUs: Long)
  case class BurstOut(user_id: Long, n_gaps: Long, mean_gap_s: Double,
                      cv_gap: Double)
  case class BurstState(lastUs: Long, n: Long, sg: Long, sq: Long)

  private class BurstinessProcessor
      extends StatefulProcessor[Long, BurstIn, BurstOut] {
    @transient private var st: ValueState[BurstState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BurstState](
        "burst", Encoders.product[BurstState], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[BurstIn], tv: TimerValues): Iterator[BurstOut] = {
      var s = Option(st.get()).getOrElse(BurstState(Long.MinValue, 0L, 0L, 0L))
      rows.toSeq.sortBy(r => (r.tsUs, r.event_id)).foreach { r =>
        if (s.lastUs != Long.MinValue) {
          // gaps are non-negative under the in-order contract, so
          // truncating division == the declared query's `div`
          val gap = (r.tsUs - s.lastUs) / 1000000L
          s = BurstState(r.tsUs, s.n + 1, s.sg + gap, s.sq + gap * gap)
        } else s = s.copy(lastUs = r.tsUs)
      }
      st.update(s)
      if (s.n >= 2) {
        def r4(x: Double) = java.math.BigDecimal.valueOf(x)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
        val (n, sg, sq) = (s.n.toDouble, s.sg.toDouble, s.sq.toDouble)
        Iterator.single(BurstOut(user, s.n, r4(sg / n),
          r4(math.sqrt((sq - sg * sg / n) / (n - 1)) / (sg / n))))
      } else Iterator.empty
    }
  }

  def streamingBurstiness(events: Dataset[BurstIn]): Dataset[BurstOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new BurstinessProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming PAGE CUSUM — live twin of the declared ts_cusum_page:
    * per key 16 bytes of state (the resetting S⁺/S⁻ pair), the
    * baseline mean broadcast in, alarms at h. The exact fold sequence
    * of the declared query ⇒ under the in-order feed contract the
    * emissions equal the batch rows bit-for-bit (StreamingSpec). */
  case class PageIn(user_id: Long, event_id: Long, value: Double)
  case class PageOut(user_id: Long, event_id: Long, cusum_pos: Double,
                     cusum_neg: Double, alarm: Boolean)
  case class PageState(sp: Double, sn: Double)

  private class PageProcessor(mu: Map[Long, Double], k: Double, h: Double)
      extends StatefulProcessor[Long, PageIn, PageOut] {
    @transient private var st: ValueState[PageState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PageState](
        "page", Encoders.product[PageState], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[PageIn], tv: TimerValues): Iterator[PageOut] = {
      val m = mu(user)
      var s = Option(st.get()).getOrElse(PageState(0.0, 0.0))
      val out = rows.toSeq.sortBy(_.event_id).map { r =>
        s = PageState(
          math.max(0.0, s.sp + (r.value - m) - k),
          math.max(0.0, s.sn - (r.value - m) - k))
        PageOut(user, r.event_id, s.sp, s.sn, s.sp > h || s.sn > h)
      }
      st.update(s)
      out.iterator
    }
  }

  def streamingPageCusum(events: Dataset[PageIn], mu: Map[Long, Double],
                         k: Double = 5.0, h: Double = 50.0): Dataset[PageOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new PageProcessor(mu, k, h),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming HOLT-WINTERS — the live forecaster twin of the declared
    * ts_holt_winters_keyed: per key the FULL smoother state rides in
    * ONE ValueState — level, trend, and the m-slot seasonal vector
    * (the tier's first VECTOR state; 8·(m+2) bytes per key forever).
    * Every arriving point advances the recursion with the exact same
    * IEEE sequence as udaf/HoltWinters (complements as literals) and
    * emits its (level, trend, seasonal_next, forecast_next) row, so
    * under the per-key in-order feed contract the emissions equal the
    * batch query row-for-row, bit-for-bit (StreamingSpec). */
  case class HwIn(user_id: Long, event_id: Long, value: Double)
  case class HwPoint(user_id: Long, event_id: Long, level: Double,
                     trend: Double, seasonal_next: Double,
                     forecast_next: Double)
  case class HwState(l: Double, b: Double, s: Array[Double])

  private class HoltWintersProcessor(m: Int, alpha: Double, omAlpha: Double,
                                     beta: Double, omBeta: Double,
                                     gamma: Double, omGamma: Double)
      extends StatefulProcessor[Long, HwIn, HwPoint] {
    @transient private var st: ValueState[HwState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HwState](
        "hw", Encoders.product[HwState], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[HwIn], tv: TimerValues): Iterator[HwPoint] = {
      var s = Option(st.get()).orNull
      val out = rows.toSeq.sortBy(_.event_id).map { r =>
        if (s == null) s = HwState(r.value, 0.0, Array.fill(m)(0.0))
        else {
          val s1 = s.s(0)
          val ln = alpha * (r.value - s1) + omAlpha * (s.l + s.b)
          val bn = beta * (ln - s.l) + omBeta * s.b
          s = HwState(ln, bn,
            s.s.drop(1) :+ (gamma * (r.value - ln) + omGamma * s1))
        }
        HwPoint(user, r.event_id, s.l, s.b, s.s(0), s.l + s.b + s.s(0))
      }
      st.update(s)
      out.iterator
    }
  }

  def streamingHoltWinters(events: Dataset[HwIn], m: Int = 24,
                           alpha: Double = 0.3, omAlpha: Double = 0.7,
                           beta: Double = 0.1, omBeta: Double = 0.9,
                           gamma: Double = 0.05,
                           omGamma: Double = 0.95): Dataset[HwPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(
        new HoltWintersProcessor(m, alpha, omAlpha, beta, omBeta, gamma, omGamma),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming Kalman local-level filter — the live twin of the
    * declared ts_kalman_level: 16 BYTES of state per key (level +
    * error variance), the same predict/update arithmetic in the same
    * IEEE order as the batch prefix fold, so stream ≡ batch
    * bit-for-bit when fed per-key in event_id order. The natural
    * streaming smoother: unlike the batch O(n²) prefix device, each
    * arrival costs O(1). */
  case class KalIn(user_id: Long, event_id: Long, value: Double)
  case class KalPoint(user_id: Long, event_id: Long, level: Double,
                      err_var: Double, gain_next: Double)
  case class KalState(l: Double, p: Double)

  private class KalmanProcessor(q: Double, r: Double, p0: Double)
      extends StatefulProcessor[Long, KalIn, KalPoint] {
    @transient private var st: ValueState[KalState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[KalState](
        "kal", Encoders.product[KalState], TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[KalIn], tv: TimerValues): Iterator[KalPoint] = {
      var s = Option(st.get()).orNull
      val out = rows.toSeq.sortBy(_.event_id).map { rr =>
        if (s == null) s = KalState(rr.value, p0)
        else {
          val k = (s.p + q) / (s.p + q + r)
          s = KalState(s.l + k * (rr.value - s.l), (1.0 - k) * (s.p + q))
        }
        KalPoint(user, rr.event_id, s.l, s.p, (s.p + q) / (s.p + q + r))
      }
      st.update(s)
      out.iterator
    }
  }

  def streamingKalmanLevel(events: Dataset[KalIn], q: Double = 4.0,
                           r: Double = 16.0,
                           p0: Double = 100.0): Dataset[KalPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new KalmanProcessor(q, r, p0),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming heavy hitters — the SPACE-SAVING sketch (Metwally,
    * Agrawal, El Abbadi 2005): per shard at most `k` counters live in
    * a [[org.apache.spark.sql.streaming.MapState]] (the third state
    * primitive this tier exercises, after ValueState and ListState).
    * On a tracked item the counter increments; on a new item with a
    * full table the MIN counter is evicted and the newcomer inherits
    * min+1 (the classic overestimate bound: any item with true count
    * > n/k is guaranteed tracked). With k ≥ distinct items the sketch
    * degenerates to EXACT counting — which is what StreamingSpec pins
    * against the batch groupBy count; the eviction path is asserted
    * separately with a small k. State is O(k) per shard forever —
    * the always-bounded version of a streaming top-k. Each batch
    * emits the current table; counts only grow, so max-per-item over
    * all emissions equals the final table. */
  case class HhIn(shard: Long, item: String)
  case class HhOut(shard: Long, item: String, cnt: Long)

  private class HeavyHittersProcessor(k: Int)
      extends StatefulProcessor[Long, HhIn, HhOut] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        shard: Long, rows: Iterator[HhIn], tv: TimerValues): Iterator[HhOut] = {
      // deterministic order: sort the batch's items (arrival order
      // inside a batch is shuffle-dependent; eviction must not be)
      rows.toSeq.sortBy(_.item).foreach { r =>
        if (counts.containsKey(r.item)) {
          counts.updateValue(r.item, counts.getValue(r.item) + 1L)
        } else {
          val entries = counts.iterator().toSeq
          if (entries.size < k) counts.updateValue(r.item, 1L)
          else {
            // evict the min counter (ties: smallest item, pinned)
            val (mItem, mCnt) = entries.minBy(e => (e._2, e._1))
            counts.removeKey(mItem)
            counts.updateValue(r.item, mCnt + 1L)
          }
        }
      }
      counts.iterator().toSeq.sortBy(_._1)
        .map { case (item, c) => HhOut(shard, item, c) }.iterator
    }
  }

  def streamingHeavyHitters(events: Dataset[HhIn], k: Int): Dataset[HhOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.shard)
      .transformWithState(new HeavyHittersProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming token-budget gate — the live twin of the declared
    * sample_token_budget: per source, admit documents until the token
    * budget is spent, then drop forever. ONE int64 running total per
    * source (bounded state for an unbounded doc stream). The batch
    * query fixes admission order by the Knuth hash; the stream admits
    * in ARRIVAL order — feed it in the batch's hash order (as the
    * equivalence test does) and the admitted set is identical, which
    * is exactly the deployment contract: the budget gate is
    * order-sensitive and the batch order is the spec. Within a
    * micro-batch, rows are processed in (shuf, doc_id) order so a
    * batch boundary can never reorder admission. */
  case class TbIn(source: String, doc_id: Long, n_tok: Long, shuf: Long)
  case class TbOut(source: String, doc_id: Long, n_tok: Long, cum_tok: Long)

  private class TokenBudgetProcessor(budget: Long)
      extends StatefulProcessor[String, TbIn, TbOut] {
    @transient private var spent: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      spent = getHandle.getValueState[Long](
        "spent", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        source: String, rows: Iterator[TbIn], tv: TimerValues): Iterator[TbOut] = {
      // batch semantics exactly: cum_tok accumulates over EVERY doc in
      // order (admitted or not), a doc is admitted iff its cum ≤
      // budget — monotone cumsum ⇒ the admitted set is a strict
      // prefix, and the gate never reopens after the first overflow
      var cum = if (spent.exists()) spent.get() else 0L
      val out = rows.toSeq.sortBy(r => (r.shuf, r.doc_id)).flatMap { r =>
        cum += r.n_tok
        if (cum <= budget) Some(TbOut(source, r.doc_id, r.n_tok, cum)) else None
      }
      spent.update(cum)
      out.iterator
    }
  }

  def streamingTokenBudget(docs: Dataset[TbIn], budget: Long): Dataset[TbOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new TokenBudgetProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }

  /** The token-budget gate in REAL (BPE) tokens — the live twin of the
    * declared sample_token_budget_bpe. The per-doc count comes from
    * graft.text.Bpe's ROW-LOCAL fold expression (the distinct-words
    * broadcast join of the batch form is unavailable on a stream; the
    * fold is one scalar expression per row, no shuffle, and BpeSpec
    * asserts it equals the batch tokenizer word-for-word), then the
    * same one-int64-per-source [[TokenBudgetProcessor]] admits a
    * strict prefix. Same order contract as [[streamingTokenBudget]]:
    * feed in the batch's Knuth-hash order and the admitted set is the
    * batch query's exactly. */
  def streamingBpeTokenBudget(docs: DataFrame, byCol: String, idCol: String,
                              textCol: String, budget: Long): Dataset[TbOut] = {
    import docs.sparkSession.implicits._
    docs.select(col(byCol).as("source"), col(idCol).as("doc_id"),
        expr(graft.text.Bpe.docTokExpr(textCol)).as("n_tok"),
        ((col(idCol) * 2654435761L) % 4294967296L).as("shuf"))
      .as[TbIn]
      .groupByKey(_.source)
      .transformWithState(new TokenBudgetProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }
}
