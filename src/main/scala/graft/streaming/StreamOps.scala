package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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

  /** Per-key running state (count + EWM) via flatMapGroupsWithState —
    * the custom-stateful extension point (§2.K "stateful custom"). */
  case class EventRow(event_id: Long, user_id: Long, value: Double)
  case class RunState(n: Long, ewm: Double)
  case class RunOut(user_id: Long, event_id: Long, n: Long, ewm: Double)

  def runningEwm(events: Dataset[EventRow], alpha: Double): Dataset[RunOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RunState, RunOut](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[RunState]) =>
          // event-time order within the group: micro-batches preserve
          // arrival order; tests feed data in event_id order
          var st = state.getOption.getOrElse(RunState(0L, 0.0))
          val out = rows.toSeq.sortBy(_.event_id).map { r =>
            val ewm = if (st.n == 0) r.value else alpha * r.value + (1 - alpha) * st.ewm
            st = RunState(st.n + 1, ewm)
            RunOut(user, r.event_id, st.n, st.ewm)
          }
          state.update(st)
          out.iterator
      }
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

  def streamingFunnel(events: Dataset[FunnelIn]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    def minOpt(a: Option[Long], b: Option[Long]): Option[Long] = (a, b) match {
      case (Some(x), Some(y)) => Some(math.min(x, y))
      case _ => a.orElse(b)
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelIn], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
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
  case class BucketState(ids: List[Long])
  case class CandPair(a: Long, b: Long)

  def streamingLshCandidates(sigs: Dataset[SigIn],
                             maxPerBucket: Int = 64): Dataset[CandPair] = {
    import sigs.sparkSession.implicits._
    sigs.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, CandPair](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[SigIn], state: GroupState[BucketState]) =>
          var seen = state.getOption.map(_.ids).getOrElse(Nil)
          val out = List.newBuilder[CandPair]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (!seen.contains(r.doc_id)) {
              if (seen.size < maxPerBucket)
                seen.foreach(s => out += CandPair(math.min(s, r.doc_id), math.max(s, r.doc_id)))
              seen = (r.doc_id :: seen).take(maxPerBucket)
            }
          }
          state.update(BucketState(seen))
          out.result().iterator
      }
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

  def streamingAsof(events: Dataset[AsofIn]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[AsofIn], state: GroupState[AsofState]) =>
          var st = state.getOption.orNull
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
}
