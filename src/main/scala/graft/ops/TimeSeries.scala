package graft.ops

import graft.api.syntax._
import graft.core.{Policy => P, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.H time-series operators — the reference's core surface (resample /
  * ffill / sessionize / as-of are what a TSDB adds over a DataFrame).
  *
  * Design rules:
  *  - buckets via date_trunc / epoch-floor arithmetic (codegen'd,
  *    groupBy compiles to partial+final hash agg — the 100 TB shape);
  *  - gap-filling and interpolation via ordered windows with
  *    ignoreNulls first/last — one shuffle + sort per series key;
  *  - every ts comparison happens at µs on both engines (oracle casts
  *    ns→µs first) so the precision split can never flip a bucket edge;
  *  - single-partition windows appear only on deliberately single-series
  *    queries (user_id = 7) — keyed variants shard by user_id.
  */
object TimeSeries {
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    T.events(s, d)

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(P.dec2(c)).cast("double")

  // Durbin–Levinson steps for ts_pacf, ONE shared expression text per
  // step evaluated by both engines (each step references only earlier
  // aliases, so the chain is a plain select/CTE cascade — no fold):
  // aₖ = PACF(k), pₖⱼ = AR(k) coefficient j.
  private val dlSteps: Seq[String] = Seq(
    "r1 AS a1",
    "(r2 - a1 * r1) / (1.0 - a1 * r1) AS a2",
    "a1 - a2 * a1 AS p21",
    "(r3 - (p21 * r2 + a2 * r1)) / (1.0 - (p21 * r1 + a2 * r2)) AS a3",
    "p21 - a3 * a2 AS p31",
    "a2 - a3 * p21 AS p32",
    "(r4 - (p31 * r3 + p32 * r2 + a3 * r1)) / (1.0 - (p31 * r1 + p32 * r2 + a3 * r3)) AS a4",
    "p31 - a4 * a3 AS p41",
    "p32 - a4 * p32 AS p42",
    "a3 - a4 * p31 AS p43",
    "(r5 - (p41 * r4 + p42 * r3 + p43 * r2 + a4 * r1)) / (1.0 - (p41 * r1 + p42 * r2 + p43 * r3 + a4 * r4)) AS a5")

  // ADF normal-equation determinants (ts_adf_test) — the Aggs.det3
  // device over this file's moment names, one text both engines.
  private def det3t(a: String, b: String, c: String, d: String, e: String,
                    f: String, g: String, h: String, i: String): String =
    s"($a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) + $c * ($d * $h - $e * $g))"
  private val adfDet = det3t("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
  private val adfDet0 = det3t("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
  private val adfDet1 = det3t("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
  private val adfDet2 = det3t("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")

  // Holt-Winters level update l' = α(x − s₁) + (1−α)(l + b), spelled
  // once so every repetition inside the oracle CTE step is the same
  // text (ts_holt_winters; complements as literals, never 1−α). The
  // Spark-side twin is now udaf/HoltWinters' linear pass (round 16).
  private val hwLSql = "0.3 * (s.x - rec.sv[1]) + 0.7 * (rec.l + rec.b)"

  val ops: Seq[OpSpec] = Seq(
    // resample('1h').agg — downsample, non-empty buckets only (SQL
    // semantics; gap-filling is ts_upsample_ffill's job).
    OpSpec(
      "ts_resample_agg",
      // thin call into graft.api — the gate proves the API layer
      (s, d) =>
        ev(s, d)
          .resample("hour", "ts", "h")(
            count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("h"),
      Some("""SELECT date_trunc('hour', cast(ts as timestamp)) AS h, count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events GROUP BY 1 ORDER BY h""".stripMargin),
    ),
    // resample('15min').agg — the OFFSET-frequency form of the API
    // (round-11 verdict "missing" item 2: api.resample accepted only
    // date_trunc units; pandas users write resample('15min')). The API
    // parses the offset and plans the epoch-floor bucket
    // (unix_micros div step)·step — the ts_date_floor lattice, proven
    // ≡ DuckDB time_bucket — through the SAME hash-agg shape as the
    // calendar-unit form. Unfiltered corpus: the whole events table
    // buckets in one partial+final agg.
    OpSpec(
      "ts_resample_15min",
      // thin call into graft.api (offset-frequency spelling)
      (s, d) =>
        ev(s, d)
          .resample("15min", "ts", "bucket")(
            count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("bucket"),
      Some("""SELECT time_bucket(INTERVAL 15 MINUTES, cast(ts as timestamp)) AS bucket,
             |  count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
    // resample with an EXPLICIT ORIGIN — the lattice that makes
    // NON-day-dividing steps ('7h' here) well-defined (round-12 ADVICE:
    // without an anchor, DuckDB time_bucket (2000-01-03), pandas
    // (start_day) and naive epoch-floor (1970) silently disagree for
    // such steps, so plain resample REJECTS them; with the anchor all
    // engines agree by construction). bucket = origin +
    // ⌊(ts−origin)/step⌋·step via pmod true floor ≡ DuckDB
    // time_bucket(step, ts, origin) ≡ pandas resample(origin=…). Same
    // partial+final hash-agg shape; the gate runs the one spelling the
    // day-dividing family CANNOT express.
    OpSpec(
      "ts_resample_origin",
      // thin call into graft.api (explicit-origin offset spelling)
      (s, d) =>
        ev(s, d)
          .resampleOrigin("7h",
            java.time.LocalDateTime.of(2024, 1, 1, 0, 0), "ts", "bucket")(
            count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("bucket"),
      Some("""SELECT time_bucket(INTERVAL '7 hours', cast(ts as timestamp),
             |                   TIMESTAMP '2024-01-01 00:00:00') AS bucket,
             |  count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
    // The SAME anchored resample STRAIGHT FROM SQL TEXT — the
    // `resample` TVF's optional 5th (origin) argument; expands to the
    // identical pmod-floor lattice via the shared offsetMicrosRaw
    // parser, so SQL tier ≡ DataFrame tier ≡ time_bucket-origin truth.
    OpSpec(
      "ts_resample_origin_tvf",
      (s, d) => {
        ev(s, d).createOrReplaceTempView("tvf_events_ro")
        s.sql("""SELECT bucket, n, sum_value
                |FROM resample('tvf_events_ro', 'ts', '7h', 'value',
                |              '2024-01-01 00:00:00')
                |ORDER BY bucket""".stripMargin)
      },
      Some("""SELECT time_bucket(INTERVAL '7 hours', cast(ts as timestamp),
             |                   TIMESTAMP '2024-01-01 00:00:00') AS bucket,
             |  count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
    // resample('1d').ohlc — open/close picked by event_id (ts order),
    // deterministic in both engines via arg_min/arg_max ≡ min_by/max_by.
    OpSpec(
      "ts_resample_ohlc",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .resampleOhlc("day", "ts", "value", "event_id", "day")
          .orderBy("day"),
      Some("""SELECT date_trunc('day', cast(ts as timestamp)) AS day,
             |  arg_min(value, event_id) AS open, max(value) AS high,
             |  min(value) AS low, arg_max(value, event_id) AS close
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin),
    ),
    // resample('1h').quantile([.5, .95]) — the hourly latency-profile
    // staple. EXACT per-bucket percentiles (Spark `percentile` ≡
    // DuckDB `quantile_cont`, identical (1−f)·a + f·b interpolation on
    // identical 2-dp doubles, r4 per agg_quantile's precedent). Shape:
    // one shuffle on the bucket key + a per-bucket sort of BUCKET rows
    // (hours hold ~100s-1000s of rows at any SF — never a whole-series
    // sort); at 100 TB swap `percentile` for `approx_percentile` per
    // the agg_quantile scale note if buckets stop fitting.
    OpSpec(
      "ts_resample_quantile",
      // thin call into graft.api — resample with arbitrary agg exprs
      (s, d) =>
        ev(s, d)
          .resample("hour", "ts", "h")(
            count(lit(1)).as("n"),
            P.r4(expr("percentile(value, 0.5)")).as("p50"),
            P.r4(expr("percentile(value, 0.95)")).as("p95"))
          .orderBy("h"),
      Some("""SELECT date_trunc('hour', cast(ts as timestamp)) AS h, count(*) AS n,
             |  round(quantile_cont(value, 0.5), 4) AS p50,
             |  round(quantile_cont(value, 0.95), 4) AS p95
             |FROM events GROUP BY 1 ORDER BY h""".stripMargin),
    ),
    // between_time('09:00','17:00') — inclusive start, exclusive end.
    OpSpec(
      "ts_between_time",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .betweenTime(9, 17, "ts")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events
             |WHERE extract(hour FROM cast(ts as timestamp)) >= 9
             |  AND extract(hour FROM cast(ts as timestamp)) < 17
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    // shift(freq='1h') — lattice shift of the time index.
    OpSpec(
      "ts_shift_time",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") < 3)
          .shiftTime("1 HOUR", "ts", "ts_shifted")
          .select(col("event_id"),
            P.tsOut(col("ts")).as("ts"),
            P.tsOut(col("ts_shifted")).as("ts_shifted"))
          .orderBy("event_id"),
      Some("""SELECT event_id, cast(ts as timestamp) AS ts,
             |  cast(ts as timestamp) + INTERVAL 1 HOUR AS ts_shifted
             |FROM events WHERE user_id < 3 ORDER BY event_id""".stripMargin),
    ),
    // ffill(): data has no NULLs — manufacture them (view-events' value
    // masked), then carry last non-null forward per user.
    OpSpec(
      "ts_ffill",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") < 10)
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .ffill("v", Seq("event_id"), Seq("user_id"), "v_ffill")
          .select("event_id", "user_id", "v", "v_ffill")
          .orderBy("event_id"),
      Some("""SELECT event_id, user_id, v,
             |  last_value(v IGNORE NULLS) OVER
             |    (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
             |FROM (SELECT event_id, user_id,
             |        CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
             |      FROM events WHERE user_id < 10)
             |ORDER BY event_id""".stripMargin),
    ),
    OpSpec(
      "ts_bfill",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") < 10)
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .bfill("v", Seq("event_id"), Seq("user_id"), "v_bfill")
          .select("event_id", "user_id", "v", "v_bfill")
          .orderBy("event_id"),
      Some("""SELECT event_id, user_id, v,
             |  first_value(v IGNORE NULLS) OVER
             |    (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill
             |FROM (SELECT event_id, user_id,
             |        CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
             |      FROM events WHERE user_id < 10)
             |ORDER BY event_id""".stripMargin),
    ),
    // asfreq('1h') + ffill: hourly time-spine over one sparse series
    // (user 7 ⇒ ~67 events over 30 days ⇒ most buckets empty, so the
    // fill actually fires). Spine = sequence + explode; at scale the
    // spine is tiny relative to data and the join broadcasts.
    OpSpec(
      "ts_upsample_ffill",
      // thin call into graft.api (upsampleFfill; single-series demo —
      // by = Nil after the user filter, pass series keys at scale)
      (s, d) =>
        ev(s, d).filter(col("user_id") === 7).select(col("ts"), col("value"))
          .upsampleFfill("hour", "ts", "value")
          .select(P.tsOut(col("h")).as("h"), col("v"), col("v_ffill"))
          .orderBy("h"),
      Some("""WITH e AS (SELECT cast(ts as timestamp) AS ts, value FROM events WHERE user_id = 7),
             |hourly AS (SELECT date_trunc('hour', ts) AS h,
             |             cast(sum(cast(value as decimal(18,2))) as double) AS v
             |           FROM e GROUP BY 1),
             |bounds AS (SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1 FROM e),
             |spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h FROM bounds)
             |SELECT spine.h, hourly.v AS v,
             |  last_value(hourly.v IGNORE NULLS) OVER
             |    (ORDER BY spine.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
             |FROM spine LEFT JOIN hourly ON spine.h = hourly.h
             |ORDER BY spine.h""".stripMargin),
    ),
    // asfreq('15min') + ffill — the OFFSET-frequency upsample (the
    // same API generalization as ts_resample_15min applied to the
    // spine family): epoch-floor buckets + a 900-second sequence
    // spine, forward-filled. Same single-series demo shape as
    // ts_upsample_ffill; DuckDB twin via time_bucket +
    // generate_series(…, INTERVAL 15 MINUTES).
    OpSpec(
      "ts_upsample_15min",
      // thin call into graft.api (upsampleFfill, offset spelling)
      (s, d) =>
        ev(s, d).filter(col("user_id") === 7).select(col("ts"), col("value"))
          .upsampleFfill("15min", "ts", "value")
          .select(P.tsOut(col("h")).as("h"), col("v"), col("v_ffill"))
          .orderBy("h"),
      Some("""WITH e AS (SELECT cast(ts as timestamp) AS ts, value FROM events WHERE user_id = 7),
             |q AS (SELECT time_bucket(INTERVAL 15 MINUTES, ts) AS h,
             |        cast(sum(cast(value as decimal(18,2))) as double) AS v
             |      FROM e GROUP BY 1),
             |bounds AS (SELECT time_bucket(INTERVAL 15 MINUTES, min(ts)) AS t0,
             |                  time_bucket(INTERVAL 15 MINUTES, max(ts)) AS t1 FROM e),
             |spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 15 MINUTES)) AS h FROM bounds)
             |SELECT spine.h, q.v AS v,
             |  last_value(q.v IGNORE NULLS) OVER
             |    (ORDER BY spine.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
             |FROM spine LEFT JOIN q ON spine.h = q.h
             |ORDER BY spine.h""".stripMargin),
    ),
    // interpolate('linear') positionally, pandas-style: null cells get
    // prev + (next−prev)·(i−pi)/(ni−pi); leading/trailing nulls stay.
    // Identical IEEE expression on both sides — no rounding needed.
    OpSpec(
      "ts_interpolate_linear",
      // thin call into graft.api (single-series demo: by = Nil after
      // the user filter; pass series keys in `by` at scale)
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") === 7)
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .interpolate("v", "event_id", as = "v_interp")
          .select("event_id", "v", "v_interp")
          .orderBy("event_id"),
      Some("""SELECT event_id, v,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
             |         prev_v + (next_v - prev_v) * cast(i - pi as double) / cast(ni - pi as double)
             |  END AS v_interp
             |FROM (
             |  SELECT event_id, v, i,
             |    last_value(v IGNORE NULLS) OVER b AS prev_v,
             |    last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER b AS pi,
             |    first_value(v IGNORE NULLS) OVER f AS next_v,
             |    first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER f AS ni
             |  FROM (
             |    SELECT event_id,
             |      CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v,
             |      cast(row_number() OVER (ORDER BY event_id) as bigint) AS i
             |    FROM events WHERE user_id = 7)
             |  WINDOW b AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         f AS (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |ORDER BY event_id""".stripMargin),
    ),
    // interpolate(limit=2) [P core/generic.py:8156] — the production
    // form of interpolation: fill at most `limit` consecutive nulls
    // (forward from the last valid value), leave the rest null. The
    // ts_interpolate_linear device with ONE extra predicate: fill only
    // when i − pi ≤ limit (position distance from the previous valid
    // row) — a gap of 4 nulls gets its first 2 interpolated, the tail
    // stays null, pandas limit_direction='forward' for INTERIOR gaps.
    // (One measured deviation, like ts_interpolate_nearest's: pandas
    // 'forward' also clamp-fills TRAILING NaNs with the last valid
    // value; this op leaves them null — both engines spell the same
    // CASE, so the gate is unaffected. ts_interpolate_both below
    // carries the full measured edge semantics.) Same single
    // ordered-window pass; the cap adds no shuffle.
    OpSpec(
      "ts_interpolate_limit",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") === 7)
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .interpolate("v", "event_id", limit = Some(2), as = "v_interp")
          .select("event_id", "v", "v_interp")
          .orderBy("event_id"),
      Some("""SELECT event_id, v,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND i - pi <= 2 THEN
             |         prev_v + (next_v - prev_v) * cast(i - pi as double) / cast(ni - pi as double)
             |  END AS v_interp
             |FROM (
             |  SELECT event_id, v, i,
             |    last_value(v IGNORE NULLS) OVER b AS prev_v,
             |    last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER b AS pi,
             |    first_value(v IGNORE NULLS) OVER f AS next_v,
             |    first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER f AS ni
             |  FROM (
             |    SELECT event_id,
             |      CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v,
             |      cast(row_number() OVER (ORDER BY event_id) as bigint) AS i
             |    FROM events WHERE user_id = 7)
             |  WINDOW b AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         f AS (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |ORDER BY event_id""".stripMargin),
    ),
    // interpolate(limit=2, limit_direction='backward') [P core/
    // generic.py:8156] — semantics MEASURED against pandas 2.2.2
    // (probe in-session, 12-point vector): interior nulls fill with
    // the true linear value iff within `limit` of the NEXT valid row
    // (ni − i ≤ limit — the mirror of forward's i − pi); LEADING
    // nulls clamp to the first valid value within the same distance;
    // trailing nulls always stay null. Same one-pass two-window
    // scaffold as the rest of the family.
    OpSpec(
      "ts_interpolate_backward",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") === 7)
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .interpolate("v", "event_id", limit = Some(2),
            direction = "backward", as = "v_interp")
          .select("event_id", "v", "v_interp")
          .orderBy("event_id"),
      Some("""SELECT event_id, v,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND ni - i <= 2 THEN
             |         prev_v + (next_v - prev_v) * cast(i - pi as double) / cast(ni - pi as double)
             |       WHEN prev_v IS NULL AND next_v IS NOT NULL AND ni - i <= 2 THEN next_v
             |  END AS v_interp
             |FROM (
             |  SELECT event_id, v, i,
             |    last_value(v IGNORE NULLS) OVER b AS prev_v,
             |    last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER b AS pi,
             |    first_value(v IGNORE NULLS) OVER f AS next_v,
             |    first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER f AS ni
             |  FROM (
             |    SELECT event_id,
             |      CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v,
             |      cast(row_number() OVER (ORDER BY event_id) as bigint) AS i
             |    FROM events WHERE user_id = 7)
             |  WINDOW b AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         f AS (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |ORDER BY event_id""".stripMargin),
    ),
    // interpolate(limit=2, limit_direction='both') — the union of the
    // directions, MEASURED against pandas 2.2.2: interior nulls fill
    // iff within `limit` of EITHER neighbor (min(i−pi, ni−i) ≤ limit,
    // value still the one true linear interpolation); leading nulls
    // clamp to the first valid, trailing nulls to the last valid,
    // each within the limit. Closes the limit_direction family
    // (forward/backward/both).
    OpSpec(
      "ts_interpolate_both",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") === 7)
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .interpolate("v", "event_id", limit = Some(2),
            direction = "both", as = "v_interp")
          .select("event_id", "v", "v_interp")
          .orderBy("event_id"),
      Some("""SELECT event_id, v,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND least(i - pi, ni - i) <= 2 THEN
             |         prev_v + (next_v - prev_v) * cast(i - pi as double) / cast(ni - pi as double)
             |       WHEN prev_v IS NULL AND next_v IS NOT NULL AND ni - i <= 2 THEN next_v
             |       WHEN next_v IS NULL AND prev_v IS NOT NULL AND i - pi <= 2 THEN prev_v
             |  END AS v_interp
             |FROM (
             |  SELECT event_id, v, i,
             |    last_value(v IGNORE NULLS) OVER b AS prev_v,
             |    last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER b AS pi,
             |    first_value(v IGNORE NULLS) OVER f AS next_v,
             |    first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER f AS ni
             |  FROM (
             |    SELECT event_id,
             |      CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v,
             |      cast(row_number() OVER (ORDER BY event_id) as bigint) AS i
             |    FROM events WHERE user_id = 7)
             |  WINDOW b AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         f AS (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |ORDER BY event_id""".stripMargin),
    ),
    // tz_localize + tz_convert [P core/arrays/datetimes.py] — the
    // day-one TSDB ask the engine had deliberately scoped out (UTC
    // session pin, §2.H). Both directions in one gated query, on
    // dates spanning DST transitions (orders 1995–2001):
    //   wall = tz_localize('UTC').tz_convert(zone)   — Spark
    //     from_utc_timestamp ≡ DuckDB (ts AT TIME ZONE 'UTC') AT
    //     TIME ZONE zone (instant → zone wall clock);
    //   utc  = tz_localize(zone).tz_convert('UTC')   — Spark
    //     to_utc_timestamp ≡ the mirrored AT TIME ZONE pair.
    // Both engines resolve offsets from the IANA tz database (DST
    // handling probed in-session: EDT −4 / EST −5 / CEST +2 /
    // Kolkata +5:30 all agree), and midnight timestamps can never
    // hit a spring-forward gap (US/EU transitions are 01:00–03:00
    // local). Row-local projection — scan-fused, zero shuffle.
    OpSpec(
      "ts_tz_convert",
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderkey") % 500 === 0)
          // P.tsOut: wall-clock results emit as NTZ (the §2.0 output
          // policy — DuckDB's AT TIME ZONE chain is naive too)
          .select(col("o_orderkey"), col("o_orderdate"),
            P.tsOut(from_utc_timestamp(col("o_orderdate"), "America/New_York")).as("ny_wall"),
            P.tsOut(from_utc_timestamp(col("o_orderdate"), "Asia/Kolkata")).as("kolkata_wall"),
            P.tsOut(to_utc_timestamp(col("o_orderdate"), "Europe/Paris")).as("paris_as_utc"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderdate,
             |  (o_orderdate AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS ny_wall,
             |  (o_orderdate AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kolkata' AS kolkata_wall,
             |  (o_orderdate AT TIME ZONE 'Europe/Paris') AT TIME ZONE 'UTC' AS paris_as_utc
             |FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey""".stripMargin),
    ),
    // .dt accessor family; weekday pinned Mon=0 on both engines
    // (Spark weekday ≡ DuckDB isodow−1 — the only portable encoding).
    OpSpec(
      "ts_dt_extract",
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderkey") % 500 === 0)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("bigint").as("yr"),
            month(col("o_orderdate")).cast("bigint").as("mo"),
            dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
            weekday(col("o_orderdate")).cast("bigint").as("wd"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, cast(extract(year FROM o_orderdate) as bigint) AS yr,
             |  cast(extract(month FROM o_orderdate) as bigint) AS mo,
             |  cast(extract(day FROM o_orderdate) as bigint) AS dom,
             |  cast(isodow(o_orderdate) - 1 as bigint) AS wd
             |FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey""".stripMargin),
    ),
    // .dt.floor('15min') via epoch-floor; identical to DuckDB
    // time_bucket (same 900 s lattice from any epoch-aligned origin).
    OpSpec(
      "ts_date_floor",
      (s, d) =>
        ev(s, d)
          .filter(
            col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
              col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
          .groupBy(timestamp_micros(
            expr("(unix_micros(ts) div 900000000) * 900000000")).as("bucket"))
          .agg(count(lit(1)).as("n"))
          .select(P.tsOut(col("bucket")).as("bucket"), col("n"))
          .orderBy("bucket"),
      Some("""SELECT time_bucket(INTERVAL 15 MINUTES, cast(ts as timestamp)) AS bucket, count(*) AS n
             |FROM events
             |WHERE cast(ts as timestamp) >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND cast(ts as timestamp) < TIMESTAMP '2024-01-12 00:00:00'
             |GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
    // Gap-based sessionization (30 min) — lag + cumulative flag-sum, the
    // batch twin of streaming session_window. Gaps compared at µs.
    OpSpec(
      "ts_sessionize",
      // thin call into graft.api (30-minute gap in µs)
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") < 10)
          .sessionize(1800000000L, "ts", "event_id", Seq("user_id"))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min("ts").as("t0"), max("ts").as("t1"),
            dsum(col("value")).as("sum_value"))
          .select(col("user_id"), col("session_id"), col("n_events"),
            P.tsOut(col("t0")).as("t_start"), P.tsOut(col("t1")).as("t_end"),
            col("sum_value"))
          .orderBy("user_id", "session_id"),
      Some("""WITH e AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts, value
             |          FROM events WHERE user_id < 10),
             |flagged AS (
             |  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTES
             |                 THEN 1 ELSE 0 END AS new_sess
             |  FROM (SELECT *, lag(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts FROM e)),
             |sess AS (
             |  SELECT *, cast(sum(new_sess) OVER
             |    (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(ts) AS t_start, max(ts) AS t_end,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
    ),
    // The hourly resample STRAIGHT FROM SQL TEXT through the `resample`
    // table-valued function (GraftExtensions, round-11 verdict item 3)
    // — gates the SQL surface of the recipe, not just the DataFrame/
    // api.syntax forms. The TVF expands to a parsed date_trunc hash-agg
    // plan, so Catalyst sees ordinary SQL (partial+final agg, codegen).
    OpSpec(
      "ts_resample_tvf",
      (s, d) => {
        ev(s, d).createOrReplaceTempView("tvf_events_rs")
        s.sql("""SELECT * FROM resample('tvf_events_rs', 'ts', 'hour', 'value')
                |ORDER BY bucket""".stripMargin)
      },
      Some("""SELECT date_trunc('hour', cast(ts as timestamp)) AS bucket, count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
    // The 15-MINUTE resample through the SQL TVF — the offset-frequency
    // spelling reaching the SQL tier (the TVF shares api.syntax's
    // offsetMicros parser, so SQL and DataFrame tiers accept identical
    // forms and plan the identical epoch-floor hash agg).
    OpSpec(
      "ts_resample_tvf15",
      (s, d) => {
        ev(s, d).createOrReplaceTempView("tvf_events_rs15")
        s.sql("""SELECT * FROM resample('tvf_events_rs15', 'ts', '15min', 'value')
                |ORDER BY bucket""".stripMargin)
      },
      Some("""SELECT time_bucket(INTERVAL 15 MINUTES, cast(ts as timestamp)) AS bucket,
             |  count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
    // Gap sessionization from SQL text via the `sessionize` TVF — the
    // SQL twin of ts_sessionize (same lag + cumulative-flag-sum plan,
    // reached through GraftExtensions instead of api.syntax). The TVF
    // returns per-event rows + session_id; the per-session aggregate on
    // top is deliberately the ts_sessionize shape so the two queries'
    // oracles stay textually identical.
    OpSpec(
      "ts_sessionize_tvf",
      (s, d) => {
        ev(s, d).filter(col("user_id") < 10)
          .createOrReplaceTempView("tvf_events_sess")
        s.sql("""SELECT * FROM sessionize('tvf_events_sess', 'ts', 'event_id', 'user_id', 1800000000)""")
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min("ts").as("t0"), max("ts").as("t1"),
            dsum(col("value")).as("sum_value"))
          .select(col("user_id"), col("session_id"), col("n_events"),
            P.tsOut(col("t0")).as("t_start"), P.tsOut(col("t1")).as("t_end"),
            col("sum_value"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts, value
             |          FROM events WHERE user_id < 10),
             |flagged AS (
             |  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTES
             |                 THEN 1 ELSE 0 END AS new_sess
             |  FROM (SELECT *, lag(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts FROM e)),
             |sess AS (
             |  SELECT *, cast(sum(new_sess) OVER
             |    (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(ts) AS t_start, max(ts) AS t_end,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
    ),
    // Adjusted EWM (pandas ewm(alpha=.5, adjust=True).mean()) in closed
    // form: yₙ = Σ xᵢ·2ⁱ / Σ 2ⁱ — both cumulative sums run left-to-right
    // in frame order in both engines, and ·2ⁱ is exact scaling, so the
    // result is bit-deterministic. Valid for series ≲1000 points before
    // 2ⁱ overflows double; the general-length path is the streaming/
    // Aggregator implementation in graft.udaf.Ewm (tested vs this form).
    OpSpec(
      "ts_ewm",
      // thin call into graft.api (alpha = 0.5 ⇒ weight base 2)
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") < 10)
          .ewmMean(0.5, "value", "event_id", Seq("user_id"), "ewm_value")
          .select("event_id", "user_id", "ewm_value")
          .orderBy("event_id"),
      Some("""SELECT event_id, user_id,
             |  round(sum(value * pow(2.0, i)) OVER w / sum(pow(2.0, i)) OVER w, 4) AS ewm_value
             |FROM (SELECT event_id, user_id, value,
             |        cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) as double) AS i
             |      FROM events WHERE user_id < 10)
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin),
    ),
    // ewm(alpha=.5, adjust=True).std(bias=False) — the ts_ewm closed
    // form extended with second moments: weights wᵢ = 2ⁱ give Σw, Σw²
    // (= Σ4ⁱ), Σw·x, Σw·x² as cumulative window sums (left-to-right in
    // frame order, exact ·2ⁱ scaling → bit-deterministic); variance is
    // the pandas bias=False form  (Σw)²/((Σw)²−Σw²) · (Σwx²/Σw −
    // (Σwx/Σw)²), NULL at n=1, clamped at 0 before sqrt so a constant
    // series can't emit NaN from a −1 ulp residue. Valid for series
    // ≲500 points before 4ⁱ overflows double (general-length path:
    // graft.udaf.Ewm).
    OpSpec(
      "ts_ewm_std",
      // thin call into graft.api (alpha = 0.5 ⇒ weight bases 2 and 4)
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") < 10)
          .ewmStd(0.5, "value", "event_id", Seq("user_id"), "ewm_std")
          .select("event_id", "user_id", "ewm_std")
          .orderBy("event_id"),
      Some("""SELECT event_id, user_id,
             |  CASE WHEN nn > 1 THEN
             |    round(sqrt(greatest(
             |      (sw * sw / (sw * sw - sww)) * (swxx / sw - (swx / sw) * (swx / sw)),
             |      0.0)), 4)
             |  END AS ewm_std
             |FROM (
             |  SELECT event_id, user_id,
             |    sum(pow(2.0, i)) OVER w AS sw,
             |    sum(pow(4.0, i)) OVER w AS sww,
             |    sum(value * pow(2.0, i)) OVER w AS swx,
             |    sum(value * value * pow(2.0, i)) OVER w AS swxx,
             |    count(*) OVER w AS nn
             |  FROM (SELECT event_id, user_id, value,
             |          cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) as double) AS i
             |        FROM events WHERE user_id < 10)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |ORDER BY event_id""".stripMargin),
    ),
    // ewm(alpha=.5, adjust=True).cov(other, bias=False) [P core/window/
    // ewm.py] — the pairwise half of the EWM family: x = value, y =
    // lag(value, 1) (the win_rolling_corr pairing). Same exact 2ⁱ
    // window-sum device as ts_ewm_std extended to co-moments: Σw, Σw²,
    // Σwx, Σwy, Σwxy over the VALID-pair subsequence (rows with y
    // non-null — pandas pairwise semantics drop NaN pairs), all masked
    // by the same predicate so both engines share one formula text.
    // cov = (Σw)²/((Σw)²−Σw²) · (Σwxy/Σw − (Σwx/Σw)(Σwy/Σw)); NULL at
    // n ≤ 1. Valid for series ≲500 points before 4ⁱ overflows double
    // (general-length path: graft.udaf.Ewm's recursive device).
    OpSpec(
      "ts_ewm_cov",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("event_id")
        val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val valid = col("y").isNotNull
        ev(s, d)
          .filter(col("user_id") < 10)
          // lag + row_number share one spec -> fuse into ONE node; the
          // six cum sums (dependent on y, i) fuse into a SECOND
          .select(col("*"),
            lag("value", 1).over(byUser).as("y"),
            row_number().over(byUser).cast("double").as("i"))
          .select(col("*"),
            sum(when(valid, pow(lit(2.0), col("i")))).over(cum).as("sw"),
            sum(when(valid, pow(lit(4.0), col("i")))).over(cum).as("sww"),
            sum(when(valid, col("value") * pow(lit(2.0), col("i")))).over(cum).as("swx"),
            sum(when(valid, col("y") * pow(lit(2.0), col("i")))).over(cum).as("swy"),
            sum(when(valid, col("value") * col("y") * pow(lit(2.0), col("i")))).over(cum).as("swxy"),
            count(col("y")).over(cum).as("nn"))
          .select(col("event_id"), col("user_id"),
            when(col("nn") > 1,
              P.r4((col("sw") * col("sw") / (col("sw") * col("sw") - col("sww"))) *
                (col("swxy") / col("sw") -
                  (col("swx") / col("sw")) * (col("swy") / col("sw")))))
              .as("ewm_cov"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CASE WHEN nn > 1 THEN
             |    round((sw * sw / (sw * sw - sww)) * (swxy / sw - (swx / sw) * (swy / sw)), 4)
             |  END AS ewm_cov
             |FROM (
             |  SELECT event_id, user_id,
             |    sum(CASE WHEN y IS NOT NULL THEN pow(2.0, i) END) OVER w AS sw,
             |    sum(CASE WHEN y IS NOT NULL THEN pow(4.0, i) END) OVER w AS sww,
             |    sum(CASE WHEN y IS NOT NULL THEN value * pow(2.0, i) END) OVER w AS swx,
             |    sum(CASE WHEN y IS NOT NULL THEN y * pow(2.0, i) END) OVER w AS swy,
             |    sum(CASE WHEN y IS NOT NULL THEN value * y * pow(2.0, i) END) OVER w AS swxy,
             |    count(y) OVER w AS nn
             |  FROM (SELECT event_id, user_id, value,
             |          lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS y,
             |          cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) as double) AS i
             |        FROM events WHERE user_id < 10)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |ORDER BY event_id""".stripMargin),
    ),
    // ewm(alpha=.5, adjust=True).corr(other) [P core/window/ewm.py] —
    // EWM correlation over the same valid-pair subsequence. The
    // bias=False debiasing factor cancels in the ratio (pandas uses the
    // biased co-moments for corr), so corr = (Σwxy/Σw − mx·my) /
    // sqrt((Σwx²/Σw − mx²)(Σwy²/Σw − my²)); NULL at n ≤ 1 or zero
    // variance (denominator clamped by a dd > 0 guard, the
    // win_rolling_corr discipline).
    OpSpec(
      "ts_ewm_corr",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("event_id")
        val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val valid = col("y").isNotNull
        val mx = col("swx") / col("sw")
        val my = col("swy") / col("sw")
        val dd = (col("swxx") / col("sw") - mx * mx) *
          (col("swyy") / col("sw") - my * my)
        ev(s, d)
          .filter(col("user_id") < 10)
          // lag + row_number fuse into ONE node (same spec); the seven
          // cum sums (dependent on y, i) fuse into a SECOND (was 7)
          .select(col("*"),
            lag("value", 1).over(byUser).as("y"),
            row_number().over(byUser).cast("double").as("i"))
          .select(col("*"),
            sum(when(valid, pow(lit(2.0), col("i")))).over(cum).as("sw"),
            sum(when(valid, col("value") * pow(lit(2.0), col("i")))).over(cum).as("swx"),
            sum(when(valid, col("y") * pow(lit(2.0), col("i")))).over(cum).as("swy"),
            sum(when(valid, col("value") * col("value") * pow(lit(2.0), col("i")))).over(cum).as("swxx"),
            sum(when(valid, col("y") * col("y") * pow(lit(2.0), col("i")))).over(cum).as("swyy"),
            sum(when(valid, col("value") * col("y") * pow(lit(2.0), col("i")))).over(cum).as("swxy"),
            count(col("y")).over(cum).as("nn"))
          .select(col("event_id"), col("user_id"),
            when(col("nn") > 1 && dd > 0,
              P.r4((col("swxy") / col("sw") - mx * my) / sqrt(dd)))
              .as("ewm_corr"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CASE WHEN nn > 1 AND
             |            (swxx / sw - (swx / sw) * (swx / sw)) *
             |            (swyy / sw - (swy / sw) * (swy / sw)) > 0 THEN
             |    round((swxy / sw - (swx / sw) * (swy / sw)) /
             |          sqrt((swxx / sw - (swx / sw) * (swx / sw)) *
             |               (swyy / sw - (swy / sw) * (swy / sw))), 4)
             |  END AS ewm_corr
             |FROM (
             |  SELECT event_id, user_id,
             |    sum(CASE WHEN y IS NOT NULL THEN pow(2.0, i) END) OVER w AS sw,
             |    sum(CASE WHEN y IS NOT NULL THEN value * pow(2.0, i) END) OVER w AS swx,
             |    sum(CASE WHEN y IS NOT NULL THEN y * pow(2.0, i) END) OVER w AS swy,
             |    sum(CASE WHEN y IS NOT NULL THEN value * value * pow(2.0, i) END) OVER w AS swxx,
             |    sum(CASE WHEN y IS NOT NULL THEN y * y * pow(2.0, i) END) OVER w AS swyy,
             |    sum(CASE WHEN y IS NOT NULL THEN value * y * pow(2.0, i) END) OVER w AS swxy,
             |    count(y) OVER w AS nn
             |  FROM (SELECT event_id, user_id, value,
             |          lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS y,
             |          cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) as double) AS i
             |        FROM events WHERE user_id < 10)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |ORDER BY event_id""".stripMargin),
    ),
    // Conversion funnel (the product-analytics TSDB staple): per user,
    // the first ts of each stage; a user converts at stage k if the
    // first-ts chain is ordered signup ≤ click ≤ purchase up to k.
    // One hash-agg over (user, conditional-min) — no self-joins, no
    // window; 100 TB shape is a single shuffle on user_id.
    OpSpec(
      "ts_funnel",
      (s, d) => {
        val e = ev(s, d)
        def firstTs(t: String) = min(when(col("event_type") === t, col("ts")))
        e.groupBy("user_id")
          .agg(
            firstTs("signup").as("t_signup"),
            firstTs("click").as("t_click"),
            firstTs("purchase").as("t_purchase"))
          .agg(
            count(lit(1)).as("n_users"),
            sum(when(col("t_signup").isNotNull, 1L).otherwise(0L)).as("n_signup"),
            sum(when(col("t_signup").isNotNull && col("t_click") >= col("t_signup"), 1L)
              .otherwise(0L)).as("n_signup_click"),
            sum(when(col("t_signup").isNotNull && col("t_click") >= col("t_signup") &&
              col("t_purchase") >= col("t_click"), 1L).otherwise(0L)).as("n_full_funnel"))
      },
      Some("""SELECT count(*) AS n_users,
             |  cast(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_signup,
             |  cast(sum(CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup THEN 1 ELSE 0 END) as bigint) AS n_signup_click,
             |  cast(sum(CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup AND t_purchase >= t_click THEN 1 ELSE 0 END) as bigint) AS n_full_funnel
             |FROM (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'signup' THEN cast(ts as timestamp) END) AS t_signup,
             |    min(CASE WHEN event_type = 'click' THEN cast(ts as timestamp) END) AS t_click,
             |    min(CASE WHEN event_type = 'purchase' THEN cast(ts as timestamp) END) AS t_purchase
             |  FROM events GROUP BY user_id)""".stripMargin),
    ),
    // The SAME incremental stateful operator that serves the streaming
    // tier (StreamOps.streamingFunnel — a transformWithState
    // StatefulProcessor with per-user ValueState), executed as a BATCH
    // query inside the hash gate: Spark 4 runs StatefulProcessors over
    // batch inputs, so the custom-state tier gets a DuckDB oracle the
    // same way the custom Catalyst operator did (join_asof_physical).
    // Stage mins are exact int64 µs — order-independent, hash-safe.
    OpSpec(
      "ts_funnel_stateful",
      (s, d) => {
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        s.streams.active // force the StateStoreCoordinator endpoint up
        import s.implicits._
        val in = T.events(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
          .as[graft.streaming.StreamOps.FunnelIn]
        graft.streaming.StreamOps.streamingFunnel(in)
          .toDF()
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  min(CASE WHEN event_type = 'signup' THEN epoch_us(cast(ts as timestamp)) END) AS t_signup,
             |  min(CASE WHEN event_type = 'click' THEN epoch_us(cast(ts as timestamp)) END) AS t_click,
             |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(cast(ts as timestamp)) END) AS t_purchase
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
    // pandas merge_ordered(fill_method='ffill') keyed by user: the
    // ordered full-outer merge of each user's purchase and click series
    // with both value columns forward-filled independently. Every stage
    // (join + window) shards by user_id.
    OpSpec(
      "ts_merge_ordered",
      (s, d) => {
        val p = ev(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
        val c = ev(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        graft.ts.MergeOrdered.merge(p, c, on = "ts", by = Seq("user_id"), ffill = true)
          .select(col("user_id"), P.tsOut(col("ts")).as("ts"),
            col("purchase_value"), col("click_value"))
          .orderBy("user_id", "ts")
      },
      Some("""WITH p AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS purchase_value
             |          FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click'),
             |     m AS (SELECT coalesce(p.user_id, c.user_id) AS user_id,
             |                  coalesce(p.ts, c.ts) AS ts, purchase_value, click_value
             |           FROM p FULL JOIN c ON p.user_id = c.user_id AND p.ts = c.ts)
             |SELECT user_id, ts,
             |  last_value(purchase_value IGNORE NULLS) OVER w AS purchase_value,
             |  last_value(click_value IGNORE NULLS) OVER w AS click_value
             |FROM m
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, ts""".stripMargin),
    ),
    // interpolate(method='time') [P core/generic.py] — gap-weighted
    // interpolation: weights come from the TIMESTAMP distance to the
    // bracketing non-nulls, not the row offset (ts_interpolate_linear's
    // device with unix_micros(ts) as the abscissa). Exact int64 µs
    // deltas; one double quotient at the end, identical IEEE tree.
    OpSpec(
      "ts_interpolate_time",
      (s, d) => {
        val ordered = org.apache.spark.sql.expressions.Window.orderBy("event_id")
        val back = ordered.rowsBetween(Long.MinValue, 0)
        val fwd = ordered.rowsBetween(0, Long.MaxValue)
        ev(s, d)
          .filter(col("user_id") === 7)
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .withColumn("t", unix_micros(col("ts")))
          // all four functions in one projection level: same
          // partition/order, per-function frames -> ONE WindowExec
          .select(col("*"),
            last("v", ignoreNulls = true).over(back).as("prev_v"),
            last(when(col("v").isNotNull, col("t")), ignoreNulls = true).over(back).as("pt"),
            first("v", ignoreNulls = true).over(fwd).as("next_v"),
            first(when(col("v").isNotNull, col("t")), ignoreNulls = true).over(fwd).as("nt"))
          .select(col("event_id"), col("v"),
            when(col("v").isNotNull, col("v"))
              // nt > pt guard: ns-sourced timestamps µs-truncate, so
              // bracketing stamps CAN collapse to equality — 0/0 is
              // NULL in Spark's Divide but NaN in DuckDB's IEEE float
              // division; pin the degenerate gap to prev_v on both
              // sides instead
              .when(col("prev_v").isNotNull && col("next_v").isNotNull &&
                  col("nt") > col("pt"),
                col("prev_v") + (col("next_v") - col("prev_v")) *
                  (col("t") - col("pt")).cast("double") /
                  (col("nt") - col("pt")).cast("double"))
              .when(col("prev_v").isNotNull && col("next_v").isNotNull,
                col("prev_v"))
              .as("v_interp"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, v,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND nt > pt
             |       THEN prev_v + (next_v - prev_v) * cast(t - pt as double) / cast(nt - pt as double)
             |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
             |       THEN prev_v
             |  END AS v_interp
             |FROM (
             |  SELECT event_id, v, t,
             |    last_value(v IGNORE NULLS) OVER wb AS prev_v,
             |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wb AS pt,
             |    first_value(v IGNORE NULLS) OVER wf AS next_v,
             |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wf AS nt
             |  FROM (SELECT event_id,
             |          CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v,
             |          epoch_us(cast(ts as timestamp)) AS t
             |        FROM events WHERE user_id = 7)
             |  WINDOW wb AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         wf AS (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |ORDER BY event_id""".stripMargin),
    ),
    // datetime .diff() — inter-arrival time per user in whole µs
    // (exact int64; no float timedelta to diverge). Same one-window
    // plan as every lag.
    OpSpec(
      "ts_delta",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        ev(s, d)
          .filter(col("user_id") < 10)
          .select(col("event_id"), col("user_id"),
            (unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
              .as("delta_us"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  epoch_us(cast(ts as timestamp))
             |    - epoch_us(lag(cast(ts as timestamp), 1)
             |               OVER (PARTITION BY user_id ORDER BY event_id)) AS delta_us
             |FROM events WHERE user_id < 10 ORDER BY event_id""".stripMargin),
    ),
    // resample('1h') with EMPTY buckets kept — pandas resample emits
    // the full calendar spine; SQL GROUP BY drops empty groups, so the
    // spine is GENERATED (min/max agg → sequence() explode), then the
    // already-aggregated bucket counts LEFT-join onto it with zero
    // fill. Scale shape: the fact table is read once (for the tiny
    // min/max agg and the hash agg); the spine is hours-of-history
    // rows (thousands), so the join is spine × small-agg — broadcast,
    // never a second pass over raw events.
    OpSpec(
      "ts_resample_spine",
      (s, d) => {
        val e7 = ev(s, d).filter(col("user_id") === 7)
        val buckets = e7
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        val spine = e7
          .agg(date_trunc("hour", min(col("ts"))).as("lo"),
            date_trunc("hour", max(col("ts"))).as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
        spine.join(broadcast(buckets), Seq("h"), "left")
          .select(P.tsOut(col("h")).as("h"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
          .orderBy("h")
      },
      Some("""WITH e AS (SELECT cast(ts as timestamp) AS ts, value
             |           FROM events WHERE user_id = 7),
             |b AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n,
             |        cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |      FROM e GROUP BY 1),
             |r AS (SELECT date_trunc('hour', min(ts)) AS lo,
             |             date_trunc('hour', max(ts)) AS hi FROM e),
             |s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM r)
             |SELECT s.h AS h, coalesce(b.n, 0) AS n,
             |  coalesce(b.sum_value, 0.0) AS sum_value
             |FROM s LEFT JOIN b USING (h) ORDER BY h""".stripMargin),
    ),
    // resample('1h').last().ffill() — the downsample-then-carry
    // workflow (state-of-the-world series from an event stream): last
    // value per bucket picked by event_id via max_by (deterministic),
    // empty buckets from the generated spine, then the ffill window
    // carries the last observation forward. The window is over the
    // SPINE (hours of history), not the event table — at 100 TB it
    // sorts thousands of rows, not billions.
    OpSpec(
      "ts_resample_last_ffill",
      (s, d) => {
        val e7 = ev(s, d).filter(col("user_id") === 7)
        val buckets = e7
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(max_by(col("value"), col("event_id")).as("last_v"))
        val spine = e7
          .agg(date_trunc("hour", min(col("ts"))).as("lo"),
            date_trunc("hour", max(col("ts"))).as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
        val wf = org.apache.spark.sql.expressions.Window.orderBy("h")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        spine.join(broadcast(buckets), Seq("h"), "left")
          .select(P.tsOut(col("h")).as("h"),
            last(col("last_v"), ignoreNulls = true).over(wf).as("v"))
          .orderBy("h")
      },
      Some("""WITH e AS (SELECT cast(ts as timestamp) AS ts, value, event_id
             |           FROM events WHERE user_id = 7),
             |b AS (SELECT date_trunc('hour', ts) AS h,
             |        arg_max(value, event_id) AS last_v
             |      FROM e GROUP BY 1),
             |r AS (SELECT date_trunc('hour', min(ts)) AS lo,
             |             date_trunc('hour', max(ts)) AS hi FROM e),
             |s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM r)
             |SELECT s.h AS h,
             |  last_value(b.last_v IGNORE NULLS)
             |    OVER (ORDER BY s.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
             |FROM s LEFT JOIN b USING (h) ORDER BY h""".stripMargin),
    ),
    // ewm(alpha=.5, adjust=False).mean() — the RECURSIVE pandas form
    // yₜ = (1−α)·yₜ₋₁ + α·xₜ (the default in incremental/streaming
    // usage; ts_ewm is adjust=True). Determinism: the 2ⁱ closed form
    // was tried first and FAILED the gate twice — its quotients have
    // pure power-of-two denominators, so exact 4-dp ties occur (round
    // split at row 56), and unrounded the engines' window-SUM
    // association differs in the last ulp (split at row 229). The fix
    // is the ordered-fold device on the LITERAL recurrence: the oracle
    // folds each prefix list left-to-right (DuckDB `list_reduce`) while
    // Spark — LINEAR declared spelling since round 16 (verdict item 4)
    // — runs graft.udaf.Ewm's flatMapGroups pass: one shuffle on the
    // key, one ordered O(n) pass per series. Both execute the same two
    // exact-by-0.5 products per step and IEEE addition is commutative,
    // so every intermediate is bit-identical — no round needed. (The
    // old O(n²) prefix-fold Spark spelling survives only as the
    // oracle's windowed-SQL form; EwmSpec pins the bit-equality.)
    // Single series (user_id = 7) kept so the oracle row set is
    // unchanged; the same code is partition-parallel across keys
    // (ts_ewm_linear declares the 10-key form).
    OpSpec(
      "ts_ewm_adjust_false",
      (s, d) =>
        graft.udaf.Ewm.ewmDf(
            ev(s, d).filter(col("user_id") === 7)
              .select("user_id", "event_id", "value"),
            alpha = 0.5, adjusted = false)
          .select(col("event_id"), col("ewm").as("ewm_value"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  list_reduce(l, (acc, x) -> 0.5 * acc + 0.5 * x) AS ewm_value
             |FROM (SELECT event_id,
             |        list(value) OVER (ORDER BY event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l
             |      FROM events WHERE user_id = 7)
             |ORDER BY event_id""".stripMargin),
    ),
    // The LINEAR-TIME gated twin of ts_ewm_adjust_false: the same
    // recursive yₜ = α·xₜ + (1−α)·yₜ₋₁, computed by the
    // graft.udaf.Ewm flatMapGroups Aggregator — one shuffle on the
    // key, one ordered O(n) pass per series, partition-parallel
    // across keys (HERE 10 series, not the single-series prefix-fold
    // policy above). This is the form a million-point series should
    // use; the prefix-list fold stays as the windowed-SQL exactness
    // device. Determinism: Scala computes 0.5·x + 0.5·y, DuckDB's
    // fold 0.5·acc + 0.5·x — same two exact-by-0.5 products, and IEEE
    // addition is commutative, so every intermediate is bit-identical
    // and no rounding is needed.
    OpSpec(
      "ts_ewm_linear",
      (s, d) =>
        graft.udaf.Ewm.ewmDf(
            ev(s, d).filter(col("user_id") < 10)
              .select("user_id", "event_id", "value"),
            alpha = 0.5, adjusted = false)
          .select(col("user_id"), col("event_id"), col("ewm").as("ewm_value"))
          .orderBy("user_id", "event_id"),
      Some("""SELECT user_id, event_id,
             |  list_reduce(l, (acc, x) -> 0.5 * acc + 0.5 * x) AS ewm_value
             |FROM (SELECT user_id, event_id,
             |        list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l
             |      FROM events WHERE user_id < 10)
             |ORDER BY user_id, event_id""".stripMargin),
    ),
    // Gap report — the data-quality complement of ts_sessionize: every
    // inter-arrival gap over the threshold, with its endpoints and
    // width in exact µs (int64 arithmetic end to end; the same lag
    // window every series op uses, one shuffle+sort per key).
    OpSpec(
      "ts_gap_report",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        ev(s, d)
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"),
            lag(col("ts"), 1).over(w).as("gap_start"), col("ts").as("gap_end"))
          .withColumn("gap_us",
            unix_micros(col("gap_end")) - unix_micros(col("gap_start")))
          .filter(col("gap_us") > 3600000000L)
          .select(col("user_id"), col("event_id"),
            P.tsOut(col("gap_start")).as("gap_start"),
            P.tsOut(col("gap_end")).as("gap_end"), col("gap_us"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  cast(gap_start as timestamp) AS gap_start,
             |  cast(gap_end as timestamp) AS gap_end, gap_us
             |FROM (
             |  SELECT user_id, event_id,
             |    lag(cast(ts as timestamp), 1)
             |      OVER (PARTITION BY user_id ORDER BY event_id) AS gap_start,
             |    cast(ts as timestamp) AS gap_end,
             |    epoch_us(cast(ts as timestamp))
             |      - epoch_us(lag(cast(ts as timestamp), 1)
             |                 OVER (PARTITION BY user_id ORDER BY event_id)) AS gap_us
             |  FROM events WHERE user_id < 10)
             |WHERE gap_us > 3600000000 ORDER BY user_id, event_id""".stripMargin),
    ),
    // Seasonal profile — groupby(ts.dt.hour) (the hour-of-day load
    // curve every TSDB dashboard shows). A MODULAR bucket, not a
    // timeline bucket like ts_resample_agg: 24 output rows at any
    // scale, one partial+final hash agg, exact decimal sums.
    OpSpec(
      "ts_hourly_profile",
      (s, d) =>
        ev(s, d)
          .groupBy(hour(col("ts")).cast("bigint").as("hod"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("hod"), col("n"), col("sum_value"),
            (col("sum_value") / col("n")).as("avg_value"))
          .orderBy("hod"),
      Some("""SELECT hod, n, sum_value, sum_value / n AS avg_value
             |FROM (
             |  SELECT extract(hour FROM cast(ts as timestamp)) AS hod,
             |    count(*) AS n,
             |    cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |  FROM events GROUP BY 1)
             |ORDER BY hod""".stripMargin),
    ),
    // Holt's linear-trend exponential smoothing (α=.3, β=.1, b₁=0) —
    // the forecasting staple one step past the EWM family: a COUPLED
    // two-state recursion (level, trend). LINEAR declared spelling
    // since round 16 (verdict item 4): graft.udaf.Holt's flatMapGroups
    // pass — one shuffle on the key, one ordered O(n) pass per series
    // — while the oracle runs the SAME recursion as a linear recursive
    // CTE: the identical IEEE op sequence (complements as literals),
    // so the chain is bit-exact and emitted UNROUNDED. Single series
    // (user_id = 7) kept so the oracle row set is unchanged;
    // ts_holt_linear_keyed declares the partition-parallel 10-key form.
    OpSpec(
      "ts_holt_linear",
      (s, d) =>
        graft.udaf.Holt.holtDf(
            ev(s, d).filter(col("user_id") === 7)
              .select("user_id", "event_id", "value"),
            alpha = 0.3, omAlpha = 0.7, beta = 0.1, omBeta = 0.9)
          .select(col("event_id"), col("level"), col("trend"),
            (col("level") + col("trend")).as("forecast_next"))
          .orderBy("event_id"),
      Some("""WITH RECURSIVE s AS (
             |  SELECT cast(row_number() OVER (ORDER BY event_id) as bigint) AS i,
             |    event_id, value AS x
             |  FROM events WHERE user_id = 7),
             |rec AS (
             |  -- CAST: a bare 0.0 would type b DECIMAL(2,1) for the
             |  -- whole recursion and truncate every trend to 1 dp
             |  SELECT i, event_id, x, x AS l, CAST(0.0 AS DOUBLE) AS b FROM s WHERE i = 1
             |  UNION ALL
             |  SELECT s.i, s.event_id, s.x,
             |    0.3 * s.x + 0.7 * (rec.l + rec.b) AS l,
             |    0.1 * (0.3 * s.x + 0.7 * (rec.l + rec.b) - rec.l) + 0.9 * rec.b AS b
             |  FROM rec JOIN s ON s.i = rec.i + 1)
             |SELECT event_id, l AS level, b AS trend, l + b AS forecast_next
             |FROM rec ORDER BY event_id""".stripMargin),
    ),
    // HOLT-WINTERS additive (α=.3, β=.1, γ=.05, season m=24) — the
    // classical seasonal forecaster completing the exponential family
    // (EWM → Holt → HW). THREE coupled states per step: level, trend,
    // and a 24-slot seasonal vector (a rotating queue). LINEAR declared
    // spelling since round 16 (verdict item 4): graft.udaf.HoltWinters'
    // flatMapGroups pass — one shuffle on the key, one ordered O(n·m)
    // pass per series — while the oracle runs the identical recursion
    // as a recursive CTE over LIST(DOUBLE) (sv[2:24] || [s1']), the
    // same IEEE op sequence op-for-op, so level/trend/seasonal/forecast
    // all go out UNROUNDED and bit-exact. Single series (user_id = 7)
    // kept so the oracle row set is unchanged; ts_holt_winters_keyed
    // declares the partition-parallel 10-key form.
    OpSpec(
      "ts_holt_winters",
      (s, d) =>
        graft.udaf.HoltWinters.holtWintersDf(
            ev(s, d).filter(col("user_id") === 7)
              .select("user_id", "event_id", "value"),
            m = 24, alpha = 0.3, omAlpha = 0.7, beta = 0.1, omBeta = 0.9,
            gamma = 0.05, omGamma = 0.95)
          .select(col("event_id"), col("level"), col("trend"),
            col("seasonal_next"),
            (col("level") + col("trend") + col("seasonal_next"))
              .as("forecast_next"))
          .orderBy("event_id"),
      Some(s"""WITH RECURSIVE s AS (
              |  SELECT cast(row_number() OVER (ORDER BY event_id) as bigint) AS i,
              |    event_id, value AS x
              |  FROM events WHERE user_id = 7),
              |rec AS (
              |  SELECT i, event_id, x, x AS l, CAST(0.0 AS DOUBLE) AS b,
              |    list_transform(range(24), i2 -> CAST(0.0 AS DOUBLE)) AS sv
              |  FROM s WHERE i = 1
              |  UNION ALL
              |  SELECT s.i, s.event_id, s.x,
              |    $hwLSql AS l,
              |    0.1 * (($hwLSql) - rec.l) + 0.9 * rec.b AS b,
              |    rec.sv[2:24] ||
              |      [0.05 * (s.x - ($hwLSql)) + 0.95 * rec.sv[1]] AS sv
              |  FROM rec JOIN s ON s.i = rec.i + 1)
              |SELECT event_id, l AS level, b AS trend, sv[1] AS seasonal_next,
              |  l + b + sv[1] AS forecast_next
              |FROM rec ORDER BY event_id""".stripMargin),
    ),
    // The LINEAR keyed twin of ts_holt_linear (the ts_ewm_linear
    // pattern): udaf/Holt's flatMapGroups carries the coupled
    // recursion in one ordered O(n) pass per series, partition-
    // parallel across the 10 keys — the form a million-point corpus
    // uses. Gated against the SAME recursive CTE, partitioned by key
    // (base i=1 per user, step joins on user_id AND i+1) — bit-exact,
    // since both sides execute the identical IEEE sequence (the
    // complements ride as literals, never computed as 1−α).
    OpSpec(
      "ts_holt_linear_keyed",
      (s, d) =>
        graft.udaf.Holt.holtDf(
            ev(s, d).filter(col("user_id") < 10)
              .select("user_id", "event_id", "value"),
            alpha = 0.3, omAlpha = 0.7, beta = 0.1, omBeta = 0.9)
          .select(col("user_id"), col("event_id"), col("level"), col("trend"),
            (col("level") + col("trend")).as("forecast_next"))
          .orderBy("user_id", "event_id"),
      Some("""WITH RECURSIVE s AS (
             |  SELECT user_id,
             |    cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) as bigint) AS i,
             |    event_id, value AS x
             |  FROM events WHERE user_id < 10),
             |rec AS (
             |  SELECT user_id, i, event_id, x, x AS l, CAST(0.0 AS DOUBLE) AS b
             |  FROM s WHERE i = 1
             |  UNION ALL
             |  SELECT s.user_id, s.i, s.event_id, s.x,
             |    0.3 * s.x + 0.7 * (rec.l + rec.b) AS l,
             |    0.1 * (0.3 * s.x + 0.7 * (rec.l + rec.b) - rec.l) + 0.9 * rec.b AS b
             |  FROM rec JOIN s ON s.user_id = rec.user_id AND s.i = rec.i + 1)
             |SELECT user_id, event_id, l AS level, b AS trend, l + b AS forecast_next
             |FROM rec ORDER BY user_id, event_id""".stripMargin),
    ),
    // The LINEAR keyed twin of ts_holt_winters (the udaf/Holt pattern
    // with VECTOR state): one O(n·m) ordered pass per series via
    // flatMapGroups with a rotating m-queue, partition-parallel across
    // keys — the form a million-series corpus uses. Gated against the
    // SAME list-state recursive CTE partitioned by key; identical IEEE
    // sequence (complements as literals) ⇒ bit-exact unrounded.
    OpSpec(
      "ts_holt_winters_keyed",
      (s, d) =>
        graft.udaf.HoltWinters.holtWintersDf(
            ev(s, d).filter(col("user_id") < 10)
              .select("user_id", "event_id", "value"),
            m = 24, alpha = 0.3, omAlpha = 0.7, beta = 0.1, omBeta = 0.9,
            gamma = 0.05, omGamma = 0.95)
          .select(col("user_id"), col("event_id"), col("level"), col("trend"),
            col("seasonal_next"),
            (col("level") + col("trend") + col("seasonal_next"))
              .as("forecast_next"))
          .orderBy("user_id", "event_id"),
      Some(s"""WITH RECURSIVE s AS (
              |  SELECT user_id,
              |    cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) as bigint) AS i,
              |    event_id, value AS x
              |  FROM events WHERE user_id < 10),
              |rec AS (
              |  SELECT user_id, i, event_id, x, x AS l, CAST(0.0 AS DOUBLE) AS b,
              |    list_transform(range(24), i2 -> CAST(0.0 AS DOUBLE)) AS sv
              |  FROM s WHERE i = 1
              |  UNION ALL
              |  SELECT s.user_id, s.i, s.event_id, s.x,
              |    $hwLSql AS l,
              |    0.1 * (($hwLSql) - rec.l) + 0.9 * rec.b AS b,
              |    rec.sv[2:24] ||
              |      [0.05 * (s.x - ($hwLSql)) + 0.95 * rec.sv[1]] AS sv
              |  FROM rec JOIN s ON s.user_id = rec.user_id AND s.i = rec.i + 1)
              |SELECT user_id, event_id, l AS level, b AS trend,
              |  sv[1] AS seasonal_next, l + b + sv[1] AS forecast_next
              |FROM rec ORDER BY user_id, event_id""".stripMargin),
    ),
    // PACF via DURBIN–LEVINSON (the second panel of every AR-order
    // diagnostic, pandas plot_pacf): standard ρₖ = cₖ/c₀ from the
    // single series (mean-centered lag products folded IN EVENT ORDER
    // over the collected array — both engines the same ascending-t
    // fold), then the DL recursion UNROLLED to k = 5 as a cascade of
    // shared per-step expressions (dlSteps — no fold, each step only
    // references earlier aliases). ACF and PACF emitted side by side,
    // r4.
    OpSpec(
      "ts_pacf",
      (s, d) => {
        val base = ev(s, d).filter(col("user_id") === 7)
        val ser = base.agg(
          expr("transform(array_sort(collect_list(named_struct('i', event_id, 'v', value))), x -> x.v)")
            .as("arr"),
          (sum(P.dec2(col("value"))).cast("double") / count(lit(1))).as("mu"))
        def ck(k: Int) =
          // sequence(1, 0) DESCENDS in Spark ([1, 0]), so an empty/short
          // arr would drive element_at out of bounds — size(arr) ≤ k
          // yields c_k = 0 instead (gate-neutral: the gated series has
          // hundreds of points).
          s"""CASE WHEN size(arr) <= $k THEN 0D ELSE aggregate(sequence(1, size(arr) - $k), 0D,
             |  (acc, t) -> acc + (element_at(arr, t) - mu) * (element_at(arr, t + $k) - mu)) END""".stripMargin
        val withR = ser
          .selectExpr((0 to 5).map(k => s"${ck(k)} AS c$k"): _*)
          // nullif guards the degenerate c0 = 0 series (ANSI double
          // division THROWS on zero in Spark 4): NULL acf/pacf rows
          // instead of a crash. Gate-neutral — c0 > 0 on the gated
          // series, and x / nullif(c0, 0) is the identical IEEE
          // division when c0 ≠ 0.
          .selectExpr((1 to 5).map(k => s"c$k / nullif(c0, 0D) AS r$k"): _*)
        val dl = dlSteps.foldLeft(withR)((df, step) => df.selectExpr("*", step))
        dl.selectExpr(
            """stack(5, 1L, r1, a1, 2L, r2, a2, 3L, r3, a3, 4L, r4, a4, 5L, r5, a5)
              |AS (k, acf_raw, pacf_raw)""".stripMargin)
          .selectExpr("k", "round(acf_raw, 4) AS acf", "round(pacf_raw, 4) AS pacf")
          .orderBy("k")
      },
      Some {
        val ckSql = (0 to 5).map(k =>
          s"""list_reduce(list_prepend(0.0, list_transform(range(1, len(arr) - ${k - 1}),
             |    t -> (arr[t] - mu) * (arr[t + $k] - mu))), (acc, x) -> acc + x) AS c$k""".stripMargin)
          .mkString(",\n|  ")
        val dlCtes = dlSteps.zipWithIndex.map { case (step, i) =>
          s"q${i + 1} AS (SELECT *, $step FROM q$i)"
        }.mkString(",\n|")
        s"""WITH b AS (SELECT event_id, value FROM events WHERE user_id = 7),
           |s AS (
           |  SELECT list(value ORDER BY event_id) AS arr,
           |    cast(sum(cast(value as decimal(18,2))) as double) / count(*) AS mu
           |  FROM b),
           |c AS (
           |  SELECT
           |  $ckSql
           |  FROM s),
           |q0 AS (SELECT ${(1 to 5).map(k => s"c$k / c0 AS r$k").mkString(", ")} FROM c),
           |$dlCtes,
           |st AS (
           |  ${(1 to 5).map(k =>
                s"SELECT cast($k as bigint) AS k, r$k AS acf_raw, a$k AS pacf_raw FROM q${dlSteps.length}")
                .mkString("\n|  UNION ALL ")})
           |SELECT k, round(acf_raw, 4) AS acf, round(pacf_raw, 4) AS pacf
           |FROM st ORDER BY k""".stripMargin
      },
    ),
    // ADF UNIT-ROOT TEST (Dickey & Fuller 1979, one augmentation lag,
    // constant only): Δxₜ ~ α + β·xₜ₋₁ + γ·Δxₜ₋₁ over the daily CENTS
    // series; the stat is β̂/se(β̂) with se from the (X'X)⁻¹ cofactor —
    // the stationarity question every TSDB analysis asks, answered
    // with the agg_ols machinery. EVERY moment is an exact bigint sum
    // (all three regressands are integer cents; at much larger daily
    // masses the sums move to decimal(38,0), same plan); β̂, SSE, the
    // cofactor and det are Cramer/det3 texts shared verbatim, so only
    // the final divisions float.
    OpSpec(
      "ts_adf_test",
      (s, d) => {
        val w = Window.orderBy("i")
        val daily = ev(s, d)
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
          .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("bigint"))
            .as("yc"))
        val reg = daily
          .withColumn("x1", lag(col("yc"), 1).over(w))
          .withColumn("dy", col("yc") - col("x1"))
          .withColumn("x2", lag(col("dy"), 1).over(w))
          .filter(col("x2").isNotNull)
          .select(col("x1"), col("x2"), col("dy").as("y"))
        val m = reg.agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x1")).cast("double").as("s1"),
          sum(col("x2")).cast("double").as("s2"),
          sum(col("x1") * col("x1")).cast("double").as("s11"),
          sum(col("x2") * col("x2")).cast("double").as("s22"),
          sum(col("x1") * col("x2")).cast("double").as("s12"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("y") * col("y")).cast("double").as("syy"),
          sum(col("x1") * col("y")).cast("double").as("s1y"),
          sum(col("x2") * col("y")).cast("double").as("s2y"))
        m.selectExpr("n", "sy", "syy", "s1y", "s2y", "s2", "s22",
            s"$adfDet AS det", s"$adfDet0 AS det0", s"$adfDet1 AS det1",
            s"$adfDet2 AS det2")
          // nullif guards the degenerate regressions (singular X'X or
          // n ≤ 3 — ANSI double division throws on zero in Spark 4);
          // gate-neutral: det > 0 and n ≫ 3 on the gated daily series,
          // and x / nullif(d, 0) is the identical IEEE division there.
          .selectExpr("cast(n as bigint) AS n_obs",
            "det1 / nullif(det, 0D) AS beta",
            s"""round((det1 / nullif(det, 0D)) / sqrt(
               |  ((syy - (det0 / nullif(det, 0D) * sy + det1 / nullif(det, 0D) * s1y + det2 / nullif(det, 0D) * s2y)) / nullif(n - 3, 0D))
               |  * (n * s22 - s2 * s2) / nullif(det, 0D)), 4) AS adf_stat""".stripMargin)
      },
      Some(s"""WITH daily AS (
              |  SELECT cast(extract(day FROM ts) as bigint) AS i,
              |    cast(sum(cast(cast(value as decimal(18,2)) * 100 as bigint)) as bigint) AS yc
              |  FROM events GROUP BY 1),
              |lag1 AS (
              |  SELECT i, yc, lag(yc, 1) OVER (ORDER BY i) AS x1,
              |    yc - lag(yc, 1) OVER (ORDER BY i) AS dy
              |  FROM daily),
              |lag2 AS (
              |  SELECT x1, dy, lag(dy, 1) OVER (ORDER BY i) AS x2 FROM lag1),
              |reg AS (SELECT x1, x2, dy AS y FROM lag2 WHERE x2 IS NOT NULL),
              |m AS (
              |  SELECT cast(count(*) as double) AS n,
              |    cast(sum(x1) as double) AS s1, cast(sum(x2) as double) AS s2,
              |    cast(sum(x1 * x1) as double) AS s11,
              |    cast(sum(x2 * x2) as double) AS s22,
              |    cast(sum(x1 * x2) as double) AS s12,
              |    cast(sum(y) as double) AS sy, cast(sum(y * y) as double) AS syy,
              |    cast(sum(x1 * y) as double) AS s1y,
              |    cast(sum(x2 * y) as double) AS s2y
              |  FROM reg),
              |dets AS (
              |  SELECT n, sy, syy, s1y, s2y, s2, s22,
              |    $adfDet AS det, $adfDet0 AS det0, $adfDet1 AS det1,
              |    $adfDet2 AS det2
              |  FROM m)
              |SELECT cast(n as bigint) AS n_obs,
              |  det1 / det AS beta,
              |  round((det1 / det) / sqrt(
              |    ((syy - (det0 / det * sy + det1 / det * s1y + det2 / det * s2y)) / (n - 3))
              |    * (n * s22 - s2 * s2) / det), 4) AS adf_stat
              |FROM dets""".stripMargin),
    ),
    // LJUNG–BOX portmanteau (Ljung & Box 1978): Q = n(n+2)·Σₖ r²ₖ/(n−k)
    // at lags 1–5 — the white-noise test read NEXT TO acf/pacf (is
    // there any autocorrelation left?). Reuses ts_pacf's exact c_k/r_k
    // machinery verbatim; the Q combination is one shared text.
    OpSpec(
      "ts_ljung_box",
      (s, d) => {
        val base = ev(s, d).filter(col("user_id") === 7)
        val ser = base.agg(
          expr("transform(array_sort(collect_list(named_struct('i', event_id, 'v', value))), x -> x.v)")
            .as("arr"),
          (sum(P.dec2(col("value"))).cast("double") / count(lit(1))).as("mu"),
          count(lit(1)).cast("double").as("nd"))
        def ck(k: Int) =
          // sequence(1, 0) DESCENDS in Spark ([1, 0]), so an empty/short
          // arr would drive element_at out of bounds — size(arr) ≤ k
          // yields c_k = 0 instead (gate-neutral: the gated series has
          // hundreds of points).
          s"""CASE WHEN size(arr) <= $k THEN 0D ELSE aggregate(sequence(1, size(arr) - $k), 0D,
             |  (acc, t) -> acc + (element_at(arr, t) - mu) * (element_at(arr, t + $k) - mu)) END""".stripMargin
        ser
          .selectExpr(Seq("nd") ++ (0 to 5).map(k => s"${ck(k)} AS c$k"): _*)
          // nullif: same degenerate-series guard as ts_pacf (ANSI double
          // division throws on c0 = 0; gate-neutral when c0 ≠ 0).
          .selectExpr(Seq("nd") ++ (1 to 5).map(k => s"c$k / nullif(c0, 0D) AS r$k"): _*)
          .selectExpr("cast(nd as bigint) AS n",
            s"""round(nd * (nd + 2.0) * (${(1 to 5).map(k =>
                 s"r$k * r$k / nullif(nd - $k, 0D)").mkString(" + ")}), 4) AS q_lb""",
            "cast(5 as bigint) AS dof")
      },
      Some {
        val ckSql = (0 to 5).map(k =>
          s"""list_reduce(list_prepend(0.0, list_transform(range(1, len(arr) - ${k - 1}),
             |    t -> (arr[t] - mu) * (arr[t + $k] - mu))), (acc, x) -> acc + x) AS c$k""".stripMargin)
          .mkString(",\n|  ")
        s"""WITH b AS (SELECT event_id, value FROM events WHERE user_id = 7),
           |s AS (
           |  SELECT list(value ORDER BY event_id) AS arr,
           |    cast(sum(cast(value as decimal(18,2))) as double) / count(*) AS mu,
           |    cast(count(*) as double) AS nd
           |  FROM b),
           |c AS (
           |  SELECT nd,
           |  $ckSql
           |  FROM s),
           |r AS (SELECT nd, ${(1 to 5).map(k => s"c$k / c0 AS r$k").mkString(", ")} FROM c)
           |SELECT cast(nd as bigint) AS n,
           |  round(nd * (nd + 2.0) * (${(1 to 5).map(k =>
                s"r$k * r$k / (nd - $k)").mkString(" + ")}), 4) AS q_lb,
           |  cast(5 as bigint) AS dof
           |FROM r""".stripMargin
      },
    ),
    // THEIL–SEN robust trend (Sen 1968): slope = median of all C(n,2)
    // pairwise slopes over the DAILY value-mass series, intercept =
    // median residual — the trend estimate a single outlier day can't
    // drag (unlike the OLS fit). The pair explode is over the
    // TIME-BOUNDED daily aggregate (30 rows → 435 pairs; at 100 TB the
    // daily series is still ~365·years rows — the fact table never
    // self-joins). Slopes are exact-input doubles with one shared
    // division text ⇒ identical multisets; medians via the proven
    // percentile ≡ quantile_cont device, r4.
    OpSpec(
      "ts_theil_sen",
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
          .agg(dsum(col("value")).as("y"))
        val a = daily.select(col("i").as("ia"), col("y").as("ya"))
        val b = daily.select(col("i").as("ib"), col("y").as("yb"))
        val mMed = a.join(broadcast(b), col("ia") < col("ib"))
          .select(((col("yb") - col("ya")) /
            (col("ib") - col("ia")).cast("double")).as("m"))
          .agg(expr("percentile(m, 0.5)").as("m"), count(lit(1)).as("n_pairs"))
        daily.crossJoin(broadcast(mMed))
          .select(col("m"), col("n_pairs"),
            (col("y") - col("m") * col("i").cast("double")).as("r"))
          .groupBy("m", "n_pairs")
          .agg(count(lit(1)).as("n_days"),
            expr("percentile(r, 0.5)").as("b"))
          .select(col("n_days"), col("n_pairs"),
            P.r4(col("m")).as("slope"), P.r4(col("b")).as("intercept"))
      },
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i,
             |    cast(sum(cast(value as decimal(18,2))) as double) AS y
             |  FROM events GROUP BY 1),
             |sl AS (
             |  SELECT (b.y - a.y) / cast(b.i - a.i as double) AS m
             |  FROM daily a JOIN daily b ON a.i < b.i),
             |mm AS (SELECT quantile_cont(m, 0.5) AS m, count(*) AS n_pairs FROM sl),
             |res AS (
             |  SELECT mm.m, mm.n_pairs,
             |    d.y - mm.m * cast(d.i as double) AS r
             |  FROM daily d CROSS JOIN mm)
             |SELECT count(*) AS n_days, n_pairs,
             |  round(m, 4) AS slope,
             |  round(quantile_cont(r, 0.5), 4) AS intercept
             |FROM res GROUP BY m, n_pairs""".stripMargin),
    ),
    // MANN–KENDALL trend TEST (Mann 1945; Theil–Sen's standard
    // companion — Sen estimates the slope, MK decides if it's real):
    // S = Σ_{i<j} sign(yⱼ−yᵢ), tie-corrected var(S) = [n(n−1)(2n+5) −
    // Σₜ t(t−1)(2t+5)]/18, z with the ±1 continuity correction. S and
    // the tie sums are EXACT INTEGERS (sign counting over the daily
    // CENTS series — equality is int equality, no epsilon); only the
    // final z division is floating, in one shared text.
    OpSpec(
      "ts_mann_kendall",
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
          .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("bigint"))
            .as("yc"))
        val a = daily.select(col("i").as("ia"), col("yc").as("ya"))
        val b = daily.select(col("i").as("ib"), col("yc").as("yb"))
        val sAgg = a.join(broadcast(b), col("ia") < col("ib"))
          .agg(sum(signum(col("yb") - col("ya")).cast("bigint")).as("s_stat"))
        val ties = daily.groupBy("yc").agg(count(lit(1)).as("t"))
          .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L)).as("tie_sum"))
        val nRow = daily.agg(count(lit(1)).as("n_days"))
        nRow.crossJoin(broadcast(sAgg)).crossJoin(broadcast(ties))
          .selectExpr("n_days", "s_stat",
            "cast(n_days * (n_days - 1) * (2 * n_days + 5) - tie_sum as double) / 18.0 AS v")
          .selectExpr("n_days", "s_stat",
            """round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(v)
              |  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(v)
              |  ELSE 0.0 END, 4) AS z""".stripMargin)
      },
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i,
             |    cast(sum(cast(cast(value as decimal(18,2)) * 100 as bigint)) as bigint) AS yc
             |  FROM events GROUP BY 1),
             |sa AS (
             |  SELECT cast(sum(CASE WHEN b.yc > a.yc THEN 1
             |    WHEN b.yc < a.yc THEN -1 ELSE 0 END) as bigint) AS s_stat
             |  FROM daily a JOIN daily b ON a.i < b.i),
             |ti AS (
             |  SELECT cast(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) as bigint) AS tie_sum
             |  FROM (SELECT count(*) AS t FROM daily GROUP BY yc)),
             |nr AS (SELECT count(*) AS n_days FROM daily),
             |vv AS (
             |  SELECT n_days, s_stat,
             |    cast(n_days * (n_days - 1) * (2 * n_days + 5) - tie_sum as double) / 18.0 AS v
             |  FROM nr CROSS JOIN sa CROSS JOIN ti)
             |SELECT n_days, s_stat,
             |  round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(v)
             |    WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(v)
             |    ELSE 0.0 END, 4) AS z
             |FROM vv""".stripMargin),
    ),
    // WALD–WOLFOWITZ RUNS TEST: is the series' above/below-median
    // pattern random, or does it trend/oscillate? R = number of sign
    // runs; z = (R − (2n₁n₂/n + 1)) / √(2n₁n₂(2n₁n₂ − n)/(n²(n−1))).
    // The threshold is the interpolated median of EXACT CENTS (integer
    // inputs ⇒ (a+b)/2 identical doubles both engines — a raw double
    // COMPARISON is safe only because the operands are exact);
    // everything after is integer counting + one shared formula text.
    OpSpec(
      "ts_runs_test",
      (s, d) => {
        val base = ev(s, d).filter(col("user_id") === 7)
          .select(col("event_id"),
            (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
        val med = base.agg(expr("percentile(cents, 0.5)").as("med"))
        val w = Window.orderBy("event_id")
        val signs = base.crossJoin(broadcast(med))
          .filter(col("cents") =!= col("med")) // drop exact-median points
          .withColumn("up", (col("cents") > col("med")).cast("bigint"))
          .withColumn("flip",
            when(lag(col("up"), 1).over(w).isNull, 0L)
              .when(lag(col("up"), 1).over(w) =!= col("up"), 1L).otherwise(0L))
        signs.agg(
            sum(col("up")).as("n1"),
            sum(lit(1L) - col("up")).as("n2"),
            (sum(col("flip")) + lit(1L)).as("runs"))
          .selectExpr("n1", "n2", "runs",
            "cast(n1 + n2 as double) AS nd",
            "cast(2 * n1 * n2 as double) AS p")
          .selectExpr("n1", "n2", "runs",
            "round((runs - (p / nd + 1.0)) / sqrt(p * (p - nd) / (nd * nd * (nd - 1.0))), 4) AS z")
      },
      Some("""WITH b AS (
             |  SELECT event_id, cast(cast(value as decimal(18,2)) * 100 as bigint) AS cents
             |  FROM events WHERE user_id = 7),
             |m AS (SELECT quantile_cont(cents, 0.5) AS med FROM b),
             |s AS (
             |  SELECT event_id, CASE WHEN cents > med THEN 1 ELSE 0 END AS up
             |  FROM b CROSS JOIN m WHERE cents <> med),
             |f AS (
             |  SELECT up, CASE WHEN lag(up, 1) OVER (ORDER BY event_id) IS NULL THEN 0
             |    WHEN lag(up, 1) OVER (ORDER BY event_id) <> up THEN 1 ELSE 0 END AS flip
             |  FROM s),
             |a AS (
             |  SELECT cast(sum(up) as bigint) AS n1,
             |    cast(sum(1 - up) as bigint) AS n2,
             |    cast(sum(flip) + 1 as bigint) AS runs
             |  FROM f),
             |d AS (SELECT n1, n2, runs, cast(n1 + n2 as double) AS nd,
             |        cast(2 * n1 * n2 as double) AS p FROM a)
             |SELECT n1, n2, runs,
             |  round((runs - (p / nd + 1.0)) / sqrt(p * (p - nd) / (nd * nd * (nd - 1.0))), 4) AS z
             |FROM d""".stripMargin),
    ),
    // PAGE'S two-sided CUSUM (Page 1954, the SPC standard): S⁺ₜ =
    // max(0, S⁺ₜ₋₁ + (xₜ−μ) − k), S⁻ₜ = max(0, S⁻ₜ₋₁ − (xₜ−μ) − k),
    // alarm when either exceeds h — the RESETTING drift detector the
    // declared ts_cusum_flag's cumulative form complements (Page
    // resets at zero, so it localizes WHERE the shift starts). A
    // max-recursion — non-associative, no window expresses it.
    // LINEAR declared spelling since round 16: graft.udaf.Spc's
    // flatMapGroups pass carries the (S⁺, S⁻) pair in one ordered
    // O(n) sweep per series; μ is the exact decimal series mean
    // broadcast in; k = 5, h = 50 literals both engines. The oracle
    // runs the identical recursion as a recursive CTE; max/adds share
    // the op sequence ⇒ unrounded bit-exact.
    OpSpec(
      "ts_cusum_page",
      (s, d) => {
        val base = ev(s, d).filter(col("user_id") === 7)
        val mu = base.agg(
          (sum(P.dec2(col("value"))).cast("double") / count(lit(1))).as("mu"))
        graft.udaf.Spc.cusumDf(
            base.crossJoin(broadcast(mu))
              .select("user_id", "event_id", "value", "mu"),
            k = 5.0)
          .select(col("event_id"), col("value"),
            col("cusum_pos"), col("cusum_neg"),
            (col("cusum_pos") > 50.0d || col("cusum_neg") > 50.0d).as("alarm"))
          .orderBy("event_id")
      },
      Some("""WITH RECURSIVE s AS (
             |  SELECT cast(row_number() OVER (ORDER BY event_id) as bigint) AS i,
             |    event_id, value AS x
             |  FROM events WHERE user_id = 7),
             |m AS (
             |  SELECT cast(sum(cast(value as decimal(18,2))) as double) / count(*) AS mu
             |  FROM events WHERE user_id = 7),
             |rec AS (
             |  SELECT i, event_id, x,
             |    greatest(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE) + (x - mu) - 5.0) AS sp,
             |    greatest(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE) - (x - mu) - 5.0) AS sn
             |  FROM s CROSS JOIN m WHERE i = 1
             |  UNION ALL
             |  SELECT s.i, s.event_id, s.x,
             |    greatest(CAST(0.0 AS DOUBLE), rec.sp + (s.x - mu) - 5.0) AS sp,
             |    greatest(CAST(0.0 AS DOUBLE), rec.sn - (s.x - mu) - 5.0) AS sn
             |  FROM rec JOIN s ON s.i = rec.i + 1 CROSS JOIN m)
             |SELECT event_id, x AS value, sp AS cusum_pos, sn AS cusum_neg,
             |  (sp > 50.0 OR sn > 50.0) AS alarm
             |FROM rec ORDER BY event_id""".stripMargin),
    ),
    // EWMA CONTROL CHART (Roberts 1959 — with Page above and
    // ts_cusum_flag, the SPC triad): zₜ = λxₜ + (1−λ)zₜ₋₁ from z₀ = μ,
    // with the TIME-VARYING limit ±L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t})) that
    // tightens as the chart warms up. (1−λ)^{2t} is carried as a
    // MULTIPLICATIVE recursion state (q ← q·(0.7·0.7)) — pow() is
    // banned by the determinism policy (libm-vs-Math.pow last-ulp
    // split), a product recursion is exact-same-ops both engines.
    // LINEAR declared spelling since round 16: graft.udaf.Spc's
    // flatMapGroups pass carries (z, q) in one ordered O(n) sweep per
    // series. μ, σ from the exact-moment closed form, broadcast in.
    // Unrounded bit-exact.
    OpSpec(
      "ts_ewma_chart",
      (s, d) => {
        val base = ev(s, d).filter(col("user_id") === 7)
        val stats = base.agg(
          count(lit(1)).cast("double").as("nd"),
          sum(P.dec2(col("value"))).cast("double").as("sy"),
          sum((P.dec2(col("value")) * P.dec2(col("value"))).cast("decimal(38,4)"))
            .cast("double").as("syy"))
          .selectExpr("sy / nd AS mu",
            "sqrt((syy - sy * sy / nd) / (nd - 1)) AS sd")
        graft.udaf.Spc.ewmaChartDf(
            base.crossJoin(broadcast(stats))
              .select("user_id", "event_id", "value", "mu", "sd"),
            lambda = 0.3, omLambda = 0.7)
          .selectExpr("event_id", "value", "mu", "ewma",
            "3.0D * sd * sqrt(0.3D / (2.0D - 0.3D) * (1.0D - q)) AS ctrl_limit")
          .selectExpr("event_id", "value", "ewma", "ctrl_limit",
            "abs(ewma - mu) > ctrl_limit AS alarm")
          .orderBy("event_id")
      },
      Some("""WITH RECURSIVE s AS (
             |  SELECT cast(row_number() OVER (ORDER BY event_id) as bigint) AS i,
             |    event_id, value AS x
             |  FROM events WHERE user_id = 7),
             |m AS (
             |  SELECT sy / nd AS mu, sqrt((syy - sy * sy / nd) / (nd - 1)) AS sd
             |  FROM (
             |    SELECT cast(count(*) as double) AS nd,
             |      cast(sum(cast(value as decimal(18,2))) as double) AS sy,
             |      cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) as double) AS syy
             |    FROM events WHERE user_id = 7)),
             |rec AS (
             |  -- q must ride as DOUBLE: bare 0.7 * 0.7 is DECIMAL in
             |  -- DuckDB (exactly 0.490) where Spark's 0.7D * 0.7D is
             |  -- the double 0.48999999999999994 — the recursion would
             |  -- diverge measurably within a few steps
             |  SELECT i, event_id, x,
             |    0.3 * x + 0.7 * mu AS z,
             |    CAST(1.0 AS DOUBLE) * (CAST(0.7 AS DOUBLE) * CAST(0.7 AS DOUBLE)) AS q
             |  FROM s CROSS JOIN m WHERE i = 1
             |  UNION ALL
             |  SELECT s.i, s.event_id, s.x,
             |    0.3 * s.x + 0.7 * rec.z AS z,
             |    rec.q * (CAST(0.7 AS DOUBLE) * CAST(0.7 AS DOUBLE)) AS q
             |  FROM rec JOIN s ON s.i = rec.i + 1),
             |cl AS (
             |  SELECT event_id, x, mu, z,
             |    3.0 * sd * sqrt(0.3 / (2.0 - 0.3) * (1.0 - q)) AS ctrl_limit
             |  FROM rec CROSS JOIN m)
             |SELECT event_id, x AS value, z AS ewma, ctrl_limit,
             |  abs(z - mu) > ctrl_limit AS alarm
             |FROM cl ORDER BY event_id""".stripMargin),
    ),
    // BACKTEST — the forecasting tier's self-measuring report (what
    // sim_recall_report is to the ANN tier): one-step-ahead MAE of
    // naive (xₜ₋₁), Holt, and Holt-Winters on the same series, side by
    // side — the number that DECIDES which smoother a pipeline ships.
    // Forecasts come from the SAME linear udaf passes the declared
    // smoothers run (round 16 — the last inline prefix folds retired;
    // udaf/Holt and udaf/HoltWinters are bit-exact vs the old folds,
    // EwmSpec), broadcast-joined back by event_id; errors via one lag
    // window, MAE as the ordered fold over event order, r4. The
    // oracle reruns both recursive CTEs and the same lag/fold — every
    // double identical until the final rounds.
    OpSpec(
      "ts_backtest_report",
      (s, d) => {
        val base = ev(s, d).filter(col("user_id") === 7)
          .select("user_id", "event_id", "value")
        val holtF = graft.udaf.Holt.holtDf(base,
            alpha = 0.3, omAlpha = 0.7, beta = 0.1, omBeta = 0.9)
          .select(col("event_id").as("h_eid"),
            (col("level") + col("trend")).as("f_holt"))
        val hwF = graft.udaf.HoltWinters.holtWintersDf(base,
            m = 24, alpha = 0.3, omAlpha = 0.7, beta = 0.1, omBeta = 0.9,
            gamma = 0.05, omGamma = 0.95)
          .select(col("event_id").as("w_eid"),
            (col("level") + col("trend") + col("seasonal_next")).as("f_hw"))
        val withF = base
          .join(broadcast(holtF), col("event_id") === col("h_eid"))
          .join(broadcast(hwF), col("event_id") === col("w_eid"))
          .select(col("event_id"), col("value"),
            col("value").as("f_naive"), col("f_holt"), col("f_hw"))
        val lagE = Window.orderBy("event_id") // single declared series
        val errs = withF
          .select(col("event_id"), col("value"),
            abs(lag(col("f_naive"), 1).over(lagE) - col("value")).as("e_naive"),
            abs(lag(col("f_holt"), 1).over(lagE) - col("value")).as("e_holt"),
            abs(lag(col("f_hw"), 1).over(lagE) - col("value")).as("e_hw"))
          .filter(col("e_naive").isNotNull)
        errs
          .selectExpr("event_id",
            "stack(3, 'holt', e_holt, 'hw', e_hw, 'naive', e_naive) AS (model, err)")
          .groupBy("model")
          .agg(count(lit(1)).as("n"),
            expr("""aggregate(transform(array_sort(collect_list(named_struct('i', event_id, 'e', err))),
              |  x -> x.e), 0D, (acc, x) -> acc + x)""".stripMargin).as("se"))
          .select(col("model"), col("n"),
            P.r4(col("se") / col("n")).as("mae"))
          .orderBy("model")
      },
      Some(s"""WITH RECURSIVE s AS (
              |  SELECT cast(row_number() OVER (ORDER BY event_id) as bigint) AS i,
              |    event_id, value AS x
              |  FROM events WHERE user_id = 7),
              |rec AS (
              |  SELECT i, event_id, x, x AS l, CAST(0.0 AS DOUBLE) AS b FROM s WHERE i = 1
              |  UNION ALL
              |  SELECT s.i, s.event_id, s.x,
              |    0.3 * s.x + 0.7 * (rec.l + rec.b) AS l,
              |    0.1 * (0.3 * s.x + 0.7 * (rec.l + rec.b) - rec.l) + 0.9 * rec.b AS b
              |  FROM rec JOIN s ON s.i = rec.i + 1),
              |recw AS (
              |  SELECT i, event_id, x, x AS l, CAST(0.0 AS DOUBLE) AS b,
              |    list_transform(range(24), i2 -> CAST(0.0 AS DOUBLE)) AS sv
              |  FROM s WHERE i = 1
              |  UNION ALL
              |  SELECT s.i, s.event_id, s.x,
              |    $hwLSql AS l,
              |    0.1 * (($hwLSql) - rec.l) + 0.9 * rec.b AS b,
              |    rec.sv[2:24] ||
              |      [0.05 * (s.x - ($hwLSql)) + 0.95 * rec.sv[1]] AS sv
              |  FROM recw rec JOIN s ON s.i = rec.i + 1),
              |f AS (
              |  SELECT r.event_id, r.x, r.x AS f_naive, r.l + r.b AS f_holt,
              |    w.l + w.b + w.sv[1] AS f_hw
              |  FROM rec r JOIN recw w ON w.event_id = r.event_id),
              |e AS (
              |  SELECT event_id, x,
              |    abs(lag(f_naive, 1) OVER (ORDER BY event_id) - x) AS e_naive,
              |    abs(lag(f_holt, 1) OVER (ORDER BY event_id) - x) AS e_holt,
              |    abs(lag(f_hw, 1) OVER (ORDER BY event_id) - x) AS e_hw
              |  FROM f),
              |st AS (
              |  SELECT 'naive' AS model, event_id, e_naive AS err FROM e WHERE e_naive IS NOT NULL
              |  UNION ALL
              |  SELECT 'holt', event_id, e_holt FROM e WHERE e_holt IS NOT NULL
              |  UNION ALL
              |  SELECT 'hw', event_id, e_hw FROM e WHERE e_hw IS NOT NULL)
              |SELECT model, count(*) AS n,
              |  round(list_reduce(list_prepend(0.0, list(err ORDER BY event_id)),
              |    (acc, x) -> acc + x) / count(*), 4) AS mae
              |FROM st GROUP BY model ORDER BY model""".stripMargin),
    ),
    // Seasonal anomaly — z-score of each event against ITS HOUR-OF-
    // DAY baseline (how real monitoring alerts: 3am traffic compared
    // to 3am history, not the global mean). The 24-row baseline of
    // exact moment sums broadcasts back onto the stream; z and the
    // flag share formula text. Row-local after one tiny join — scales
    // as a scan.
    OpSpec(
      "ts_seasonal_anomaly",
      (s, d) => {
        val withHod = ev(s, d).withColumn("hod", hour(col("ts")).cast("bigint"))
        val base = withHod.groupBy("hod")
          .agg(count(lit(1)).as("n"),
            sum(P.dec2(col("value"))).cast("double").as("sx"),
            sum((P.dec2(col("value")) * P.dec2(col("value"))).cast("decimal(38,4)"))
              .cast("double").as("sq"))
          .select(col("hod"), (col("sx") / col("n")).as("mu"),
            sqrt((col("sq") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("sd"))
        withHod.join(broadcast(base), Seq("hod"))
          .filter(col("user_id") < 10) // bound verify output; baseline uses ALL rows
          .select(col("event_id"), col("user_id"),
            P.r4((col("value") - col("mu")) / col("sd")).as("z_seasonal"),
            (abs(col("value") - col("mu")) > lit(3.0) * col("sd")).as("is_anomaly"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  round((value - mu) / sd, 4) AS z_seasonal,
             |  abs(value - mu) > 3.0 * sd AS is_anomaly
             |FROM (
             |  SELECT event_id, user_id, value,
             |    extract(hour FROM cast(ts as timestamp)) AS hod
             |  FROM events) e
             |JOIN (
             |  SELECT hod, sx / n AS mu,
             |    sqrt((sq - sx * sx / n) / (n - 1)) AS sd
             |  FROM (
             |    SELECT extract(hour FROM cast(ts as timestamp)) AS hod,
             |      count(*) AS n,
             |      cast(sum(cast(value as decimal(18,2))) as double) AS sx,
             |      cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) as double) AS sq
             |    FROM events GROUP BY 1)) b USING (hod)
             |WHERE user_id < 10
             |ORDER BY event_id""".stripMargin),
    ),
    // Systematic every-Nth downsampling per series — the "thin the
    // stream, keep the phase" sampler (pandas .iloc[::n] per group):
    // keeps rows where (row_number − 1) mod 25 = 0, so each series
    // retains its first event and every 25th after — deterministic,
    // order-defined, unlike hash sampling which is content-defined.
    // One row_number window, then a row-local filter.
    OpSpec(
      "ts_every_nth",
      (s, d) => {
        val byU = Window.partitionBy("user_id").orderBy("event_id")
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            row_number().over(byU).cast("bigint").as("i"))
          .filter((col("i") - 1) % 25 === 0)
          .select(col("event_id"), col("user_id"), col("value"), col("i"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value, i
             |FROM (
             |  SELECT event_id, user_id, value,
             |    cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) as bigint) AS i
             |  FROM events)
             |WHERE (i - 1) % 25 = 0
             |ORDER BY event_id""".stripMargin),
    ),
    // Hourly load-profile percentiles — p50/p95 of value by hour of
    // day, the capacity-planning readout on every SRE dashboard. ONE
    // hash agg; percentile takes the fraction ARRAY so each hour
    // sorts once for both order statistics (the agg_quantile_multi
    // device, same exact-interpolation semantics as quantile_cont).
    OpSpec(
      "ts_load_percentiles",
      (s, d) =>
        ev(s, d)
          .groupBy(hour(col("ts")).cast("bigint").as("hod"))
          .agg(count(lit(1)).as("n"),
            expr("percentile(value, array(0.5D, 0.95D))").as("pq"))
          .select(col("hod"), col("n"),
            P.r4(col("pq")(0)).as("p50"), P.r4(col("pq")(1)).as("p95"))
          .orderBy("hod"),
      Some("""SELECT hod, count(*) AS n,
             |  round(quantile_cont(value, 0.5), 4) AS p50,
             |  round(quantile_cont(value, 0.95), 4) AS p95
             |FROM (SELECT extract(hour FROM cast(ts as timestamp)) AS hod, value
             |      FROM events) t
             |GROUP BY hod
             |ORDER BY hod""".stripMargin),
    ),
    // Weekly activity heatmap — (weekday × hour) totals, the classic
    // calendar grid every ops dashboard draws. Weekday is pinned
    // Monday=0 on both engines (Spark weekday() ≡ DuckDB isodow−1 —
    // Spark dayofweek() is Sunday=1 and DuckDB dow is Sunday=0, a
    // cross-engine off-by-one this spelling avoids). One map-combined
    // hash agg over ≤168 cells.
    OpSpec(
      "ts_calendar_profile",
      (s, d) =>
        ev(s, d)
          .groupBy(expr("weekday(ts)").cast("bigint").as("dow"),
            hour(col("ts")).cast("bigint").as("hod"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("dow", "hod"),
      Some("""SELECT isodow(cast(ts as timestamp)) - 1 AS dow,
             |  extract(hour FROM cast(ts as timestamp)) AS hod,
             |  count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY dow, hod""".stripMargin),
    ),
    // pd.to_datetime(format=) — format-string round trip: render the
    // event time to text and parse it back (Spark date_format /
    // to_timestamp ≡ DuckDB strftime / strptime; the second-resolution
    // format truncates µs, which the round trip makes visible).
    // Row-local, scan-fused.
    OpSpec(
      "ts_parse_format",
      (s, d) =>
        ev(s, d)
          .filter(col("user_id") === 7)
          .select(col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
            to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
              "yyyy-MM-dd HH:mm:ss").cast("timestamp_ntz").as("ts_parsed"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  strftime(cast(ts as timestamp), '%Y-%m-%d %H:%M:%S') AS ts_str,
             |  strptime(strftime(cast(ts as timestamp), '%Y-%m-%d %H:%M:%S'),
             |           '%Y-%m-%d %H:%M:%S') AS ts_parsed
             |FROM events WHERE user_id = 7 ORDER BY event_id""".stripMargin),
    ),
    // First derivative of an irregular series — Δvalue/Δseconds per
    // key (the monitoring "rate()" primitive). One lag window; the
    // numerator subtraction and the µs→s scaling are the same IEEE
    // ops on identical operands in both engines; a zero Δt is
    // null-guarded (P.div ≡ nullif) so ANSI division can't throw.
    OpSpec(
      "ts_derivative",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        ev(s, d)
          .filter(col("user_id") < 10)
          .select(col("event_id"), col("user_id"),
            P.div(col("value") - lag("value", 1).over(w),
              (unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w))) / lit(1000000.0))
              .as("rate_per_s"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  (value - lag(value, 1) OVER w)
             |    / nullif((epoch_us(cast(ts as timestamp))
             |              - epoch_us(lag(cast(ts as timestamp), 1) OVER w)) / 1000000.0, 0)
             |    AS rate_per_s
             |FROM events WHERE user_id < 10
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
             |ORDER BY event_id""".stripMargin),
    ),
    // TWAP — the time-weighted average every market/telemetry TSDB
    // quotes for irregular samples: each value weighted by how long it
    // was live (Δt to the next sample). The weight is an exact µs
    // int64, the product value·Δt an exact decimal, so the whole
    // aggregation is order-independent with ONE double division at
    // the end — determinism for free at any partitioning. One lag-
    // window pass + one hash agg.
    OpSpec(
      "ts_twap",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        ev(s, d)
          .filter(col("user_id") < 10)
          .withColumn("dt_us",
            unix_micros(lead("ts", 1).over(w)) - unix_micros(col("ts")))
          .filter(col("dt_us").isNotNull)
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(
            (sum((P.dec2(col("value")) * col("dt_us")).cast("decimal(38,2)"))
              .cast("double") / sum(col("dt_us")).cast("double")).as("twap"),
            count(lit(1)).as("n"))
          .select(col("user_id"), P.tsOut(col("day")).as("day"),
            col("twap"), col("n"))
          .orderBy("user_id", "day")
      },
      Some("""SELECT user_id, date_trunc('day', ts2) AS day,
             |  cast(sum(cast(cast(value as decimal(18,2)) * dt_us as decimal(38,2))) as double)
             |    / cast(sum(dt_us) as double) AS twap,
             |  count(*) AS n
             |FROM (
             |  SELECT user_id, cast(ts as timestamp) AS ts2, value,
             |    epoch_us(lead(cast(ts as timestamp), 1)
             |             OVER (PARTITION BY user_id ORDER BY event_id))
             |      - epoch_us(cast(ts as timestamp)) AS dt_us
             |  FROM events WHERE user_id < 10)
             |WHERE dt_us IS NOT NULL
             |GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin),
    ),
    // interpolate(method='nearest') — fill each null with the value of
    // the TIME-nearer valid neighbor (ties → previous, pinned in the
    // shared CASE text so both engines agree by construction; edge
    // nulls take the only available side — NOTE this deliberately
    // diverges from pandas, which leaves LEADING NaNs unfilled for
    // method='nearest'; both engines here spell the same edge-fill
    // CASE, so the cross-engine gate is unaffected by the deviation).
    // Completes the interpolation
    // family: linear / time / limit / nearest. Same two-window
    // prev/next scaffold as ts_interpolate_linear — no arithmetic on
    // values at all, so determinism is free.
    OpSpec(
      "ts_interpolate_nearest",
      (s, d) => {
        val ordered = Window.orderBy("event_id")
        val back = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fwd = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ev(s, d)
          .filter(col("user_id") === 7)
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .withColumn("t", unix_micros(col("ts")))
          // all four functions in one projection level: same
          // partition/order, per-function frames -> ONE WindowExec
          .select(col("*"),
            last("v", ignoreNulls = true).over(back).as("prev_v"),
            last(when(col("v").isNotNull, col("t")), ignoreNulls = true).over(back).as("pt"),
            first("v", ignoreNulls = true).over(fwd).as("next_v"),
            first(when(col("v").isNotNull, col("t")), ignoreNulls = true).over(fwd).as("nt"))
          .select(col("event_id"), col("v"),
            when(col("v").isNotNull, col("v"))
              .when(col("prev_v").isNull, col("next_v"))
              .when(col("next_v").isNull, col("prev_v"))
              .when(col("t") - col("pt") <= col("nt") - col("t"), col("prev_v"))
              .otherwise(col("next_v")).as("v_near"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, v,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN prev_v IS NULL THEN next_v
             |       WHEN next_v IS NULL THEN prev_v
             |       WHEN t - pt <= nt - t THEN prev_v
             |       ELSE next_v END AS v_near
             |FROM (
             |  SELECT event_id, v, t,
             |    last_value(v IGNORE NULLS) OVER b AS prev_v,
             |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER b AS pt,
             |    first_value(v IGNORE NULLS) OVER f AS next_v,
             |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER f AS nt
             |  FROM (
             |    SELECT event_id,
             |      CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v,
             |      epoch_us(cast(ts as timestamp)) AS t
             |    FROM events WHERE user_id = 7)
             |  WINDOW b AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         f AS (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |ORDER BY event_id""".stripMargin),
    ),
    // ewm(halflife=1h, times=ts) — TIME-decay EWM for irregular
    // series, the form a TSDB actually needs (row-index decay assumes
    // regular spacing; ts_ewm/ts_ewm_adjust_false are that family).
    // Each step decays the running (num, den) by 0.5^(Δt/halflife)
    // before adding the new sample — the pandas adjust=True
    // times-aware weights. Determinism: pow(0.5, Δt/hl) is
    // transcendental (last-ulp engine skew possible), so per §2.0 the
    // terms fold in the SAME order via the prefix-list device of
    // ts_ewm_adjust_false (uniform {num,den,t} structs so DuckDB's
    // init-less list_reduce types; Spark seeds with element 1) and
    // the output rounds to 4 dp. Single-series by policy.
    OpSpec(
      "ts_ewm_halflife_time",
      (s, d) => {
        val cum = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d)
          .filter(col("user_id") === 7)
          .withColumn("l",
            collect_list(struct(unix_micros(col("ts")).as("t"), col("value").as("v")))
              .over(cum))
          .select(col("event_id"),
            expr("""round(aggregate(
                   |  slice(transform(l, s -> named_struct('num', s.v, 'den', 1.0D, 't', s.t)), 2,
                   |        size(l) - 1),
                   |  named_struct('num', element_at(l, 1).v, 'den', 1.0D, 't', element_at(l, 1).t),
                   |  (acc, e) -> named_struct(
                   |    'num', acc.num * pow(0.5D, (e.t - acc.t) / 3600000000.0D) + e.num,
                   |    'den', acc.den * pow(0.5D, (e.t - acc.t) / 3600000000.0D) + e.den,
                   |    't', e.t),
                   |  acc -> acc.num / acc.den), 4)""".stripMargin).as("ewm_t"))
          .orderBy("event_id")
      },
      // DuckDB trap pinned here: list_reduce casts each lambda result
      // back to the list's ELEMENT type, and a bare `1.0` literal is
      // DECIMAL(2,1) — which silently truncated the den accumulator to
      // one decimal until every field was forced to DOUBLE.
      Some("""SELECT event_id,
             |  round(r.num / r.den, 4) AS ewm_t
             |FROM (
             |  SELECT event_id,
             |    list_reduce(
             |      list_transform(l, s -> {'num': s.v, 'den': 1.0::DOUBLE, 't': s.t}),
             |      (acc, e) -> {'num': acc.num * pow(0.5::DOUBLE, (e.t - acc.t)::DOUBLE / 3600000000.0::DOUBLE) + e.num,
             |                   'den': acc.den * pow(0.5::DOUBLE, (e.t - acc.t)::DOUBLE / 3600000000.0::DOUBLE) + e.den,
             |                   't': e.t}) AS r
             |  FROM (
             |    SELECT event_id,
             |      list({'t': epoch_us(cast(ts as timestamp)), 'v': value}) OVER (
             |        ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l
             |    FROM events WHERE user_id = 7))
             |ORDER BY event_id""".stripMargin),
    ),
    // pandas Series.autocorr(lag=1) PER SERIES — lag-1 Pearson over
    // (x_t, x_{t-1}) pairs, grouped by user. Same exact-decimal
    // closed form as agg_corr_grouped (six sums per group, one hash
    // agg after the lag window); the window and the agg share the
    // user_id shuffle, so the whole thing is ONE exchange + sort at
    // any scale. Defined when the group has ≥2 pairs and nonzero
    // variance on both margins (P.div null-guards).
    OpSpec(
      "ts_autocorr",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        val x = P.dec2(col("value"))
        val y = P.dec2(col("y"))
        ev(s, d).filter(col("user_id") < 10)
          .withColumn("y", lag("value", 1).over(w))
          .filter(col("y").isNotNull)
          .groupBy("user_id")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum((x * x).cast("decimal(38,4)")).cast("double").as("sxx"),
            sum((y * y).cast("decimal(38,4)")).cast("double").as("syy"),
            sum((x * y).cast("decimal(38,4)")).cast("double").as("sxy"))
          .select(col("user_id"), col("n").cast("bigint").as("n_pairs"),
            P.r4(P.div(col("n") * col("sxy") - col("sx") * col("sy"),
              sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("acf1"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, cast(n as bigint) AS n_pairs,
             |  round((n * sxy - sx * sy) /
             |        nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0), 4) AS acf1
             |FROM (
             |  SELECT user_id, cast(count(*) as double) AS n,
             |    cast(sum(cast(value as decimal(18,2))) as double) AS sx,
             |    cast(sum(cast(y as decimal(18,2))) as double) AS sy,
             |    cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) as double) AS sxx,
             |    cast(sum(cast(cast(y as decimal(18,2)) * cast(y as decimal(18,2)) as decimal(38,4))) as double) AS syy,
             |    cast(sum(cast(cast(value as decimal(18,2)) * cast(y as decimal(18,2)) as decimal(38,4))) as double) AS sxy
             |  FROM (
             |    SELECT user_id, value,
             |      lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS y
             |    FROM events WHERE user_id < 10)
             |  WHERE y IS NOT NULL
             |  GROUP BY user_id)
             |ORDER BY user_id""".stripMargin),
    ),
    // Rolling z-score anomaly flag — the monitoring staple: flag rows
    // whose value sits more than 3 sample-stddevs from the trailing
    // 20-row mean. Moments via the exact-decimal sum device
    // (win_rolling_std), so mean/std are IDENTICAL doubles in both
    // engines; the flag is a comparison of identical doubles —
    // deterministic even at an exact tie, no rounding policy needed
    // (§2.0 rule 2 applies to emitted continuous values; the emitted
    // z is r4'd, the flag is computed pre-rounding). One WindowExec
    // on the user_id shuffle at any scale.
    OpSpec(
      "ts_anomaly_flag",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(-19, 0)
        val x = P.dec2(col("value"))
        ev(s, d).filter(col("user_id") < 10)
          // one projection level -> ONE fused WindowExec (was 3)
          .select(col("*"),
            count(lit(1)).over(w).as("n"),
            sum(x).over(w).cast("double").as("sx"),
            sum((x * x).cast("decimal(38,4)")).over(w).cast("double").as("sxx"))
          .withColumn("m", col("sx") / col("n").cast("double"))
          .withColumn("sd",
            sqrt((col("sxx") - col("sx") * col("sx") / col("n").cast("double")) /
              (col("n") - 1).cast("double")))
          .filter(col("n") === 20)
          .select(col("event_id"), col("user_id"),
            P.r4((col("value") - col("m")) / col("sd")).as("z"),
            (abs(col("value") - col("m")) > lit(3.0) * col("sd")).as("is_anomaly"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  round((value - m) / sd, 4) AS z,
             |  abs(value - m) > 3.0 * sd AS is_anomaly
             |FROM (
             |  SELECT event_id, user_id, value,
             |    count(*) OVER w AS n,
             |    cast(sum(cast(value as decimal(18,2))) OVER w as double) / cast(count(*) OVER w as double) AS m,
             |    sqrt((cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) OVER w as double)
             |          - cast(sum(cast(value as decimal(18,2))) OVER w as double) * cast(sum(cast(value as decimal(18,2))) OVER w as double) / cast(count(*) OVER w as double))
             |         / cast(count(*) OVER w - 1 as double)) AS sd
             |  FROM events WHERE user_id < 10
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
             |WHERE n = 20
             |ORDER BY event_id""".stripMargin),
    ),
    // LTTB-style plotting downsampler (Steinarsson 2013, the Grafana
    // staple), parallel variant: fixed 20-row buckets; each bucket
    // keeps the point with the largest triangle area against the
    // PREVIOUS and NEXT buckets' centroids (the original anchors on
    // the previously-SELECTED point, which is sequential; anchoring on
    // the neighbor centroid is the standard parallel relaxation and
    // keeps every bucket independent). First/last bucket pin the
    // series endpoints, as LTTB does. Determinism: centroids are
    // exact-int/decimal sums with one division, the area cross-product
    // is identical IEEE text in both engines, and the per-bucket
    // argmax breaks area ties by event_id. Plan: two tiny bucket aggs
    // broadcast back onto the rows, one window for the argmax — the
    // 100 TB shape is one shuffle on (series, bucket).
    OpSpec(
      "ts_downsample_lttb",
      (s, d) => {
        val rows = ev(s, d).filter(col("user_id") === 7)
          .select(col("event_id"), unix_micros(col("ts")).as("x"),
            col("value").as("y"))
          .withColumn("rn", row_number().over(Window.orderBy("event_id")))
          .withColumn("b", expr("cast((rn - 1) div 20 as bigint)"))
        val cent = rows.groupBy("b").agg(
          (sum(col("x")).cast("double") / count(lit(1)).cast("double")).as("cx"),
          (sum(P.dec2(col("y"))).cast("double") / count(lit(1)).cast("double")).as("cy"),
          min("rn").as("rn_min"), max("rn").as("rn_max"))
        val w = Window.orderBy("b")
        val anchored = cent
          .withColumn("ax", lag("cx", 1).over(w)).withColumn("ay", lag("cy", 1).over(w))
          .withColumn("nx", lead("cx", 1).over(w)).withColumn("ny", lead("cy", 1).over(w))
          // bucket count rides the (tiny) bucket table as a window
          // count — no driver-side action in a query builder
          .withColumn("n_b", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .select("b", "ax", "ay", "nx", "ny", "rn_min", "rn_max", "n_b")
        rows.join(broadcast(anchored), Seq("b"))
          .withColumn("area",
            abs((col("ax") - col("nx")) * (col("y") - col("ay")) -
              (col("ax") - col("x")) * (col("ny") - col("ay"))))
          .withColumn("pick",
            when(col("b") === 0, col("rn") === col("rn_min"))
              .when(col("b") === col("n_b") - 1, col("rn") === col("rn_max"))
              .otherwise(row_number().over(
                Window.partitionBy("b").orderBy(desc("area"), col("event_id"))) === 1))
          .filter(col("pick"))
          .select(col("b"), col("event_id"), col("x"), col("y"))
          .orderBy("b")
      },
      Some("""WITH r AS (
             |  SELECT event_id, epoch_us(cast(ts as timestamp)) AS x, value AS y,
             |    row_number() OVER (ORDER BY event_id) AS rn
             |  FROM events WHERE user_id = 7),
             |rb AS (SELECT *, cast((rn - 1) // 20 as bigint) AS b FROM r),
             |c AS (
             |  SELECT b,
             |    cast(sum(x) as double) / cast(count(*) as double) AS cx,
             |    cast(sum(cast(y as decimal(18,2))) as double) / cast(count(*) as double) AS cy,
             |    min(rn) AS rn_min, max(rn) AS rn_max
             |  FROM rb GROUP BY b),
             |a AS (
             |  SELECT b,
             |    lag(cx, 1) OVER (ORDER BY b) AS ax, lag(cy, 1) OVER (ORDER BY b) AS ay,
             |    lead(cx, 1) OVER (ORDER BY b) AS nx, lead(cy, 1) OVER (ORDER BY b) AS ny,
             |    rn_min, rn_max, count(*) OVER () AS n_b
             |  FROM c),
             |s AS (
             |  SELECT rb.b, rb.event_id, rb.x, rb.y, rb.rn, a.rn_min, a.rn_max, a.n_b,
             |    abs((a.ax - a.nx) * (rb.y - a.ay) - (a.ax - rb.x) * (a.ny - a.ay)) AS area
             |  FROM rb JOIN a USING (b))
             |SELECT b, event_id, x, y
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY b ORDER BY area DESC, event_id) AS pick_rn
             |  FROM s)
             |WHERE CASE WHEN b = 0 THEN rn = rn_min
             |           WHEN b = n_b - 1 THEN rn = rn_max
             |           ELSE pick_rn = 1 END
             |ORDER BY b""".stripMargin),
    ),
    // Cross-SERIES correlation: Pearson r between two users' HOURLY
    // TOTALS on the hours both were active. Totals, not means — the
    // bucket series stays an exact 2-dp decimal, so the co-moment
    // sums reduce exactly (a mean-based series would sum arbitrary
    // doubles in engine-specific order). Plan: one hash agg per user
    // slice off the same scan, inner join on hour (both sides already
    // shuffled by hour), closed-form r from six exact sums — at
    // 100 TB this is two map-side-combined aggs + one equi-join of
    // bucket rows.
    OpSpec(
      "ts_cross_corr",
      (s, d) => {
        def hourly(uid: Int, vc: String) =
          ev(s, d).filter(col("user_id") === uid)
            .groupBy(date_trunc("hour", col("ts")).as("h"))
            .agg(sum(P.dec2(col("value"))).as(vc))
        val j = hourly(7, "va").join(hourly(8, "vb"), Seq("h"))
        val x = col("va"); val y = col("vb")
        j.agg(
            count(lit(1)).cast("double").as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum((x * x).cast("decimal(38,4)")).cast("double").as("sxx"),
            sum((y * y).cast("decimal(38,4)")).cast("double").as("syy"),
            sum((x * y).cast("decimal(38,4)")).cast("double").as("sxy"))
          .select(col("n").cast("bigint").as("n_hours"),
            P.r4(P.div(col("n") * col("sxy") - col("sx") * col("sy"),
              sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("xcorr"))
      },
      Some("""SELECT cast(n as bigint) AS n_hours,
             |  round((n * sxy - sx * sy) /
             |        nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0), 4) AS xcorr
             |FROM (
             |  SELECT cast(count(*) as double) AS n,
             |    cast(sum(va) as double) AS sx, cast(sum(vb) as double) AS sy,
             |    cast(sum(cast(va * va as decimal(38,4))) as double) AS sxx,
             |    cast(sum(cast(vb * vb as decimal(38,4))) as double) AS syy,
             |    cast(sum(cast(va * vb as decimal(38,4))) as double) AS sxy
             |  FROM (
             |    SELECT date_trunc('hour', cast(ts as timestamp)) AS h,
             |      sum(cast(value as decimal(18,2))) AS va
             |    FROM events WHERE user_id = 7 GROUP BY 1) a
             |  JOIN (
             |    SELECT date_trunc('hour', cast(ts as timestamp)) AS h,
             |      sum(cast(value as decimal(18,2))) AS vb
             |    FROM events WHERE user_id = 8 GROUP BY 1) b USING (h))""".stripMargin),
    ),
    // Weekly cohort retention — the product-analytics staple: of the
    // users active in week w, what fraction is also active in week
    // w+1. Everything reduces to the DISTINCT (user, week) pair set
    // (one shuffle, tiny vs the fact table), then a self-join on
    // (user, week+7d) and two counts — at 100 TB the fact table is
    // touched once, map-side, and only user-week pairs ever shuffle.
    // date_trunc('week') starts Monday in BOTH engines; the ratio is
    // one double division of exact counts, r4.
    OpSpec(
      "ts_retention",
      (s, d) => {
        val au = ev(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
          .distinct()
        val nxt = au.select(col("user_id"),
          (col("week") - expr("INTERVAL 7 DAYS")).as("week"))
        val active = au.groupBy("week").agg(count(lit(1)).as("active"))
        val retained = au.join(nxt, Seq("user_id", "week"))
          .groupBy("week").agg(count(lit(1)).as("retained"))
        active.join(retained, Seq("week"), "left")
          .select(P.tsOut(col("week")).as("week"), col("active"),
            coalesce(col("retained"), lit(0L)).as("retained"),
            P.r4(coalesce(col("retained"), lit(0L)).cast("double") /
              col("active").cast("double")).as("retention"))
          .orderBy("week")
      },
      Some("""WITH au AS (
             |  SELECT DISTINCT user_id, date_trunc('week', cast(ts as timestamp)) AS week
             |  FROM events),
             |nxt AS (SELECT user_id, week - INTERVAL 7 DAY AS week FROM au),
             |active AS (SELECT week, count(*) AS active FROM au GROUP BY week),
             |retained AS (
             |  SELECT week, count(*) AS retained
             |  FROM au JOIN nxt USING (user_id, week) GROUP BY week)
             |SELECT a.week, a.active,
             |  coalesce(r.retained, 0) AS retained,
             |  round(cast(coalesce(r.retained, 0) as double) / cast(a.active as double), 4) AS retention
             |FROM active a LEFT JOIN retained r ON a.week = r.week
             |ORDER BY a.week""".stripMargin),
    ),
    // Time-to-convert: first signup → first purchase per user, summary
    // over converting users. Per-user agg (min-ts per stage) is one
    // shuffle of two timestamps per user; deltas are exact µs bigints,
    // so the mean is Σ/n with identical IEEE divisions and the median
    // interpolates two exact ints — both r4. The ts_funnel device
    // applied to the duration question a growth team actually asks.
    OpSpec(
      "ts_time_to_convert",
      (s, d) => {
        val per = ev(s, d)
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("s_us"),
            min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("p_us"))
          .filter(col("s_us").isNotNull && col("p_us").isNotNull &&
            col("p_us") > col("s_us"))
          .select((col("p_us") - col("s_us")).as("delta_us"))
        per.agg(
            count(lit(1)).as("n_users"),
            P.r4(sum(col("delta_us")).cast("double") / count(lit(1)).cast("double") /
              lit(3600000000.0)).as("avg_hours"),
            P.r4(expr("percentile(delta_us, 0.5D)") / lit(3600000000.0)).as("p50_hours"))
      },
      Some("""SELECT count(*) AS n_users,
             |  round(cast(sum(delta_us) as double) / cast(count(*) as double) / 3600000000.0, 4) AS avg_hours,
             |  round(quantile_cont(delta_us, 0.5) / 3600000000.0, 4) AS p50_hours
             |FROM (
             |  SELECT p_us - s_us AS delta_us
             |  FROM (
             |    SELECT user_id,
             |      min(CASE WHEN event_type = 'signup' THEN epoch_us(cast(ts as timestamp)) END) AS s_us,
             |      min(CASE WHEN event_type = 'purchase' THEN epoch_us(cast(ts as timestamp)) END) AS p_us
             |    FROM events GROUP BY user_id)
             |  WHERE s_us IS NOT NULL AND p_us IS NOT NULL AND p_us > s_us)""".stripMargin),
    ),
    // Session-duration summary over the ts_sessionize sessions (the
    // question the sessionization actually feeds): session count,
    // mean events/session, mean and median duration. Durations are
    // exact µs bigints (min/max per session), so every aggregate is
    // exact-int until the final r4'd divisions/interpolation — and the
    // whole thing rides the SAME user_id shuffle as sessionize plus
    // one single-row reduction.
    OpSpec(
      "ts_session_stats",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("event_id")
        val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = ev(s, d)
          .filter(col("user_id") < 10)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum("new_sess").over(cum))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
        sess.agg(
          count(lit(1)).as("n_sessions"),
          P.r4(sum(col("n_events")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_events"),
          P.r4(sum(col("dur_us")).cast("double") / count(lit(1)).cast("double") /
            lit(60000000.0)).as("avg_minutes"),
          P.r4(expr("percentile(dur_us, 0.5D)") / lit(60000000.0)).as("p50_minutes"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(cast(ts as timestamp)) AS us
             |          FROM events WHERE user_id < 10),
             |flagged AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_sess
             |  FROM (SELECT *, lag(us, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_us FROM e)),
             |sess AS (
             |  SELECT user_id,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id, us
             |  FROM flagged),
             |per AS (
             |  SELECT user_id, session_id, count(*) AS n_events,
             |    max(us) - min(us) AS dur_us
             |  FROM sess GROUP BY user_id, session_id)
             |SELECT count(*) AS n_sessions,
             |  round(cast(sum(n_events) as double) / cast(count(*) as double), 4) AS avg_events,
             |  round(cast(sum(dur_us) as double) / cast(count(*) as double) / 60000000.0, 4) AS avg_minutes,
             |  round(quantile_cont(dur_us, 0.5) / 60000000.0, 4) AS p50_minutes
             |FROM per""".stripMargin),
    ),
    // ACF profile: lag-1..5 autocorrelation per series in ONE pass —
    // five lag columns off a single window sort, stack-unpivoted to
    // (user, k, x, y) rows, then the grouped exact-decimal Pearson
    // closed form per (user, k). The unpivot multiplies rows 5× AFTER
    // the window (row-local, no extra shuffle); at 100 TB this is
    // still one exchange + sort + one hash agg. The profile is what
    // seasonality/AR-order diagnostics actually read (pandas
    // plot_acf's data).
    OpSpec(
      "ts_acf_profile",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        val base = ev(s, d).filter(col("user_id") < 4)
        val lagged = (1 to 5).foldLeft(base) { (df, k) =>
          df.withColumn(s"y$k", lag("value", k).over(w))
        }
        val stacked = lagged.select(col("user_id"), col("value"),
          expr("stack(5, 1L, y1, 2L, y2, 3L, y3, 4L, y4, 5L, y5) as (k, y)"))
          .filter(col("y").isNotNull)
        val x = P.dec2(col("value"))
        val y = P.dec2(col("y"))
        stacked.groupBy("user_id", "k")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum((x * x).cast("decimal(38,4)")).cast("double").as("sxx"),
            sum((y * y).cast("decimal(38,4)")).cast("double").as("syy"),
            sum((x * y).cast("decimal(38,4)")).cast("double").as("sxy"))
          .select(col("user_id"), col("k"), col("n").cast("bigint").as("n_pairs"),
            P.r4(P.div(col("n") * col("sxy") - col("sx") * col("sy"),
              sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("acf"))
          .orderBy("user_id", "k")
      },
      Some {
        val lagCols = (1 to 5).map(k =>
          s"lag(value, $k) OVER (PARTITION BY user_id ORDER BY event_id) AS y$k").mkString(",\n  ")
        val arms = (1 to 5).map(k =>
          s"SELECT user_id, value, cast($k as bigint) AS k, y$k AS y FROM lagged").mkString("\n  UNION ALL ")
        s"""WITH lagged AS (
           |  SELECT user_id, value,
           |  $lagCols
           |  FROM events WHERE user_id < 4),
           |stacked AS (
           |  $arms),
           |sums AS (
           |  SELECT user_id, k, cast(count(*) as double) AS n,
           |    cast(sum(cast(value as decimal(18,2))) as double) AS sx,
           |    cast(sum(cast(y as decimal(18,2))) as double) AS sy,
           |    cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) as double) AS sxx,
           |    cast(sum(cast(cast(y as decimal(18,2)) * cast(y as decimal(18,2)) as decimal(38,4))) as double) AS syy,
           |    cast(sum(cast(cast(value as decimal(18,2)) * cast(y as decimal(18,2)) as decimal(38,4))) as double) AS sxy
           |  FROM stacked WHERE y IS NOT NULL GROUP BY user_id, k)
           |SELECT user_id, k, cast(n as bigint) AS n_pairs,
           |  round((n * sxy - sx * sy) /
           |        nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0), 4) AS acf
           |FROM sums ORDER BY user_id, k""".stripMargin
      },
    ),
    // Week-over-week growth of weekly totals — the BI dashboard
    // staple. The fact table reduces to one exact-decimal total per
    // week FIRST (map-side combined hash agg), then a lag window over
    // the handful of weekly rows; growth = cur/prev − 1 is one
    // identical-IEEE division of exact sums, r4, NULL on the first
    // week (P.div guard unneeded: prev is NULL, not zero).
    OpSpec(
      "ts_wow_growth",
      (s, d) => {
        val weekly = ev(s, d)
          .groupBy(date_trunc("week", col("ts")).as("week"))
          .agg(sum(P.dec2(col("value"))).as("total"))
        val w = Window.orderBy("week") // tiny: one row per week
        weekly
          .withColumn("prev", lag("total", 1).over(w))
          .select(P.tsOut(col("week")).as("week"),
            col("total").cast("double").as("total"),
            P.r4(col("total").cast("double") / col("prev").cast("double") - 1.0)
              .as("wow_growth"))
          .orderBy("week")
      },
      Some("""SELECT week, cast(total as double) AS total,
             |  round(cast(total as double) / cast(prev as double) - 1.0, 4) AS wow_growth
             |FROM (
             |  SELECT week, total, lag(total, 1) OVER (ORDER BY week) AS prev
             |  FROM (
             |    SELECT date_trunc('week', cast(ts as timestamp)) AS week,
             |      sum(cast(value as decimal(18,2))) AS total
             |    FROM events GROUP BY 1))
             |ORDER BY week""".stripMargin),
    ),
    // VWAP — volume-weighted average price per (event_type, day), the
    // market-data staple, with the weight extracted from the JSON props
    // column (the json_get device feeding an agg). price·weight stays
    // EXACT: decimal(18,2) × decimal(10,0) accumulated as decimal(38,2)
    // (order-independent under any partitioning); one r4'd division at
    // the end, nullif-guarded (weights can be 0). Row-local JSON
    // extract + one map-combined hash agg — the 100 TB shape.
    OpSpec(
      "ts_vwap",
      (s, d) => {
        val w = get_json_object(col("props"), "$.k").cast("bigint")
        ev(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(
            sum(w).as("volume"),
            sum((P.dec2(col("value")) * w.cast("decimal(10,0)"))
              .cast("decimal(38,2)")).as("pv"))
          .select(col("event_type"), P.tsOut(col("day")).as("day"),
            col("volume"),
            P.r4(P.div(col("pv").cast("double"), col("volume").cast("double")))
              .as("vwap"))
          .orderBy("event_type", "day")
      },
      Some("""SELECT event_type, day, cast(volume as bigint) AS volume,
             |  round(cast(pv as double) / nullif(cast(volume as double), 0), 4) AS vwap
             |FROM (
             |  SELECT event_type, date_trunc('day', cast(ts as timestamp)) AS day,
             |    sum(k) AS volume,
             |    sum(cast(cast(value as decimal(18,2)) * cast(k as decimal(10,0)) as decimal(38,2))) AS pv
             |  FROM (
             |    SELECT event_type, ts, value,
             |      cast(json_extract_string(props, '$.k') as bigint) AS k
             |    FROM events)
             |  GROUP BY 1, 2)
             |ORDER BY event_type, day""".stripMargin),
    ),
    // RSI(14), Cutler's SMA form — the technical-analysis staple on
    // the exact-arithmetic plan: diff of 2-dp decimals is exact, gains
    // and losses stay decimal through the 14-row rolling sums (one
    // WindowExec per user shard, no re-shuffle), and the only IEEE
    // step is the final 100·g/(g+l) division, r4'd and nullif-guarded
    // (a flat window has g+l = 0). Cutler over Wilder: the SMA form
    // is order-k windowed (scales as any rolling sum); Wilder's
    // recursive smoothing is the ts_ewm_adjust_false device.
    OpSpec(
      "ts_rsi",
      (s, d) => {
        val byU = Window.partitionBy("user_id").orderBy("event_id")
        val r14 = byU.rowsBetween(-13, 0)
        ev(s, d)
          .withColumn("diff",
            P.dec2(col("value")) - P.dec2(lag("value", 1).over(byU)))
          .withColumn("gain", greatest(col("diff"), lit(0).cast("decimal(18,2)")))
          .withColumn("loss", greatest(-col("diff"), lit(0).cast("decimal(18,2)")))
          .withColumn("nd", count(col("diff")).over(r14))
          .withColumn("g", sum(col("gain")).over(r14).cast("double"))
          .withColumn("l", sum(col("loss")).over(r14).cast("double"))
          .select(col("event_id"), col("user_id"),
            when(col("nd") === 14,
              P.r4(P.div(col("g") * 100, col("g") + col("l")))).as("rsi14"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CASE WHEN nd = 14 THEN round(g * 100 / nullif(g + l, 0), 4) END AS rsi14
             |FROM (
             |  SELECT event_id, user_id,
             |    count(diff) OVER w AS nd,
             |    cast(sum(greatest(diff, 0.00)) OVER w as double) AS g,
             |    cast(sum(greatest(-diff, 0.00)) OVER w as double) AS l
             |  FROM (
             |    SELECT event_id, user_id,
             |      cast(value as decimal(18,2)) -
             |        cast(lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) as decimal(18,2)) AS diff
             |    FROM events)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
             |ORDER BY event_id""".stripMargin),
    ),
    // resample('1h').mean().interpolate(method='time') — the full
    // pandas upsample-and-fill chain: hourly buckets (exact decimal
    // sums), the generated spine supplies EMPTY buckets, then linear
    // time-interpolation fills them from the bracketing observed
    // means (the ts_interpolate_time prev/next device, here over the
    // SPINE — thousands of hours at any corpus size, never the fact
    // table, so the unpartitioned window is bounded by the time range
    // exactly like ts_resample_spine). Spine edges are observed by
    // construction (lo/hi = min/max event hours), so no edge nulls.
    OpSpec(
      "ts_resample_interpolate",
      (s, d) => {
        val e7 = ev(s, d).filter(col("user_id") === 7)
        val buckets = e7
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg((sum(P.dec2(col("value"))).cast("double") /
            count(lit(1)).cast("double")).as("m"))
        val spine = e7
          .agg(date_trunc("hour", min(col("ts"))).as("lo"),
            date_trunc("hour", max(col("ts"))).as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
        val ordered = Window.orderBy("h") // spine-sized: hours, not rows
        val back = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fwd = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        spine.join(broadcast(buckets), Seq("h"), "left")
          .withColumn("t", unix_micros(col("h")))
          // one projection level -> ONE WindowExec (per-function frames)
          .select(col("*"),
            last("m", ignoreNulls = true).over(back).as("pm"),
            last(when(col("m").isNotNull, col("t")), ignoreNulls = true).over(back).as("pt"),
            first("m", ignoreNulls = true).over(fwd).as("nm"),
            first(when(col("m").isNotNull, col("t")), ignoreNulls = true).over(fwd).as("nt"))
          .select(P.tsOut(col("h")).as("h"),
            // UNROUNDED double out — the ts_interpolate_time-proven
            // device: the interp arithmetic is bit-identical across
            // engines, while round(,4) near a .00005 boundary is not
            when(col("m").isNotNull, col("m"))
              .otherwise(col("pm") + (col("nm") - col("pm")) *
                (col("t") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")).as("v_interp"),
            col("m").isNotNull.as("observed"))
          .orderBy("h")
      },
      Some("""WITH e AS (SELECT cast(ts as timestamp) AS ts, value
             |           FROM events WHERE user_id = 7),
             |b AS (SELECT date_trunc('hour', ts) AS h,
             |        cast(sum(cast(value as decimal(18,2))) as double)
             |          / cast(count(*) as double) AS m
             |      FROM e GROUP BY 1),
             |r AS (SELECT date_trunc('hour', min(ts)) AS lo,
             |             date_trunc('hour', max(ts)) AS hi FROM e),
             |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM r),
             |j AS (SELECT sp.h AS h, b.m AS m, epoch_us(sp.h) AS t
             |      FROM sp LEFT JOIN b USING (h))
             |SELECT h,
             |  CASE WHEN m IS NOT NULL THEN m
             |       ELSE pm + (nm - pm) * cast(t - pt as double) / cast(nt - pt as double)
             |  END AS v_interp,
             |  m IS NOT NULL AS observed
             |FROM (
             |  SELECT h, m, t,
             |    last_value(m IGNORE NULLS) OVER wb AS pm,
             |    last_value(CASE WHEN m IS NOT NULL THEN t END IGNORE NULLS) OVER wb AS pt,
             |    first_value(m IGNORE NULLS) OVER wf AS nm,
             |    first_value(CASE WHEN m IS NOT NULL THEN t END IGNORE NULLS) OVER wf AS nt
             |  FROM j
             |  WINDOW wb AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         wf AS (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |ORDER BY h""".stripMargin),
    ),
    // Month-to-date running total — the BI dashboard counterpart of
    // ts_wow_growth: daily exact-decimal totals FIRST (the only fact
    // shuffle, map-combined), then a cumsum window PARTITIONED BY
    // month — the reset-on-period-boundary semantics pandas spells
    // groupby(month).cumsum(). The window runs over daily rows (≤31
    // per partition at any corpus size). Decimal sums end-to-end; the
    // doubles are exact casts.
    OpSpec(
      "ts_mtd_cumulative",
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(sum(P.dec2(col("value"))).as("daily_total"))
          .withColumn("month", date_trunc("month", col("day")))
        val mtd = Window.partitionBy("month").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .select(P.tsOut(col("day")).as("day"),
            col("daily_total").cast("double").as("daily_total"),
            sum(col("daily_total")).over(mtd).cast("double").as("mtd_total"))
          .orderBy("day")
      },
      Some("""SELECT day, cast(daily_total as double) AS daily_total,
             |  cast(sum(daily_total) OVER (PARTITION BY date_trunc('month', day)
             |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS mtd_total
             |FROM (
             |  SELECT date_trunc('day', cast(ts as timestamp)) AS day,
             |    sum(cast(value as decimal(18,2))) AS daily_total
             |  FROM events GROUP BY 1)
             |ORDER BY day""".stripMargin),
    ),
    // SMA crossover signal (the golden/death-cross TA staple): where
    // the fast rolling mean crosses the slow one. DIVISIONLESS exact
    // comparison — SMA5 > SMA20 ⟺ s5·4 > s20 with both sums exact
    // decimals, so the regime bit can never straddle an engine
    // boundary; the crossover is a lag-compare of that bit. Both sums
    // + counts in ONE fused WindowExec, the lag in a second.
    OpSpec(
      "ts_sma_crossover",
      (s, d) => {
        val byU = Window.partitionBy("user_id").orderBy("event_id")
        val r5 = byU.rowsBetween(-4, 0)
        val r20 = byU.rowsBetween(-19, 0)
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(r20).as("n20"),
            sum(P.dec2(col("value"))).over(r5).as("s5"),
            sum(P.dec2(col("value"))).over(r20).as("s20"))
          // both flags coalesced non-null (the win_bollinger lesson:
          // nullable bools dtype-split the pandas comparator)
          .select(col("event_id"), col("user_id"),
            coalesce(when(col("n20") === 20, col("s5") * 4 > col("s20")), lit(false))
              .as("fast_above"))
          .select(col("event_id"), col("user_id"), col("fast_above"),
            coalesce(col("fast_above") =!= lag("fast_above", 1).over(byU), lit(false))
              .as("crossover"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, fast_above,
             |  coalesce(fast_above <> lag(fast_above, 1) OVER (PARTITION BY user_id ORDER BY event_id), false) AS crossover
             |FROM (
             |  SELECT event_id, user_id,
             |    coalesce(CASE WHEN n20 = 20 THEN s5 * 4 > s20 END, false) AS fast_above
             |  FROM (
             |    SELECT event_id, user_id,
             |      count(*) OVER w20 AS n20,
             |      sum(cast(value as decimal(18,2))) OVER w5 AS s5,
             |      sum(cast(value as decimal(18,2))) OVER w20 AS s20
             |    FROM events
             |    WINDOW w5 AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             |           w20 AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)))
             |ORDER BY event_id""".stripMargin),
    ),
    // CUSUM change-point flag (Page 1954) per user — the drift
    // detector. The running sum of deviations Σ(xⱼ−μ) is computed as
    // cusum_dec − i·μ: the cumsum stays an EXACT DECIMAL (order-
    // independent, no float running-sum whose segment-tree association
    // could split engines) and only ONE IEEE multiply-subtract per row
    // turns it into the deviation form — algebraically identical,
    // bit-deterministic. μ and σ come from the per-user exact moment
    // sums broadcast back (the agg_mad join-back shape); flag =
    // |cusum_dev| > 3σ·√i (the Brownian-scaling envelope).
    OpSpec(
      "ts_cusum_flag",
      // Determinism device (tightened after an sf0.1-only 4-dp tie
      // split that the sf0.01 gate never reached — row 38933's
      // `cusum − i·mu` differed in the last ulp between engines and
      // straddled a round-half boundary): the deviation is computed as
      // ONE exact decimal numerator (cusum·n − i·s — every factor a
      // 2-dp decimal or integer, exact in both engines) followed by a
      // single double division by n. Identical numerator + one
      // correctly-rounded division ⇒ bit-identical doubles, so the r4
      // cannot split. The drift flag compares the same expression
      // against 3·sd·√i (shared text, identical IEEE).
      (s, d) => {
        val byU = Window.partitionBy("user_id").orderBy("event_id")
        val cum = byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val stats = ev(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(P.dec2(col("value"))).as("s_dec"),
            sum((P.dec2(col("value")) * P.dec2(col("value"))).cast("decimal(38,4)"))
              .cast("double").as("q"))
          .select(col("user_id"), col("n"), col("s_dec"),
            sqrt((col("q") - col("s_dec").cast("double") * col("s_dec").cast("double") / col("n")) /
              (col("n") - 1)).as("sd"))
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            row_number().over(byU).cast("bigint").as("i"),
            sum(P.dec2(col("value"))).over(cum).as("cusum_dec"))
          .join(broadcast(stats), Seq("user_id"))
          // bounded casts keep BOTH engines in exact decimal: an
          // unbounded decimal×bigint would exceed width 38 and DuckDB
          // silently falls back to double for the product (measured —
          // that reintroduces the ulp split this device removes).
          // Width margin: decimal(24,2)×decimal(10,0) → decimal(35,2)
          // ≤ DuckDB's exact width 38, provided |cusum|,|s| < 10²²
          // and n < 10¹⁰ (i ≤ n). The guard asserts a 10× margin
          // (|sum| < 10²¹, n < 10⁹) so an out-of-envelope corpus
          // raises instead of silently nulling dev under Spark's
          // non-ANSI narrowing cast.
          .withColumn("dev",
            when(abs(col("cusum_dec")) < lit(1e21) &&
                 abs(col("s_dec")) < lit(1e21) && col("n") < lit(1000000000L),
              (col("cusum_dec").cast("decimal(24,2)") * col("n").cast("decimal(10,0)") -
                col("i").cast("decimal(10,0)") * col("s_dec").cast("decimal(24,2)"))
                .cast("double") / col("n").cast("double"))
              .otherwise(raise_error(lit(
                "ts_cusum_flag: per-user cusum/count exceeds the decimal(24,2)/decimal(10,0) envelope — widen the bounded casts"))))
          // NO r4 on dev: the exact-decimal numerator makes the two
          // engines' doubles bit-identical, and §2.0's rule is to
          // round only where internals differ — here rounding would
          // REINTRODUCE a split, because dev = num/n lands exactly on
          // 4-dp half-ties (num·10⁴ divisible by 2n happens
          // constantly) and Spark rounds the shortest-string repr
          // while DuckDB rounds the binary value.
          .select(col("event_id"), col("user_id"),
            col("dev").as("cusum_dev"),
            (abs(col("dev")) > lit(3.0) * col("sd") * sqrt(col("i").cast("double"))).as("drift"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  dev AS cusum_dev,
             |  abs(dev) > 3.0 * sd * sqrt(cast(i as double)) AS drift
             |FROM (
             |  SELECT event_id, user_id, i, sd,
             |    cast(cast(cusum_dec as decimal(24,2)) * cast(n as decimal(10,0))
             |         - cast(i as decimal(10,0)) * cast(s_dec as decimal(24,2)) as double)
             |      / cast(n as double) AS dev
             |  FROM (
             |    SELECT event_id, user_id,
             |      cast(row_number() OVER w as bigint) AS i,
             |      sum(cast(value as decimal(18,2))) OVER
             |        (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_dec
             |    FROM events
             |    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)) c
             |  JOIN (
             |    SELECT user_id, n, s_dec,
             |      sqrt((q - cast(s_dec as double) * cast(s_dec as double) / n) / (n - 1)) AS sd
             |    FROM (
             |      SELECT user_id, count(*) AS n,
             |        sum(cast(value as decimal(18,2))) AS s_dec,
             |        cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) as double) AS q
             |      FROM events GROUP BY 1)) st USING (user_id))
             |ORDER BY event_id""".stripMargin),
    ),
    // Local-maxima peak detection (the find_peaks staple): a point is
    // a peak when strictly above both neighbors AND at least
    // `prominence` above the lower one — every comparison is between
    // EXACT 2-dp decimals (lag/lead of the same parquet doubles), so
    // the flag can't straddle an engine boundary. One fused WindowExec
    // (lag+lead, same spec), row-local flag after.
    OpSpec(
      "ts_peak_detect",
      (s, d) => {
        val byU = Window.partitionBy("user_id").orderBy("event_id")
        val v = P.dec2(col("value"))
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            lag("value", 1).over(byU).as("pv"),
            lead("value", 1).over(byU).as("nv"))
          .select(col("event_id"), col("user_id"),
            (col("pv").isNotNull && col("nv").isNotNull &&
              v > P.dec2(col("pv")) && v > P.dec2(col("nv")) &&
              v - greatest(P.dec2(col("pv")), P.dec2(col("nv"))) >=
                lit(new java.math.BigDecimal("5.00"))).as("is_peak"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  pv IS NOT NULL AND nv IS NOT NULL
             |    AND cast(value as decimal(18,2)) > cast(pv as decimal(18,2))
             |    AND cast(value as decimal(18,2)) > cast(nv as decimal(18,2))
             |    AND cast(value as decimal(18,2)) -
             |        greatest(cast(pv as decimal(18,2)), cast(nv as decimal(18,2))) >= 5.00
             |    AS is_peak
             |FROM (
             |  SELECT event_id, user_id, value,
             |    lag(value, 1) OVER w AS pv,
             |    lead(value, 1) OVER w AS nv
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |ORDER BY event_id""".stripMargin),
    ),
    // Classical additive seasonal decomposition (statsmodels
    // seasonal_decompose, period=24) of the global hourly series:
    // observed = trend + seasonal + residual. Trend is the centered
    // 25-hour rolling mean (one division of an exact-decimal window
    // sum); the hour-of-day seasonal means and their grand-mean
    // centering sum DOUBLES, so both use the ordered-fold device
    // (Spark sorted-struct aggregate fold == DuckDB list_sum(list(x
    // ORDER BY k)) — the text_unigram_logprob equivalence) — bit-
    // deterministic, hence emitted UNROUNDED. Every window/fold runs
    // over the HOURLY frame (hours of history, never fact rows); the
    // seasonal table is 24 rows, broadcast back. One fact shuffle
    // total — the 100 TB shape.
    OpSpec(
      "ts_seasonal_decompose",
      (s, d) => decomposeFrame(s, d)
        .select(P.tsOut(col("h")).as("h"), col("obs"), col("trend"),
          col("seasonal"), col("resid"))
        .orderBy("h"),
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', cast(ts as timestamp)) AS h,
             |    sum(cast(value as decimal(18,2))) AS st
             |  FROM events GROUP BY 1),
             |t AS (
             |  SELECT h, cast(st as double) AS obs,
             |    CASE WHEN count(*) OVER w = 25
             |         THEN cast(sum(st) OVER w as double) / 25 END AS trend
             |  FROM hourly
             |  WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
             |t2 AS (SELECT h, obs, trend, obs - trend AS det,
             |         extract(hour FROM h) AS hod FROM t),
             |sm AS (SELECT hod, list_sum(list(det ORDER BY h)) / cast(count(*) as double) AS smean
             |       FROM t2 WHERE det IS NOT NULL GROUP BY hod),
             |g AS (SELECT list_sum(list(smean ORDER BY hod)) / cast(count(*) as double) AS gmean FROM sm)
             |SELECT t2.h AS h, t2.obs AS obs, t2.trend AS trend,
             |  sm.smean - g.gmean AS seasonal,
             |  t2.det - (sm.smean - g.gmean) AS resid
             |FROM t2 JOIN sm USING (hod) CROSS JOIN g
             |ORDER BY h""".stripMargin),
    ),
    // SEASONAL / TREND STRENGTH (Hyndman-Athanasopoulos FPP §: F_T =
    // max(0, 1 − Var(resid)/Var(trend+resid)), F_S analogously with
    // seasonal) — the two scalars that SUMMARIZE a decomposition: "is
    // there a trend / a daily cycle worth modeling?" Computed over the
    // full-window rows of the SAME decomposeFrame; all three variances
    // from ordered-fold sums (h order) through the agg_stddev_var
    // closed form in one shared expression text.
    OpSpec(
      "ts_seasonal_strength",
      (s, d) => {
        val f = decomposeFrame(s, d).filter(col("trend").isNotNull)
          .select(col("h"), (col("trend") + col("resid")).as("tr"),
            (col("seasonal") + col("resid")).as("sr"), col("resid").as("rr"))
          .withColumn("arr",
            expr("struct(h, tr, sr, rr, tr * tr AS tr2, sr * sr AS sr2, rr * rr AS rr2)"))
        def fold(field: String) =
          expr(s"""aggregate(transform(array_sort(collect_list(arr)), x -> x.$field),
                 |  0D, (acc, x) -> acc + x)""".stripMargin)
        f.agg(count(lit(1)).cast("double").as("nd"),
            fold("tr").as("s_tr"), fold("tr2").as("q_tr"),
            fold("sr").as("s_sr"), fold("sr2").as("q_sr"),
            fold("rr").as("s_rr"), fold("rr2").as("q_rr"))
          .selectExpr("cast(nd as bigint) AS n",
            "round(greatest(0D, 1.0 - ((q_rr - s_rr * s_rr / nd) / (nd - 1)) / ((q_tr - s_tr * s_tr / nd) / (nd - 1))), 4) AS trend_strength",
            "round(greatest(0D, 1.0 - ((q_rr - s_rr * s_rr / nd) / (nd - 1)) / ((q_sr - s_sr * s_sr / nd) / (nd - 1))), 4) AS seasonal_strength")
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', cast(ts as timestamp)) AS h,
             |    sum(cast(value as decimal(18,2))) AS st
             |  FROM events GROUP BY 1),
             |t AS (
             |  SELECT h, cast(st as double) AS obs,
             |    CASE WHEN count(*) OVER w = 25
             |         THEN cast(sum(st) OVER w as double) / 25 END AS trend
             |  FROM hourly
             |  WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
             |t2 AS (SELECT h, obs, trend, obs - trend AS det,
             |         extract(hour FROM h) AS hod FROM t),
             |sm AS (SELECT hod, list_sum(list(det ORDER BY h)) / cast(count(*) as double) AS smean
             |       FROM t2 WHERE det IS NOT NULL GROUP BY hod),
             |g AS (SELECT list_sum(list(smean ORDER BY hod)) / cast(count(*) as double) AS gmean FROM sm),
             |f AS (
             |  SELECT t2.h AS h,
             |    t2.trend + (t2.det - (sm.smean - g.gmean)) AS tr,
             |    (sm.smean - g.gmean) + (t2.det - (sm.smean - g.gmean)) AS sr,
             |    t2.det - (sm.smean - g.gmean) AS rr
             |  FROM t2 JOIN sm USING (hod) CROSS JOIN g
             |  WHERE t2.trend IS NOT NULL),
             |m AS (
             |  SELECT cast(count(*) as double) AS nd,
             |    list_sum(list(tr ORDER BY h)) AS s_tr, list_sum(list(tr * tr ORDER BY h)) AS q_tr,
             |    list_sum(list(sr ORDER BY h)) AS s_sr, list_sum(list(sr * sr ORDER BY h)) AS q_sr,
             |    list_sum(list(rr ORDER BY h)) AS s_rr, list_sum(list(rr * rr ORDER BY h)) AS q_rr
             |  FROM f)
             |SELECT cast(nd as bigint) AS n,
             |  round(greatest(0, 1.0 - ((q_rr - s_rr * s_rr / nd) / (nd - 1)) / ((q_tr - s_tr * s_tr / nd) / (nd - 1))), 4) AS trend_strength,
             |  round(greatest(0, 1.0 - ((q_rr - s_rr * s_rr / nd) / (nd - 1)) / ((q_sr - s_sr * s_sr / nd) / (nd - 1))), 4) AS seasonal_strength
             |FROM m""".stripMargin),
    ),
    // CUSUM single-changepoint estimate per series (the classic
    // offline estimator: k* = argmax_k |S_k| where S_k is the cumsum
    // of deviations from the series mean). The whole argmax runs in
    // EXACT decimal arithmetic — score = |n·cumsum_k − k·total| as
    // decimal(35,2) (n·S_k scaled by n, the ts_cusum_flag width
    // device), so comparisons can't ulp-split and ties break to the
    // earlier row identically in both engines. One window pass per
    // series, one argmax agg; the only doubles are the two output
    // divisions (int/int and decimal→double/double, bit-identical).
    OpSpec(
      "ts_changepoint",
      // thin call into graft.api (changepoint)
      (s, d) => {
        import graft.api.syntax._
        T.events(s, d)
          .changepoint("value", "event_id", Seq("user_id"))
          .orderBy("user_id")
      },
      Some("""WITH w AS (
             |  SELECT user_id, event_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             |    sum(cast(value as decimal(18,2))) OVER
             |      (PARTITION BY user_id ORDER BY event_id
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(cast(value as decimal(18,2))) OVER (PARTITION BY user_id) AS total,
             |    cast(count(*) OVER (PARTITION BY user_id) as bigint) AS n
             |  FROM events),
             |sc AS (SELECT user_id, event_id, rn, n,
             |    abs(cast(cum as decimal(24,2)) * cast(n as decimal(10,0))
             |        - cast(rn as decimal(10,0)) * cast(total as decimal(24,2))) AS score
             |  FROM w)
             |SELECT user_id, event_id AS cp_event_id, cast(rn as bigint) AS cp_k,
             |  cast(score as double) / cast(n as double) AS s_max
             |FROM sc
             |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY score DESC, rn) = 1
             |ORDER BY user_id""".stripMargin),
    ),
    // BURSTINESS — coefficient of variation of per-key inter-arrival
    // gaps (CV ≈ 1 Poisson, ≫ 1 bursty, ≪ 1 metronomic): the
    // arrival-process diagnostic read next to ts_gap_report. Gaps in
    // whole seconds from EXACT µs integers (unix_micros ≡ epoch_us,
    // integer div — the gap_report device), moments as exact bigint
    // sums, then the agg_stddev_var closed form with identical
    // expression text both engines. One window pass + one hash agg.
    OpSpec(
      "ts_burstiness",
      (s, d) => burstinessOf(ev(s, d), "user_id", "ts", "event_id"),
      Some("""WITH g AS (
             |  SELECT user_id,
             |    (epoch_us(cast(ts as timestamp))
             |     - epoch_us(lag(cast(ts as timestamp), 1)
             |         OVER (PARTITION BY user_id ORDER BY ts, event_id))) // 1000000
             |      AS gap_s
             |  FROM events),
             |m AS (
             |  SELECT user_id, count(gap_s) AS n_gaps,
             |    cast(sum(gap_s) as double) AS sg,
             |    cast(sum(gap_s * gap_s) as double) AS sq
             |  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id)
             |SELECT user_id, n_gaps,
             |  round(sg / n_gaps, 4) AS mean_gap_s,
             |  round(sqrt((sq - sg * sg / n_gaps) / (n_gaps - 1))
             |        / (sg / n_gaps), 4) AS cv_gap
             |FROM m WHERE n_gaps >= 2 ORDER BY user_id""".stripMargin),
    ),
  )

  /** The classical-decomposition frame shared by ts_seasonal_decompose
    * and ts_seasonal_strength: h, obs, trend (centered 25 h mean, NULL
    * at the edges), seasonal (centered hour-of-day means), resid.
    * Ordered-fold devices throughout — bit-deterministic, unrounded. */
  private def decomposeFrame(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame = {
    val hourly = ev(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(sum(P.dec2(col("value"))).as("st"))
    val w25 = Window.orderBy("h").rowsBetween(-12, 12) // hourly frame: bounded
    val t2 = hourly
      .withColumn("obs", col("st").cast("double"))
      .withColumn("trend", when(count(lit(1)).over(w25) === 25,
        sum(col("st")).over(w25).cast("double") / 25))
      .withColumn("det", col("obs") - col("trend"))
      .withColumn("hod", hour(col("h")))
    val sm = t2.filter(col("det").isNotNull)
      .groupBy("hod")
      .agg((expr("""aggregate(
                   |  transform(array_sort(collect_list(struct(h, det))), x -> x.det),
                   |  0D, (acc, x) -> acc + x)""".stripMargin) /
        count(lit(1)).cast("double")).as("smean"))
    val g = sm.agg((expr("""aggregate(
                           |  transform(array_sort(collect_list(struct(hod, smean))), x -> x.smean),
                           |  0D, (acc, x) -> acc + x)""".stripMargin) /
      count(lit(1)).cast("double")).as("gmean"))
    t2.join(broadcast(sm), Seq("hod"))
      .crossJoin(broadcast(g))
      .select(col("h"), col("obs"), col("trend"),
        (col("smean") - col("gmean")).as("seasonal"),
        (col("det") - (col("smean") - col("gmean"))).as("resid"))
  }

  /** Per-key inter-arrival CV — see ts_burstiness. `idCol` breaks
    * timestamp ties deterministically in the lag ordering. */
  def burstinessOf(df: org.apache.spark.sql.DataFrame, keyCol: String,
                   tsCol: String,
                   idCol: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, idCol)
    df.select(col(keyCol), col(tsCol), col(idCol))
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select(col(keyCol),
        expr(s"(unix_micros($tsCol) - unix_micros(prev_ts)) div 1000000")
          .as("gap_s"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).cast("double").as("sg"),
        sum(col("gap_s") * col("gap_s")).cast("double").as("sq"))
      .filter(col("n_gaps") >= 2)
      .select(col(keyCol), col("n_gaps"),
        P.r4(col("sg") / col("n_gaps")).as("mean_gap_s"),
        P.r4(sqrt((col("sq") - col("sg") * col("sg") / col("n_gaps")) /
            (col("n_gaps") - lit(1L))) /
          (col("sg") / col("n_gaps"))).as("cv_gap"))
      .orderBy(keyCol)
  }
}
