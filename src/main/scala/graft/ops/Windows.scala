package graft.ops

import graft.api.syntax._
import graft.core.{Policy => P, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.E window functions (pandas rolling/expanding/shift/rank analogues).
  *
  * All windows partition by `user_id` and order by `event_id` (generated
  * in ts order — FIXTURES), so ordering is identical in both engines
  * regardless of the ns(DuckDB)/µs(Spark) ts precision split. The
  * `user_id < 10` filter keeps verify output O(10²–10³) at any sf while
  * the window semantics are unchanged.
  *
  * Scale: one shuffle on user_id + one per-partition sort serves every
  * frame here; at 100 TB the same plan holds. Same-partition/order
  * window functions fuse into one WindowExec ONLY when declared in a
  * single projection level — sequential withColumn inserts a Project
  * between window layers that CollapseWindow cannot see through, so
  * each function would pay its own pass over the sorted partition
  * (round-9 audit; PlanShapeSpec pins the fusion on win_bollinger).
  * Running sums use the exact-decimal device (Policy.dec2) so results
  * are partition-order-independent.
  */
object Windows {
  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    T.events(s, d).filter(col("user_id") < 10)

  private val byUser = Window.partitionBy("user_id").orderBy("event_id")
  private val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
  private val full = byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
  private val roll5 = byUser.rowsBetween(-4, 0)

  // Every oracle shares this subquery shape.
  private val EV = "(SELECT * FROM events WHERE user_id < 10)"

  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "win_row_number",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            row_number().over(byUser).cast("bigint").as("rn"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // Ranking over a low-cardinality column: ties collapse to the same
    // rank in both engines — deterministic without a hidden tie-break.
    OpSpec(
      "win_rank_dense",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_type")
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id, event_type,
              |  rank() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk,
              |  dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS drnk
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    OpSpec(
      "win_ntile",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            ntile(4).over(byUser).cast("bigint").as("quartile"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  ntile(4) OVER (PARTITION BY user_id ORDER BY event_id) AS quartile
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    OpSpec(
      "win_lag_lead",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            lag("value", 1).over(byUser).as("prev_value"),
            lead("value", 1).over(byUser).as("next_value"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id, value,
              |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
              |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // diff(): exact — 2-dp doubles subtract bit-identically via decimal.
    OpSpec(
      "win_diff",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .diffN(1, "value", "event_id", Seq("user_id"), "diff")
          .select("event_id", "user_id", "diff")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  cast(cast(value as decimal(18,2)) -
              |       cast(lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) as decimal(18,2))
              |       as double) AS diff
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    OpSpec(
      "win_pct_change",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .pctChange("value", "event_id", Seq("user_id"), "pct_change")
          .select("event_id", "user_id", "pct_change")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  value / nullif(lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 0) - 1 AS pct_change
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    OpSpec(
      "win_cumsum",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .cumsum("value", "event_id", Seq("user_id"), "cum_value")
          .select("event_id", "user_id", "cum_value")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  cast(sum(cast(value as decimal(18,2))) OVER
              |    (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    as double) AS cum_value
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    OpSpec(
      "win_cummax_min",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            max("value").over(cum).as("cum_max"),
            min("value").over(cum).as("cum_min"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  max(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_max,
              |  min(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_min
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    OpSpec(
      "win_first_last",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            first("value").over(full).as("first_value"),
            last("value").over(full).as("last_value"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  first_value(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_value,
              |  last_value(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).mean() with pandas min_periods: NULL until the frame is
    // full. Mean from the exact decimal sum — no FP accumulation drift.
    OpSpec(
      "win_rolling_rows",
      // thin call into graft.api (pandas default min_periods = n)
      (s, d) =>
        ev(s, d)
          .rollingMean(5, "value", "event_id", Seq("user_id"), as = "roll_avg5")
          .select("event_id", "user_id", "roll_avg5")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN count(*) OVER w = 5 THEN
              |    cast(sum(cast(value as decimal(18,2))) OVER w as double) / 5
              |  END AS roll_avg5
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5, min_periods=1).mean() [P core/window/rolling.py] — the
    // production min_periods override: partial frames emit the mean of
    // whatever rows exist instead of NULL (pandas default min_periods=
    // window is win_rolling_rows above). Same exact-decimal sum over
    // the actual frame count — no NULL guard needed, count ≥ 1 always.
    OpSpec(
      "win_rolling_minp",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .rollingMean(5, "value", "event_id", Seq("user_id"),
            minPeriods = 1, as = "roll_avg_minp")
          .select("event_id", "user_id", "roll_avg_minp")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  cast(sum(cast(value as decimal(18,2))) OVER w as double) / count(*) OVER w AS roll_avg_minp
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling('1h') time-based: Spark rangeBetween needs a numeric order
    // column → unix_micros; DuckDB ranges over the µs-truncated ts. Both
    // frames are [t−1h, t] at µs precision.
    OpSpec(
      "win_rolling_time",
      // graft.api window spec + caller-chosen aggs
      (s, d) => {
        val e = ev(s, d)
        val wt = e.rollingTimeWindow(3600000000L, "ts", Seq("user_id"))
        e.select(col("event_id"), col("user_id"),
            count(lit(1)).over(wt).as("n_1h"),
            sum(P.dec2(col("value"))).over(wt).cast("double").as("sum_1h"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id, count(*) OVER w AS n_1h,
              |  cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sum_1h
              |FROM (SELECT event_id, user_id, cast(ts as timestamp) AS ts, value
              |      FROM events WHERE user_id < 10)
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts
              |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // expanding().avg(): unbounded-preceding frame, exact-sum mean.
    OpSpec(
      "win_expanding",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .expandingMean("value", "event_id", Seq("user_id"), "expanding_avg")
          .select("event_id", "user_id", "expanding_avg")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  cast(sum(cast(value as decimal(18,2))) OVER w as double)
              |    / count(*) OVER w AS expanding_avg
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // expanding().std() — the running sample std (pandas expanding
    // family's second member): exact decimal moment sums over the
    // unbounded-preceding frame, n per-row, NULL at n = 1. Same
    // formula text as win_rolling_std with the frame opened; the
    // doubles (sx, sq exact decimals cast once) are identical in both
    // engines so the CASE/round land the same.
    OpSpec(
      "win_expanding_std",
      // thin call into graft.api (expandingStd)
      (s, d) =>
        ev(s, d)
          .expandingStd("value", "event_id", Seq("user_id"), as = "exp_std")
          .select("event_id", "user_id", "exp_std")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN n > 1 THEN round(sqrt((sq - sx * sx / n) / (n - 1)), 4) END AS exp_std
              |FROM (
              |  SELECT event_id, user_id,
              |    count(*) OVER w AS n,
              |    cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sx,
              |    cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sq
              |  FROM $EV
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // percent_rank / cume_dist (pandas rank(pct=True) family).
    OpSpec(
      "win_percent_rank",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            percent_rank().over(byUser).as("pct_rank"),
            cume_dist().over(byUser).as("cume"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  percent_rank() OVER (PARTITION BY user_id ORDER BY event_id) AS pct_rank,
              |  cume_dist() OVER (PARTITION BY user_id ORDER BY event_id) AS cume
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    OpSpec(
      "win_nth_value",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            nth_value(col("value"), 3).over(full).as("third_value"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_value
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // groupby.head(k): top-3 most valuable events per user.
    OpSpec(
      "win_topk_per_group",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .topkPerGroup(3, Seq("user_id"), Seq(desc("value"), col("event_id")))
          .select(col("user_id"), col("rn").cast("bigint").as("rn"),
            col("event_id"), col("value"))
          .orderBy("user_id", "rn"),
      Some(s"""SELECT user_id, rn, event_id, value FROM (
              |  SELECT user_id, event_id, value,
              |    cast(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) as bigint) AS rn
              |  FROM $EV)
              |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin),
    ),
 
    // The SAME per-key top-k through the bounded-heap AGGREGATOR
    // (udaf/TopK) instead of the window: Spark's two-phase aggregation
    // discards losers map-side, so the shuffle carries ≤ k rows per
    // (partition, key) instead of every row — the 100 TB difference for
    // per-entity leaderboards. Same oracle as win_topk_per_group: the
    // gate proves the map-side-combining form identical to the window.
    OpSpec(
      "win_topk_udaf",
      (s, d) => {
        val in = ev(s, d).select(col("user_id").as("key"),
          col("value").as("v"), col("event_id").as("id"))
        graft.udaf.TopK.topKPerKey(in, 3)
          .select(col("key").as("user_id"), col("rank").as("rn"),
            col("id").as("event_id"), col("v").as("value"))
          .orderBy("user_id", "rn")
      },
      Some(s"""SELECT user_id, rn, event_id, value FROM (
              |  SELECT user_id, event_id, value,
              |    cast(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) as bigint) AS rn
              |  FROM $EV)
              |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin),
    ),

    // z-score normalization per group — the feature-engineering staple.
    // mean/std from exact decimal sums, identical IEEE on both engines.
    OpSpec(
      "win_zscore",
      // thin call into graft.api
      (s, d) =>
        ev(s, d)
          .zscore("value", "event_id", Seq("user_id"), "zscore")
          .select("event_id", "user_id", "zscore")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  (value - sx / n) / sqrt((sq - sx * sx / n) / (n - 1)) AS zscore
              |FROM (
              |  SELECT event_id, user_id, value,
              |    count(*) OVER w AS n,
              |    cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sx,
              |    cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sq
              |  FROM $EV
              |  WINDOW w AS (PARTITION BY user_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
              |ORDER BY event_id""".stripMargin),
    ),
 
    // cumprod (pandas cumprod): factors kept near 1 so 67-term series
    // stay in double range; both engines multiply the running frame
    // left-to-right.
    OpSpec(
      "win_cumprod",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            P.r4(product(lit(1) + col("value") / 1000).over(cum)).as("cumprod"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  round(product(1 + value / 1000) OVER
              |    (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cumprod
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).std(): sample stddev from exact decimal sums over the
    // 5-row frame, NULL until the frame fills (pandas min_periods).
    OpSpec(
      "win_rolling_std",
      // thin call into graft.api (rollingStd)
      (s, d) =>
        ev(s, d)
          .rollingStd(5, "value", "event_id", Seq("user_id"), as = "roll_std5")
          .select("event_id", "user_id", "roll_std5")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN rn5 = 5 THEN round(sqrt((sq - sx * sx / 5) / 4), 4) END AS roll_std5
              |FROM (
              |  SELECT event_id, user_id,
              |    count(*) OVER w AS rn5,
              |    cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sx,
              |    cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sq
              |  FROM $EV
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).skew(): population skewness over the 5-row frame from
    // exact decimal moment sums; the post-sum formula TEXT is shared
    // verbatim with the oracle (the agg_skew_kurt device), and the
    // sqrt-denominator quotient is irrational so 4dp rounding is safe.
    {
      val mean = "(s1 / 5.0)"
      val m2 = s"(s2 / 5.0 - $mean * $mean)"
      val m3 = s"(s3 / 5.0 - 3 * $mean * s2 / 5.0 + 2 * $mean * $mean * $mean)"
      val skew = s"CASE WHEN n = 5 AND $m2 > 0 THEN round($m3 / ($m2 * sqrt($m2)), 4) END"
      OpSpec(
        "win_rolling_skew",
        // thin call into graft.api (rollingSkew) — decimal(12,2) base
        // so the cube's STATIC type fits 38 digits; the API's formula
        // text is the same algebra, so the doubles match the oracle's
        (s, d) =>
          ev(s, d)
            .rollingSkew(5, "value", "event_id", Seq("user_id"), "roll_skew5")
            .select("event_id", "user_id", "roll_skew5")
            .orderBy("event_id"),
        Some(s"""SELECT event_id, user_id, $skew AS roll_skew5
                |FROM (
                |  SELECT event_id, user_id,
                |    count(*) OVER w AS n,
                |    cast(sum(cast(value as decimal(12,2))) OVER w as double) AS s1,
                |    cast(sum(cast(cast(value as decimal(12,2)) * cast(value as decimal(12,2)) as decimal(38,4))) OVER w as double) AS s2,
                |    cast(sum(cast(cast(value as decimal(12,2)) * cast(value as decimal(12,2)) * cast(value as decimal(12,2)) as decimal(38,6))) OVER w as double) AS s3
                |  FROM $EV
                |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
                |ORDER BY event_id""".stripMargin),
      )
    },
    // rolling(5).kurt() analogue: population EXCESS kurtosis over the
    // 5-row frame from exact decimal moment sums (the win_rolling_skew
    // device widened to the 4th moment). Width audit: value ≤ 10⁶ at
    // 2 dp ⇒ x: decimal(8,2); x²: (17,4) exact; x⁴ = (17,4)² = (35,8)
    // — the widest static type any engine sees is ≤ 38, so both sum
    // EXACTLY (an (18,2) base would put x⁴ at precision 73 and
    // silently truncate). Post-sum formula text shared verbatim; r4 on
    // the final quotient (agg_skew_kurt precedent — the m2² denominator
    // makes exact 4-dp half-ties measure-zero but internals can skew).
    {
      val mean = "(s1 / 5.0)"
      val m2 = s"(s2 / 5.0 - $mean * $mean)"
      val m4 = s"(s4 / 5.0 - 4 * $mean * s3 / 5.0 + 6 * $mean * $mean * s2 / 5.0 - 3 * $mean * $mean * $mean * $mean)"
      val kurt = s"CASE WHEN n = 5 AND $m2 > 0 THEN round($m4 / ($m2 * $m2) - 3, 4) END"
      OpSpec(
        "win_rolling_kurt",
        // thin call into graft.api (rollingKurt) — same moment sums,
        // same shared formula text
        (s, d) =>
          ev(s, d)
            .rollingKurt(5, "value", "event_id", Seq("user_id"), "roll_kurt5")
            .select("event_id", "user_id", "roll_kurt5")
            .orderBy("event_id"),
        Some(s"""SELECT event_id, user_id, $kurt AS roll_kurt5
                |FROM (
                |  SELECT event_id, user_id,
                |    count(*) OVER w AS n,
                |    cast(sum(x) OVER w as double) AS s1,
                |    cast(sum(x2) OVER w as double) AS s2,
                |    cast(sum(cast(x2 * x as decimal(26,6))) OVER w as double) AS s3,
                |    cast(sum(cast(x2 * x2 as decimal(35,8))) OVER w as double) AS s4
                |  FROM (
                |    -- (19,4) not (17,4): DuckDB multiplies width-<=18
                |    -- operands in physical int64 (measured overflow at
                |    -- 137425.9041²); width 19 forces the int128 path.
                |    -- Same exact values as Spark's (17,4) static type.
                |    SELECT event_id, user_id, x, cast(x * x as decimal(19,4)) AS x2
                |    FROM (SELECT event_id, user_id, cast(value as decimal(8,2)) AS x FROM $EV))
                |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
                |ORDER BY event_id""".stripMargin),
      )
    },
    // rolling(5).min()/.max() [P rolling.py:2000]: exact frame extrema
    // with the min_periods guard — value comparisons only, no
    // arithmetic, so no rounding device needed.
    OpSpec(
      "win_rolling_minmax",
      // thin call into graft.api (rollingMinMax)
      (s, d) =>
        ev(s, d)
          .rollingMinMax(5, "value", "event_id", Seq("user_id"),
            minAs = "roll_min5", maxAs = "roll_max5")
          .select("event_id", "user_id", "roll_min5", "roll_max5")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN count(*) OVER w = 5 THEN min(value) OVER w END AS roll_min5,
              |  CASE WHEN count(*) OVER w = 5 THEN max(value) OVER w END AS roll_max5
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).median() [P core/window/rolling.py:2066]: EXACT
    // percentile over the 5-row frame with the min_periods guard. n=5 is
    // odd, so the median is the 3rd order statistic of five 2-dp doubles
    // — no interpolation, no rounding needed, bit-identical in both
    // engines (Spark exact `percentile`, DuckDB `quantile_cont`).
    OpSpec(
      "win_rolling_median",
      (s, d) =>
        ev(s, d)
          .withColumn("rn5", count(lit(1)).over(roll5))
          .withColumn("med", expr("percentile(value, 0.5D)").over(roll5))
          .select(col("event_id"), col("user_id"),
            when(col("rn5") === 5, col("med")).as("roll_med5"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN count(*) OVER w = 5 THEN quantile_cont(value, 0.5) OVER w
              |  END AS roll_med5
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).apply(robust scale) — rolling MEDIAN ABSOLUTE
    // DEVIATION: mad = median(|x_i − median(window)|). One
    // collect_list window (≤5 values), then both medians are exact
    // 3rd-order-statistic picks over the sorted 5-array — no
    // interpolation, no aggregation-order dependence (sorting makes
    // the list canonical), so the doubles are bit-identical and go
    // out unrounded. The window list is O(n) state per row at frame
    // width n — the same cost class as win_rolling_median's exact
    // percentile.
    OpSpec(
      "win_rolling_mad",
      (s, d) =>
        ev(s, d)
          .withColumn("rn5", count(lit(1)).over(roll5))
          .withColumn("ws", collect_list(col("value")).over(roll5))
          .select(col("event_id"), col("user_id"),
            when(col("rn5") === 5, expr(
              "element_at(array_sort(transform(ws, x -> abs(x - element_at(array_sort(ws), 3)))), 3)"))
              .as("roll_mad5"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN cnt = 5 THEN
              |    list_sort(list_transform(lw, x -> abs(x - list_sort(lw)[3])))[3]
              |  END AS roll_mad5
              |FROM (
              |  SELECT event_id, user_id,
              |    count(*) OVER w AS cnt, list(value) OVER w AS lw
              |  FROM $EV
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // HAMPEL FILTER — the robust rolling outlier CLEANER (flag where
    // |x − med₅| > 3·1.4826·mad₅, replace with the window median):
    // what a production TSDB runs before any model sees the data.
    // Composes the two order-statistic devices above (exact 3rd-pick
    // median and MAD — no interpolation); the 3·1.4826 factor ships as
    // the SINGLE literal 4.4478 in both engines (a literal×literal
    // product would be decimal-exact in DuckDB but double-rounded in
    // Spark — the ts_ewma_chart dialect split). NULL until the frame
    // fills.
    OpSpec(
      "win_hampel_filter",
      (s, d) =>
        ev(s, d)
          .withColumn("rn5", count(lit(1)).over(roll5))
          .withColumn("ws", collect_list(col("value")).over(roll5))
          // try_element_at: warm-up rows carry < 3 elements; the rn5
          // gate below nulls their outputs, but the projection still
          // evaluates here
          .withColumn("med", expr("try_element_at(array_sort(ws), 3)"))
          .withColumn("mad", expr(
            "try_element_at(array_sort(transform(ws, x -> abs(x - try_element_at(array_sort(ws), 3)))), 3)"))
          .select(col("event_id"), col("user_id"), col("value"),
            // int flag, not boolean: a NULLABLE bool column dtype-splits
            // the driver comparator (object-with-None vs duckdb's float)
            when(col("rn5") === 5,
              expr("cast(abs(value - med) > 4.4478D * mad as int)")).as("is_outlier"),
            when(col("rn5") === 5, expr(
              "CASE WHEN abs(value - med) > 4.4478D * mad THEN med ELSE value END"))
              .as("cleaned"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id, value,
              |  CASE WHEN cnt = 5 THEN cast(abs(value - med) > 4.4478 * mad as int) END AS is_outlier,
              |  CASE WHEN cnt = 5 THEN
              |    CASE WHEN abs(value - med) > 4.4478 * mad THEN med ELSE value END
              |  END AS cleaned
              |FROM (
              |  SELECT event_id, user_id, value, cnt,
              |    list_sort(lw)[3] AS med,
              |    list_sort(list_transform(lw, x -> abs(x - list_sort(lw)[3])))[3] AS mad
              |  FROM (
              |    SELECT event_id, user_id, value,
              |      count(*) OVER w AS cnt, list(value) OVER w AS lw
              |    FROM $EV
              |    WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)))
              |ORDER BY event_id""".stripMargin),
    ),
    // diff(periods=3) [P core/frame.py:10028]: the periods parameter is
    // just lag's offset — declared at n=3 to pin the generalized form
    // (win_diff pins n=1). Exact via the decimal device.
    OpSpec(
      "win_diff_n",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            (P.dec2(col("value")) - P.dec2(lag("value", 3).over(byUser)))
              .cast("double").as("diff3"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  cast(cast(value as decimal(18,2)) -
              |       cast(lag(value, 3) OVER (PARTITION BY user_id ORDER BY event_id) as decimal(18,2))
              |       as double) AS diff3
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).cov(lag-1): sample covariance with the lag-1 series,
    // same exact co-moment sums as win_rolling_corr. NOT rounded: both
    // engines evaluate the identical IEEE expression over identical
    // doubles, and rounding a near-tie 4dp value is exactly where their
    // round() tie policies diverge (§2.0 rule 2).
    OpSpec(
      "win_rolling_cov",
      (s, d) => {
        val x = when(col("y").isNotNull, P.dec2(col("value")))
        val y = P.dec2(col("y"))
        ev(s, d)
          .withColumn("y", lag("value", 1).over(byUser))
          // the four roll5 functions in one projection level -> they
          // fuse into ONE WindowExec above the lag's (2 nodes total)
          .select(col("*"),
            count(col("y")).over(roll5).as("n"),
            sum(x).over(roll5).cast("double").as("sx"),
            sum(y).over(roll5).cast("double").as("sy"),
            sum((x * y).cast("decimal(38,4)")).over(roll5).cast("double").as("sxy"))
          .select(col("event_id"), col("user_id"),
            when(col("n") === 5,
              (col("sxy") - col("sx") * col("sy") / lit(5.0)) / lit(4.0))
              .as("roll_cov5"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN n = 5 THEN (sxy - sx * sy / 5.0) / 4.0 END AS roll_cov5
              |FROM (
              |  SELECT event_id, user_id,
              |    count(y) OVER w AS n,
              |    cast(sum(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END) OVER w as double) AS sx,
              |    cast(sum(cast(y as decimal(18,2))) OVER w as double) AS sy,
              |    cast(sum(cast(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END * cast(y as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sxy
              |  FROM (SELECT event_id, user_id, value,
              |          lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS y
              |        FROM $EV)
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).corr(lag-1): rolling autocorrelation per user from the
    // closed-form Pearson over exact decimal co-moment sums — the same
    // determinism discipline as win_rolling_std (no engine corr builtin,
    // whose bias/formula choices differ). Pairs need the lag present:
    // n counts non-null y in the frame; defined when n=5 and var>0.
    OpSpec(
      "win_rolling_corr",
      (s, d) => {
        val x = when(col("y").isNotNull, P.dec2(col("value")))
        val y = P.dec2(col("y"))
        ev(s, d)
          .withColumn("y", lag("value", 1).over(byUser))
          // six roll5 functions, one projection level -> ONE fused
          // WindowExec above the lag's (2 nodes total, was 7)
          .select(col("*"),
            count(col("y")).over(roll5).as("n"),
            sum(x).over(roll5).cast("double").as("sx"),
            sum(y).over(roll5).cast("double").as("sy"),
            sum((x * x).cast("decimal(38,4)")).over(roll5).cast("double").as("sxx"),
            sum((y * y).cast("decimal(38,4)")).over(roll5).cast("double").as("syy"),
            sum((x * y).cast("decimal(38,4)")).over(roll5).cast("double").as("sxy"))
          .withColumn("dd",
            (lit(5.0) * col("sxx") - col("sx") * col("sx")) *
              (lit(5.0) * col("syy") - col("sy") * col("sy")))
          .select(col("event_id"), col("user_id"),
            when(col("n") === 5 && col("dd") > 0,
              P.r4((lit(5.0) * col("sxy") - col("sx") * col("sy")) / sqrt(col("dd"))))
              .as("roll_corr5"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN n = 5 AND (5 * sxx - sx * sx) * (5 * syy - sy * sy) > 0
              |       THEN round((5 * sxy - sx * sy) /
              |                  sqrt((5 * sxx - sx * sx) * (5 * syy - sy * sy)), 4) END AS roll_corr5
              |FROM (
              |  SELECT event_id, user_id,
              |    count(y) OVER w AS n,
              |    cast(sum(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END) OVER w as double) AS sx,
              |    cast(sum(cast(y as decimal(18,2))) OVER w as double) AS sy,
              |    cast(sum(cast(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END * cast(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sxx,
              |    cast(sum(cast(cast(y as decimal(18,2)) * cast(y as decimal(18,2)) as decimal(38,4))) OVER w as double) AS syy,
              |    cast(sum(cast(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END * cast(y as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sxy
              |  FROM (SELECT event_id, user_id, value,
              |          lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS y
              |        FROM $EV)
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // rank(method='average') — pandas' DEFAULT rank: ties get the MEAN
    // of the ranks they span, = min_rank + (tie_count − 1)/2. Exact
    // int arithmetic before one division by 2.0 → values end in .0/.5,
    // bit-identical cross-engine. min_rank is SQL rank(); tie_count is
    // count(*) over the (user, key) tie partition — no second sort.
    OpSpec(
      "win_rank_average",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_type")
        val tie = Window.partitionBy("user_id", "event_type")
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            (rank().over(w) + (count(lit(1)).over(tie) - 1) / lit(2.0)).as("avg_rank"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id, event_type,
              |  rank() OVER (PARTITION BY user_id ORDER BY event_type)
              |    + (count(*) OVER (PARTITION BY user_id, event_type) - 1) / 2.0 AS avg_rank
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // The generic `rolling.apply` ESCAPE HATCH [P core/window/
    // rolling.py:1855 .apply] — the windowed sibling of
    // udf_groupby_apply's recipe: collect the frame into an ordered
    // list (collect_list over a rows frame preserves frame order
    // given the total order), then run ANY per-window lambda on it
    // row-locally. The demo body — a position-weighted rolling mean
    // (w = 1..5, Σwᵢxᵢ/15) — has no builtin aggregate. Determinism:
    // the weighted sum is spelled as ONE fixed-association expression
    // in both engines (identical IEEE op sequence, no rounding
    // needed), complete windows only (size = 5 → else NULL), matching
    // rolling(5).apply's min_periods default. Cost: one list column
    // per row over the same single WindowExec every rolling op uses —
    // O(window) per row, the same contract as pandas apply.
    OpSpec(
      "win_rolling_apply",
      (s, d) =>
        ev(s, d)
          .withColumn("l", collect_list(col("value")).over(roll5))
          .select(col("event_id"), col("user_id"),
            when(size(col("l")) === 5, expr(
              """(element_at(l,1)*1D + element_at(l,2)*2D + element_at(l,3)*3D
                |  + element_at(l,4)*4D + element_at(l,5)*5D) / 15D""".stripMargin))
              .as("wmean5"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN len(l) = 5 THEN
              |    (l[1]*1 + l[2]*2 + l[3]*3 + l[4]*4 + l[5]*5) / 15
              |  END AS wmean5
              |FROM (SELECT event_id, user_id,
              |        list(value) OVER (PARTITION BY user_id ORDER BY event_id
              |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS l
              |      FROM $EV)
              |ORDER BY event_id""".stripMargin),
    ),
    // rank(method='first') [P core/generic.py:9950] — ties broken by
    // INSERTION ORDER, i.e. ranks are a permutation with no gaps and
    // no fractions. In a distributed engine "insertion order" must be
    // an explicit total order (partition order is not reproducible):
    // here event_id, the generator's arrival order. That makes it
    // exactly row_number() over (key, event_id) — the same one
    // shuffle + one sort as every other rank; deterministic by
    // construction in both engines.
    OpSpec(
      "win_rank_first",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_type", "event_id")
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            row_number().over(w).cast("bigint").as("first_rank"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id, event_type,
              |  row_number() OVER (PARTITION BY user_id ORDER BY event_type, event_id) AS first_rank
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // rolling('1h').sum()/min()/max() — the time-based frame of
    // win_rolling_time with the rest of the pandas agg family: exact
    // decimal sum, and min/max (order-independent by construction).
    OpSpec(
      "win_rolling_time_sum",
      (s, d) => {
        val wt = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, 0)
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            sum(P.dec2(col("value"))).over(wt).cast("double").as("sum_1h"),
            min(col("value")).over(wt).as("min_1h"),
            max(col("value")).over(wt).as("max_1h"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sum_1h,
              |  min(value) OVER w AS min_1h,
              |  max(value) OVER w AS max_1h
              |FROM (SELECT event_id, user_id, cast(ts as timestamp) AS ts, value
              |      FROM events WHERE user_id < 10)
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts
              |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // expanding().cov(lag-1) — the unbounded-frame variant of
    // win_rolling_cov: same exact decimal co-moment sums, with the
    // frame count n variable (defined from the 2nd pair on). NOT
    // rounded, same §2.0 rationale as the rolling variant.
    OpSpec(
      "win_expanding_cov",
      (s, d) => {
        val x = when(col("y").isNotNull, P.dec2(col("value")))
        val y = P.dec2(col("y"))
        ev(s, d)
          .withColumn("y", lag("value", 1).over(byUser))
          // one projection level -> ONE fused cum WindowExec above the
          // lag's (2 nodes total)
          .select(col("*"),
            count(col("y")).over(cum).cast("double").as("n"),
            sum(x).over(cum).cast("double").as("sx"),
            sum(y).over(cum).cast("double").as("sy"),
            sum((x * y).cast("decimal(38,4)")).over(cum).cast("double").as("sxy"))
          .select(col("event_id"), col("user_id"),
            when(col("n") >= 2,
              (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
              .as("exp_cov"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN n >= 2 THEN (sxy - sx * sy / n) / (n - 1) END AS exp_cov
              |FROM (
              |  SELECT event_id, user_id,
              |    cast(count(y) OVER w as double) AS n,
              |    cast(sum(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END) OVER w as double) AS sx,
              |    cast(sum(cast(y as decimal(18,2))) OVER w as double) AS sy,
              |    cast(sum(cast(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END * cast(y as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sxy
              |  FROM (SELECT event_id, user_id, value,
              |          lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS y
              |        FROM $EV)
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // expanding().corr(lag-1) — unbounded-frame Pearson from the same
    // closed form as win_rolling_corr, n variable.
    OpSpec(
      "win_expanding_corr",
      (s, d) => {
        val x = when(col("y").isNotNull, P.dec2(col("value")))
        val y = P.dec2(col("y"))
        ev(s, d)
          .withColumn("y", lag("value", 1).over(byUser))
          // six cum functions, one projection level -> ONE fused
          // WindowExec above the lag's (2 nodes total, was 7)
          .select(col("*"),
            count(col("y")).over(cum).cast("double").as("n"),
            sum(x).over(cum).cast("double").as("sx"),
            sum(y).over(cum).cast("double").as("sy"),
            sum((x * x).cast("decimal(38,4)")).over(cum).cast("double").as("sxx"),
            sum((y * y).cast("decimal(38,4)")).over(cum).cast("double").as("syy"),
            sum((x * y).cast("decimal(38,4)")).over(cum).cast("double").as("sxy"))
          .withColumn("dd",
            (col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy")))
          .select(col("event_id"), col("user_id"),
            when(col("n") >= 2 && col("dd") > 0,
              P.r4((col("n") * col("sxy") - col("sx") * col("sy")) / sqrt(col("dd"))))
              .as("exp_corr"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN n >= 2 AND (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
              |       THEN round((n * sxy - sx * sy) /
              |                  sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) END AS exp_corr
              |FROM (
              |  SELECT event_id, user_id,
              |    cast(count(y) OVER w as double) AS n,
              |    cast(sum(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END) OVER w as double) AS sx,
              |    cast(sum(cast(y as decimal(18,2))) OVER w as double) AS sy,
              |    cast(sum(cast(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END * cast(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sxx,
              |    cast(sum(cast(cast(y as decimal(18,2)) * cast(y as decimal(18,2)) as decimal(38,4))) OVER w as double) AS syy,
              |    cast(sum(cast(CASE WHEN y IS NOT NULL THEN cast(value as decimal(18,2)) END * cast(y as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sxy
              |  FROM (SELECT event_id, user_id, value,
              |          lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS y
              |        FROM $EV)
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // groupby().cumcount() [P core/groupby/groupby.py] — the 0-based
    // position within the group: row_number() − 1. Same single
    // shuffle+sort as every other byUser window.
    OpSpec(
      "win_cumcount",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            (row_number().over(byUser) - 1).cast("bigint").as("cumcount"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS cumcount
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // rolling(5, center=True).mean() [P rolling.py] — the center
    // parameter: a symmetric (-2, +2) frame instead of trailing. Exact
    // decimal sum / 5, full-frame guard (pandas emits NaN where the
    // symmetric window is truncated at either partition edge).
    OpSpec(
      "win_rolling_center",
      (s, d) => {
        val c5 = byUser.rowsBetween(-2, 2)
        ev(s, d)
          // both c5 functions in one projection -> ONE fused WindowExec
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(c5).as("nc"),
            sum(P.dec2(col("value"))).over(c5).cast("double").as("sc"))
          .select(col("event_id"), col("user_id"),
            when(col("nc") === 5, col("sc") / 5).as("roll_c5"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN count(*) OVER w = 5
              |       THEN cast(sum(cast(value as decimal(18,2))) OVER w as double) / 5
              |  END AS roll_c5
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
              |ORDER BY event_id""".stripMargin),
    ),
    // ffill(limit=2) [P core/generic.py] — bounded forward fill: carry
    // the last non-null at most 2 rows, then revert to NULL. The
    // unbounded ts_ffill device with a 2-row trailing frame IS the
    // limit parameter.
    OpSpec(
      "win_ffill_limit",
      (s, d) => {
        val f2 = byUser.rowsBetween(-2, 0)
        ev(s, d)
          .withColumn("pv",
            when(col("event_type") === "purchase", col("value")))
          .select(col("event_id"), col("user_id"),
            last("pv", ignoreNulls = true).over(f2).as("pv_fill2"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
              |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS pv_fill2
              |FROM (SELECT event_id, user_id,
              |        CASE WHEN event_type = 'purchase' THEN value END AS pv
              |      FROM $EV)
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5) distinct count (rolling .apply(nunique) — the windowed
    // form of nunique): frame list → array_distinct → size. Same
    // materialized-frame device as win_rolling_rank; distinctness over
    // a 5-element list is O(w²) compares inside the window operator.
    OpSpec(
      "win_rolling_nunique",
      (s, d) =>
        ev(s, d)
          .withColumn("rn5", count(lit(1)).over(roll5))
          .withColumn("fr", collect_list("event_type").over(roll5))
          .select(col("event_id"), col("user_id"),
            when(col("rn5") === 5,
              expr("size(array_distinct(fr))").cast("bigint")).as("roll_nuniq"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN count(*) OVER w = 5
              |       THEN len(list_distinct(list(event_type) OVER w))
              |  END AS roll_nuniq
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).rank(method='min') [P rolling.py, pandas ≥ 1.4] —
    // rank of the CURRENT value inside its frame: 1 + |{y ∈ frame :
    // y < value}|. Both engines materialize the 5-element frame list
    // (collect_list / windowed list()) and count with a lambda —
    // comparisons only, no float arithmetic to diverge. O(w) per row
    // with w=5; the frame list never leaves the window operator.
    OpSpec(
      "win_rolling_rank",
      (s, d) =>
        ev(s, d)
          .withColumn("rn5", count(lit(1)).over(roll5))
          .withColumn("fr", collect_list("value").over(roll5))
          .select(col("event_id"), col("user_id"),
            when(col("rn5") === 5,
              (expr("size(filter(fr, y -> y < value))") + 1).cast("bigint"))
              .as("roll_rank"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN count(*) OVER w = 5
              |       THEN 1 + len(list_filter(list(value) OVER w, y -> y < value))
              |  END AS roll_rank
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5).quantile(0.25) [P core/window/rolling.py] — the general
    // q of the win_rolling_median device: both engines linearly
    // interpolate between the two order statistics (Spark `percentile`
    // exact / DuckDB quantile_cont), and over a 5-row frame q=0.25
    // lands exactly on sorted[1], so no interpolation arithmetic can
    // diverge. NULL until the frame fills (pandas min_periods default).
    OpSpec(
      "win_rolling_quantile",
      (s, d) =>
        ev(s, d)
          .withColumn("rn5", count(lit(1)).over(roll5))
          .withColumn("q25", expr("percentile(value, 0.25D)").over(roll5))
          .select(col("event_id"), col("user_id"),
            when(col("rn5") === 5, col("q25")).as("roll_q25"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN count(*) OVER w = 5 THEN quantile_cont(value, 0.25) OVER w
              |  END AS roll_q25
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // groupby().nth(4) — the 5th row of each group in a stated order
    // (pandas nth is 0-based positional). row_number + filter: the
    // rank predicate pushes into the window's sort, so at 100 TB each
    // group is sorted once and only one row per group survives the
    // filter — no per-group collect.
    OpSpec(
      "win_group_nth",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        ev(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 5)
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id, event_id, event_type, value
              |FROM (SELECT user_id, event_id, event_type, value,
              |        row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
              |      FROM $EV)
              |WHERE rn = 5 ORDER BY user_id""".stripMargin),
    ),
    // rank(pct=True) — pandas percentile rank: AVERAGE rank / group
    // size (NOT SQL percent_rank, whose denominator is n−1 and whose
    // numerator is min-rank). Exact int arithmetic over the
    // win_rank_average device, ONE double division — bit-identical.
    OpSpec(
      "win_rank_pct",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_type")
        val tie = Window.partitionBy("user_id", "event_type")
        val all = Window.partitionBy("user_id")
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            ((rank().over(w) * lit(2L) + count(lit(1)).over(tie) - 1).cast("double") /
              (count(lit(1)).over(all) * lit(2L))).as("pct_rank"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id, event_type,
              |  cast(rank() OVER (PARTITION BY user_id ORDER BY event_type) * 2
              |       + count(*) OVER (PARTITION BY user_id, event_type) - 1 as double)
              |    / (count(*) OVER (PARTITION BY user_id) * 2) AS pct_rank
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // expanding().median() — exact running median. Even frames
    // interpolate the two middle order statistics; both engines
    // compute ≈(a+b)/2 within an ulp of each other, and because the
    // inputs are 2-decimal values the true midpoints have ≤3 decimals
    // — never within 5e-5 of a 4-dp rounding boundary — so r4 is
    // split-proof here (unlike the power-of-two EWM quotients).
    OpSpec(
      "win_expanding_median",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            P.r4(expr("percentile(value, 0.5D)").over(cum)).as("exp_median"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  round(quantile_cont(value, 0.5) OVER w, 4) AS exp_median
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // rolling(5) OLS slope of value against row position — pandas
    // rolling.apply(lambda w: polyfit(arange(5), w, 1)[0]), the TS
    // trend staple. Position x = row_number (exact bigint), y = 2-dp
    // value (exact decimal): every moment sum is exact, the closed
    // form slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) has ONE double
    // division — identical IEEE both engines, r4 per §2.0. Same
    // single-shuffle WindowExec as the rest of the rolling family.
    OpSpec(
      "win_rolling_slope",
      (s, d) =>
        ev(s, d)
          .withColumn("x", row_number().over(byUser).cast("bigint"))
          // five roll5 functions, one projection level -> ONE fused
          // WindowExec above the row_number's (2 nodes total)
          .select(col("*"),
            count(lit(1)).over(roll5).as("n"),
            sum(col("x")).over(roll5).as("sx"),
            sum(col("x") * col("x")).over(roll5).as("sxx"),
            sum(P.dec2(col("value"))).over(roll5).cast("double").as("sy"),
            sum((col("x") * P.dec2(col("value"))).cast("decimal(38,2)")).over(roll5)
              .cast("double").as("sxy"))
          .select(col("event_id"), col("user_id"),
            when(col("n") === 5,
              P.r4((lit(5.0) * col("sxy") - col("sx").cast("double") * col("sy")) /
                (lit(5.0) * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double"))))
              .as("slope5"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN n = 5 THEN
              |    round((5.0 * sxy - cast(sx as double) * sy) /
              |          (5.0 * cast(sxx as double) - cast(sx as double) * cast(sx as double)), 4)
              |  END AS slope5
              |FROM (
              |  SELECT event_id, user_id,
              |    count(*) OVER w AS n,
              |    sum(x) OVER w AS sx,
              |    sum(x * x) OVER w AS sxx,
              |    cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sy,
              |    cast(sum(cast(x * cast(value as decimal(18,2)) as decimal(38,2))) OVER w as double) AS sxy
              |  FROM (SELECT event_id, user_id, value,
              |          cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) as bigint) AS x
              |        FROM $EV)
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // Length of the current run of consecutive value INCREASES ending
    // at each row (pandas idiom: s.groupby((diff<=0).cumsum()).
    // cumcount()) — the gaps-and-islands device: a cumulative sum of
    // break flags labels each run, a second window counts within the
    // run. Pure integer arithmetic end-to-end (comparisons on 2-dp
    // doubles are exact) — no rounding policy needed. Two window
    // passes over ONE user_id shuffle+sort (same frame spec).
    OpSpec(
      "win_streak",
      (s, d) =>
        ev(s, d)
          .withColumn("brk",
            when(col("value") > lag("value", 1).over(byUser), 0L).otherwise(1L))
          .withColumn("grp", sum("brk").over(cum))
          .withColumn("streak_up",
            count(lit(1))
              .over(Window.partitionBy("user_id", "grp").orderBy("event_id")) - 1)
          .select("event_id", "user_id", "streak_up")
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  count(*) OVER (PARTITION BY user_id, grp ORDER BY event_id
              |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS streak_up
              |FROM (
              |  SELECT event_id, user_id,
              |    sum(brk) OVER (PARTITION BY user_id ORDER BY event_id
              |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
              |  FROM (
              |    SELECT event_id, user_id, value,
              |      CASE WHEN value > lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id)
              |           THEN 0 ELSE 1 END AS brk
              |    FROM $EV))
              |ORDER BY event_id""".stripMargin),
    ),
    // Max drawdown per series — the finance/monitoring staple: the
    // worst peak-to-trough ratio of the running cumulative sum (a
    // value series would work too; the cumsum makes a monotone-ish
    // "equity curve" out of the event stream). Per row: dd =
    // cum/cummax − 1 (identical IEEE division of exact decimal-sum
    // doubles); per user: min(dd) r4'd once at the end. One window
    // pass + one hash agg on the same user_id shuffle.
    OpSpec(
      "win_drawdown",
      (s, d) =>
        ev(s, d)
          .withColumn("cdec", sum(P.dec2(col("value"))).over(cum))
          .withColumn("c", col("cdec").cast("double"))
          .withColumn("m", max(col("cdec")).over(cum).cast("double"))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n"),
            P.r4(min(col("c") / col("m") - 1.0)).as("max_drawdown"))
          .orderBy("user_id"),
      // two explicit window levels: engines reject nested window calls
      Some(s"""SELECT user_id, count(*) AS n,
              |  round(min(cast(c as double) / cast(m as double) - 1.0), 4) AS max_drawdown
              |FROM (
              |  SELECT user_id, cdec AS c,
              |    max(cdec) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
              |  FROM (
              |    SELECT user_id, event_id,
              |      sum(cast(value as decimal(18,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdec
              |    FROM $EV))
              |GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
    // rolling(10) ARGMAX — which event was the window's peak: the
    // struct-max device (max of (value, event_id) pairs compares
    // value first, then event_id — the tie policy is IN the struct
    // ordering, identical in both engines; DuckDB spells the same
    // pair-max over a row() value). No second scan, same WindowExec.
    OpSpec(
      "win_rolling_argmax",
      (s, d) =>
        ev(s, d)
          .withColumn("peak",
            max(struct(col("value").as("v"), col("event_id").as("i")))
              .over(byUser.rowsBetween(-9, 0)))
          .select(col("event_id"), col("user_id"),
            col("peak.i").as("argmax_id"),
            col("peak.v").as("peak_value"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  (max({'v': value, 'i': event_id}) OVER w).i AS argmax_id,
              |  (max({'v': value, 'i': event_id}) OVER w).v AS peak_value
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin),
    ),
    // Min-max scaling to [0,1] per series — the ML feature-prep
    // staple (sklearn MinMaxScaler per group). min/max are exact
    // decimals off one full-frame WindowExec; the scale arithmetic
    // shares its formula text, and the degenerate max=min series
    // nullifies on both sides (P.div).
    OpSpec(
      "win_min_max_scale",
      (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            min(P.dec2(col("value"))).over(full).as("mn"),
            max(P.dec2(col("value"))).over(full).as("mx"))
          .select(col("event_id"), col("user_id"),
            P.r4(P.div(
              (P.dec2(col("value")) - col("mn")).cast("double"),
              (col("mx") - col("mn")).cast("double"))).as("scaled"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  round(cast(cast(value as decimal(18,2)) - mn as double)
              |        / nullif(cast(mx - mn as double), 0), 4) AS scaled
              |FROM (
              |  SELECT event_id, user_id, value,
              |    min(cast(value as decimal(18,2))) OVER w AS mn,
              |    max(cast(value as decimal(18,2))) OVER w AS mx
              |  FROM $EV
              |  WINDOW w AS (PARTITION BY user_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
              |ORDER BY event_id""".stripMargin),
    ),
    // cume_dist — the CDF-position window function (pandas
    // rank(pct=True, method='max') analogue): identical built-in
    // semantics in both engines (ties share the value), one division
    // of exact integers per row — deterministic without rounding.
    OpSpec(
      "win_cume_dist",
      (s, d) => {
        val byValue = Window.partitionBy("user_id").orderBy("value")
        ev(s, d)
          .select(col("event_id"), col("user_id"),
            cume_dist().over(byValue).as("cdist"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  cume_dist() OVER (PARTITION BY user_id ORDER BY value) AS cdist
              |FROM $EV ORDER BY event_id""".stripMargin),
    ),
    // Bollinger bands — rolling(20) mean ± 2σ and the breach flag, the
    // charting staple. Mean and σ come from the win_rolling_std exact
    // moment sums (decimal s1/s2, one WindowExec, no re-shuffle); the
    // band arithmetic and the breach comparison share one formula TEXT
    // with the oracle, so the inequality can never split engines. The
    // parquet double `value` is compared un-cast on both sides (same
    // bits read from the same file). Bands only where the frame is
    // full (rn = 20), matching pandas rolling(20, min_periods=20).
    OpSpec(
      "win_bollinger",
      (s, d) => {
        val roll20 = byUser.rowsBetween(-19, 0)
        ev(s, d)
          // one projection level -> the three same-spec window
          // functions land in ONE WindowExec (sequential withColumn
          // stacks three; PlanShapeSpec pins the fusion)
          .select(col("event_id"), col("user_id"), col("value"),
            count(lit(1)).over(roll20).as("rn"),
            sum(P.dec2(col("value"))).over(roll20).cast("double").as("sx"),
            sum((P.dec2(col("value")) * P.dec2(col("value"))).cast("decimal(38,4)"))
              .over(roll20).cast("double").as("sq"))
          .withColumn("m", col("sx") / 20)
          .withColumn("sd", sqrt((col("sq") - col("sx") * col("sx") / 20) / 19))
          .select(col("event_id"), col("user_id"),
            when(col("rn") === 20, P.r4(col("m"))).as("mid"),
            when(col("rn") === 20, P.r4(col("m") + col("sd") * 2)).as("upper"),
            when(col("rn") === 20, P.r4(col("m") - col("sd") * 2)).as("lower"),
            // non-null boolean (no band -> no breach): a nullable bool
            // dtype-splits the comparator (None vs NaN in pandas)
            coalesce(when(col("rn") === 20,
              col("value") > col("m") + col("sd") * 2 ||
                col("value") < col("m") - col("sd") * 2), lit(false)).as("breach"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |  CASE WHEN rn = 20 THEN round(sx / 20, 4) END AS mid,
              |  CASE WHEN rn = 20 THEN round(sx / 20 + 2 * sqrt((sq - sx * sx / 20) / 19), 4) END AS upper,
              |  CASE WHEN rn = 20 THEN round(sx / 20 - 2 * sqrt((sq - sx * sx / 20) / 19), 4) END AS lower,
              |  coalesce(CASE WHEN rn = 20 THEN value > sx / 20 + 2 * sqrt((sq - sx * sx / 20) / 19)
              |                       OR value < sx / 20 - 2 * sqrt((sq - sx * sx / 20) / 19) END, false) AS breach
              |FROM (
              |  SELECT event_id, user_id, value,
              |    count(*) OVER w AS rn,
              |    cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sx,
              |    cast(sum(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(38,4))) OVER w as double) AS sq
              |  FROM $EV
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
              |ORDER BY event_id""".stripMargin),
    ),
    // WEIGHTED rolling mean — pandas rolling(5, win_type='triang')
    // .mean() (round-12 verdict "missing" #5, the one rolling-family
    // parameter without a twin): triangular weights [1,2,3,2,1]/9 over
    // the 5-row frame. Spelled as a LAG CHAIN (five same-spec lags in
    // one projection → ONE WindowExec, the win_rolling_slope fusion):
    // each weighted term is an exact decimal (int literal × dec2
    // value), the sum is exact, and the single double division by 9
    // is identical IEEE in both engines, r4 out. NULL until the frame
    // fills (lag(4) null ⇔ fewer than 5 rows — value is non-null, so
    // the guard needs no count window), matching min_periods=5.
    OpSpec(
      "win_rolling_weighted",
      // thin call into the parameterized API (syntax.rollingWeighted —
      // arbitrary weight vectors; the triang family pinned here)
      (s, d) =>
        ev(s, d)
          .rollingWeighted(Seq(1, 2, 3, 2, 1), "value", "event_id",
            Seq("user_id"), "_w")
          .select(col("event_id"), col("user_id"), P.r4(col("_w")).as("wma5"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id, user_id,
              |  round(cast((lag(cast(value as decimal(18,2)), 4) OVER w)
              |      + (lag(cast(value as decimal(18,2)), 3) OVER w) * 2
              |      + (lag(cast(value as decimal(18,2)), 2) OVER w) * 3
              |      + (lag(cast(value as decimal(18,2)), 1) OVER w) * 2
              |      + cast(value as decimal(18,2)) as double) / 9.0, 4) AS wma5
              |FROM $EV
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
              |ORDER BY event_id""".stripMargin),
    ),
  )
}
