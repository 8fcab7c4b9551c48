package graft.ops

import graft.core.{Policy => P, Tables => T}
import graft.ts.AsofJoin
import org.apache.spark.sql.functions._

/** §2.C joins (pandas `merge` / `merge_asof` analogues).
  *
  * Scale notes: big⋈big equi-joins (orders⋈lineitem) compile to
  * sort-merge on the shuffled key — the 100 TB default. Dimension joins
  * broadcast (nation/region/part are KB–MB at any sf; part is explicitly
  * hinted, the others are under the 10 MB auto-threshold). The as-of
  * family uses the union-and-window idiom in [[graft.ts.AsofJoin]]:
  * one shuffle + one sort, no range explosion (see its scaladoc).
  * Aggregated outputs keep verify dumps O(groups), not O(rows).
  */
object Joins {

  // events split into a probe stream (purchases) and a build stream
  // (signups/clicks) — the classic "enrich each purchase with the most
  // recent prior marketing touch" as-of shape.
  private def purchases(s: org.apache.spark.sql.SparkSession, d: String) =
    T.events(s, d).filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")

  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "join_inner",
      (s, d) =>
        T.orders(s, d)
          .join(T.lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "inner")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_lines"),
            sum(P.dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
             |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_price
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),
    // Same semantics, explicitly-broadcast small side → BroadcastHashJoin
    // (plan shape asserted in PlanShapeSpec).
    OpSpec(
      "join_broadcast",
      (s, d) =>
        T.lineitem(s, d)
          .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(
            count(lit(1)).as("n"),
            sum(P.dec2(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n,
             |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    ),
    // Left join with genuinely unmatched left rows (customers without
    // urgent orders): count(o_orderkey) < count(*) proves NULL rows flow.
    OpSpec(
      "join_left",
      (s, d) =>
        T.customer(s, d)
          .join(
            T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("o_orderkey")).as("n_matched"),
            countDistinct(col("c_custkey")).as("n_customers"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_matched,
             |  count(DISTINCT c_custkey) AS n_customers
             |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
             |  ON c_custkey = o_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),
    // Full outer with misses on BOTH sides (filtered key ranges overlap
    // only partially); null-side counters prove both directions fire.
    OpSpec(
      "join_outer",
      (s, d) =>
        T.customer(s, d).filter(col("c_nationkey") < 13)
          .select("c_custkey", "c_nationkey")
          .join(
            T.orders(s, d).filter(col("o_totalprice") > 150000)
              .select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"), "full_outer")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_left_null"),
            sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_right_null")),
      Some("""SELECT count(*) AS n_rows,
             |  cast(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) as bigint) AS n_left_null,
             |  cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) as bigint) AS n_right_null
             |FROM (SELECT c_custkey FROM customer WHERE c_nationkey < 13) c
             |FULL JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 150000) o
             |  ON c_custkey = o_custkey""".stripMargin),
    ),
    OpSpec(
      "join_semi",
      (s, d) =>
        T.customer(s, d)
          .join(
            T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
          .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, count(*) AS n FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    ),
    OpSpec(
      "join_anti",
      (s, d) =>
        T.customer(s, d)
          .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
          .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, count(*) AS n FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    ),
    OpSpec(
      "join_cross",
      (s, d) =>
        T.region(s, d).crossJoin(T.nation(s, d))
          .select("r_regionkey", "r_name", "n_nationkey", "n_name")
          .orderBy("r_regionkey", "n_nationkey"),
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region CROSS JOIN nation
             |ORDER BY r_regionkey, n_nationkey""".stripMargin),
    ),
    // Equi key + range predicate: lineitems shipped within 30 days of
    // their order's date. Compiles to sort-merge on the equi key with the
    // range as a residual filter — no range explosion at scale.
    OpSpec(
      "join_theta_range",
      (s, d) =>
        T.orders(s, d)
          .join(
            T.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") >= col("o_orderdate") &&
              col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n"),
            sum(P.dec2(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
             |FROM orders JOIN lineitem
             |  ON o_orderkey = l_orderkey
             |  AND l_shipdate >= o_orderdate
             |  AND l_shipdate < o_orderdate + INTERVAL 30 DAY
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    ),
    // Global backward as-of: each purchase picks up the most recent
    // signup at-or-before it. Oracle truncates ts to µs INSIDE the join
    // so both engines compare at the same precision. Uses the
    // range-partitioned backwardGlobal (parallel window + boundary-carry
    // pass) rather than the serial single-partition window — the 100 TB
    // shape for an un-keyed as-of.
    OpSpec(
      "join_asof_backward",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "signup")
          .select(col("ts"), col("value").as("sig_value"))
        AsofJoin.backwardGlobal(
          purchases(s, d).drop("user_id"), build,
          on = "ts", payload = Seq("sig_value"))
          .select(col("event_id"), P.tsOut(col("ts")).as("ts"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("sig_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, cast(ts as timestamp) AS ts, value
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT cast(ts as timestamp) AS ts, value AS sig_value
             |          FROM events WHERE event_type = 'signup')
             |SELECT p.event_id, p.ts, b.ts AS matched_ts, b.sig_value
             |FROM p ASOF LEFT JOIN b ON p.ts >= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // Keyed as-of: last prior click BY THE SAME USER before each
    // purchase (the per-entity enrichment every TSDB pipeline runs).
    OpSpec(
      "join_asof_by",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        AsofJoin.backward(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, b.ts AS matched_ts, b.click_value
             |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // Multi-column by-key (pandas merge_asof(by=[k1, k2])): the frontier
    // resets per (user, calendar day) — clicks only match purchases of
    // the SAME user on the SAME day. Same one-shuffle window idiom; the
    // composite key is just more partition columns.
    OpSpec(
      "join_asof_by2",
      (s, d) => {
        val probe = purchases(s, d).withColumn("day", to_date(col("ts")))
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("ts"), col("value").as("click_value"))
        AsofJoin.backward(
          probe, build,
          on = "ts", by = Seq("user_id", "day"), payload = Seq("click_value"))
          .select(col("event_id"), col("user_id"),
            col("day").cast("string").as("day"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(cast(ts as timestamp) as date) AS day,
             |                 cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(cast(ts as timestamp) as date) AS day,
             |                 cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, cast(p.day as varchar) AS day,
             |  b.ts AS matched_ts, b.click_value
             |FROM p ASOF LEFT JOIN b
             |  ON p.user_id = b.user_id AND p.day = b.day AND p.ts >= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // Tolerance: matches farther than 1 hour back are nulled, not
    // dropped (pandas merge_asof(tolerance=...) semantics).
    OpSpec(
      "join_asof_tolerance",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        AsofJoin.backward(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
          toleranceMicros = Some(3600L * 1000000L))
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id,
             |  CASE WHEN p.ts - b.ts <= INTERVAL 1 HOUR THEN b.ts END AS matched_ts,
             |  CASE WHEN p.ts - b.ts <= INTERVAL 1 HOUR THEN b.click_value END AS click_value
             |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // The same keyed backward as-of, but through the CUSTOM CATALYST
    // OPERATOR tier (AsofJoinNode → AsofJoinStrategy → AsofJoinExec,
    // plans/AsofJoinPlan.scala): this puts the physical operator inside
    // the DuckDB hash gate, not just the scalatest equivalence suite.
    // Strategy registration is idempotent on the session.
    OpSpec(
      "join_asof_physical",
      (s, d) => {
        val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        if (!cs.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
          cs.experimental.extraStrategies ++= Seq(graft.plans.AsofJoinStrategy)
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        graft.plans.AsofJoinPlan.asof(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, b.ts AS matched_ts, b.click_value
             |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // Forward as-of through the CUSTOM CATALYST OPERATOR (the same
    // AsofJoinExec two-pointer merge, direction='forward') — puts the
    // exec's forward path inside the hash gate alongside the backward
    // one.
    OpSpec(
      "join_asof_physical_fwd",
      (s, d) => {
        val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        if (!cs.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
          cs.experimental.extraStrategies ++= Seq(graft.plans.AsofJoinStrategy)
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        graft.plans.AsofJoinPlan.asof(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
          direction = "forward")
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, b.ts AS matched_ts, b.click_value
             |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // Forward as-of (pandas direction='forward'): the NEXT click by the
    // same user at-or-after each purchase. Same single-shuffle window
    // idiom, mirrored frame.
    OpSpec(
      "join_asof_forward",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        AsofJoin.forward(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, b.ts AS matched_ts, b.click_value
             |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // GLOBAL (no by-key) as-of through the SCALE path — merge_asof
    // without `by`, where the naive window is one serial partition.
    // AsofJoin.backwardGlobal range-partitions the tagged union on ts
    // (deterministic quantile-sketch bounds; any monotone bucketing
    // yields the same result), windows each bucket in parallel, then
    // repairs bucket-boundary probes with an O(numPartitions)-row
    // broadcast prefix-carry — the 100× plan, previously capability-
    // tested only (AsofJoinSpec); this puts it inside the hash gate.
    // Deterministic: click ts are globally unique in the corpus, so
    // the latest-at-or-before match is unique.
    OpSpec(
      "join_asof_global",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("ts"), col("value").as("click_value"))
        AsofJoin.backwardGlobal(
          purchases(s, d), build,
          on = "ts", payload = Seq("click_value"))
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, b.ts AS matched_ts, b.click_value
             |FROM p ASOF LEFT JOIN b ON p.ts >= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // merge_asof(direction='forward', tolerance=Δ) — the parameter
    // COMBINATION (tolerance is direction-agnostic in pandas; declared
    // backward-only until now). Same single-pass mirrored window,
    // misses nulled by the gap test.
    OpSpec(
      "join_asof_tolerance_fwd",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        AsofJoin.forward(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
          toleranceMicros = Some(3600L * 1000000L))
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id,
             |  CASE WHEN b.ts - p.ts <= INTERVAL 1 HOUR THEN b.ts END AS matched_ts,
             |  CASE WHEN b.ts - p.ts <= INTERVAL 1 HOUR THEN b.click_value END AS click_value
             |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // Nearest as-of (pandas direction='nearest', ties → backward): the
    // closest click by the same user on either side of each purchase.
    // Oracle composes DuckDB's backward and forward ASOF joins with the
    // same tie-break.
    OpSpec(
      "join_asof_nearest",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        AsofJoin.nearest(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click'),
             |     bk AS (SELECT p.event_id, p.user_id, p.ts, b.ts AS b_ts, b.click_value AS b_val
             |            FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts),
             |     fw AS (SELECT p.event_id, b.ts AS f_ts, b.click_value AS f_val
             |            FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts)
             |SELECT bk.event_id, bk.user_id,
             |  CASE WHEN b_ts IS NULL THEN f_ts
             |       WHEN f_ts IS NULL THEN b_ts
             |       WHEN (bk.ts - b_ts) <= (f_ts - bk.ts) THEN b_ts ELSE f_ts END AS matched_ts,
             |  CASE WHEN b_ts IS NULL THEN f_val
             |       WHEN f_ts IS NULL THEN b_val
             |       WHEN (bk.ts - b_ts) <= (f_ts - bk.ts) THEN b_val ELSE f_val END AS click_value
             |FROM bk JOIN fw USING (event_id)
             |ORDER BY bk.event_id""".stripMargin),
    ),
    // merge_asof(direction='nearest', tolerance=Δ) — the last uncovered
    // cell of the direction × tolerance matrix (nearest and tolerance
    // were declared separately until now). Choose-nearest-then-null-out
    // ≡ filter-then-choose: the nearest candidate has the MINIMUM gap,
    // so if it violates Δ both sides do. Δ=30 min (tighter than the
    // 1-hour backward/forward tolerances, so misses actually occur).
    // Oracle = the two-ASOF nearest composition bounded by a gap CASE.
    OpSpec(
      "join_asof_nearest_tol",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        AsofJoin.nearest(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
          toleranceMicros = Some(1800L * 1000000L))
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click'),
             |     bk AS (SELECT p.event_id, p.user_id, p.ts, b.ts AS b_ts, b.click_value AS b_val
             |            FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts),
             |     fw AS (SELECT p.event_id, b.ts AS f_ts, b.click_value AS f_val
             |            FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts),
             |     near AS (
             |       SELECT bk.event_id, bk.user_id, bk.ts,
             |         CASE WHEN b_ts IS NULL THEN f_ts
             |              WHEN f_ts IS NULL THEN b_ts
             |              WHEN (bk.ts - b_ts) <= (f_ts - bk.ts) THEN b_ts ELSE f_ts END AS m_ts,
             |         CASE WHEN b_ts IS NULL THEN f_val
             |              WHEN f_ts IS NULL THEN b_val
             |              WHEN (bk.ts - b_ts) <= (f_ts - bk.ts) THEN b_val ELSE f_val END AS m_val
             |       FROM bk JOIN fw USING (event_id))
             |SELECT event_id, user_id,
             |  CASE WHEN m_ts >= ts - INTERVAL 30 MINUTES
             |        AND m_ts <= ts + INTERVAL 30 MINUTES THEN m_ts END AS matched_ts,
             |  CASE WHEN m_ts >= ts - INTERVAL 30 MINUTES
             |        AND m_ts <= ts + INTERVAL 30 MINUTES THEN m_val END AS click_value
             |FROM near ORDER BY event_id""".stripMargin),
    ),
    // The keyed backward as-of STRAIGHT FROM SQL TEXT through the
    // asof_join table-valued function (GraftExtensions) — gates the SQL
    // surface of the custom operator, not just the DataFrame helper.
    // Requires a session built with GraftExtensions (Verify/Bench are).
    OpSpec(
      "join_asof_tvf",
      (s, d) => {
        purchases(s, d).createOrReplaceTempView("tvf_purchases")
        T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
          .createOrReplaceTempView("tvf_clicks")
        s.sql("""SELECT event_id, user_id, matched_ts, click_value
                |FROM asof_join('tvf_purchases', 'tvf_clicks', 'ts', 'user_id', 'click_value')""".stripMargin)
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, b.ts AS matched_ts, b.click_value
             |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // Strict backward as-of (pandas merge_asof(allow_exact_matches=
    // False)): build rows at EXACTLY the probe's ts are excluded — the
    // match is the latest click strictly before each purchase. Same
    // one-shuffle window idiom with the frame ending 1 µs short
    // (AsofJoin strict frames); DuckDB's strict ASOF spelling is a bare
    // `>` in the inequality.
    OpSpec(
      "join_asof_strict",
      (s, d) => {
        val build = T.events(s, d).filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        AsofJoin.backward(
          purchases(s, d), build,
          on = "ts", by = Seq("user_id"), payload = Seq("click_value"),
          allowExactMatches = false)
          .select(col("event_id"), col("user_id"),
            P.tsOut(col("matched_ts")).as("matched_ts"), col("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |     b AS (SELECT user_id, cast(ts as timestamp) AS ts, value AS click_value
             |          FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, b.ts AS matched_ts, b.click_value
             |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts > b.ts
             |ORDER BY p.event_id""".stripMargin),
    ),
    // pandas merge(indicator=True) [P core/reshape/merge.py]: full outer
    // join + both/left_only/right_only provenance column. The two sides
    // are filtered asymmetrically so all three labels actually occur.
    // Full-outer on the shuffled key is SMJ — the 100 TB default; the
    // indicator is a row-local CASE after the join.
    OpSpec(
      "join_indicator",
      (s, d) => {
        val a = T.customer(s, d).filter(col("c_nationkey") < 13)
          .select(col("c_custkey").as("k"), lit(1).as("in_a"))
        val b = T.orders(s, d).filter(col("o_totalprice") > 150000)
          .select(col("o_custkey").as("k")).distinct()
          .withColumn("in_b", lit(1))
        a.join(b, Seq("k"), "full_outer")
          .select(col("k"),
            when(col("in_a").isNotNull && col("in_b").isNotNull, "both")
              .when(col("in_a").isNotNull, "left_only")
              .otherwise("right_only").as("merge_ind"))
          .orderBy("k")
      },
      Some("""SELECT coalesce(a.k, b.k2) AS k,
             |  CASE WHEN in_a IS NOT NULL AND in_b IS NOT NULL THEN 'both'
             |       WHEN in_a IS NOT NULL THEN 'left_only'
             |       ELSE 'right_only' END AS merge_ind
             |FROM (SELECT c_custkey AS k, 1 AS in_a FROM customer WHERE c_nationkey < 13) a
             |FULL OUTER JOIN (SELECT DISTINCT o_custkey AS k2, 1 AS in_b
             |                 FROM orders WHERE o_totalprice > 150000) b
             |  ON a.k = b.k2
             |ORDER BY k""".stripMargin),
    ),
    // PURE interval join — NO equi-key: which lineitems shipped inside
    // each order-week window [d0, d0+7), across the whole table. Spark's
    // native plan for a keyless range predicate is BroadcastNestedLoop /
    // cartesian — O(|iv|·|points|) compares. The scale device is BIN
    // BLOCKING: each interval explodes to the week-buckets it overlaps
    // (≤ 2 for a 7-day window), points bucket to their own week, the
    // join is an EQUI-join on the bucket, and the original range
    // predicate remains as the residual filter. Pair generation is
    // O(points + intervals·buckets) shuffled on the bucket — the plan a
    // 100 TB range join needs. The oracle is the DIRECT range join:
    // the gate proves the blocking lossless.
    OpSpec(
      "join_range_binned",
      (s, d) => {
        val iv = T.orders(s, d).filter(col("o_orderkey") < 500)
          .select(col("o_orderkey").as("iv_id"), col("o_orderdate").as("d0"),
            date_add(col("o_orderdate"), 7).as("d1"))
        val ivBins = iv.withColumn("wk",
          explode(expr(
            "sequence(date_trunc('week', d0), date_trunc('week', d1), interval 7 days)")))
        val pts = T.lineitem(s, d)
          .select(col("l_shipdate").as("day"), col("l_quantity"))
          .withColumn("wk", date_trunc("week", col("day")))
        ivBins.join(pts, Seq("wk"))
          .filter(col("day") >= col("d0") && col("day") < col("d1"))
          .groupBy("iv_id")
          .agg(count(lit(1)).as("n"),
            sum(P.dec2(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy("iv_id")
      },
      Some("""SELECT o_orderkey AS iv_id, count(*) AS n,
             |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
             |FROM (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey < 500) o
             |JOIN lineitem
             |  ON l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 7 DAY
             |GROUP BY 1 ORDER BY iv_id""".stripMargin),
    ),
    // merge(on=[k1, k2]) — composite-key equi-join: daily purchase vs
    // click activity per user. The shuffle key is the full (user, day)
    // tuple — one exchange per side, SMJ on both columns.
    OpSpec(
      "join_multi_key",
      (s, d) => {
        def daily(t: String, n: String) =
          T.events(s, d).filter(col("event_type") === t)
            .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
            .agg(count(lit(1)).as(n))
        daily("purchase", "n_purch")
          .join(daily("click", "n_click"), Seq("user_id", "day"))
          .select(col("user_id"), P.tsOut(col("day")).as("day"),
            col("n_purch"), col("n_click"))
          .orderBy("user_id", "day")
      },
      Some("""WITH p AS (SELECT user_id, date_trunc('day', cast(ts as timestamp)) AS day, count(*) AS n_purch
             |          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |     c AS (SELECT user_id, date_trunc('day', cast(ts as timestamp)) AS day, count(*) AS n_click
             |          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.user_id, p.day, n_purch, n_click
             |FROM p JOIN c ON p.user_id = c.user_id AND p.day = c.day
             |ORDER BY p.user_id, p.day""".stripMargin),
    ),
    // combine_first [P core/frame.py] — value-level coalesce of two
    // aligned frames: full outer on the (user, day) index, purchase
    // sums patched by click sums where missing.
    OpSpec(
      "join_combine_first",
      (s, d) => {
        def daily(t: String, n: String) =
          T.events(s, d).filter(col("event_type") === t)
            .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
            .agg(sum(P.dec2(col("value"))).cast("double").as(n))
        daily("purchase", "pv")
          .join(daily("click", "cv"), Seq("user_id", "day"), "full_outer")
          .select(col("user_id"), P.tsOut(col("day")).as("day"),
            coalesce(col("pv"), col("cv")).as("val"))
          .orderBy("user_id", "day")
      },
      Some("""WITH p AS (SELECT user_id, date_trunc('day', cast(ts as timestamp)) AS day,
             |            cast(sum(cast(value as decimal(18,2))) as double) AS pv
             |          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |     c AS (SELECT user_id, date_trunc('day', cast(ts as timestamp)) AS day,
             |            cast(sum(cast(value as decimal(18,2))) as double) AS cv
             |          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT coalesce(p.user_id, c.user_id) AS user_id,
             |       coalesce(p.day, c.day) AS day,
             |       coalesce(pv, cv) AS val
             |FROM p FULL OUTER JOIN c ON p.user_id = c.user_id AND p.day = c.day
             |ORDER BY user_id, day""".stripMargin),
    ),
    // pandas merge(validate='1:m') as a QUERY: instead of raising, emit
    // the key-cardinality audit a data engineer runs before a big join
    // — per-key left/right multiplicities classified 1:1 / 1:m / m:1 /
    // m:m (+ left_only/right_only orphans), aggregated to one row per
    // relation class. Two tiny per-key aggs FULL-joined: the shuffle
    // carries one row per key, never the fact rows, so the audit of a
    // 100 TB join costs one pass over each side.
    OpSpec(
      "join_cardinality_audit",
      (s, d) => {
        val lc = T.customer(s, d)
          .groupBy(col("c_custkey").as("k")).agg(count(lit(1)).as("n_l"))
        val ro = T.orders(s, d)
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_r"))
        lc.join(ro, Seq("k"), "full_outer")
          .select(col("k"),
            when(col("n_l").isNull, "right_only")
              .when(col("n_r").isNull, "left_only")
              .when(col("n_l") === 1 && col("n_r") === 1, "1:1")
              .when(col("n_l") === 1, "1:m")
              .when(col("n_r") === 1, "m:1")
              .otherwise("m:m").as("relation"),
            coalesce(col("n_l"), lit(0L)).as("n_l"),
            coalesce(col("n_r"), lit(0L)).as("n_r"))
          .groupBy("relation")
          .agg(count(lit(1)).as("n_keys"),
            sum(col("n_l")).as("left_rows"), sum(col("n_r")).as("right_rows"))
          .orderBy("relation")
      },
      Some("""SELECT relation, count(*) AS n_keys,
             |  cast(sum(n_l) as bigint) AS left_rows,
             |  cast(sum(n_r) as bigint) AS right_rows
             |FROM (
             |  SELECT CASE WHEN l.n_l IS NULL THEN 'right_only'
             |              WHEN r.n_r IS NULL THEN 'left_only'
             |              WHEN l.n_l = 1 AND r.n_r = 1 THEN '1:1'
             |              WHEN l.n_l = 1 THEN '1:m'
             |              WHEN r.n_r = 1 THEN 'm:1'
             |              ELSE 'm:m' END AS relation,
             |    coalesce(l.n_l, 0) AS n_l, coalesce(r.n_r, 0) AS n_r
             |  FROM (SELECT c_custkey AS k, count(*) AS n_l FROM customer GROUP BY 1) l
             |  FULL OUTER JOIN (SELECT o_custkey AS k, count(*) AS n_r FROM orders GROUP BY 1) r
             |  USING (k))
             |GROUP BY relation ORDER BY relation""".stripMargin),
    ),
    // NULL-key join semantics pinned cross-engine (§2.C's own warning:
    // "beware NULL keys" — no other fixture exercises them). Keys are
    // nullif-seeded on BOTH sides (customers of nation 3 and nation 5's
    // own key go NULL), then pushed through inner / left / anti and
    // summarized to one row per mode. The semantics under test: SQL
    // equality never matches NULL (inner drops null-key rows, left
    // keeps them unmatched), and anti is NOT EXISTS — null-key left
    // rows are KEPT, which is exactly where the NOT IN anti-join trap
    // diverges (NOT IN against a list containing NULL returns zero
    // rows). Spark's left_anti implements NOT EXISTS; the oracle
    // spells NOT EXISTS so both engines pin the same rule.
    OpSpec(
      "join_null_keys",
      (s, d) => {
        val c = T.customer(s, d)
          .filter(col("c_custkey") % 50 === 0)
          .select(col("c_custkey"), expr("cast(nullif(c_nationkey, 3) as bigint)").as("k"))
        val n = T.nation(s, d)
          .select(expr("cast(nullif(n_nationkey, 5) as bigint)").as("k"), col("n_name"))
        def stat(df: org.apache.spark.sql.DataFrame, mode: String) =
          df.agg(
              count(lit(1)).as("n_rows"),
              sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_key"))
            .select(lit(mode).as("mode"), col("n_rows"), col("n_null_key"))
        stat(c.join(n, Seq("k")), "inner")
          .unionAll(stat(c.join(n, Seq("k"), "left"), "left"))
          .unionAll(stat(c.join(n, Seq("k"), "left_anti"), "anti"))
          .orderBy("mode")
      },
      Some("""WITH c AS (SELECT c_custkey, cast(nullif(c_nationkey, 3) as bigint) AS k
             |          FROM customer WHERE c_custkey % 50 = 0),
             |n AS (SELECT cast(nullif(n_nationkey, 5) as bigint) AS k, n_name FROM nation)
             |SELECT 'inner' AS mode, count(*) AS n_rows,
             |  cast(sum(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END) as bigint) AS n_null_key
             |FROM c JOIN n ON c.k = n.k
             |UNION ALL
             |SELECT 'left', count(*),
             |  cast(sum(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END) as bigint)
             |FROM c LEFT JOIN n ON c.k = n.k
             |UNION ALL
             |SELECT 'anti', count(*),
             |  cast(sum(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END) as bigint)
             |FROM c WHERE NOT EXISTS (SELECT 1 FROM n WHERE n.k = c.k)
             |ORDER BY mode""".stripMargin),
    ),
  )
}
