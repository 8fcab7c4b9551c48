package graft.ops

import graft.core.{Tables => T}
import org.apache.spark.sql.functions._

/** §2.L UDF surface. Builtins beat UDFs (codegen, pushdown-transparent),
  * so the engine's rule is: UDF only where no builtin composition
  * exists. This declared query deliberately wraps a plain Scala UDF — a
  * text normalizer — to exercise registration, null handling and
  * determinism; its oracle re-implements the same logic in SQL.
  * (The UDF breaks codegen fusion at exactly one projection — visible
  * in the plan as a BatchEvalPython-free ObjectHashAggregate-free
  * simple Project(udf) — acceptable off the hot path.)
  */
object Udfs {
  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "udf_scalar",
      (s, d) => {
        val normalize = udf((t: String) =>
          if (t == null) null else t.trim.toLowerCase.replaceAll(" +", " "))
        T.documents(s, d)
          .filter(col("doc_id") < 50)
          .select(col("doc_id"),
            normalize(concat(lit("  "), col("text"), lit("  "))).as("norm_text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  lower(trim(regexp_replace('  ' || text || '  ', ' +', ' ', 'g'))) AS norm_text
             |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin),
    ),
    // The generic `groupby.apply` ESCAPE HATCH [P core/groupby/
    // groupby.py .apply] — pandas' most-used generic surface: "run MY
    // function once per group". The Spark recipe, reusable verbatim
    // for any per-group logic:
    //   1. groupByKey on the group key (ONE shuffle — same cost as
    //      any agg on that key);
    //   2. inside flatMapGroups, SORT the group's rows by an explicit
    //      total-order column FIRST — partition arrival order is not
    //      reproducible, so any order-sensitive apply-body without
    //      this sort is nondeterministic (the determinism policy);
    //   3. run arbitrary Scala over the ordered Seq, emit 0..n typed
    //      rows (here: 1 summary row per group).
    // Memory bound: ONE group must fit on an executor (same contract
    // as pandas apply, which holds one group in a frame) — fine for
    // per-user/per-entity groups; for giant groups use an Aggregator
    // (udaf/Ewm, udaf/TopK) or window instead. The demo body — the
    // longest strictly-increasing run of `value` in event order, a
    // classic not-expressible-as-one-agg statistic — is re-derived by
    // the oracle via gaps-and-islands SQL, so the recipe's output is
    // hash-gated like every builtin op.
    OpSpec(
      "udf_groupby_apply",
      (s, d) => {
        val spark = s
        import spark.implicits._
        T.events(s, d).filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"), col("value"))
          .as[(Long, Long, Double)]
          .groupByKey(_._1)
          .flatMapGroups { (user: Long, rows: Iterator[(Long, Long, Double)]) =>
            val ordered = rows.toSeq.sortBy(_._2) // explicit total order
            var best, cur = 0L
            var prev = Double.NaN
            ordered.foreach { case (_, _, v) =>
              cur = if (!prev.isNaN && v > prev) cur + 1 else 1
              if (cur > best) best = cur
              prev = v
            }
            Iterator((user, ordered.size.toLong, best))
          }
          .toDF("user_id", "n_events", "longest_up_run")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  max(run_len) AS longest_up_run
             |FROM (
             |  SELECT user_id,
             |    count(*) OVER (PARTITION BY user_id, grp
             |                   ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS run_len
             |  FROM (
             |    SELECT user_id, event_id,
             |      count(CASE WHEN up = 0 THEN 1 END)
             |        OVER (PARTITION BY user_id ORDER BY event_id
             |              ROWS UNBOUNDED PRECEDING) AS grp
             |    FROM (
             |      SELECT user_id, event_id, value,
             |        CASE WHEN value > lag(value) OVER
             |          (PARTITION BY user_id ORDER BY event_id)
             |        THEN 1 ELSE 0 END AS up
             |      FROM events WHERE user_id < 10)))
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
    // pandas' STRING surfaces df.query / df.eval (round-13 verdict
    // item 6): the thin api layer translates the pandas dialect
    // (and/or/not, ==, `in [..]` lists; @var rejected) and hands the
    // text to Catalyst — so the predicate PUSHES DOWN like any native
    // filter and the eval projections fuse into one codegen stage
    // (plan-asserted in ApiSpec). The declared composition: filter
    // orders with query(), derive two columns with a multiline
    // eval(), aggregate per status.
    OpSpec(
      "api_query_eval",
      (s, d) => {
        import graft.api.syntax._
        T.orders(s, d)
          .query("o_orderstatus == 'F' and not (o_totalprice < 1000.0) " +
            "and o_orderpriority in ['1-URGENT', '2-HIGH']")
          // price goes through exact cents (decimal policy §2.0) so the
          // per-group sum is order-free at any partitioning
          .eval("""price_c = cast(o_totalprice as decimal(18,2))
                  |is_low_cust = o_custkey < 500""".stripMargin)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            (sum(col("price_c")).cast("double") / 1000.0).as("sum_price_k"),
            sum(when(col("is_low_cust"), 1L).otherwise(0L)).as("n_low_cust"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) / 1000.0
             |    AS sum_price_k,
             |  cast(sum(CASE WHEN o_custkey < 500 THEN 1 ELSE 0 END) as bigint)
             |    AS n_low_cust
             |FROM orders
             |WHERE o_orderstatus = 'F' AND NOT (o_totalprice < 1000.0)
             |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),
  )
}
