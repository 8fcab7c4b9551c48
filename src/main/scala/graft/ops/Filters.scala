package graft.ops

import graft.core.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.B projection / filter / predicates.
  *
  * All row-local (narrow) transformations: no shuffle, fully fused by
  * whole-stage codegen, filters and column pruning pushed to the scan.
  * Money arithmetic is done decimal-first (cast the 2-dp inputs to
  * decimal BEFORE multiplying) so results are exact in both engines —
  * rounding a double product instead would hit cross-engine tie-breaking
  * differences on the ~1% of products landing exactly on a half-cent.
  */
object Filters {
  private def li(s: org.apache.spark.sql.SparkSession, d: String) = T.lineitem(s, d)

  /** ONE oracle text for both top-percent spellings — bit-identical
    * by construction (exact integer rank, identical final division). */
  private val topPercentOracleSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice, pr
      |FROM (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |    percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS pr
      |  FROM orders)
      |WHERE pr > 0.9
      |ORDER BY o_orderkey""".stripMargin

  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "proj_select_rename",
      (s, d) =>
        T.customer(s, d)
          .select(
            col("c_custkey").as("id"),
            col("c_name").as("name"),
            col("c_mktsegment").as("segment"))
          .orderBy("id"),
      Some("SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment FROM customer ORDER BY id"),
    ),
    // Selective 1% predicate keeps verify output O(10^3) at any sf —
    // full-table dumps under a global sort are a scale liability
    // (the operator itself is still a narrow, fused projection).
    OpSpec(
      "proj_compute",
      (s, d) =>
        li(s, d)
          .filter(col("l_orderkey") % 100 === 0)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount")).cast("decimal(4,2)"))
              .cast("decimal(18,4)").cast("double").as("revenue"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  cast(cast(cast(l_extendedprice as decimal(18,2)) * cast(1 - l_discount as decimal(4,2)) as decimal(18,4)) as double) AS revenue
             |FROM lineitem WHERE l_orderkey % 100 = 0 ORDER BY l_orderkey, l_linenumber""".stripMargin),
    ),
    OpSpec(
      "filter_compare",
      (s, d) =>
        li(s, d)
          .filter(col("l_quantity") > 45)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin),
    ),
    OpSpec(
      "filter_compound",
      (s, d) =>
        li(s, d)
          .filter(
            (col("l_returnflag") === "A" || col("l_linestatus") === "F") &&
              !(col("l_discount") < 0.05))
          .agg(count(lit(1)).as("n")),
      Some("""SELECT count(*) AS n FROM lineitem
             |WHERE (l_returnflag = 'A' OR l_linestatus = 'F') AND NOT (l_discount < 0.05)""".stripMargin),
    ),
    OpSpec(
      "filter_isin",
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select("o_orderkey", "o_orderpriority")
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""".stripMargin),
    ),
    OpSpec(
      "filter_between",
      (s, d) =>
        li(s, d)
          .filter(col("l_quantity").between(10, 15))
          .agg(count(lit(1)).as("n"), min("l_quantity").as("min_q"), max("l_quantity").as("max_q")),
      Some("""SELECT count(*) AS n, min(l_quantity) AS min_q, max(l_quantity) AS max_q
             |FROM lineitem WHERE l_quantity BETWEEN 10 AND 15""".stripMargin),
    ),
    // No NULLs exist in the data (FIXTURES) — manufacture them with
    // nullif so the null predicates actually fire.
    OpSpec(
      "filter_null",
      (s, d) =>
        li(s, d)
          .withColumn("d", when(col("l_discount") === 0.0, lit(null)).otherwise(col("l_discount")))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("d")).as("n_not_null"),
            sum(when(col("d").isNull, 1L).otherwise(0L)).as("n_null")),
      Some("""SELECT count(*) AS n_rows, count(d) AS n_not_null,
             |  cast(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) as bigint) AS n_null
             |FROM (SELECT nullif(l_discount, 0.0) AS d FROM lineitem)""".stripMargin),
    ),
    OpSpec(
      "cond_case_when",
      (s, d) =>
        li(s, d)
          .select(
            when(col("l_quantity") < 10, "low")
              .when(col("l_quantity") < 25, "mid")
              .otherwise("high").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      Some("""SELECT CASE WHEN l_quantity < 10 THEN 'low'
             |            WHEN l_quantity < 25 THEN 'mid'
             |            ELSE 'high' END AS bucket, count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
    OpSpec(
      "null_coalesce",
      (s, d) =>
        li(s, d)
          .filter(col("l_orderkey") % 100 === 0)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            coalesce(
              when(col("l_discount") === 0.0, lit(null)).otherwise(col("l_discount")),
              lit(-1.0)).as("d"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, coalesce(nullif(l_discount, 0.0), -1.0) AS d
             |FROM lineitem WHERE l_orderkey % 100 = 0 ORDER BY l_orderkey, l_linenumber""".stripMargin),
    ),
    // Casts restricted to the cross-engine-safe set: int widening and
    // double→decimal of genuinely 2-dp values. (double→int is banned:
    // Spark truncates, DuckDB rounds.)
    OpSpec(
      "cast_types",
      (s, d) =>
        li(s, d)
          .filter(col("l_orderkey") % 100 === 0)
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast("bigint").as("ln_big"),
            col("l_linenumber").cast("double").as("ln_dbl"),
            // decimal round-trip exercises the cast; emit double (the
            // comparator sees Decimal-vs-float64 dtype splits otherwise)
            col("l_extendedprice").cast("decimal(18,2)").cast("double").as("price_rt"),
            col("l_orderkey").cast("string").as("key_str"))
          .orderBy("l_orderkey", "ln_big"),
      Some("""SELECT l_orderkey, cast(l_linenumber as bigint) AS ln_big,
             |  cast(l_linenumber as double) AS ln_dbl,
             |  cast(cast(l_extendedprice as decimal(18,2)) as double) AS price_rt,
             |  cast(l_orderkey as varchar) AS key_str
             |FROM lineitem WHERE l_orderkey % 100 = 0 ORDER BY l_orderkey, ln_big""".stripMargin),
    ),
    // pandas axis=1 reductions — df[['a','b','c']].min/max/mean(axis=1):
    // row-wise, so they fuse into the scan (greatest/least are codegen
    // comparisons; the mean is a 3-term sum in a FIXED left-to-right
    // textual order + one /3.0 — written identically in both engines).
    OpSpec(
      "proj_rowwise_stats",
      (s, d) =>
        li(s, d)
          .filter(col("l_orderkey") % 100 === 0)
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("ln"),
            least(col("l_quantity"), col("l_discount"), col("l_tax")).as("row_min"),
            greatest(col("l_quantity"), col("l_discount"), col("l_tax")).as("row_max"),
            ((col("l_quantity") + col("l_discount") + col("l_tax")) / 3.0).as("row_mean"))
          .orderBy("l_orderkey", "ln"),
      Some("""SELECT l_orderkey, cast(l_linenumber as bigint) AS ln,
             |  least(l_quantity, l_discount, l_tax) AS row_min,
             |  greatest(l_quantity, l_discount, l_tax) AS row_max,
             |  (l_quantity + l_discount + l_tax) / 3.0 AS row_mean
             |FROM lineitem WHERE l_orderkey % 100 = 0
             |ORDER BY l_orderkey, ln""".stripMargin),
    ),
    // "rows above their group's 90th percentile" — the pandas
    // groupby-filter idiom df[df.x > df.groupby(g).x.transform(
    // 'quantile', .9)], expressed RANK-based (percent_rank > 0.9) so
    // it is exact under ties in both engines: percent_rank =
    // (rank−1)/(n−1) is a ratio of exact integers, one identical IEEE
    // division, no quantile-interpolation policy to reconcile. One
    // window over the o_orderstatus shuffle, filter, no second scan
    // (vs the transform-then-compare spelling, which re-joins).
    OpSpec(
      "filter_top_percent",
      (s, d) =>
        T.orders(s, d)
          .withColumn("pr",
            percent_rank().over(
              Window.partitionBy("o_orderstatus").orderBy("o_totalprice")))
          .filter(col("pr") > 0.9)
          .select("o_orderkey", "o_orderstatus", "o_totalprice", "pr")
          .orderBy("o_orderkey"),
      Some(topPercentOracleSql),
    ),
    // The GROUP-COUNT-INDEPENDENT top-percent filter (round 17): the
    // window spelling above sorts the fact table partitioned by
    // o_orderstatus ALONE — 3 sort tasks no matter the cluster — and
    // the full-registry 100× sweep measured it 4.61× at 3.33× data
    // (the agg_spearman disease surfacing in the filter tier). This
    // spelling derives percent_rank EXACTLY from ParallelRank's
    // bucketed doubled-rank grid: #strictly-smaller b = (dr − c − 1)/2
    // (exact int64 — dr is the Mann–Whitney doubled rank), then
    // percent_rank = b/(n−1), the IDENTICAL IEEE division Spark's
    // PercentRank evaluates, so the filtered pr values are
    // bit-identical to the window form. Qualifying (status, price)
    // pairs join back to orders UNHINTED (AQE picks broadcast at
    // bench SF, a co-partitioned shuffle join at 100 TB). Both keys
    // gate against ONE oracle text — the ts_ewm_linear /
    // agg_spearman_grid scale-twin precedent.
    OpSpec(
      "filter_top_percent_grid",
      (s, d) => {
        val orders = T.orders(s, d)
        val grid = graft.core.ParallelRank.doubledAvgRankGrid(
          orders.select(col("o_orderstatus"), col("o_totalprice")),
          Seq("o_orderstatus"), "o_totalprice", "dr")
        val totals = grid.groupBy("o_orderstatus").agg(sum("_c").as("n"))
        val qualify = grid
          .join(broadcast(totals), Seq("o_orderstatus"))
          .withColumn("pr", when(col("n") > 1L,
              expr("cast((dr - _c - 1) div 2 as double)") /
                (col("n") - 1L).cast("double"))
            .otherwise(lit(0.0)))
          .filter(col("pr") > 0.9)
          .select(col("o_orderstatus").as("_qs"),
            col("o_totalprice").as("_qp"), col("pr"))
        orders
          .join(qualify,
            col("o_orderstatus") <=> col("_qs") &&
              col("o_totalprice") <=> col("_qp"))
          .select("o_orderkey", "o_orderstatus", "o_totalprice", "pr")
          .orderBy("o_orderkey")
      },
      Some(topPercentOracleSql),
    ),
  )

}
