package graft.ops

import graft.core.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** §2.D / §2.H — round-13 batch 6: the inference panel COMPLETED.
  * StatsTests brought ANOVA / Kruskal–Wallis / Cohen's d / Kendall /
  * KPSS; this file adds the variance-homogeneity pair every ANOVA
  * protocol runs FIRST (Bartlett, Brown–Forsythe/Levene), the
  * repeated-measures rank test (Friedman), the regression-residual
  * autocorrelation statistic (Durbin–Watson), lag-1 Granger
  * causality, transcendental-free period detection (phase-binned
  * ANOVA), and the two-proportion z-test.
  *
  * Determinism is the StatsTests discipline, unchanged:
  *  - exact integer/decimal moments (value cents, doubled medians,
  *    doubled ranks, D·n·e-scaled residuals) — order-free under any
  *    partitioning;
  *  - floating cross-group sums ride the ORDERED FOLD (Spark
  *    `aggregate(transform(array_sort(collect_list(struct(k, t)))))`
  *    ≡ DuckDB `list_sum(list(t ORDER BY k))` — identical
  *    left-to-right IEEE sequences; Bartlett's nullable ln-terms use
  *    the entropy device `list_reduce(list_prepend(0.0, …))` so a
  *    NULL term poisons the fold identically in both engines);
  *  - ONE shared final-formula text per statistic, nullif-guarded —
  *    degenerate inputs (empty corpus, 1-row corpus, constant or
  *    single-member groups) yield NULL, never an ANSI
  *    divide-by-zero.
  *
  * Scale shapes: every op is one partial+final hash agg over the
  * fact table into a BOUNDED frame (k event types, ≤49k distinct
  * cents, 31 days, 744 hours, 9 candidate periods) and all test
  * statistics run on that frame. The fact table never self-joins,
  * never sorts globally, and never enters a window — at 100 TB the
  * moments shuffle, the rows don't.
  */
object Inference {
  private def cents(c: Column) = (c.cast("decimal(18,2)") * 100).cast("bigint")
  private def d38(c: Column) = c.cast("decimal(38,0)")

  // column names are spliced into expr() texts below — reject anything
  // that is not a plain identifier BEFORE it reaches a parser
  private def ident(s: String): String = {
    require("[A-Za-z_][A-Za-z0-9_]*".r.matches(s),
      s"not a plain identifier: '$s'")
    s
  }

  /** Ordered fold of `term` over rows keyed by `key` (both engines sum
    * the same ascending-key sequence left to right). Null-propagating:
    * a NULL term poisons the whole fold, matching the oracle's
    * list_reduce(list_prepend(0.0, …)) device. */
  private def foldTerm(key: String, term: String): String =
    s"""aggregate(
       |  transform(array_sort(collect_list(struct(${ident(key)}, $term))), x -> x.$term),
       |  0D, (acc, x) -> acc + x)""".stripMargin

  /** 3×3 determinant as ONE formula text parsed by BOTH engines —
    * row-major a b c / d e f / g h i (the agg_ols det3 device). */
  private def det3(a: String, b: String, c: String, d: String, e: String,
                   f: String, g: String, h: String, i: String): String =
    s"($a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) + $c * ($d * $h - $e * $g))"

  /** The daily value-mass series in exact cents: i = day-of-month,
    * yc = Σ cents(value) — the KPSS/theil_sen bounded frame. */
  private def dailyCents(df: DataFrame): DataFrame =
    df.groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
      .agg(sum(cents(col("value"))).as("yc"))

  /** One-way ANOVA F over an ALREADY-EXACT integer column `zCol`
    * (half-cents, ranks, …) across `byCol` groups — the reusable
    * core shared by agg_levene_bf (and mirroring anovaOnewayOf's
    * formula text, minus the /10⁴ cents rescale). */
  private def anovaOnInt(df: DataFrame, byCol: String, zCol: String,
                         statAlias: String): DataFrame = {
    ident(byCol); ident(statAlias)
    val zi = col(zCol)
    df.groupBy(byCol)
      .agg(
        count(lit(1)).as("nj"),
        sum(zi).as("sj"),
        sum(d38(zi) * d38(zi)).as("s2j"))
      .withColumn("t1term",
        col("sj").cast("double") * col("sj").cast("double") /
          col("nj").cast("double"))
      .agg(
        count(lit(1)).as("k"),
        sum(col("nj")).as("n"),
        sum(col("sj")).as("s"),
        sum(col("s2j")).as("s2"),
        expr(foldTerm(byCol, "t1term")).as("t1"))
      .selectExpr(
        "cast(k as bigint) AS k_groups",
        "cast(coalesce(n, 0) as bigint) AS n_rows",
        s"""round(((t1 - cast(s as double) * cast(s as double) / nullif(cast(n as double), 0D))
           |        / nullif(cast(k as double) - 1.0, 0D))
           |      / nullif((cast(s2 as double) - t1)
           |        / nullif(cast(n as double) - cast(k as double), 0D), 0D), 4) AS $statAlias""".stripMargin)
  }

  /** Bartlett's variance-homogeneity B of a 2-dp `valueCol` across
    * `byCol` groups — the reusable form behind agg_bartlett_test. */
  def bartlettOf(df: DataFrame, byCol: String, valueCol: String): DataFrame = {
    ident(byCol) // spliced into the fold texts — validate before any parse
    val xi = cents(col(valueCol))
    df.groupBy(byCol)
      .agg(
        count(lit(1)).as("nj"),
        sum(xi).as("sj"),
        sum(d38(xi) * d38(xi)).as("s2j"))
      .filter(col("nj") >= 2)
      .withColumn("t1term",
        expr("cast(sj as double) * cast(sj as double) / cast(nj as double)"))
      .withColumn("lterm",
        expr("""(cast(nj as double) - 1.0)
               |  * ln(nullif((cast(s2j as double)
               |      - cast(sj as double) * cast(sj as double) / cast(nj as double))
               |    / (cast(nj as double) - 1.0), 0D))""".stripMargin))
      .withColumn("iterm", expr("1.0 / (cast(nj as double) - 1.0)"))
      .agg(
        count(lit(1)).as("k"),
        sum(col("nj")).as("n"),
        sum(col("s2j")).as("s2"),
        expr(foldTerm(byCol, "t1term")).as("t1"),
        expr(foldTerm(byCol, "lterm")).as("ls"),
        expr(foldTerm(byCol, "iterm")).as("si"))
      .selectExpr(
        "cast(k as bigint) AS k_groups",
        "cast(coalesce(n, 0) as bigint) AS n_rows",
        """round(((cast(n as double) - cast(k as double))
          |    * ln(nullif((cast(s2 as double) - t1)
          |        / nullif(cast(n as double) - cast(k as double), 0D), 0D))
          |  - ls)
          |  / nullif(1.0 + (si - 1.0 / nullif(cast(n as double) - cast(k as double), 0D))
          |      / nullif(3.0 * (cast(k as double) - 1.0), 0D), 0D), 4) AS bartlett_b""".stripMargin)
  }

  /** Brown–Forsythe (median-centered Levene) W of a 2-dp `valueCol`
    * across `byCol` groups — the reusable form behind agg_levene_bf.
    * The group median is the EXACT doubled-median over the per-group
    * distinct-cents grid; W is the one-way ANOVA F over
    * zᵢⱼ = |2xᵢⱼ − 2medⱼ|. */
  def leveneBfOf(df: DataFrame, byCol: String, valueCol: String): DataFrame = {
    val xi = cents(col(valueCol))
    val cell = df.groupBy(col(byCol), xi.as("v")).agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy(byCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cell
      .withColumn("cu", sum(col("cnt")).over(byType))
      .withColumn("nj", sum(col("cnt")).over(Window.partitionBy(byCol)))
    val med = cum.groupBy(byCol).agg(
      (min(when(col("cu") >= expr("cast(floor((nj + 1) / 2) as bigint)"), col("v"))) +
        min(when(col("cu") >= expr("cast(floor(nj / 2) + 1 as bigint)"), col("v"))))
        .as("dmed"))
    val z = df.select(col(byCol), xi.as("x"))
      .join(broadcast(med), byCol)
      .select(col(byCol), abs(lit(2L) * col("x") - col("dmed")).as("z"))
    anovaOnInt(z, byCol, "z", "w_stat")
  }

  /** Friedman Q over a CELL frame (one row per block × treatment with
    * an exact integer response) — the reusable form behind
    * agg_friedman_test. Only blocks carrying ALL treatments rank. */
  def friedmanOf(cell0: DataFrame, blockCol: String, treatCol: String,
                 respCol: String): DataFrame = {
    val cell = cell0.select(col(blockCol).as("i"), col(treatCol).as("trt"),
      col(respCol).as("m"))
    val ktot = cell.agg(countDistinct(col("trt")).as("ktot"))
    val fullDays = cell.groupBy("i").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(ktot)).filter(col("c") === col("ktot")).select("i")
    val cc = cell.join(broadcast(fullDays), "i")
    val grid = cc.groupBy("i", "m").agg(count(lit(1)).as("t"))
    val byBlock = Window.partitionBy("i").orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rk = grid.select(col("i"), col("m"),
      (sum(col("t")).over(byBlock) * 2 - col("t") + 1).as("dr"))
    cc.join(rk, Seq("i", "m"))
      .groupBy("trt")
      .agg(sum(col("dr")).as("drj"), count(lit(1)).as("nd"))
      .agg(
        count(lit(1)).as("k"),
        min(col("nd")).as("n"),
        sum(d38(col("drj")) * d38(col("drj"))).as("sd2"))
      .selectExpr(
        "cast(k as bigint) AS k_treatments",
        "cast(coalesce(n, 0) as bigint) AS n_blocks",
        """round(3.0 * cast(sd2 as double)
          |    / nullif(cast(n as double) * cast(k as double) * (cast(k as double) + 1.0), 0D)
          |  - 3.0 * cast(n as double) * (cast(k as double) + 1.0), 4) AS friedman_q""".stripMargin)
  }

  /** Durbin–Watson of the `valueCol` ~ `orderCol` trend residuals over
    * a BOUNDED exact-integer series — the reusable form behind
    * ts_dw_stat. slope_per_day is reported in value units (cents/100)
    * per `orderCol` step. */
  def dwStatOf(series: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val daily = series.select(col(orderCol).as("i"), col(valueCol).as("yc"))
    val m = daily.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("i")), lit(0L)).as("st"),
      coalesce(sum(col("i") * col("i")), lit(0L)).as("stt"),
      coalesce(sum(col("yc")), lit(0L)).as("sy"),
      coalesce(sum(col("i") * col("yc")), lit(0L)).as("sty"))
    val et = daily.crossJoin(broadcast(m))
      .select(col("i"),
        (d38(col("n") * col("stt") - col("st") * col("st")) * d38(col("n")) * d38(col("yc"))
          - d38(col("n")) * d38(col("n") * col("sty") - col("st") * col("sy")) * d38(col("i"))
          - d38(col("n") * col("stt") - col("st") * col("st")) * d38(col("sy"))
          + d38(col("n") * col("sty") - col("st") * col("sy")) * d38(col("st"))).as("e"),
        (col("n") * col("stt") - col("st") * col("st")).as("dd"),
        (col("n") * col("sty") - col("st") * col("sy")).as("nb"))
    val w = Window.orderBy("i") // bounded pre-aggregated series
    et.select(col("e"), lag(col("e"), 1).over(w).as("e1"),
        col("dd"), col("nb"))
      .agg(
        count(lit(1)).as("n"),
        sum(d38(col("e") - col("e1")) * d38(col("e") - col("e1"))).as("sdd"),
        sum(d38(col("e")) * d38(col("e"))).as("se2"),
        max(col("dd")).as("dd"),
        max(col("nb")).as("nb"))
      .selectExpr(
        "cast(n as bigint) AS n_days",
        """round(cast(nb as double) / nullif(cast(dd as double), 0D) / 100.0, 4)
          | AS slope_per_day""".stripMargin,
        "round(cast(sdd as double) / nullif(cast(se2 as double), 0D), 4) AS dw_stat")
  }

  /** Lag-1 Granger F of `xCol` → `yCol` over a BOUNDED exact-integer
    * aligned series keyed by `orderCol` — the reusable form behind
    * ts_granger_f. */
  def grangerFOf(series: DataFrame, orderCol: String, yCol: String,
                 xCol: String): DataFrame = {
    val w = Window.orderBy(orderCol) // bounded pre-aggregated series
    val lg = series.select(
        col(yCol).as("y"),
        lag(col(yCol), 1).over(w).as("y1"),
        lag(col(xCol), 1).over(w).as("x1"))
      .filter(col("y1").isNotNull && col("x1").isNotNull)
    val mo = lg.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("y1")).cast("double").as("s1"),
      sum(col("x1")).cast("double").as("s2"),
      sum(d38(col("y1")) * d38(col("y1"))).cast("double").as("s11"),
      sum(d38(col("y1")) * d38(col("x1"))).cast("double").as("s12"),
      sum(d38(col("x1")) * d38(col("x1"))).cast("double").as("s22"),
      sum(col("y")).cast("double").as("sy"),
      sum(d38(col("y")) * d38(col("y"))).cast("double").as("syy"),
      sum(d38(col("y1")) * d38(col("y"))).cast("double").as("s1y"),
      sum(d38(col("x1")) * d38(col("y"))).cast("double").as("s2y"))
    mo.selectExpr(
        "n", "sy", "syy", "s1y", "s2y", "s1", "s11",
        s"${det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")} AS det",
        s"${det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")} AS det0",
        s"${det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")} AS det1",
        s"${det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")} AS det2")
      .selectExpr("n", "syy", "sy", "s1y", "s2y", "s1", "s11",
        "syy - (det0 * sy + det1 * s1y + det2 * s2y) / nullif(det, 0D) AS ssru")
      .selectExpr(
        "cast(n as bigint) AS n_obs",
        """round(syy - ((sy * s11 - s1 * s1y) * sy + (n * s1y - s1 * sy) * s1y)
          |  / nullif(n * s11 - s1 * s1, 0D), 4) AS ssr_restricted""".stripMargin,
        "round(ssru, 4) AS ssr_unrestricted",
        """round(((syy - ((sy * s11 - s1 * s1y) * sy + (n * s1y - s1 * sy) * s1y)
          |    / nullif(n * s11 - s1 * s1, 0D)) - ssru)
          |  * (n - 3.0) / nullif(ssru, 0D), 4) AS granger_f""".stripMargin)
  }

  /** Phase-binned ANOVA F per candidate period over a BOUNDED
    * exact-integer series keyed by non-negative `hCol` — the reusable
    * form behind ts_period_detect. */
  def periodDetectOf(series: DataFrame, hCol: String, valueCol: String,
                     periods: Seq[Long]): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2), "periods must be >= 2")
    series
      .select(col(hCol).as("h"), col(valueCol).as("yc"),
        explode(array(periods.map(lit): _*)).as("p"))
      .groupBy(col("p"), (col("h") % col("p")).as("ph"))
      .agg(
        count(lit(1)).as("nj"),
        sum(col("yc")).as("sj"),
        sum(d38(col("yc")) * d38(col("yc"))).as("s2j"))
      .withColumn("t1term",
        expr("cast(sj as double) * cast(sj as double) / cast(nj as double)"))
      .groupBy("p")
      .agg(
        count(lit(1)).as("k"),
        sum(col("nj")).as("n"),
        sum(col("sj")).as("s"),
        sum(col("s2j")).as("s2"),
        expr(foldTerm("ph", "t1term")).as("t1"))
      .selectExpr(
        "cast(p as bigint) AS period",
        "cast(k as bigint) AS k_phases",
        "cast(n as bigint) AS n_hours",
        """round(((t1 - cast(s as double) * cast(s as double) / nullif(cast(n as double), 0D))
          |        / nullif(cast(k as double) - 1.0, 0D))
          |      / nullif((cast(s2 as double) - t1)
          |        / nullif(cast(n as double) - cast(k as double), 0D), 0D), 4) AS f_stat""".stripMargin)
      .orderBy("period")
  }

  /** Generalized ESD (iterative Grubbs, k rounds) over a BOUNDED
    * exact-integer series — the reusable form behind ts_esd_outliers.
    * Each round's moment update is an exact subtraction (the removed
    * row's n/Σ/Σ² leave integer moments), so no float drift crosses
    * rounds; only each round's G division floats, in the SAME
    * expression text the oracle uses.
    *
    * Shape (round-14 rewrite): the series is bounded by contract, so
    * the whole loop is ONE plan — pack the series into an i-sorted
    * struct list (one agg), then run every round as row-local HOF
    * folds over the list (moments, argmax-G with ties → smallest i,
    * filter-out) on the single packed row. The r13 spelling unrolled
    * k stages of agg + crossJoin + sort-limit + anti-join whose plans
    * NESTED (round 3 re-contained rounds 1–2), and measured 8.2 s at
    * sf0.1 under load for 30 rows; this is one job, no DiskMemo
    * needed. Argmax ties and the all-null-G regime (zero variance /
    * n ≤ 1: G's denominator is row-independent, so G is null for ALL
    * surviving rows or none) reproduce the old ORDER BY g DESC
    * NULLS LAST, i: the fold keeps the first (= smallest-i) element
    * unless a strictly greater non-null G appears. */
  def esdOutliersOf(series: DataFrame, orderCol: String, valueCol: String,
                    k: Int): DataFrame = {
    require(k >= 1 && k <= 10, s"k rounds must be in [1, 10], got $k")
    def gOf(st: String, p: String): String =
      s"""abs(cast($p.yc as double) - cast($st.sv as double) / nullif(cast($st.n as double), 0D))
         |  / nullif(sqrt((cast($st.s2 as double)
         |      - cast($st.sv as double) * cast($st.sv as double) / nullif(cast($st.n as double), 0D))
         |    / nullif(cast($st.n as double) - 1.0, 0D)), 0D)""".stripMargin
    // exact integer moments of the surviving rows (s2 decimal(38,0)
    // like the old agg — yc² can pass int64 at large SF)
    val stText =
      """aggregate(acc.rem,
        |  named_struct('n', 0L, 'sv', 0L, 's2', cast(0 as decimal(38,0))),
        |  (a, p) -> named_struct('n', a.n + 1L, 'sv', a.sv + p.yc,
        |    's2', cast(a.s2 + cast(p.yc as decimal(19,0)) * cast(p.yc as decimal(19,0))
        |               as decimal(38,0))))""".stripMargin
    val bestText =
      s"""aggregate(acc.rem,
         |  cast(null as struct<g: double, i: bigint, yc: bigint>),
         |  (b, p) -> if(b.i is null
         |               or (${gOf("st", "p")} is not null
         |                   and ${gOf("st", "p")} > b.g),
         |    named_struct('g', ${gOf("st", "p")}, 'i', p.i, 'yc', p.yc), b))"""
        .stripMargin
    // ONE fold over the k rounds: the accumulator carries (rem, out)
    // as VALUES, so round r+1 re-reads round r's result instead of
    // re-containing its plan (and instead of a withColumn chain whose
    // CollapseProject re-substitution compounds the expression tree
    // round over round — measured seconds of driver-side analysis).
    // Intermediates bind through the transform(array(x), v -> body)
    // LET-device — without it the moment aggregate's text would embed
    // once per reference (~60 copies) and both the analyzer pass and
    // the interpreted evaluation go superlinear (measured: 22 s for a
    // 30-row series). The 'out' seed is slice(array(<proto>), 1, 0):
    // a correctly-TYPED empty array (bare array() is array<void>).
    val foldText =
      s"""(aggregate(sequence(1, $k),
         |  named_struct('rem', _rem0,
         |    'out', slice(array(named_struct('iteration', 0, 'day', 0L,
         |      'day_value', cast(0.0 as double), 'g_stat', cast(0.0 as double),
         |      'n_remaining', 0L)), 1, 0)),
         |  (acc, it) -> element_at(transform(array($stText), st ->
         |    element_at(transform(array($bestText), best -> named_struct(
         |      'rem', filter(acc.rem, p -> p.i != best.i),
         |      'out', if(st.n > 0 and best.i is not null,
         |        array_append(acc.out, named_struct(
         |          'iteration', cast(it as int),
         |          'day', best.i,
         |          'day_value', round(cast(best.yc as double) / 100.0, 4),
         |          'g_stat', round(best.g, 4),
         |          'n_remaining', st.n)),
         |        acc.out))), 1)), 1))).out""".stripMargin
    // NULL values are excluded BEFORE packing: the exact fold computes
    // 'a.sv + p.yc', so one NULL yc would poison every round's moments
    // (the pre-pack sum()-based spelling skipped NULLs — keep that).
    series.filter(col(valueCol).isNotNull)
      .agg(sort_array(collect_list(struct(
        col(orderCol).cast("bigint").as("i"),
        col(valueCol).cast("bigint").as("yc")))).as("_rem0"))
      .select(explode(expr(foldText)).as("_r"))
      .select(col("_r.iteration").as("iteration"), col("_r.day").as("day"),
        col("_r.day_value").as("day_value"), col("_r.g_stat").as("g_stat"),
        col("_r.n_remaining").as("n_remaining"))
      .orderBy("iteration")
  }

  /** Per-panel-cell proportion z vs the rest + Benjamini–Hochberg FDR
    * over the panel — the reusable form behind agg_prop_ztest_bh.
    * `panelCol` keys the (BOUNDED) panel; `successCol` is the boolean
    * success mark. BH runs on the rounded 4-dp p's with (p, key) tie
    * order by declared semantics. */
  def propZTestBhOf(df: DataFrame, panelCol: Column, successCol: Column,
                    alphaFdr: Double = 0.1): DataFrame = {
    val daily = df
      .groupBy(panelCol.as("i"))
      .agg(
        count(lit(1)).as("nd"),
        coalesce(sum(when(successCol, 1L).otherwise(0L)), lit(0L)).as("xd"))
    val tot = daily.agg(
      coalesce(sum(col("nd")), lit(0L)).as("n"),
      coalesce(sum(col("xd")), lit(0L)).as("x"))
    val z = daily.crossJoin(broadcast(tot))
      .selectExpr("i", "nd", "xd",
        """(cast(xd as double) / nullif(cast(nd as double), 0D)
          |  - cast(x - xd as double) / nullif(cast(n - nd as double), 0D))
          |/ nullif(sqrt(cast(x as double) / nullif(cast(n as double), 0D)
          |    * (1.0 - cast(x as double) / nullif(cast(n as double), 0D))
          |    * (1.0 / nullif(cast(nd as double), 0D)
          |       + 1.0 / nullif(cast(n - nd as double), 0D))), 0D) AS z""".stripMargin)
      .withColumn("t", expr("1.0 / (1.0 + 0.2316419 * abs(z))"))
      .withColumn("p4", expr(
        """round(2.0 * 0.3989422804014327 * exp(-(abs(z) * abs(z)) / 2.0)
          |  * (((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
          |      - 0.356563782) * t + 0.319381530) * t), 4)""".stripMargin))
    // NULLS LAST explicitly on both engines: Spark defaults ASC NULLS
    // FIRST where DuckDB defaults NULLS LAST, so a degenerate panel
    // (NULL z/p4: zero or all successes, or a single-day panel) would
    // rank differently (ADVICE r13 item 2). `i` is a groupBy key,
    // never NULL.
    val byP = Window.orderBy(asc_nulls_last("p4"), col("i")) // bounded panel
    val tail = Window.orderBy(asc_nulls_last("p4"), col("i"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    z.withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .withColumn("rnk", row_number().over(byP))
      .withColumn("cand",
        expr("p4 * cast(m as double) / cast(rnk as double)"))
      .select(col("i").as("day"), col("nd").as("n_day"), col("xd").as("x_day"),
        expr("round(z, 4)").as("z_stat"), col("p4").as("p_value"),
        // min(1, ·): BH adjusted p is a probability — the largest raw
        // p's cand = p·m/rank can exceed 1 (scipy/statsmodels clip
        // too; ADVICE r13 item 1)
        round(least(lit(1.0), min(col("cand")).over(tail)), 4).as("p_bh"))
      .withColumn("significant", expr(s"p_bh <= ${alphaFdr}"))
      .orderBy("day")
  }

  /** One-sample t of a 2-dp `valueCol` per `byCol` group against
    * μ₀ = `mu0Cents`/100 — the reusable form behind agg_ttest_1samp. */
  def ttest1SampOf(df: DataFrame, byCol: String, valueCol: String,
                   mu0Cents: Long): DataFrame = {
    val xi = cents(col(valueCol))
    val mu = s"${mu0Cents.toDouble}"
    df.groupBy(byCol)
      .agg(
        count(lit(1)).as("nj"),
        sum(xi).as("sj"),
        sum(d38(xi) * d38(xi)).as("s2j"))
      .selectExpr(byCol, "cast(nj as bigint) AS n_rows",
        "round(cast(sj as double) / nullif(cast(nj as double), 0D) / 100.0, 4) AS mean_value",
        s"""round((cast(sj as double) / nullif(cast(nj as double), 0D) - $mu)
           |  / nullif(sqrt((cast(s2j as double)
           |      - cast(sj as double) * cast(sj as double) / nullif(cast(nj as double), 0D))
           |    / nullif(cast(nj as double) - 1.0, 0D)
           |    / nullif(cast(nj as double), 0D)), 0D), 4) AS t_stat""".stripMargin)
      .orderBy(byCol)
  }

  /** Paired t over a frame of EXACT-INTEGER cent diffs (`dCol`) — the
    * reusable form behind agg_ttest_paired. */
  def ttestPairedOf(diffs: DataFrame, dCol: String): DataFrame =
    diffs.select(col(dCol).as("dd"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(col("dd")), lit(0L)).as("sd"),
        coalesce(sum(d38(col("dd")) * d38(col("dd"))), lit(0L).cast("decimal(38,0)")).as("s2d"))
      .selectExpr("cast(n as bigint) AS n_pairs",
        "round(cast(sd as double) / nullif(cast(n as double), 0D) / 100.0, 4) AS mean_diff",
        """round(cast(sd as double) / nullif(cast(n as double), 0D)
          |  / nullif(sqrt((cast(s2d as double)
          |      - cast(sd as double) * cast(sd as double) / nullif(cast(n as double), 0D))
          |    / nullif(cast(n as double) - 1.0, 0D)
          |    / nullif(cast(n as double), 0D)), 0D), 4) AS t_stat""".stripMargin)

  /** McNemar's paired before/after over a heavy-use mark: per
    * `blockCol`, X₁ = "≥ `minCount` rows matching `cond1`", X₂
    * likewise for `cond2` — the reusable form behind agg_mcnemar. */
  def mcnemarOf(df: DataFrame, blockCol: String, cond1: Column,
                cond2: Column, minCount: Long): DataFrame = {
    val perBlock = df
      .groupBy(blockCol)
      .agg(
        when(sum(when(cond1, 1L).otherwise(0L)) >= minCount, 1L)
          .otherwise(0L).as("x1"),
        when(sum(when(cond2, 1L).otherwise(0L)) >= minCount, 1L)
          .otherwise(0L).as("x2"))
    perBlock.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("x1") === 1L && col("x2") === 1L, 1L).otherwise(0L)), lit(0L)).as("a"),
        coalesce(sum(when(col("x1") === 1L && col("x2") === 0L, 1L).otherwise(0L)), lit(0L)).as("b"),
        coalesce(sum(when(col("x1") === 0L && col("x2") === 1L, 1L).otherwise(0L)), lit(0L)).as("c"),
        coalesce(sum(when(col("x1") === 0L && col("x2") === 0L, 1L).otherwise(0L)), lit(0L)).as("dd"))
      .selectExpr(
        "cast(n as bigint) AS n_users",
        "a AS both_halves", "b AS first_only", "c AS second_only", "dd AS neither",
        """round(cast((b - c) * (b - c) as double)
          |  / nullif(cast(b + c as double), 0D), 4) AS mcnemar_chi2""".stripMargin,
        """round((abs(cast(b - c as double)) - 1.0) * (abs(cast(b - c as double)) - 1.0)
          |  / nullif(cast(b + c as double), 0D), 4) AS mcnemar_chi2_cc""".stripMargin)
  }

  /** Cochran's Q over the heavy-use incidence matrix: blocks =
    * `blockCol`, treatments = `treatCol`, mark = "block carries ≥
    * `minCount` rows of the treatment" — the reusable form behind
    * agg_cochran_q. k counts EVERY distinct treatment in `df` (a
    * treatment nobody marks still widens the design). */
  def cochranQOf(df: DataFrame, blockCol: String, treatCol: String,
                 minCount: Long): DataFrame = {
    val inc = df.groupBy(blockCol, treatCol)
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= minCount)
      .select(blockCol, treatCol)
    val kct = df.agg(countDistinct(col(treatCol)).as("k"))
      .crossJoin(broadcast(inc.agg(count(lit(1)).as("n"))))
    val cj = inc.groupBy(treatCol).agg(count(lit(1)).as("c"))
      .agg(sum(d38(col("c")) * d38(col("c"))).as("sc2"))
    val ri = inc.groupBy(blockCol).agg(count(lit(1)).as("r"))
      .agg(sum(d38(col("r")) * d38(col("r"))).as("sr2"),
        count(lit(1)).as("n_blocks"))
    kct.crossJoin(broadcast(cj)).crossJoin(broadcast(ri))
      .selectExpr(
        "cast(k as bigint) AS k_treatments",
        "cast(n_blocks as bigint) AS n_blocks",
        "cast(n as bigint) AS n_marks",
        """round((cast(k as double) - 1.0)
          |    * (cast(k as double) * cast(sc2 as double) - cast(n as double) * cast(n as double))
          |  / nullif(cast(k as double) * cast(n as double) - cast(sr2 as double), 0D), 4) AS cochran_q""".stripMargin)
  }

  /** Wilcoxon signed-rank over a frame of EXACT-INTEGER paired diffs
    * (`dCol`; zero diffs dropped per the classic procedure) — the
    * reusable form behind agg_wilcoxon_signed. */
  def wilcoxonSignedOf(diffs: DataFrame, dCol: String): DataFrame = {
    val dz = diffs.select(col(dCol).as("dd"))
      .filter(col("dd") =!= 0L)
      .select(abs(col("dd")).as("ad"), signum(col("dd")).cast("bigint").as("sg"))
    val grid = dz.groupBy("ad").agg(count(lit(1)).as("t"))
    val byA = Window.orderBy("ad") // distinct-|d| grid: bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = grid.select(col("ad"), col("t"),
      (sum(col("t")).over(byA) * 2 - col("t") + 1).as("dr"))
    val ties = grid.agg(
      coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L)).as("tie_sum"))
    dz.join(broadcast(ranked.select("ad", "dr")), "ad")
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("sg") === 1L, col("dr")).otherwise(0L)), lit(0L)).as("wp2"),
        coalesce(sum(when(col("sg") === -1L, col("dr")).otherwise(0L)), lit(0L)).as("wm2"))
      .crossJoin(broadcast(ties))
      .selectExpr(
        "cast(n as bigint) AS n_pairs",
        "cast(wp2 as double) / 2.0 AS w_plus",
        "cast(wm2 as double) / 2.0 AS w_minus",
        """round((cast(wp2 as double) / 2.0
          |    - cast(n as double) * (cast(n as double) + 1.0) / 4.0)
          |  / nullif(sqrt(cast(n as double) * (cast(n as double) + 1.0)
          |      * (2.0 * cast(n as double) + 1.0) / 24.0
          |    - cast(tie_sum as double) / 48.0), 0D), 4) AS z_stat""".stripMargin)
  }

  /** Kalman local-level filter per `keyCol` series (q = process var,
    * r = observation var, p0 = diffuse init) — the reusable form behind
    * ts_kalman_level. LINEAR since round 16 (verdict item 4) when
    * key/order are integral (the udaf-family encoder shape): the
    * graft.udaf.Kalman flatMapGroups pass — one shuffle on the key,
    * one ordered O(n) pass per series, partition-parallel across keys;
    * bit-exact vs the old O(n²) prefix fold (identical IEEE op
    * sequence; the fold survives as the oracle's recursive CTE and the
    * EwmSpec cross-check). NON-integral key/order types (string keys,
    * timestamp order — accepted here since round 13) keep the original
    * window prefix-fold spelling, which is type-generic: the round-16
    * review caught that routing everything through the long-encoder
    * udaf silently broke that public contract (df.kalmanLevel).
    * Rows with a NULL key, order, or value are EXCLUDED (both paths —
    * see the null-contract note below; round-17 ADVICE fix).
    * The O(1)-per-arrival streaming twin is
    * streaming.StreamOps.streamingKalmanLevel. */
  def kalmanLevelOf(series: DataFrame, keyCol: String, orderCol: String,
                    valueCol: String, q: Double = 4.0, r: Double = 16.0,
                    p0: Double = 100.0): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    val dt = series.schema.fieldIndex _
    val (kt, ot) = (series.schema(dt(keyCol)).dataType,
      series.schema(dt(orderCol)).dataType)
    // NULL CONTRACT (ADVICE round 16): the fast path's Ewm.Point
    // encoder has primitive Long/Double fields, so a null key/order/
    // value row would throw NullPointerException at encoding — a
    // runtime-failure regression from the fold spelling's accidental
    // null juggling. A Kalman recursion has no null semantics (a null
    // observation is not a measurement; a null key/order is not a
    // series position), so BOTH spellings now exclude such rows
    // explicitly — defined behavior at every type, no NPE. Null-free
    // frames (every declared query) see the identical plan modulo one
    // scan-fused IsNotNull filter.
    val nn = series.filter(
      col(keyCol).isNotNull && col(orderCol).isNotNull && col(valueCol).isNotNull)
    if (integral(kt) && integral(ot))
      graft.udaf.Kalman.kalmanDf(nn, keyCol, orderCol, valueCol, q, r, p0)
        .orderBy(keyCol, orderCol)
    else kalmanLevelFoldOf(nn, keyCol, orderCol, valueCol, q, r, p0)
  }

  /** Type-generic prefix-fold spelling (O(n²) memory per series — fine
    * for the bounded per-key series this API documents; the integral-
    * typed fast path above is the scale form). */
  private def kalmanLevelFoldOf(series: DataFrame, keyCol: String,
                                orderCol: String, valueCol: String,
                                q: Double, r: Double, p0: Double): DataFrame = {
    val cum = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val (qs, rs, ps) = (s"${q}", s"${r}", s"${p0}")
    series
      .withColumn("pl", collect_list(col(valueCol)).over(cum))
      .select(col(keyCol), col(orderCol),
        expr(s"""aggregate(slice(pl, 2, size(pl) - 1),
               |  named_struct('l', element_at(pl, 1), 'p', CAST($ps AS DOUBLE)),
               |  (acc, x) -> named_struct(
               |    'l', acc.l + ((acc.p + $qs) / (acc.p + $qs + $rs)) * (x - acc.l),
               |    'p', (1.0 - (acc.p + $qs) / (acc.p + $qs + $rs)) * (acc.p + $qs)))""".stripMargin)
          .as("st"))
      .select(col(keyCol), col(orderCol), col("st.l").as("level"),
        col("st.p").as("err_var"),
        expr(s"(st.p + $qs) / (st.p + $qs + $rs)").as("gain_next"))
      .orderBy(keyCol, orderCol)
  }

  /** Two-proportion z of success rate where `grpCol` (boolean) is true
    * vs false — the reusable form behind agg_prop_ztest. Output labels
    * follow the declared query (weekend = grp true). */
  def propZTestOf(df: DataFrame, grpCol: Column, successCol: Column): DataFrame =
    df.agg(
        coalesce(sum(when(grpCol, 1L).otherwise(0L)), lit(0L)).as("n1"),
        coalesce(sum(when(grpCol && successCol, 1L).otherwise(0L)), lit(0L)).as("x1"),
        coalesce(sum(when(!grpCol, 1L).otherwise(0L)), lit(0L)).as("n2"),
        coalesce(sum(when(!grpCol && successCol, 1L).otherwise(0L)), lit(0L)).as("x2"))
      .selectExpr(
        "n1 AS n_weekend", "x1 AS x_weekend",
        "n2 AS n_weekday", "x2 AS x_weekday",
        "round(cast(x1 as double) / nullif(cast(n1 as double), 0D), 4) AS p_weekend",
        "round(cast(x2 as double) / nullif(cast(n2 as double), 0D), 4) AS p_weekday",
        """round((cast(x1 as double) / nullif(cast(n1 as double), 0D)
          |    - cast(x2 as double) / nullif(cast(n2 as double), 0D))
          |  / nullif(sqrt(cast(x1 + x2 as double) / nullif(cast(n1 + n2 as double), 0D)
          |      * (1.0 - cast(x1 + x2 as double) / nullif(cast(n1 + n2 as double), 0D))
          |      * (1.0 / nullif(cast(n1 as double), 0D) + 1.0 / nullif(cast(n2 as double), 0D))), 0D), 4) AS z_stat""".stripMargin)

  val ops: Seq[OpSpec] = Seq(
    // BARTLETT'S TEST of variance homogeneity across event_type — the
    // parametric pre-check run before trusting ANOVA's pooled-variance
    // denominator. B = [(N−k)·ln(S²ₚ) − Σ(nⱼ−1)·ln(S²ⱼ)] / C with
    // C = 1 + (Σ1/(nⱼ−1) − 1/(N−k)) / (3(k−1)). Moments are exact
    // integer cents; B is SCALE-INVARIANT (Σ(nⱼ−1) = N−k makes the
    // ln(10⁴) unit terms cancel exactly), so cents need no rescale.
    // The three floating per-group sums (Σ sⱼ²/nⱼ for the pooled SS,
    // the ln-variance sum, the inverse-df sum) all ride the ordered
    // fold; the ln term is nullif-guarded (a constant group has
    // S²ⱼ = 0 → NULL B, not -Inf — and the fold propagates the NULL
    // in BOTH engines via the list_reduce device).
    OpSpec(
      "agg_bartlett_test",
      (s, d) => bartlettOf(T.events(s, d), "event_type", "value"),
      Some("""WITH g AS (
             |  SELECT event_type, count(*) AS nj,
             |    cast(sum(x) as bigint) AS sj,
             |    sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0))) AS s2j
             |  FROM (SELECT event_type,
             |          cast(cast(value as decimal(18,2)) * 100 as bigint) AS x
             |        FROM events)
             |  GROUP BY event_type
             |  HAVING count(*) >= 2),
             |t AS (
             |  SELECT event_type, nj, s2j,
             |    cast(sj as double) * cast(sj as double) / cast(nj as double) AS t1term,
             |    (cast(nj as double) - 1.0)
             |      * ln(nullif((cast(s2j as double)
             |          - cast(sj as double) * cast(sj as double) / cast(nj as double))
             |        / (cast(nj as double) - 1.0), 0.0)) AS lterm,
             |    1.0 / (cast(nj as double) - 1.0) AS iterm
             |  FROM g),
             |f AS (
             |  SELECT count(*) AS k, sum(nj) AS n, sum(s2j) AS s2,
             |    list_reduce(list_prepend(0.0, list(t1term ORDER BY event_type)), (acc, x) -> acc + x) AS t1,
             |    list_reduce(list_prepend(0.0, list(lterm ORDER BY event_type)), (acc, x) -> acc + x) AS ls,
             |    list_reduce(list_prepend(0.0, list(iterm ORDER BY event_type)), (acc, x) -> acc + x) AS si
             |  FROM t)
             |SELECT cast(k as bigint) AS k_groups,
             |  cast(coalesce(n, 0) as bigint) AS n_rows,
             |  round(((cast(n as double) - cast(k as double))
             |      * ln(nullif((cast(s2 as double) - t1)
             |          / nullif(cast(n as double) - cast(k as double), 0.0), 0.0))
             |    - ls)
             |    / nullif(1.0 + (si - 1.0 / nullif(cast(n as double) - cast(k as double), 0.0))
             |        / nullif(3.0 * (cast(k as double) - 1.0), 0.0), 0.0), 4) AS bartlett_b
             |FROM f""".stripMargin),
    ),
    // BROWN–FORSYTHE (median-centered Levene) — the ROBUST
    // variance-homogeneity test (Bartlett assumes normality; B–F is
    // the one scipy.levene defaults toward for heavy tails). The group
    // median rides the EXACT DOUBLED-MEDIAN device: over the per-group
    // distinct-cents grid, 2·median = v[⌈n/2⌉] + v[⌊n/2⌋+1] via
    // cumulative counts — an exact integer, no percentile_cont float.
    // zᵢⱼ = |2xᵢⱼ − 2medⱼ| is then exact half-cents and W is literally
    // the one-way ANOVA F over z (anovaOnInt — same fold, same text).
    // Plan: grid agg + k-row broadcast back onto the fact scan + one
    // hash agg — two fact passes, zero fact shuffles beyond the aggs.
    OpSpec(
      "agg_levene_bf",
      (s, d) => leveneBfOf(T.events(s, d), "event_type", "value"),
      Some("""WITH cell AS (
             |  SELECT event_type,
             |    cast(cast(value as decimal(18,2)) * 100 as bigint) AS v,
             |    count(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |cum AS (
             |  SELECT event_type, v, cnt,
             |    sum(cnt) OVER (PARTITION BY event_type ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu,
             |    sum(cnt) OVER (PARTITION BY event_type) AS nj
             |  FROM cell),
             |med AS (
             |  SELECT event_type,
             |    min(CASE WHEN cu >= cast(floor((nj + 1) / 2) as bigint) THEN v END)
             |      + min(CASE WHEN cu >= cast(floor(nj / 2) + 1 as bigint) THEN v END) AS dmed
             |  FROM cum GROUP BY event_type),
             |z AS (
             |  SELECT e.event_type, abs(2 * e.x - m.dmed) AS z
             |  FROM (SELECT event_type,
             |          cast(cast(value as decimal(18,2)) * 100 as bigint) AS x
             |        FROM events) e
             |  JOIN med m USING (event_type)),
             |g AS (
             |  SELECT event_type, count(*) AS nj, cast(sum(z) as bigint) AS sj,
             |    sum(cast(z as decimal(38,0)) * cast(z as decimal(38,0))) AS s2j
             |  FROM z GROUP BY event_type),
             |f AS (
             |  SELECT count(*) AS k, sum(nj) AS n, sum(sj) AS s, sum(s2j) AS s2,
             |    coalesce(list_sum(list(cast(sj as double) * cast(sj as double) / cast(nj as double)
             |      ORDER BY event_type)), 0.0) AS t1
             |  FROM g)
             |SELECT cast(k as bigint) AS k_groups,
             |  cast(coalesce(n, 0) as bigint) AS n_rows,
             |  round(((t1 - cast(s as double) * cast(s as double) / nullif(cast(n as double), 0.0))
             |          / nullif(cast(k as double) - 1.0, 0.0))
             |        / nullif((cast(s2 as double) - t1)
             |          / nullif(cast(n as double) - cast(k as double), 0.0), 0.0), 4) AS w_stat
             |FROM f""".stripMargin),
    ),
    // FRIEDMAN TEST — the repeated-measures rank test: blocks = days,
    // treatments = event_type, response = daily value mass. Within
    // each COMPLETE day (all k treatments present) the k masses get
    // doubled average ranks (the Kruskal grid device, per-day); with
    // Rⱼ = dRⱼ/2, Q = 12/(nk(k+1))·ΣRⱼ² − 3n(k+1) = 3·ΣdRⱼ²/(nk(k+1))
    // − 3n(k+1) — ΣdRⱼ² is an exact decimal(38,0), so the ONLY float
    // is the final division. The whole computation runs on a ≤
    // 31·k-row frame.
    OpSpec(
      "agg_friedman_test",
      (s, d) => friedmanOf(
        T.events(s, d)
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"), col("event_type"))
          .agg(sum(cents(col("value"))).as("m")),
        "i", "event_type", "m"),
      Some("""WITH cell AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i, event_type,
             |    cast(sum(cast(cast(value as decimal(18,2)) * 100 as bigint)) as bigint) AS m
             |  FROM events GROUP BY 1, 2),
             |kt AS (SELECT count(DISTINCT event_type) AS ktot FROM events),
             |full_days AS (
             |  SELECT i FROM cell GROUP BY i
             |  HAVING count(*) = (SELECT ktot FROM kt)),
             |cc AS (SELECT cell.* FROM cell JOIN full_days USING (i)),
             |grid AS (SELECT i, m, count(*) AS t FROM cc GROUP BY 1, 2),
             |rk AS (
             |  SELECT i, m,
             |    sum(t) OVER (PARTITION BY i ORDER BY m
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 2 - t + 1 AS dr
             |  FROM grid),
             |rj AS (
             |  SELECT event_type, cast(sum(dr) as bigint) AS drj, count(*) AS nd
             |  FROM cc JOIN rk USING (i, m) GROUP BY event_type),
             |f AS (
             |  SELECT count(*) AS k, min(nd) AS n,
             |    sum(cast(drj as decimal(38,0)) * cast(drj as decimal(38,0))) AS sd2
             |  FROM rj)
             |SELECT cast(k as bigint) AS k_treatments,
             |  cast(coalesce(n, 0) as bigint) AS n_blocks,
             |  round(3.0 * cast(sd2 as double)
             |      / nullif(cast(n as double) * cast(k as double) * (cast(k as double) + 1.0), 0.0)
             |    - 3.0 * cast(n as double) * (cast(k as double) + 1.0), 4) AS friedman_q
             |FROM f""".stripMargin),
    ),
    // DURBIN–WATSON over the daily-trend regression — THE residual
    // autocorrelation statistic read after any OLS fit. The residuals
    // ride an EXACT SCALING device: with D = nΣt²−(Σt)² and
    // num_b = nΣty−ΣtΣy (both exact), Eₜ = n·D·eₜ = D·n·yₜ − n·num_b·t
    // − D·Σy + num_b·Σt is an EXACT decimal(38,0) — and DW =
    // Σ(Eₜ−Eₜ₋₁)²/ΣEₜ² because the n·D scale cancels. Every number
    // before the single final division is exact; the 31-row window is
    // the only ordered pass.
    OpSpec(
      "ts_dw_stat",
      (s, d) => dwStatOf(dailyCents(T.events(s, d)), "i", "yc"),
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i,
             |    cast(sum(cast(cast(value as decimal(18,2)) * 100 as bigint)) as bigint) AS yc
             |  FROM events GROUP BY 1),
             |m AS (
             |  SELECT count(*) AS n,
             |    cast(coalesce(sum(i), 0) as bigint) AS st,
             |    cast(coalesce(sum(i * i), 0) as bigint) AS stt,
             |    cast(coalesce(sum(yc), 0) as bigint) AS sy,
             |    cast(coalesce(sum(i * yc), 0) as bigint) AS sty
             |  FROM daily),
             |et AS (
             |  SELECT i,
             |    cast(n * stt - st * st as decimal(38,0)) * cast(n as decimal(38,0)) * cast(yc as decimal(38,0))
             |      - cast(n as decimal(38,0)) * cast(n * sty - st * sy as decimal(38,0)) * cast(i as decimal(38,0))
             |      - cast(n * stt - st * st as decimal(38,0)) * cast(sy as decimal(38,0))
             |      + cast(n * sty - st * sy as decimal(38,0)) * cast(st as decimal(38,0)) AS e,
             |    n * stt - st * st AS dd,
             |    n * sty - st * sy AS nb
             |  FROM daily CROSS JOIN m),
             |l AS (SELECT e, lag(e) OVER (ORDER BY i) AS e1, dd, nb FROM et),
             |a AS (
             |  SELECT count(*) AS n,
             |    sum(cast(e - e1 as decimal(38,0)) * cast(e - e1 as decimal(38,0))) AS sdd,
             |    sum(cast(e as decimal(38,0)) * cast(e as decimal(38,0))) AS se2,
             |    max(dd) AS dd, max(nb) AS nb
             |  FROM l)
             |SELECT cast(n as bigint) AS n_days,
             |  round(cast(nb as double) / nullif(cast(dd as double), 0.0) / 100.0, 4)
             |   AS slope_per_day,
             |  round(cast(sdd as double) / nullif(cast(se2 as double), 0.0), 4) AS dw_stat
             |FROM a""".stripMargin),
    ),
    // GRANGER CAUSALITY (lag 1): does yesterday's CLICK mass improve
    // the prediction of today's VIEW mass beyond yesterday's view
    // mass? Unrestricted y ~ 1 + y₋₁ + x₋₁ by Cramer on the shared
    // det3 text (the agg_ols device — exact decimal(38,0) moments,
    // doubles only in ONE shared formula), restricted y ~ 1 + y₋₁ by
    // the 2-var closed form; F = (SSR_r − SSR_u)·(n−3)/SSR_u. The
    // whole regression runs on the 30-row lagged daily frame.
    OpSpec(
      "ts_granger_f",
      (s, d) => grangerFOf(
        T.events(s, d).filter(col("event_type").isin("view", "click"))
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
          .agg(
            sum(when(col("event_type") === "view", cents(col("value")))
              .otherwise(0L)).as("vc"),
            sum(when(col("event_type") === "click", cents(col("value")))
              .otherwise(0L)).as("cc")),
        "i", "vc", "cc"),
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i,
             |    cast(sum(CASE WHEN event_type = 'view'
             |      THEN cast(cast(value as decimal(18,2)) * 100 as bigint) ELSE 0 END) as bigint) AS vc,
             |    cast(sum(CASE WHEN event_type = 'click'
             |      THEN cast(cast(value as decimal(18,2)) * 100 as bigint) ELSE 0 END) as bigint) AS cc
             |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1),
             |lg AS (
             |  SELECT vc AS y, lag(vc) OVER (ORDER BY i) AS y1,
             |    lag(cc) OVER (ORDER BY i) AS x1
             |  FROM daily),
             |mo AS (
             |  SELECT cast(count(*) as double) AS n,
             |    cast(sum(y1) as double) AS s1, cast(sum(x1) as double) AS s2,
             |    cast(sum(cast(y1 as decimal(38,0)) * cast(y1 as decimal(38,0))) as double) AS s11,
             |    cast(sum(cast(y1 as decimal(38,0)) * cast(x1 as decimal(38,0))) as double) AS s12,
             |    cast(sum(cast(x1 as decimal(38,0)) * cast(x1 as decimal(38,0))) as double) AS s22,
             |    cast(sum(y) as double) AS sy,
             |    cast(sum(cast(y as decimal(38,0)) * cast(y as decimal(38,0))) as double) AS syy,
             |    cast(sum(cast(y1 as decimal(38,0)) * cast(y as decimal(38,0))) as double) AS s1y,
             |    cast(sum(cast(x1 as decimal(38,0)) * cast(y as decimal(38,0))) as double) AS s2y
             |  FROM lg WHERE y1 IS NOT NULL AND x1 IS NOT NULL),
             |dets AS (
             |  SELECT n, syy, sy, s1y, s2y, s1, s11,
             |    (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)) AS det,
             |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)) AS det0,
             |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)) AS det1,
             |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)) AS det2
             |  FROM mo),
             |u AS (
             |  SELECT n, syy, sy, s1y, s2y, s1, s11,
             |    syy - (det0 * sy + det1 * s1y + det2 * s2y) / nullif(det, 0.0) AS ssru
             |  FROM dets)
             |SELECT cast(n as bigint) AS n_obs,
             |  round(syy - ((sy * s11 - s1 * s1y) * sy + (n * s1y - s1 * sy) * s1y)
             |    / nullif(n * s11 - s1 * s1, 0.0), 4) AS ssr_restricted,
             |  round(ssru, 4) AS ssr_unrestricted,
             |  round(((syy - ((sy * s11 - s1 * s1y) * sy + (n * s1y - s1 * sy) * s1y)
             |      / nullif(n * s11 - s1 * s1, 0.0)) - ssru)
             |    * (n - 3.0) / nullif(ssru, 0.0), 4) AS granger_f
             |FROM u""".stripMargin),
    ),
    // PERIOD DETECTION without transcendentals: for each candidate
    // period p, bin the hourly value-mass series by PHASE (hour mod p)
    // and score with the one-way ANOVA F — the variance-ratio
    // periodogram. A true cycle at p concentrates between-phase
    // variance, so F peaks at p (and its multiples). Everything is
    // exact cents until each p's final F division (cos/sin never
    // appear — a DFT periodogram would hash-diverge on libm ulps;
    // this is the transcendental-free equivalent a 100 TB gate can
    // actually verify). Frame: 744 hours × 9 candidates.
    OpSpec(
      "ts_period_detect",
      (s, d) => periodDetectOf(
        T.events(s, d)
          .groupBy(((dayofmonth(col("ts")) - 1) * 24 + hour(col("ts")))
            .cast("bigint").as("h"))
          .agg(sum(cents(col("value"))).as("yc")),
        "h", "yc", Seq(2L, 3L, 4L, 6L, 8L, 12L, 24L, 48L, 168L)),
      Some("""WITH hourly AS (
             |  SELECT cast((extract(day FROM ts) - 1) * 24 + extract(hour FROM ts) as bigint) AS h,
             |    cast(sum(cast(cast(value as decimal(18,2)) * 100 as bigint)) as bigint) AS yc
             |  FROM events GROUP BY 1),
             |c AS (
             |  SELECT h, yc, unnest([2, 3, 4, 6, 8, 12, 24, 48, 168]) AS p
             |  FROM hourly),
             |cell AS (
             |  SELECT p, h % p AS ph, count(*) AS nj,
             |    cast(sum(yc) as bigint) AS sj,
             |    sum(cast(yc as decimal(38,0)) * cast(yc as decimal(38,0))) AS s2j
             |  FROM c GROUP BY 1, 2),
             |f AS (
             |  SELECT p, count(*) AS k, sum(nj) AS n, sum(sj) AS s, sum(s2j) AS s2,
             |    coalesce(list_sum(list(cast(sj as double) * cast(sj as double) / cast(nj as double)
             |      ORDER BY ph)), 0.0) AS t1
             |  FROM cell GROUP BY p)
             |SELECT cast(p as bigint) AS period, cast(k as bigint) AS k_phases,
             |  cast(n as bigint) AS n_hours,
             |  round(((t1 - cast(s as double) * cast(s as double) / nullif(cast(n as double), 0.0))
             |          / nullif(cast(k as double) - 1.0, 0.0))
             |        / nullif((cast(s2 as double) - t1)
             |          / nullif(cast(n as double) - cast(k as double), 0.0), 0.0), 4) AS f_stat
             |FROM f ORDER BY period""".stripMargin),
    ),
    // TWO-PROPORTION Z-TEST: click share on weekends vs weekdays —
    // the A/B-test primitive. Four exact counts from ONE hash agg over
    // the fact table; the pooled-variance z is the only float, in one
    // shared text. (Spark weekday(): Monday = 0, weekend = {5,6};
    // DuckDB isodow: Monday = 1, weekend = {6,7} — same partition.)
    OpSpec(
      "agg_prop_ztest",
      (s, d) => propZTestOf(T.events(s, d),
        weekday(col("ts")) >= 5, col("event_type") === "click"),
      Some("""WITH c AS (
             |  SELECT
             |    cast(coalesce(sum(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END), 0) as bigint) AS n1,
             |    cast(coalesce(sum(CASE WHEN isodow(ts) >= 6 AND event_type = 'click' THEN 1 ELSE 0 END), 0) as bigint) AS x1,
             |    cast(coalesce(sum(CASE WHEN isodow(ts) < 6 THEN 1 ELSE 0 END), 0) as bigint) AS n2,
             |    cast(coalesce(sum(CASE WHEN isodow(ts) < 6 AND event_type = 'click' THEN 1 ELSE 0 END), 0) as bigint) AS x2
             |  FROM events)
             |SELECT n1 AS n_weekend, x1 AS x_weekend,
             |  n2 AS n_weekday, x2 AS x_weekday,
             |  round(cast(x1 as double) / nullif(cast(n1 as double), 0.0), 4) AS p_weekend,
             |  round(cast(x2 as double) / nullif(cast(n2 as double), 0.0), 4) AS p_weekday,
             |  round((cast(x1 as double) / nullif(cast(n1 as double), 0.0)
             |      - cast(x2 as double) / nullif(cast(n2 as double), 0.0))
             |    / nullif(sqrt(cast(x1 + x2 as double) / nullif(cast(n1 + n2 as double), 0.0)
             |        * (1.0 - cast(x1 + x2 as double) / nullif(cast(n1 + n2 as double), 0.0))
             |        * (1.0 / nullif(cast(n1 as double), 0.0) + 1.0 / nullif(cast(n2 as double), 0.0))), 0.0), 4) AS z_stat
             |FROM c""".stripMargin),
    ),
    // KALMAN FILTER, local-level model (state-space inference — the
    // probabilistic twin of ts_ewm whose smoothing weight ADAPTS to
    // accumulated uncertainty): per step, pp = p + q; k = pp/(pp + r);
    // l += k(x − l); p = (1−k)·pp, with q = 4 (process var), r = 16
    // (observation var), p₀ = 100 (diffuse init), l₀ = x₁. LINEAR
    // declared spelling since round 16 (verdict item 4): the
    // graft.udaf.Kalman flatMapGroups pass — one shuffle on the key,
    // one ordered O(n) pass per series — while the oracle runs the
    // IDENTICAL recursion as a recursive CTE, the same IEEE op
    // sequence op-for-op, so level / error variance / next gain go
    // out UNROUNDED and bit-exact. (The old O(n²) prefix-fold device
    // survives only as the oracle spelling.)
    OpSpec(
      "ts_kalman_level",
      (s, d) => kalmanLevelOf(
        T.events(s, d).filter(col("user_id") === 7)
          .select(col("user_id"), col("event_id"), col("value")),
        "user_id", "event_id", "value"),
      Some("""WITH RECURSIVE s AS (
             |  SELECT user_id, cast(row_number() OVER (ORDER BY event_id) as bigint) AS i,
             |    event_id, value AS x
             |  FROM events WHERE user_id = 7),
             |rec AS (
             |  -- CAST: a bare 100.0 would type p DECIMAL for the whole
             |  -- recursion and truncate every variance
             |  SELECT user_id, i, event_id, x, x AS l, CAST(100.0 AS DOUBLE) AS p
             |  FROM s WHERE i = 1
             |  UNION ALL
             |  SELECT s.user_id, s.i, s.event_id, s.x,
             |    rec.l + ((rec.p + 4.0) / (rec.p + 4.0 + 16.0)) * (s.x - rec.l) AS l,
             |    (1.0 - (rec.p + 4.0) / (rec.p + 4.0 + 16.0)) * (rec.p + 4.0) AS p
             |  FROM rec JOIN s ON s.i = rec.i + 1)
             |SELECT user_id, event_id, l AS level, p AS err_var,
             |  (p + 4.0) / (p + 4.0 + 16.0) AS gain_next
             |FROM rec ORDER BY user_id, event_id""".stripMargin),
    ),
    // COCHRAN'S Q — the k-treatment BINARY repeated-measures test
    // (Friedman's 0/1 sibling; McNemar's k-group generalization):
    // blocks = users, treatments = event types, Xᵢⱼ = 1 iff user i
    // fired type j HEAVILY (≥ 15 events — the mean is ~13.4/type at
    // every sf, so the mark genuinely varies; plain "ever fired" is
    // all-ones on this corpus and Q degenerates to 0/0).
    // Q = (k−1)(k·ΣCⱼ² − N²)/(k·N − ΣRᵢ²) — EVERY term an exact
    // integer (decimal(38,0) squares), the final division the only
    // float. All-0 and all-k blocks are ALGEBRAICALLY neutral (they
    // cancel in the numerator shifts and add k·R − R² = 0 to the
    // denominator), so no block filter is needed. Plan: two hash
    // aggs over the fact table — it never joins or windows. k is
    // the FULL treatment count (a type nobody marks still widens
    // the design), read from the fact table.
    OpSpec(
      "agg_cochran_q",
      (s, d) => cochranQOf(T.events(s, d), "user_id", "event_type", 15L),
      Some("""WITH inc AS (
             |  SELECT user_id, event_type FROM events
             |  GROUP BY user_id, event_type HAVING count(*) >= 15),
             |kct AS (
             |  SELECT (SELECT count(DISTINCT event_type) FROM events) AS k,
             |    count(*) AS n
             |  FROM inc),
             |cj AS (
             |  SELECT sum(cast(c as decimal(38,0)) * cast(c as decimal(38,0))) AS sc2
             |  FROM (SELECT event_type, count(*) AS c FROM inc GROUP BY event_type)),
             |ri AS (
             |  SELECT sum(cast(r as decimal(38,0)) * cast(r as decimal(38,0))) AS sr2,
             |    count(*) AS n_blocks
             |  FROM (SELECT user_id, count(*) AS r FROM inc GROUP BY user_id))
             |SELECT cast(k as bigint) AS k_treatments,
             |  cast(n_blocks as bigint) AS n_blocks,
             |  cast(n as bigint) AS n_marks,
             |  round((cast(k as double) - 1.0)
             |      * (cast(k as double) * cast(sc2 as double) - cast(n as double) * cast(n as double))
             |    / nullif(cast(k as double) * cast(n as double) - cast(sr2 as double), 0.0), 4) AS cochran_q
             |FROM kct CROSS JOIN cj CROSS JOIN ri""".stripMargin),
    ),
    // WILCOXON SIGNED-RANK — the PAIRED two-sample test completing the
    // rank family (Mann–Whitney is the unpaired member): pairs =
    // (view mass, click mass) per day, dᵢ = vᵢ − cᵢ exact cents, zero
    // diffs dropped per the classic procedure, |d| ranked with average
    // ties via the DOUBLED-RANK grid (exact integers), W± = Σdr/2 over
    // each sign. The normal approximation z uses the tie-corrected
    // variance n(n+1)(2n+1)/24 − Σ(t³−t)/48 — every moment exact until
    // the one final division.
    OpSpec(
      "agg_wilcoxon_signed",
      (s, d) => wilcoxonSignedOf(
        T.events(s, d)
          .filter(col("event_type").isin("view", "click"))
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
          .agg(
            sum(when(col("event_type") === "view", cents(col("value")))
              .otherwise(0L)).as("vc"),
            sum(when(col("event_type") === "click", cents(col("value")))
              .otherwise(0L)).as("cc"))
          .select((col("vc") - col("cc")).as("dd")),
        "dd"),
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i,
             |    cast(sum(CASE WHEN event_type = 'view'
             |      THEN cast(cast(value as decimal(18,2)) * 100 as bigint) ELSE 0 END) as bigint)
             |    - cast(sum(CASE WHEN event_type = 'click'
             |      THEN cast(cast(value as decimal(18,2)) * 100 as bigint) ELSE 0 END) as bigint) AS dd
             |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1),
             |dz AS (SELECT abs(dd) AS ad, cast(sign(dd) as bigint) AS sg
             |       FROM daily WHERE dd <> 0),
             |grid AS (SELECT ad, count(*) AS t FROM dz GROUP BY ad),
             |ranked AS (
             |  SELECT ad,
             |    sum(t) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 2
             |      - t + 1 AS dr
             |  FROM grid),
             |ti AS (SELECT cast(coalesce(sum(t * t * t - t), 0) as bigint) AS tie_sum FROM grid),
             |a AS (
             |  SELECT count(*) AS n,
             |    cast(coalesce(sum(CASE WHEN sg = 1 THEN dr ELSE 0 END), 0) as bigint) AS wp2,
             |    cast(coalesce(sum(CASE WHEN sg = -1 THEN dr ELSE 0 END), 0) as bigint) AS wm2
             |  FROM dz JOIN ranked USING (ad))
             |SELECT cast(n as bigint) AS n_pairs,
             |  cast(wp2 as double) / 2.0 AS w_plus,
             |  cast(wm2 as double) / 2.0 AS w_minus,
             |  round((cast(wp2 as double) / 2.0
             |      - cast(n as double) * (cast(n as double) + 1.0) / 4.0)
             |    / nullif(sqrt(cast(n as double) * (cast(n as double) + 1.0)
             |        * (2.0 * cast(n as double) + 1.0) / 24.0
             |      - cast(tie_sum as double) / 48.0), 0.0), 4) AS z_stat
             |FROM a CROSS JOIN ti""".stripMargin),
    ),
    // MULTIPLE TESTING with FDR control — the statistic→p-value→
    // correction pipeline completed: per DAY, a two-proportion z of
    // that day's click share vs the rest of the month, p-values via
    // the Abramowitz–Stegun 26.2.17 normal-tail polynomial (max error
    // 7.5e-8; ONE shared Horner text — exp/sqrt on bit-identical
    // inputs, the ln-in-shared-text precedent), then BENJAMINI–
    // HOCHBERG adjustment over the 30-day panel: p̃ᵢ = min_{j≥i}
    // p₍ⱼ₎·n/j as a reverse running-min window, ties ordered (p, day)
    // so the sort is total. BH runs on the ROUNDED 4-dp p's by
    // declared semantics — an ulp wobble in exp can never reorder the
    // panel. Counts exact; the windows run on the 30-row frame only.
    OpSpec(
      "agg_prop_ztest_bh",
      (s, d) => propZTestBhOf(T.events(s, d),
        dayofmonth(col("ts")).cast("bigint"),
        col("event_type") === "click"),
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i, count(*) AS nd,
             |    cast(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 0) as bigint) AS xd
             |  FROM events GROUP BY 1),
             |tot AS (SELECT cast(coalesce(sum(nd), 0) as bigint) AS n,
             |        cast(coalesce(sum(xd), 0) as bigint) AS x FROM daily),
             |zt AS (
             |  SELECT i, nd, xd,
             |    (cast(xd as double) / nullif(cast(nd as double), 0.0)
             |      - cast(x - xd as double) / nullif(cast(n - nd as double), 0.0))
             |    / nullif(sqrt(cast(x as double) / nullif(cast(n as double), 0.0)
             |        * (1.0 - cast(x as double) / nullif(cast(n as double), 0.0))
             |        * (1.0 / nullif(cast(nd as double), 0.0)
             |           + 1.0 / nullif(cast(n - nd as double), 0.0))), 0.0) AS z
             |  FROM daily CROSS JOIN tot),
             |pt AS (
             |  SELECT i, nd, xd, z, t,
             |    round(2.0 * 0.3989422804014327 * exp(-(abs(z) * abs(z)) / 2.0)
             |      * (((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
             |          - 0.356563782) * t + 0.319381530) * t), 4) AS p4
             |  FROM (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zt)),
             |bh AS (
             |  SELECT i, nd, xd, z, p4,
             |    count(*) OVER () AS m,
             |    row_number() OVER (ORDER BY p4 ASC NULLS LAST, i) AS rnk
             |  FROM pt),
             |adj AS (
             |  SELECT i, nd, xd, z, p4,
             |    round(least(1.0, min(p4 * cast(m as double) / cast(rnk as double))
             |      OVER (ORDER BY p4 ASC NULLS LAST, i
             |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 4) AS p_bh
             |  FROM bh)
             |SELECT i AS day, nd AS n_day, xd AS x_day,
             |  round(z, 4) AS z_stat, p4 AS p_value, p_bh,
             |  p_bh <= 0.1 AS significant
             |FROM adj ORDER BY day""".stripMargin),
    ),
    // ONE-SAMPLE t-TEST per group: H₀ μ = 250.00 (the generator's
    // design center). t = (x̄ − μ₀)/(s/√n) from the same exact
    // integer-cent moments as agg_stddev_var — μ₀ enters as exact
    // cents (25000), so the numerator n·Σx − n²μ₀ stays exact and one
    // shared text does the whole float tail. Completes the t family:
    // one-sample here, Welch two-sample (agg_welch_t), paired
    // (agg_ttest_paired below).
    OpSpec(
      "agg_ttest_1samp",
      (s, d) => ttest1SampOf(T.events(s, d), "event_type", "value", 25000L),
      Some("""SELECT event_type, cast(nj as bigint) AS n_rows,
             |  round(cast(sj as double) / nullif(cast(nj as double), 0.0) / 100.0, 4) AS mean_value,
             |  round((cast(sj as double) / nullif(cast(nj as double), 0.0) - 25000.0)
             |    / nullif(sqrt((cast(s2j as double)
             |        - cast(sj as double) * cast(sj as double) / nullif(cast(nj as double), 0.0))
             |      / nullif(cast(nj as double) - 1.0, 0.0)
             |      / nullif(cast(nj as double), 0.0)), 0.0), 4) AS t_stat
             |FROM (
             |  SELECT event_type, count(*) AS nj,
             |    cast(sum(x) as bigint) AS sj,
             |    sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0))) AS s2j
             |  FROM (SELECT event_type,
             |          cast(cast(value as decimal(18,2)) * 100 as bigint) AS x
             |        FROM events)
             |  GROUP BY event_type)
             |ORDER BY event_type""".stripMargin),
    ),
    // PAIRED t-TEST on the daily (view, click) value-mass pairs —
    // the parametric twin of agg_wilcoxon_signed: t = d̄/(s_d/√n)
    // over dᵢ = vᵢ − cᵢ, all moments exact integer cents
    // (decimal(38,0) squares — daily masses square past int64), one
    // shared float tail.
    OpSpec(
      "agg_ttest_paired",
      (s, d) => ttestPairedOf(
        T.events(s, d)
          .filter(col("event_type").isin("view", "click"))
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
          .agg((sum(when(col("event_type") === "view", cents(col("value"))).otherwise(0L))
            - sum(when(col("event_type") === "click", cents(col("value"))).otherwise(0L)))
            .as("dd")),
        "dd"),
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i,
             |    cast(sum(CASE WHEN event_type = 'view'
             |      THEN cast(cast(value as decimal(18,2)) * 100 as bigint) ELSE 0 END) as bigint)
             |    - cast(sum(CASE WHEN event_type = 'click'
             |      THEN cast(cast(value as decimal(18,2)) * 100 as bigint) ELSE 0 END) as bigint) AS dd
             |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1),
             |a AS (
             |  SELECT count(*) AS n, cast(coalesce(sum(dd), 0) as bigint) AS sd,
             |    coalesce(sum(cast(dd as decimal(38,0)) * cast(dd as decimal(38,0))), 0) AS s2d
             |  FROM daily)
             |SELECT cast(n as bigint) AS n_pairs,
             |  round(cast(sd as double) / nullif(cast(n as double), 0.0) / 100.0, 4) AS mean_diff,
             |  round(cast(sd as double) / nullif(cast(n as double), 0.0)
             |    / nullif(sqrt((cast(s2d as double)
             |        - cast(sd as double) * cast(sd as double) / nullif(cast(n as double), 0.0))
             |      / nullif(cast(n as double) - 1.0, 0.0)
             |      / nullif(cast(n as double), 0.0)), 0.0), 4) AS t_stat
             |FROM a""".stripMargin),
    ),
    // GENERALIZED ESD (Rosner 1983; the iterative Grubbs behind the
    // classic production anomaly detectors): k = 3 rounds over the
    // daily cents series — each round scores every SURVIVING day by
    // G = |y − x̄|/s, removes the argmax (ties → smallest day), and
    // RECOMPUTES the moments without it. The moment updates are EXACT
    // SUBTRACTIONS (n, Σy, Σy² all integer cents — no refit, no
    // float drift across rounds); only each round's G division
    // floats, in one shared text. The plan is 3 unrolled stages of
    // windows over the 30-row daily frame (bounded by construction).
    OpSpec(
      "ts_esd_outliers",
      (s, d) => esdOutliersOf(dailyCents(T.events(s, d)), "i", "yc", 3),
      Some {
        val stages = (1 to 3).map { k =>
          val prev = if (k == 1) "d0" else s"d${k - 1}"
          s"""m$k AS (
             |  SELECT count(*) AS n, cast(coalesce(sum(yc), 0) as bigint) AS sv,
             |    coalesce(sum(cast(yc as decimal(38,0)) * cast(yc as decimal(38,0))), 0) AS s2
             |  FROM $prev),
             |g$k AS (
             |  SELECT i, yc,
             |    abs(cast(yc as double) - cast(sv as double) / nullif(cast(n as double), 0.0))
             |      / nullif(sqrt((cast(s2 as double)
             |          - cast(sv as double) * cast(sv as double) / nullif(cast(n as double), 0.0))
             |        / nullif(cast(n as double) - 1.0, 0.0)), 0.0) AS g,
             |    cast(n as bigint) AS n
             |  FROM $prev CROSS JOIN m$k),
             |x$k AS (SELECT * FROM g$k ORDER BY g DESC, i LIMIT 1),
             |d$k AS (SELECT i, yc FROM g$k WHERE i <> (SELECT i FROM x$k))""".stripMargin
        }.mkString(",\n")
        s"""WITH daily AS (
           |  SELECT cast(extract(day FROM ts) as bigint) AS i,
           |    cast(sum(cast(cast(value as decimal(18,2)) * 100 as bigint)) as bigint) AS yc
           |  FROM events GROUP BY 1),
           |d0 AS (SELECT i, yc FROM daily),
           |$stages
           |SELECT * FROM (
           |  SELECT 1 AS iteration, i AS day, round(cast(yc as double) / 100.0, 4) AS day_value,
           |    round(g, 4) AS g_stat, n AS n_remaining FROM x1
           |  UNION ALL
           |  SELECT 2, i, round(cast(yc as double) / 100.0, 4), round(g, 4), n FROM x2
           |  UNION ALL
           |  SELECT 3, i, round(cast(yc as double) / 100.0, 4), round(g, 4), n FROM x3)
           |ORDER BY iteration""".stripMargin
      },
    ),
    // McNEMAR'S TEST — paired binary before/after (Cochran's Q at
    // k = 2, kept as its own op because the 2×2 discordant-cell form
    // is what an A/B analyst actually reads): per user, "clicked
    // HEAVILY (≥ 7 times; the per-half mean is ~6.7, so users
    // genuinely straddle the mark — plain ever-clicked is all-ones
    // here and χ² degenerates 0/0) in the first half of the month"
    // vs the same in the second half; χ² = (b−c)²/(b+c) over the
    // discordant cells, plus the continuity-corrected
    // (|b−c|−1)²/(b+c). Four exact cell counts from one users×2 hash
    // agg; the divisions are the only floats.
    OpSpec(
      "agg_mcnemar",
      (s, d) => mcnemarOf(T.events(s, d), "user_id",
        col("event_type") === "click" && dayofmonth(col("ts")) <= 15,
        col("event_type") === "click" && dayofmonth(col("ts")) > 15,
        7L),
      Some("""WITH pu AS (
             |  SELECT user_id,
             |    CASE WHEN sum(CASE WHEN event_type = 'click' AND extract(day FROM ts) <= 15 THEN 1 ELSE 0 END) >= 7 THEN 1 ELSE 0 END AS x1,
             |    CASE WHEN sum(CASE WHEN event_type = 'click' AND extract(day FROM ts) > 15 THEN 1 ELSE 0 END) >= 7 THEN 1 ELSE 0 END AS x2
             |  FROM events GROUP BY user_id),
             |cells AS (
             |  SELECT count(*) AS n,
             |    cast(coalesce(sum(CASE WHEN x1 = 1 AND x2 = 1 THEN 1 ELSE 0 END), 0) as bigint) AS a,
             |    cast(coalesce(sum(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END), 0) as bigint) AS b,
             |    cast(coalesce(sum(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END), 0) as bigint) AS c,
             |    cast(coalesce(sum(CASE WHEN x1 = 0 AND x2 = 0 THEN 1 ELSE 0 END), 0) as bigint) AS dd
             |  FROM pu)
             |SELECT cast(n as bigint) AS n_users,
             |  a AS both_halves, b AS first_only, c AS second_only, dd AS neither,
             |  round(cast((b - c) * (b - c) as double)
             |    / nullif(cast(b + c as double), 0.0), 4) AS mcnemar_chi2,
             |  round((abs(cast(b - c as double)) - 1.0) * (abs(cast(b - c as double)) - 1.0)
             |    / nullif(cast(b + c as double), 0.0), 4) AS mcnemar_chi2_cc
             |FROM cells""".stripMargin),
    ),
  )
}
