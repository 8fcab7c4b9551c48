package graft.ops

import graft.core.{Policy => P, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.D / §2.H — the group-comparison & rank-inference panel that
  * completes the classical-statistics tier (pandas users reach scipy
  * for these; a 100 TB corpus can't leave Spark): one-way ANOVA,
  * Kruskal–Wallis, Cohen's d effect sizes, Kendall's τ-b, and the KPSS
  * stationarity test (ADF's complement — ADF's H₀ is a unit root,
  * KPSS's H₀ is stationarity; reading them together is the standard
  * protocol).
  *
  * Determinism (SURVEY §2.0) is the same exact-moments discipline as
  * agg_welch_t / ts_adf_test:
  *  - every sum is an EXACT integer/decimal (value cents, doubled
  *    average ranks, n·y−S demeaning) — order-free under any
  *    partitioning, so partial/final hash aggs and AQE re-plans can't
  *    move a bit;
  *  - the few cross-group floating sums ride the ORDERED-FOLD device
  *    (array_sort(collect_list(struct(key, term))) ≡ DuckDB
  *    list_sum(list(term ORDER BY key)) — identical left-to-right IEEE
  *    sequence over the tiny per-group frame);
  *  - one shared final-formula text per statistic, nullif-guarded so
  *    degenerate inputs (empty corpus, single group, constant series)
  *    yield NULL rather than an ANSI divide-by-zero crash.
  *
  * Scale shapes: every op aggregates the FACT table once into a
  * bounded frame (k event types, ≤49k distinct cents, 31 days) and
  * does all statistics on that frame — the fact table never
  * self-joins, sorts globally, or enters a window.
  */
object StatsTests {
  import org.apache.spark.sql.DataFrame

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast("bigint")

  // column names are spliced into expr() texts below — reject anything
  // that is not a plain identifier BEFORE it reaches a parser
  private def ident(s: String): String = {
    require("[A-Za-z_][A-Za-z0-9_]*".r.matches(s),
      s"not a plain identifier: '$s'")
    s
  }

  /** Ordered fold of `term` over rows keyed by `key` (both engines sum
    * the same ascending-key sequence left to right). */
  private def foldTerm(key: String, term: String): String =
    s"""aggregate(
       |  transform(array_sort(collect_list(struct(${ident(key)}, $term))), x -> x.$term),
       |  0D, (acc, x) -> acc + x)""".stripMargin

  /** One-way ANOVA of a 2-dp `valueCol` across `byCol` groups — the
    * reusable form behind agg_anova_oneway (see the OpSpec below for
    * the determinism story). */
  def anovaOnewayOf(df: DataFrame, byCol: String, valueCol: String): DataFrame = {
    ident(byCol) // spliced into the fold text — validate before any parse
    val xi = cents(col(valueCol))
    df.groupBy(byCol)
      .agg(
        count(lit(1)).as("nj"),
        sum(xi).as("sj"),
        sum((xi.cast("decimal(38,0)") * xi.cast("decimal(38,0)"))).as("s2j"))
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
        "round((t1 - cast(s as double) * cast(s as double) / nullif(cast(n as double), 0D)) / 10000.0, 4) AS ss_between",
        "round((cast(s2 as double) - t1) / 10000.0, 4) AS ss_within",
        """round(((t1 - cast(s as double) * cast(s as double) / nullif(cast(n as double), 0D))
          |        / nullif(cast(k as double) - 1.0, 0D))
          |      / nullif((cast(s2 as double) - t1)
          |        / nullif(cast(n as double) - cast(k as double), 0D), 0D), 4) AS f_stat""".stripMargin)
  }

  /** Kruskal–Wallis H of a 2-dp `valueCol` across `byCol` groups — the
    * reusable form behind agg_kruskal_wallis. */
  def kruskalWallisOf(df: DataFrame, byCol: String, valueCol: String): DataFrame = {
    ident(byCol) // spliced into the fold text — validate before any parse
    val xi = cents(col(valueCol))
    val cell = df.groupBy(xi.as("v"), col(byCol)).agg(count(lit(1)).as("cnt"))
    val grid = cell.groupBy("v").agg(sum(col("cnt")).as("t"))
    val byV = Window.orderBy("v") // distinct-cents grid: bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = grid.select(col("v"), col("t"),
      (sum(col("t")).over(byV) * 2 - col("t") + 1).as("dr"))
    val rj = cell.join(ranked.select("v", "dr"), "v")
      .groupBy(byCol)
      .agg(sum(col("cnt")).as("nj"), sum(col("cnt") * col("dr")).as("r2j"))
      .withColumn("hterm",
        (col("r2j").cast("double") / 2.0) * (col("r2j").cast("double") / 2.0) /
          col("nj").cast("double"))
    val ties = grid.agg(
      coalesce(sum(expr("t * t * t - t")), lit(0L)).as("tie_sum"),
      coalesce(sum(col("t")), lit(0L)).as("n"))
    rj.agg(
        count(lit(1)).as("k"),
        expr(foldTerm(byCol, "hterm")).as("tt"))
      .crossJoin(broadcast(ties))
      .selectExpr("cast(k as bigint) AS k_groups", "cast(n as bigint) AS n_rows",
        """round(12.0 / nullif(cast(n as double) * (cast(n as double) + 1.0), 0D) * tt
          |  - 3.0 * (cast(n as double) + 1.0), 4) AS h_stat""".stripMargin,
        """round((12.0 / nullif(cast(n as double) * (cast(n as double) + 1.0), 0D) * tt
          |  - 3.0 * (cast(n as double) + 1.0))
          |  / nullif(1.0 - cast(tie_sum as double)
          |    / nullif(cast(n as double) * cast(n as double) * cast(n as double) - cast(n as double), 0D), 0D), 4) AS h_adj""".stripMargin)
  }

  /** Pairwise Cohen's d of a 2-dp `valueCol` across `byCol` groups —
    * the reusable form behind agg_cohens_d. */
  def cohensDOf(df: DataFrame, byCol: String, valueCol: String): DataFrame = {
    val xi = cents(col(valueCol))
    val g = df.groupBy(byCol)
      .agg(
        count(lit(1)).as("nj"),
        sum(xi).as("sj"),
        sum((xi.cast("decimal(38,0)") * xi.cast("decimal(38,0)"))).as("s2j"))
    val a = g.select(col(byCol).as("type_a"), col("nj").as("na"),
      col("sj").as("sa"), col("s2j").as("s2a"))
    val b = g.select(col(byCol).as("type_b"), col("nj").as("nb"),
      col("sj").as("sb"), col("s2j").as("s2b"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .selectExpr("type_a", "type_b",
        "cast(na as bigint) AS n_a", "cast(nb as bigint) AS n_b",
        """round((cast(sa as double) / cast(na as double)
          |        - cast(sb as double) / cast(nb as double))
          |      / nullif(sqrt((cast(s2a as double) - cast(sa as double) * cast(sa as double) / cast(na as double)
          |          + cast(s2b as double) - cast(sb as double) * cast(sb as double) / cast(nb as double))
          |        / nullif(cast(na as double) + cast(nb as double) - 2.0, 0D)), 0D), 4) AS cohens_d""".stripMargin)
      .orderBy("type_a", "type_b")
  }

  /** Kendall's τ-b between integer-valued columns `xCol`/`yCol` of an
    * aligned series frame keyed by `idCol` — the reusable form behind
    * agg_kendall_tau. The frame pair-explodes (C(n,2)): feed it
    * BOUNDED aggregates (daily series, panels), never a fact table. */
  def kendallTauOf(df: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame = {
    val a = df.select(col(idCol).as("ia"), col(xCol).as("xa"), col(yCol).as("ya"))
    val b = df.select(col(idCol).as("ib"), col(xCol).as("xb"), col(yCol).as("yb"))
    val pairs = a.join(broadcast(b), col("ia") < col("ib"))
      .agg(
        coalesce(sum(when(signum(col("xb") - col("xa")) * signum(col("yb") - col("ya")) === 1.0, 1L)
          .otherwise(0L)), lit(0L)).as("concordant"),
        coalesce(sum(when(signum(col("xb") - col("xa")) * signum(col("yb") - col("ya")) === -1.0, 1L)
          .otherwise(0L)), lit(0L)).as("discordant"),
        coalesce(sum(when(col("xa") === col("xb"), 1L).otherwise(0L)), lit(0L)).as("n1"),
        coalesce(sum(when(col("ya") === col("yb"), 1L).otherwise(0L)), lit(0L)).as("n2"),
        count(lit(1)).as("n0"))
    df.agg(count(lit(1)).as("n_days")).crossJoin(broadcast(pairs))
      .selectExpr("cast(n_days as bigint) AS n_days", "n0 AS n_pairs",
        "concordant", "discordant",
        """round(cast(concordant - discordant as double)
          |  / nullif(sqrt(cast(n0 - n1 as double) * cast(n0 - n2 as double)), 0D), 4) AS tau_b""".stripMargin)
  }

  /** KPSS level-stationarity η (Bartlett L=4) over an integer-valued
    * series `valueCol` ordered by `orderCol` — the reusable form
    * behind ts_kpss. Feed it a BOUNDED pre-aggregated series. */
  def kpssOf(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val daily = df.select(col(orderCol).as("i"), col(valueCol).as("yc"))
    val tot = daily.agg(count(lit(1)).as("n"), coalesce(sum(col("yc")), lit(0L)).as("sy"))
    val w = Window.orderBy("i")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = daily.crossJoin(broadcast(tot))
      .select(col("i"), col("n"), (col("n") * col("yc") - col("sy")).as("et"))
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val frame = e.select(col("n"), col("et"),
      sum(col("et")).over(cum).as("st"),
      lag(col("et"), 1).over(w).as("e1"),
      lag(col("et"), 2).over(w).as("e2"),
      lag(col("et"), 3).over(w).as("e3"),
      lag(col("et"), 4).over(w).as("e4"))
    frame.agg(
        max(col("n")).as("n"),
        sum(d38(col("st")) * d38(col("st"))).as("ss2"),
        sum(d38(col("et")) * d38(col("et"))).as("se2"),
        sum(d38(col("et")) * d38(col("e1"))).as("g1"),
        sum(d38(col("et")) * d38(col("e2"))).as("g2"),
        sum(d38(col("et")) * d38(col("e3"))).as("g3"),
        sum(d38(col("et")) * d38(col("e4"))).as("g4"))
      .selectExpr("cast(coalesce(n, 0) as bigint) AS n_days",
        """round(cast(ss2 as double)
          |  / nullif(cast(n as double) * (cast(se2 as double)
          |    + 2.0 * (0.8 * cast(g1 as double) + 0.6 * cast(g2 as double)
          |             + 0.4 * cast(g3 as double) + 0.2 * cast(g4 as double))), 0D), 4) AS kpss_eta""".stripMargin)
  }

  val ops: Seq[OpSpec] = Seq(
    // ONE-WAY ANOVA (Fisher): F = (SSB/(k−1)) / (SSW/(N−k)) over the
    // event_type groups. SSB/SSW decompose into Σⱼ sⱼ²/nⱼ (the one
    // floating cross-group sum → ordered fold) and exact totals:
    // SSW = Σx² − Σⱼ sⱼ²/nⱼ, SSB = Σⱼ sⱼ²/nⱼ − S²/N, all moments
    // integer cents (Σx² as decimal(38,0) — exact, order-free; the
    // 100² cents factor cancels in F; the reported sums of squares are
    // rescaled to value² units by /10⁴). Plan: one partial+final hash
    // agg over the fact table, then a k-row fold — nothing else.
    OpSpec(
      "agg_anova_oneway",
      (s, d) => anovaOnewayOf(T.events(s, d), "event_type", "value"),
      Some("""WITH g AS (
             |  SELECT event_type, count(*) AS nj,
             |    cast(sum(x) as bigint) AS sj,
             |    sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0))) AS s2j
             |  FROM (SELECT event_type,
             |          cast(cast(value as decimal(18,2)) * 100 as bigint) AS x
             |        FROM events)
             |  GROUP BY event_type),
             |f AS (
             |  SELECT count(*) AS k, sum(nj) AS n, sum(sj) AS s, sum(s2j) AS s2,
             |    coalesce(list_sum(list(cast(sj as double) * cast(sj as double) / cast(nj as double)
             |      ORDER BY event_type)), 0.0) AS t1
             |  FROM g)
             |SELECT cast(k as bigint) AS k_groups,
             |  cast(coalesce(n, 0) as bigint) AS n_rows,
             |  round((t1 - cast(s as double) * cast(s as double) / nullif(cast(n as double), 0.0)) / 10000.0, 4) AS ss_between,
             |  round((cast(s2 as double) - t1) / 10000.0, 4) AS ss_within,
             |  round(((t1 - cast(s as double) * cast(s as double) / nullif(cast(n as double), 0.0))
             |          / nullif(cast(k as double) - 1.0, 0.0))
             |        / nullif((cast(s2 as double) - t1)
             |          / nullif(cast(n as double) - cast(k as double), 0.0), 0.0), 4) AS f_stat
             |FROM f""".stripMargin),
    ),
    // KRUSKAL–WALLIS H (the rank-based ANOVA; Mann–Whitney's k-group
    // generalization): H = 12/(N(N+1))·Σⱼ Rⱼ²/nⱼ − 3(N+1), tie-corrected
    // H' = H / (1 − Σ(t³−t)/(N³−N)). Ranks never touch the fact table:
    // the DISTINCT-CENTS grid (agg_ks_test's documented bounded frame,
    // ≤ ~49k rows at any corpus size) carries the DOUBLED average rank
    // 2·r̄(v) = 2·cum(v) − t(v) + 1 as an exact integer (the agg_spearman
    // device), and per-group rank sums are exact Σ cnt·2r̄ — the only
    // floating cross-group sum (Σ Rⱼ²/nⱼ) rides the ordered fold.
    OpSpec(
      "agg_kruskal_wallis",
      (s, d) => kruskalWallisOf(T.events(s, d), "event_type", "value"),
      Some("""WITH cell AS (
             |  SELECT cast(cast(value as decimal(18,2)) * 100 as bigint) AS v,
             |    event_type, count(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |grid AS (SELECT v, sum(cnt) AS t FROM cell GROUP BY v),
             |ranked AS (
             |  SELECT v,
             |    sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 2
             |      - t + 1 AS dr
             |  FROM grid),
             |rj AS (
             |  SELECT event_type, sum(cnt) AS nj,
             |    cast(sum(cnt * dr) as bigint) AS r2j
             |  FROM cell JOIN ranked USING (v) GROUP BY event_type),
             |ti AS (
             |  SELECT cast(coalesce(sum(t * t * t - t), 0) as bigint) AS tie_sum,
             |    cast(coalesce(sum(t), 0) as bigint) AS n
             |  FROM grid),
             |f AS (
             |  SELECT count(*) AS k,
             |    coalesce(list_sum(list((cast(r2j as double) / 2.0) * (cast(r2j as double) / 2.0) / cast(nj as double)
             |      ORDER BY event_type)), 0.0) AS tt
             |  FROM rj)
             |SELECT cast(k as bigint) AS k_groups, cast(n as bigint) AS n_rows,
             |  round(12.0 / nullif(cast(n as double) * (cast(n as double) + 1.0), 0.0) * tt
             |    - 3.0 * (cast(n as double) + 1.0), 4) AS h_stat,
             |  round((12.0 / nullif(cast(n as double) * (cast(n as double) + 1.0), 0.0) * tt
             |    - 3.0 * (cast(n as double) + 1.0))
             |    / nullif(1.0 - cast(tie_sum as double)
             |      / nullif(cast(n as double) * cast(n as double) * cast(n as double) - cast(n as double), 0.0), 0.0), 4) AS h_adj
             |FROM f CROSS JOIN ti""".stripMargin),
    ),
    // COHEN'S d for every event-type pair — the EFFECT SIZE read next
    // to agg_welch_t / agg_anova_oneway (significance says "different",
    // d says "by how much, in pooled-sd units"). d is scale-invariant,
    // so the whole computation stays in exact integer-cent moments;
    // (nⱼ−1)·varⱼ = s2ⱼ − sⱼ²/nⱼ needs no per-group variance division.
    // Plan: ONE hash agg over the fact table → k-row frame → broadcast
    // self-join on type_a < type_b (k(k−1)/2 rows) — pairwise stats
    // without the fact table ever joining itself.
    OpSpec(
      "agg_cohens_d",
      (s, d) => cohensDOf(T.events(s, d), "event_type", "value"),
      Some("""WITH g AS (
             |  SELECT event_type, count(*) AS nj,
             |    cast(sum(x) as bigint) AS sj,
             |    sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0))) AS s2j
             |  FROM (SELECT event_type,
             |          cast(cast(value as decimal(18,2)) * 100 as bigint) AS x
             |        FROM events)
             |  GROUP BY event_type)
             |SELECT a.event_type AS type_a, b.event_type AS type_b,
             |  cast(a.nj as bigint) AS n_a, cast(b.nj as bigint) AS n_b,
             |  round((cast(a.sj as double) / cast(a.nj as double)
             |          - cast(b.sj as double) / cast(b.nj as double))
             |        / nullif(sqrt((cast(a.s2j as double) - cast(a.sj as double) * cast(a.sj as double) / cast(a.nj as double)
             |            + cast(b.s2j as double) - cast(b.sj as double) * cast(b.sj as double) / cast(b.nj as double))
             |          / nullif(cast(a.nj as double) + cast(b.nj as double) - 2.0, 0.0)), 0.0), 4) AS cohens_d
             |FROM g a JOIN g b ON a.event_type < b.event_type
             |ORDER BY type_a, type_b""".stripMargin),
    ),
    // KENDALL'S τ-b between the daily 'view' and 'click' value-mass
    // series — the rank correlation that (unlike agg_spearman's rank
    // moments) counts pairwise CONCORDANCE, with the tie correction:
    // τ-b = (C − D)/√((n₀−n₁)(n₀−n₂)). The pair explode runs over the
    // TIME-BOUNDED daily aggregate (ts_theil_sen's device: 31 days →
    // 465 pairs; the fact table never self-joins), every count is an
    // exact integer over exact cent masses, and only the final τ
    // division floats, in one shared text.
    OpSpec(
      "agg_kendall_tau",
      (s, d) => kendallTauOf(
        T.events(s, d)
          .filter(col("event_type").isin("view", "click"))
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
          .agg(
            sum(when(col("event_type") === "view", cents(col("value")))
              .otherwise(0L)).as("xc"),
            sum(when(col("event_type") === "click", cents(col("value")))
              .otherwise(0L)).as("yc")),
        "i", "xc", "yc"),
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i,
             |    cast(sum(CASE WHEN event_type = 'view'
             |      THEN cast(cast(value as decimal(18,2)) * 100 as bigint) ELSE 0 END) as bigint) AS xc,
             |    cast(sum(CASE WHEN event_type = 'click'
             |      THEN cast(cast(value as decimal(18,2)) * 100 as bigint) ELSE 0 END) as bigint) AS yc
             |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1),
             |p AS (
             |  SELECT
             |    cast(coalesce(sum(CASE WHEN sign(b.xc - a.xc) * sign(b.yc - a.yc) = 1 THEN 1 ELSE 0 END), 0) as bigint) AS concordant,
             |    cast(coalesce(sum(CASE WHEN sign(b.xc - a.xc) * sign(b.yc - a.yc) = -1 THEN 1 ELSE 0 END), 0) as bigint) AS discordant,
             |    cast(coalesce(sum(CASE WHEN a.xc = b.xc THEN 1 ELSE 0 END), 0) as bigint) AS n1,
             |    cast(coalesce(sum(CASE WHEN a.yc = b.yc THEN 1 ELSE 0 END), 0) as bigint) AS n2,
             |    count(*) AS n0
             |  FROM daily a JOIN daily b ON a.i < b.i),
             |nr AS (SELECT count(*) AS n_days FROM daily)
             |SELECT cast(n_days as bigint) AS n_days, n0 AS n_pairs,
             |  concordant, discordant,
             |  round(cast(concordant - discordant as double)
             |    / nullif(sqrt(cast(n0 - n1 as double) * cast(n0 - n2 as double)), 0.0), 4) AS tau_b
             |FROM nr CROSS JOIN p""".stripMargin),
    ),
    // KPSS stationarity test (Kwiatkowski et al. 1992, level form,
    // Bartlett lag L = 4) — ADF's standard companion: ADF's null is a
    // unit root, KPSS's null is stationarity; agreeing tests settle the
    // question. EXACT-DEMEANING device: over the daily cents series,
    // ẽₜ = n·yₜ − Σy is an exact integer (n·eₜ), so partial sums S̃ₜ,
    // Σẽ², and the Bartlett autocovariances Σẽₜẽₜ₋ₗ are ALL exact
    // (decimal(38,0) products — ẽ² can exceed int64), and the n-powers
    // cancel into one final division: η = ΣS̃ₜ² / (n·(Σẽ² + 2Σwₗγ̃ₗ)),
    // wₗ = 1 − l/5 exact literals. Only that division floats.
    OpSpec(
      "ts_kpss",
      (s, d) => kpssOf(
        T.events(s, d)
          .groupBy(dayofmonth(col("ts")).cast("bigint").as("i"))
          .agg(sum(cents(col("value"))).as("yc")),
        "i", "yc"),
      Some("""WITH daily AS (
             |  SELECT cast(extract(day FROM ts) as bigint) AS i,
             |    cast(sum(cast(cast(value as decimal(18,2)) * 100 as bigint)) as bigint) AS yc
             |  FROM events GROUP BY 1),
             |tot AS (SELECT count(*) AS n, cast(coalesce(sum(yc), 0) as bigint) AS sy FROM daily),
             |e AS (
             |  SELECT i, n, n * yc - sy AS et
             |  FROM daily CROSS JOIN tot),
             |fr AS (
             |  SELECT n, et,
             |    cast(sum(et) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS st,
             |    lag(et, 1) OVER (ORDER BY i) AS e1,
             |    lag(et, 2) OVER (ORDER BY i) AS e2,
             |    lag(et, 3) OVER (ORDER BY i) AS e3,
             |    lag(et, 4) OVER (ORDER BY i) AS e4
             |  FROM e),
             |a AS (
             |  SELECT max(n) AS n,
             |    sum(cast(st as decimal(38,0)) * cast(st as decimal(38,0))) AS ss2,
             |    sum(cast(et as decimal(38,0)) * cast(et as decimal(38,0))) AS se2,
             |    sum(cast(et as decimal(38,0)) * cast(e1 as decimal(38,0))) AS g1,
             |    sum(cast(et as decimal(38,0)) * cast(e2 as decimal(38,0))) AS g2,
             |    sum(cast(et as decimal(38,0)) * cast(e3 as decimal(38,0))) AS g3,
             |    sum(cast(et as decimal(38,0)) * cast(e4 as decimal(38,0))) AS g4
             |  FROM fr)
             |SELECT cast(coalesce(n, 0) as bigint) AS n_days,
             |  round(cast(ss2 as double)
             |    / nullif(cast(n as double) * (cast(se2 as double)
             |      + 2.0 * (0.8 * cast(g1 as double) + 0.6 * cast(g2 as double)
             |               + 0.4 * cast(g3 as double) + 0.2 * cast(g4 as double))), 0.0), 4) AS kpss_eta
             |FROM a""".stripMargin),
    ),
  )
}
