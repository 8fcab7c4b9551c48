package graft.ts

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Backward as-of join (pandas `merge_asof` semantics: backward search,
  * exact matches allowed, left-join behavior — unmatched probe rows kept
  * with NULL payload; tolerance miss → NULL, not dropped).
  *
  * Spark has no ASOF JOIN, so this is the union-and-window idiom
  * (SURVEY §2.C): tag build rows 0 and probe rows 1, union them, and for
  * each probe row take `last(payload, ignoreNulls)` over an ordered
  * window `(by) ORDER BY (ts, tag) ROWS UNBOUNDED PRECEDING..CURRENT`.
  * Build-before-probe at equal ts implements allow_exact_matches=True.
  *
  * Scale: ONE shuffle + sort on (by, ts) — no range explosion, no
  * correlated subquery, skew-bounded by the `by` key cardinality. This
  * is the 100 TB-safe shape: both inputs stream through a single
  * sort-merge pass regardless of how many build rows precede a probe.
  * With `by = Nil` the window is a single partition — correct but
  * serial; at scale, prefer a keyed variant or pre-range-partitioning.
  */
object AsofJoin {

  /** @param probe    left side; all its columns survive
    * @param build    right side; must contain `on`, `by`, and `payload`
    *                 columns, with `payload` names disjoint from probe's
    * @param on       ordering (timestamp) column name, present in both
    * @param by       equality key columns (present in both), may be empty
    * @param payload  build columns to carry onto matched probe rows
    * @param toleranceMicros max allowed probe.on − build.on; misses get
    *                 NULL payload (pandas tolerance semantics)
    * @return probe columns ++ `matched_ts` (build's `on`) ++ payload
    */
  def backward(
      probe: DataFrame,
      build: DataFrame,
      on: String,
      by: Seq[String],
      payload: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val probeCols = probe.columns.toSeq
    val buildSlim = build
      .select((by :+ on).map(col) ++ payload.map(col): _*)
      .withColumn("_matched_ts", col(on))

    val tagged = probe.withColumn("_tag", lit(1))
      .unionByName(buildSlim.withColumn("_tag", lit(0)), allowMissingColumns = true)

    val w = Window
      .partitionBy(by.map(col): _*)
      .orderBy(col(on).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (("_matched_ts" +: payload)).foldLeft(tagged) { (df, c) =>
      df.withColumn(s"_c_$c", last(col(c), ignoreNulls = true).over(w))
    }

    val matched = carried.filter(col("_tag") === 1)
    val withTol = toleranceMicros match {
      case None => matched
      case Some(tol) =>
        val ok = unix_micros(col(on)) - unix_micros(col("_c__matched_ts")) <= tol
        ("_matched_ts" +: payload).foldLeft(matched) { (df, c) =>
          df.withColumn(s"_c_$c", when(ok, col(s"_c_$c")))
        }
    }

    val out: Seq[Column] =
      probeCols.map(col) ++
        (col("_c__matched_ts").as("matched_ts") +:
          payload.map(c => col(s"_c_$c").as(c)))
    withTol.select(out: _*)
  }
}
