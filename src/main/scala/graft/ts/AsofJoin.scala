package graft.ts

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of joins (pandas `merge_asof` semantics: backward / forward /
  * nearest search, exact matches allowed, left-join behavior — unmatched
  * probe rows kept with NULL payload; tolerance miss → NULL, not
  * dropped).
  *
  * Spark has no ASOF JOIN, so this is the union-and-window idiom
  * (SURVEY §2.C): tag build rows 0 and probe rows 1, union them, and for
  * each probe row take the nearest build row's payload over an ordered
  * window. All matched fields (matched_ts + payload) are carried in ONE
  * struct through a single `last`/`first(ignoreNulls)` so they always
  * come from the SAME build row, even when some payload columns are
  * legitimately NULL (pandas rows are atomic; per-column carries would
  * tear them apart).
  *
  * Scale: ONE shuffle + sort on (by, ts) — no range explosion, no
  * correlated subquery, skew-bounded by the `by` key cardinality. This
  * is the 100 TB-safe shape: both inputs stream through a single
  * sort-merge pass regardless of how many build rows precede a probe.
  * With `by = Nil` the plain window is a single partition — correct but
  * serial; [[backwardGlobal]] is the scale path: range-partition on ts,
  * window per partition in parallel, then fix partition-boundary rows
  * with a tiny (numPartitions-row) broadcast carry pass.
  */
object AsofJoin {

  private val M = "_m" // the struct of (matched_ts, payload...) carried as a unit

  /** build side reduced to (by, on, _m struct). Probe rows get _m = NULL
    * via unionByName(allowMissingColumns), so ignoreNulls skips them. */
  private def slimBuild(
      build: DataFrame, on: String, by: Seq[String], payload: Seq[String]): DataFrame =
    build.select(
      (by :+ on).map(col) :+
        struct(col(on).as("matched_ts") +: payload.map(col): _*).as(M): _*)

  private def tagUnion(
      probe: DataFrame, build: DataFrame, on: String, by: Seq[String],
      payload: Seq[String]): DataFrame =
    probe.withColumn("_tag", lit(1))
      .unionByName(
        slimBuild(build, on, by, payload).withColumn("_tag", lit(0)),
        allowMissingColumns = true)

  /** NULL the carried struct when it violates the tolerance for `dir`. */
  private def applyTolerance(
      carried: Column, on: String, toleranceMicros: Option[Long], dir: String): Column =
    toleranceMicros match {
      case None => carried
      case Some(tol) =>
        val gap = dir match {
          case "backward" => unix_micros(col(on)) - unix_micros(carried("matched_ts"))
          case "forward"  => unix_micros(carried("matched_ts")) - unix_micros(col(on))
          case "nearest"  => abs(unix_micros(carried("matched_ts")) - unix_micros(col(on)))
        }
        when(gap <= tol, carried)
    }

  private def finish(
      df: DataFrame, probeCols: Seq[String], payload: Seq[String],
      carried: Column): DataFrame = {
    val out: Seq[Column] =
      probeCols.map(col) ++
        (carried.getField("matched_ts").as("matched_ts") +:
          payload.map(c => carried.getField(c).as(c)))
    df.filter(col("_tag") === 1).select(out: _*)
  }

  // RANGE frames include PEERS (all rows with equal ts, either tag), so
  // ordering by ts ALONE implements allow_exact_matches in both
  // directions — no tag in the sort key, and backward+forward carries
  // share one ordering, so `nearest` computes both in a single sort /
  // single WindowExec.
  //
  // STRICT (allow_exact_matches=false, pandas merge_asof's parameter):
  // the frame must EXCLUDE equal-ts build rows, so order by the numeric
  // unix_micros(ts) and end the range 1 µs short of the current value
  // ([-∞, ts−1] backward, [ts+1, +∞] forward) — timestamps are µs-
  // granular, so "ts−1 µs" is exactly "strictly before". Same single
  // sort/shuffle shape; only the frame bound changes.

  // Backward: last build row at-or-before (strict: strictly-before).
  private def backwardCarry(on: String, by: Seq[String], allowExact: Boolean): Column = {
    val w = Window.partitionBy(by.map(col): _*)
    val framed =
      if (allowExact)
        w.orderBy(col(on).asc)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      else
        w.orderBy(unix_micros(col(on)))
          .rangeBetween(Window.unboundedPreceding, -1L)
    last(col(M), ignoreNulls = true).over(framed)
  }

  // Forward: first build row at-or-after (strict: strictly-after).
  private def forwardCarry(on: String, by: Seq[String], allowExact: Boolean): Column = {
    val w = Window.partitionBy(by.map(col): _*)
    val framed =
      if (allowExact)
        w.orderBy(col(on).asc)
          .rangeBetween(Window.currentRow, Window.unboundedFollowing)
      else
        w.orderBy(unix_micros(col(on)))
          .rangeBetween(1L, Window.unboundedFollowing)
    first(col(M), ignoreNulls = true).over(framed)
  }

  /** @param probe    left side; all its columns survive
    * @param build    right side; must contain `on`, `by`, and `payload`
    *                 columns, with `payload` names disjoint from probe's
    * @param on       ordering (timestamp) column name, present in both
    * @param by       equality key columns (present in both), may be empty
    * @param payload  build columns to carry onto matched probe rows
    * @param toleranceMicros max allowed probe.on − build.on; misses get
    *                 NULL payload (pandas tolerance semantics)
    * @param allowExactMatches pandas merge_asof's parameter: false
    *                 excludes build rows with ts equal to the probe's
    * @return probe columns ++ `matched_ts` (build's `on`) ++ payload
    */
  def backward(
      probe: DataFrame,
      build: DataFrame,
      on: String,
      by: Seq[String],
      payload: Seq[String],
      toleranceMicros: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    val tagged = tagUnion(probe, build, on, by, payload)
      .withColumn("_c", backwardCarry(on, by, allowExactMatches))
    finish(tagged, probe.columns.toSeq, payload,
      applyTolerance(col("_c"), on, toleranceMicros, "backward"))
  }

  /** Forward as-of: first build row at-or-after each probe row
    * (pandas merge_asof(direction='forward')). */
  def forward(
      probe: DataFrame,
      build: DataFrame,
      on: String,
      by: Seq[String],
      payload: Seq[String],
      toleranceMicros: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    val tagged = tagUnion(probe, build, on, by, payload)
      .withColumn("_c", forwardCarry(on, by, allowExactMatches))
    finish(tagged, probe.columns.toSeq, payload,
      applyTolerance(col("_c"), on, toleranceMicros, "forward"))
  }

  /** Nearest as-of: whichever of the backward/forward candidates is
    * closer in |probe.on − build.on|; ties go backward (pandas
    * merge_asof(direction='nearest') tie-break). One shuffle; the two
    * candidate windows share the partitioning and differ only in sort
    * direction of the tag. */
  def nearest(
      probe: DataFrame,
      build: DataFrame,
      on: String,
      by: Seq[String],
      payload: Seq[String],
      toleranceMicros: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    val tagged = tagUnion(probe, build, on, by, payload)
      .withColumn("_cb", backwardCarry(on, by, allowExactMatches))
      .withColumn("_cf", forwardCarry(on, by, allowExactMatches))
    val bGap = unix_micros(col(on)) - unix_micros(col("_cb")("matched_ts"))
    val fGap = unix_micros(col("_cf")("matched_ts")) - unix_micros(col(on))
    val chosen =
      when(col("_cb").isNull, col("_cf"))
        .when(col("_cf").isNull, col("_cb"))
        .when(bGap <= fGap, col("_cb"))
        .otherwise(col("_cf"))
    val withChoice = tagged.withColumn("_c", chosen)
    finish(withChoice, probe.columns.toSeq, payload,
      applyTolerance(col("_c"), on, toleranceMicros, "nearest"))
  }

  /** Scale-safe GLOBAL (by = Nil) backward as-of. The plain global form
    * sorts everything in one task; this one range-partitions the tagged
    * union on `on`, runs the backward window per partition in parallel,
    * then repairs partition-boundary probes (those whose match lives in
    * an earlier partition) with a prefix-carry over a numPartitions-row
    * frame joined back via broadcast. Two extra tiny stages, no serial
    * sort — the 100× plan.
    *
    * Equal `on` values land in one range partition, so the
    * build-before-probe tie ordering is preserved exactly as in
    * [[backward]] (equivalence asserted in AsofJoinSpec).
    */
  def backwardGlobal(
      probe: DataFrame,
      build: DataFrame,
      on: String,
      payload: Seq[String],
      toleranceMicros: Option[Long] = None,
      numPartitions: Int = 0,
      allowExactMatches: Boolean = true): DataFrame = {
    val spark = probe.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val tagged = tagUnion(probe, build, on, Nil, payload)

    // Deterministic range buckets: boundaries come from a quantile
    // sketch of the PROBE side (correctness does not depend on the
    // bounds — any monotone bucketing yields the same as-of result, the
    // bounds only balance work — so the cheaper single-side sketch
    // suffices), and the bucket id is a pure function of ts — NOT
    // spark_partition_id over a sampled repartitionByRange, whose ids
    // are lineage-nondeterministic and would disagree between the two
    // sides of the boundary-fix join.
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else probe.select(unix_micros(col(on)).cast("double").as("_us"))
        .stat.approxQuantile("_us", probs, 0.01).distinct.sorted
    val boundsCol = array(bounds.map(b => lit(b.toLong)): _*)
    val pid: Column =
      if (bounds.isEmpty) lit(0)
      else size(filter(boundsCol, b => b <= unix_micros(col(on))))
    val ranged = tagged.withColumn("_pid", pid)

    // per-partition backward window — parallel across ts buckets (the
    // window's own hash exchange on _pid does the partitioning); frame
    // matches backwardCarry: equal-ts peers in, or strictly-before when
    // allowExactMatches=false. Equal-ts rows share a bucket (the bucket
    // id is a pure function of ts), so the strict exclusion never has to
    // cross the boundary-carry — the carried struct is always < the
    // receiving partition's every ts.
    val w0 = Window.partitionBy("_pid")
    val w =
      if (allowExactMatches)
        w0.orderBy(col(on).asc)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      else
        w0.orderBy(unix_micros(col(on)))
          .rangeBetween(Window.unboundedPreceding, -1L)
    val carried = ranged.withColumn("_c", last(col(M), ignoreNulls = true).over(w))

    // each partition's final carried struct = its last build row (NULL if
    // the partition holds no build rows); O(numPartitions) rows. Taken
    // from the build rows (tag 0) directly — NOT from _c, whose strict
    // frame excludes the last build row's own struct — max_by ignores
    // rows whose ordering key is NULL, so probe rows drop out.
    val lastPer = carried
      .groupBy(col("_pid"))
      .agg(max_by(col(M), when(col("_tag") === 0, col(on))).as("_last"))
    // prefix-carry: for partition p, the last build row of partitions < p
    val wp = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = lastPer
      .withColumn("_carry", last(col("_last"), ignoreNulls = true).over(wp))
      .select(col("_pid"), col("_carry"))

    val fixed = carried
      .join(broadcast(carry), Seq("_pid"), "left")
      .withColumn("_c", coalesce(col("_c"), col("_carry")))
    finish(fixed, probe.columns.toSeq, payload,
      applyTolerance(col("_c"), on, toleranceMicros, "backward"))
  }
}
