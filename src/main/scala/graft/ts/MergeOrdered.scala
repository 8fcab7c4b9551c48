package graft.ts

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** pandas `merge_ordered` (ordered full-outer merge with optional
  * forward fill): the union of both sides' ordered keys, each side's
  * value columns aligned on the key and — with `ffill = true` — carried
  * forward independently per column (pandas fill_method='ffill'
  * semantics; unlike merge_asof, the fill here is genuinely per-column,
  * not row-atomic).
  *
  * Shape: one full-outer sort-merge/hash join on (by, on) + one
  * windowed sort per `by` group — both shuffle on the same key, no
  * range explosion. With `by` non-empty every stage shards by the group
  * key (the 100 TB path); `by = Nil` is a deliberate single-series
  * form, serial like any global ordered fill.
  */
object MergeOrdered {

  /** @param left    left frame; must contain `by`, `on`, and its values
    * @param right   right frame; value column names must be disjoint
    *                from left's (pandas would suffix; we require clean)
    * @param on      ordering key present in both
    * @param by      group columns present in both, may be empty
    * @param ffill   forward-fill value columns after the merge
    * @return (by ++ on ++ left values ++ right values), one row per
    *         distinct (by, on) across both inputs
    */
  def merge(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String],
      ffill: Boolean): DataFrame = {
    val keys = by :+ on
    val lVals = left.columns.filterNot(keys.contains).toSeq
    val rVals = right.columns.filterNot(keys.contains).toSeq
    require(lVals.intersect(rVals).isEmpty,
      s"value columns must be disjoint, both sides have: ${lVals.intersect(rVals).mkString(",")}")

    // USING-style join coalesces the key columns
    val joined = left.join(right, keys, "full_outer")
    if (!ffill) joined
    else {
      val w = Window.partitionBy(by.map(col): _*)
        .orderBy(col(on).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      (lVals ++ rVals).foldLeft(joined) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    }
  }
}
