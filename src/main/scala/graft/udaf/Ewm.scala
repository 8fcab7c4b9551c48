package graft.udaf

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Exponentially-weighted mean over per-key ordered series — the
  * recursive aggregate stock Spark windows can't express efficiently
  * (the running value depends on every prior row, non-associatively).
  *
  * Shape: groupByKey + flatMapGroups with an in-group sort. One shuffle
  * on the key; each series is processed linearly in one task. Per-key
  * series must fit in executor memory (true for any sane key scheme at
  * 100 TB — a per-entity time series is MBs, not TBs); for pathological
  * keys, pre-aggregate or split by time range first.
  *
  * Two pandas variants:
  *  - adjusted=true:  yₙ = Σ (1−α)^(n−i) xᵢ / Σ (1−α)^(n−i)
  *  - adjusted=false: yₙ = α·xₙ + (1−α)·yₙ₋₁  (y₁ = x₁)
  *
  * EwmSpec cross-checks adjusted=true against the closed-form window
  * query `ts_ewm` (which DuckDB verifies), tying this implementation to
  * the oracle-checked surface.
  */
object Ewm {
  case class Point(key: Long, order: Long, value: Double)
  case class EwmOut(key: Long, order: Long, ewm: Double)

  def ewm(points: Dataset[Point], alpha: Double, adjusted: Boolean): Dataset[EwmOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (k: Long, it: Iterator[Point]) =>
      val sorted = it.toSeq.sortBy(_.order)
      if (adjusted) {
        var num = 0.0; var den = 0.0
        sorted.map { p =>
          num = (1 - alpha) * num + p.value
          den = (1 - alpha) * den + 1.0
          EwmOut(k, p.order, num / den)
        }.iterator
      } else {
        var y = Double.NaN
        sorted.map { p =>
          y = if (y.isNaN) p.value else alpha * p.value + (1 - alpha) * y
          EwmOut(k, p.order, y)
        }.iterator
      }
    }
  }

  /** DataFrame adapter over (user_id, event_id, value)-shaped input. */
  def ewmDf(df: DataFrame, alpha: Double, adjusted: Boolean): DataFrame = {
    import df.sparkSession.implicits._
    val pts = df.select(col("user_id").as("key"),
      col("event_id").as("order"), col("value")).as[Point]
    ewm(pts, alpha, adjusted).toDF("user_id", "event_id", "ewm")
  }
}
