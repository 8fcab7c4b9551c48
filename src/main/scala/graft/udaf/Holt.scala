package graft.udaf

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Holt's linear-trend exponential smoothing per key — the COUPLED
  * two-state recursion (level, trend) stock windows can't express
  * (each state depends on both prior states, non-associatively).
  *
  * Same shape and scale contract as [[Ewm]]: groupByKey +
  * flatMapGroups, one shuffle on the key, one linear ordered pass per
  * series, partition-parallel across keys. Recursion (matches the
  * declared ts_holt_linear prefix-fold and its recursive-CTE oracle
  * EXACTLY — same IEEE op sequence, so the keyed form is gate-able
  * against the same CTE partitioned by key):
  *
  *   l₁ = x₁, b₁ = 0
  *   lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
  *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
  */
object Holt {
  case class HoltOut(key: Long, order: Long, level: Double, trend: Double)

  /** omAlpha/omBeta are passed EXPLICITLY, not computed as 1−α: the
    * double `1 - 0.3` differs from the literal `0.7` in the last ulp,
    * and the CTE oracle spells literals — computing the complement
    * would break bit-equality. */
  def holt(points: Dataset[Ewm.Point], alpha: Double, omAlpha: Double,
           beta: Double, omBeta: Double): Dataset[HoltOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (k: Long, it: Iterator[Ewm.Point]) =>
      val sorted = it.toSeq.sortBy(_.order)
      var l = Double.NaN; var b = 0.0
      sorted.map { p =>
        if (l.isNaN) { l = p.value; b = 0.0 }
        else {
          val ln = alpha * p.value + omAlpha * (l + b)
          b = beta * (ln - l) + omBeta * b
          l = ln
        }
        HoltOut(k, p.order, l, b)
      }.iterator
    }
  }

  /** DataFrame adapter over (user_id, event_id, value)-shaped input. */
  def holtDf(df: DataFrame, alpha: Double, omAlpha: Double,
             beta: Double, omBeta: Double): DataFrame = {
    import df.sparkSession.implicits._
    val pts = df.select(col("user_id").as("key"),
      col("event_id").as("order"), col("value")).as[Ewm.Point]
    holt(pts, alpha, omAlpha, beta, omBeta)
      .toDF("user_id", "event_id", "level", "trend")
  }
}
