package graft.udaf

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Linear per-key passes for the SPC recursions (Page CUSUM, EWMA
  * control chart) — round 16, closing the last O(n²) single-series
  * prefix folds (the exponential family swapped in the same round via
  * [[Ewm]]/[[Holt]]/[[HoltWinters]]/[[Kalman]]).
  *
  * Same shape and scale contract as the rest of the udaf family:
  * groupByKey + flatMapGroups, one shuffle on the key, one ordered
  * O(n) pass per series, partition-parallel across keys. Each
  * recursion matches its declared oracle op-for-op (literals, not
  * computed complements), so the outputs gate UNROUNDED:
  *
  *   CUSUM (Page 1954):  S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ−μ) − k)
  *                       S⁻ₜ = max(0, S⁻ₜ₋₁ − (xₜ−μ) − k),  S⁺₀ = S⁻₀ = 0
  *   EWMA chart (Roberts 1959):  zₜ = λ·xₜ + (1−λ)·zₜ₋₁,  z₀ = μ
  *     with (1−λ)^{2t} carried as the multiplicative state
  *     qₜ = qₜ₋₁·((1−λ)·(1−λ)),  q₀ = 1  (pow() is banned by the
  *     determinism policy; a product recursion is exact-same-ops in
  *     both engines).
  *
  * μ (and σ for the chart) arrive per ROW — the caller computes them
  * with the exact-decimal aggregates and broadcast-joins them in, so
  * the udaf never re-derives a float the oracle spelled differently.
  */
object Spc {
  case class CusumIn(key: Long, order: Long, value: Double, mu: Double)
  case class CusumOut(key: Long, order: Long, value: Double,
                      cusumPos: Double, cusumNeg: Double)

  def cusum(points: Dataset[CusumIn], k: Double): Dataset[CusumOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (key: Long, it: Iterator[CusumIn]) =>
      val sorted = it.toSeq.sortBy(_.order)
      var sp = 0.0; var sn = 0.0
      sorted.map { p =>
        sp = math.max(0.0, sp + (p.value - p.mu) - k)
        sn = math.max(0.0, sn - (p.value - p.mu) - k)
        CusumOut(key, p.order, p.value, sp, sn)
      }.iterator
    }
  }

  /** DataFrame adapter over (user_id, event_id, value, mu). */
  def cusumDf(df: DataFrame, k: Double): DataFrame = {
    import df.sparkSession.implicits._
    val pts = df.select(col("user_id").as("key"), col("event_id").as("order"),
      col("value"), col("mu")).as[CusumIn]
    cusum(pts, k).toDF("user_id", "event_id", "value", "cusum_pos", "cusum_neg")
  }

  case class EwmaIn(key: Long, order: Long, value: Double, mu: Double, sd: Double)
  case class EwmaOut(key: Long, order: Long, value: Double, mu: Double,
                     sd: Double, ewma: Double, q: Double)

  /** omLambda passed EXPLICITLY (the literal-vs-computed last-ulp
    * split — see [[Holt.holt]]); the q step multiplies omLambda by
    * itself exactly like the oracle's CAST(0.7)·CAST(0.7). */
  def ewmaChart(points: Dataset[EwmaIn], lambda: Double,
                omLambda: Double): Dataset[EwmaOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (key: Long, it: Iterator[EwmaIn]) =>
      val sorted = it.toSeq.sortBy(_.order)
      var first = true
      var z = 0.0; var q = 1.0
      sorted.map { p =>
        if (first) { z = p.mu; first = false }
        z = lambda * p.value + omLambda * z
        q = q * (omLambda * omLambda)
        EwmaOut(key, p.order, p.value, p.mu, p.sd, z, q)
      }.iterator
    }
  }

  /** DataFrame adapter over (user_id, event_id, value, mu, sd). */
  def ewmaChartDf(df: DataFrame, lambda: Double, omLambda: Double): DataFrame = {
    import df.sparkSession.implicits._
    val pts = df.select(col("user_id").as("key"), col("event_id").as("order"),
      col("value"), col("mu"), col("sd")).as[EwmaIn]
    ewmaChart(pts, lambda, omLambda)
      .toDF("user_id", "event_id", "value", "mu", "sd", "ewma", "q")
  }
}
