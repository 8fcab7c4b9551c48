package graft.udaf

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Holt-Winters additive smoothing per key — the THREE-state coupled
  * recursion (level, trend, m-slot seasonal vector) no stock window
  * expresses. Same shape and scale contract as [[Holt]]/[[Ewm]]:
  * groupByKey + flatMapGroups, one shuffle on the key, one linear
  * ordered pass per series (O(n·m) with the rotating array), partition-
  * parallel across keys. The recursion matches the declared
  * ts_holt_winters prefix-fold and its recursive-CTE oracle EXACTLY —
  * same IEEE op sequence, so the keyed form gates against the same CTE
  * partitioned by key:
  *
  *   l₁ = x₁, b₁ = 0, s = 0⃗ (m slots)
  *   lₜ = α·(xₜ − s₁) + (1−α)·(lₜ₋₁ + bₜ₋₁)
  *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
  *   s ← rotate(s) ∥ [γ·(xₜ − lₜ) + (1−γ)·s₁]
  */
object HoltWinters {
  case class HwOut(key: Long, order: Long, level: Double, trend: Double,
                   seasonalNext: Double)

  /** Complements (omAlpha/omBeta/omGamma) passed EXPLICITLY, never
    * computed as 1−α — the literal-vs-computed last-ulp split (see
    * [[Holt.holt]]). */
  def holtWinters(points: Dataset[Ewm.Point], m: Int,
                  alpha: Double, omAlpha: Double,
                  beta: Double, omBeta: Double,
                  gamma: Double, omGamma: Double): Dataset[HwOut] = {
    require(m >= 2, s"season length must be >= 2, got $m")
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (k: Long, it: Iterator[Ewm.Point]) =>
      val sorted = it.toSeq.sortBy(_.order)
      var l = Double.NaN; var b = 0.0
      val s = scala.collection.mutable.Queue.fill(m)(0.0)
      sorted.map { p =>
        if (l.isNaN) { l = p.value; b = 0.0 }
        else {
          val s1 = s.head
          val ln = alpha * (p.value - s1) + omAlpha * (l + b)
          b = beta * (ln - l) + omBeta * b
          s.dequeue()
          s.enqueue(gamma * (p.value - ln) + omGamma * s1)
          l = ln
        }
        HwOut(k, p.order, l, b, s.head)
      }.iterator
    }
  }

  /** DataFrame adapter over (user_id, event_id, value)-shaped input. */
  def holtWintersDf(df: DataFrame, m: Int,
                    alpha: Double, omAlpha: Double,
                    beta: Double, omBeta: Double,
                    gamma: Double, omGamma: Double): DataFrame = {
    import df.sparkSession.implicits._
    val pts = df.select(col("user_id").as("key"),
      col("event_id").as("order"), col("value")).as[Ewm.Point]
    holtWinters(pts, m, alpha, omAlpha, beta, omBeta, gamma, omGamma)
      .toDF("user_id", "event_id", "level", "trend", "seasonal_next")
  }
}
