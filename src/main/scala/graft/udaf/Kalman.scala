package graft.udaf

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Kalman local-level filter per key — the adaptive-gain recursive
  * smoother (state = level + error variance; the gain is a FUNCTION of
  * accumulated uncertainty, so no window expresses it). Same shape and
  * scale contract as [[Holt]]/[[Ewm]]: groupByKey + flatMapGroups, one
  * shuffle on the key, one linear ordered pass per series, partition-
  * parallel across keys. The recursion matches ts_kalman_level's
  * recursive-CTE oracle op-for-op (every intermediate the same IEEE
  * sequence), so the output is gate-able UNROUNDED:
  *
  *   l₁ = x₁, p₁ = p₀ (diffuse init)
  *   pp = pₜ₋₁ + q;  g = pp / (pp + r)
  *   lₜ = lₜ₋₁ + g·(xₜ − lₜ₋₁);  pₜ = (1 − g)·pp
  *
  * This replaced the O(n²) prefix-fold as the DECLARED ts_kalman_level
  * spelling in round 16 (verdict item 4) — the fold survives only in
  * the oracle-side recursive CTE.
  */
object Kalman {
  case class KalmanOut(key: Long, order: Long, level: Double, errVar: Double,
                       gainNext: Double)

  def kalman(points: Dataset[Ewm.Point], q: Double, r: Double,
             p0: Double): Dataset[KalmanOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (k: Long, it: Iterator[Ewm.Point]) =>
      val sorted = it.toSeq.sortBy(_.order)
      var first = true
      var l = 0.0; var p = p0
      sorted.map { pt =>
        if (first) { l = pt.value; p = p0; first = false }
        else {
          // pp + r associates left like the oracle's (p + q) + r
          val pp = p + q
          val g = pp / (pp + r)
          l = l + g * (pt.value - l)
          p = (1.0 - g) * pp
        }
        KalmanOut(k, pt.order, l, p, (p + q) / (p + q + r))
      }.iterator
    }
  }

  /** DataFrame adapter: key/order must be long-castable (the udaf
    * family contract — for a timestamp order, unix_micros first). */
  def kalmanDf(df: DataFrame, keyCol: String, orderCol: String,
               valueCol: String, q: Double, r: Double, p0: Double): DataFrame = {
    import df.sparkSession.implicits._
    val pts = df.select(col(keyCol).as("key"),
      col(orderCol).as("order"), col(valueCol).as("value")).as[Ewm.Point]
    kalman(pts, q, r, p0)
      .toDF(keyCol, orderCol, "level", "err_var", "gain_next")
  }
}
