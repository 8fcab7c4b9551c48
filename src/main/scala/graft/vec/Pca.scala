package graft.vec

import graft.core.{Tables => T}
import graft.ops.OpSpec
import org.apache.spark.sql.functions._

/** §2.J — PCA projection over the embedding column with the rotation
  * trained OFFLINE and inlined ([[PcaModel]], the PqCodebooks device).
  * The projection itself is ROW-LOCAL (one fold over the vector with a
  * literal array — the PQ-encode shape: shuffle-free, broadcast-free,
  * 100 TB = a map); only the gated REPORTS aggregate.
  *
  * Determinism device — QUANTIZED EXACT SUMS, not ordered folds: the
  * per-row projection p = e·w − μ·w is bit-identical in both engines
  * (explicit left-fold dot with bit-identical literals, the
  * vec_pq_encode proof), so round(p, 6) is the same double everywhere,
  * and summing it as decimal(28,6) is EXACT and ORDER-FREE under any
  * partitioning — the dsum(value) device applied to a computed column.
  * Unlike collect_list ordered folds this scales to any corpus: the
  * sum is a plain distributed hash agg.
  */
object Pca {
  import PcaModel.{mean, w1, w2}

  /** Spark double literal (`D` types it DOUBLE at parse). */
  private def fs(x: Double): String = s"${x}D"

  /** DuckDB double literal (`e0` forces DOUBLE before list
    * unification can truncate to a common DECIMAL scale). */
  private def fd(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** μ·w as a Scala-side sequential fold — spliced into BOTH texts as
    * one literal, so neither engine re-derives it. */
  private def dotScala(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < a.length) { s += a(j) * b(j); j += 1 }
    s
  }
  private val c1 = dotScala(mean, w1)
  private val c2 = dotScala(mean, w2)

  /** Spark: centered projection of the double vector `es` onto the
    * literal axis — explicit left fold (ulp-identical to the oracle's
    * list_reduce; builtin inner products FMA-drift). */
  private def projSpark(es: String, w: Array[Double], c: Double): String =
    s"aggregate(zip_with($es, array(${w.map(fs).mkString(",")}), " +
      s"(x, y) -> x * y), 0D, (acc, x) -> acc + x) - ${fs(c)}"

  /** DuckDB spelling of the same projection. */
  private def projDuck(es: String, w: Array[Double], c: Double): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($es, " +
      s"[${w.map(fd).mkString(",")}]::DOUBLE[]), x -> x[1]*x[2])), " +
      s"(acc, x) -> acc + x) - ${fd(c)}"

  /** Spark: ||e − μ||² via one zip fold with the literal mean. */
  private def sqDistSpark(es: String): String =
    s"aggregate(zip_with($es, array(${mean.map(fs).mkString(",")}), " +
      s"(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"

  private def sqDistDuck(es: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($es, " +
      s"[${mean.map(fd).mkString(",")}]::DOUBLE[]), " +
      s"x -> (x[1] - x[2]) * (x[1] - x[2]))), (acc, x) -> acc + x)"

  val ops: Seq[OpSpec] = Seq(
    // Per-label centroid of the top-2 PCA projections — "where does
    // each class sit in the rotated space?" Projections are row-local
    // folds with inlined literals; the only aggregation is ONE hash
    // agg over 6-dp-quantized decimals (exact, order-free — NO
    // ordered fold anywhere, so the plan is a plain distributed agg
    // at any corpus size).
    OpSpec(
      "vec_pca_project",
      (s, d) => T.embeddings(s, d)
        .select(col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("e"))
        .select(col("label"),
          expr(s"cast(round(${projSpark("e", w1, c1)}, 6) as decimal(28,6))").as("q1"),
          expr(s"cast(round(${projSpark("e", w2, c2)}, 6) as decimal(28,6))").as("q2"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), sum(col("q1")).as("s1"), sum(col("q2")).as("s2"))
        .selectExpr("cast(label as bigint) AS label", "cast(n as bigint) AS n_vecs",
          "round(cast(s1 as double) / cast(n as double), 4) AS mean_p1",
          "round(cast(s2 as double) / cast(n as double), 4) AS mean_p2")
        .orderBy("label"),
      Some(s"""WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
              |p AS (
              |  SELECT label,
              |    cast(round(${projDuck("e", w1, c1)}, 6) as decimal(28,6)) AS q1,
              |    cast(round(${projDuck("e", w2, c2)}, 6) as decimal(28,6)) AS q2
              |  FROM v)
              |SELECT cast(label as bigint) AS label, count(*) AS n_vecs,
              |  round(cast(sum(q1) as double) / cast(count(*) as double), 4) AS mean_p1,
              |  round(cast(sum(q2) as double) / cast(count(*) as double), 4) AS mean_p2
              |FROM p GROUP BY label ORDER BY label""".stripMargin),
    ),
    // Variance-explained report: second moments of the projections
    // about the TRAINING mean vs the total centered energy — "how much
    // of the corpus does the 2-D rotation keep?" Same quantized-exact-
    // sum device at 12 dp (the squares are ≤ ~4, so decimal(38,12)
    // sums are exact at any corpus size).
    OpSpec(
      "vec_pca_var_report",
      (s, d) => T.embeddings(s, d)
        .select(expr("transform(embedding, x -> cast(x as double))").as("e"))
        .select(
          expr(s"${projSpark("e", w1, c1)}").as("p1"),
          expr(s"${projSpark("e", w2, c2)}").as("p2"),
          expr(sqDistSpark("e")).as("t"))
        // p*p, not power(p,2): Math.pow and C pow may differ an ulp
        .select(
          expr("cast(round(p1 * p1, 12) as decimal(38,12))").as("q1"),
          expr("cast(round(p2 * p2, 12) as decimal(38,12))").as("q2"),
          expr("cast(round(t, 12) as decimal(38,12))").as("qt"))
        .agg(count(lit(1)).as("n"),
          sum(col("q1")).as("s1"), sum(col("q2")).as("s2"), sum(col("qt")).as("st"))
        .selectExpr("cast(n as bigint) AS n_vecs",
          "round(cast(s1 as double) / nullif(cast(n as double), 0D), 6) AS var_pc1",
          "round(cast(s2 as double) / nullif(cast(n as double), 0D), 6) AS var_pc2",
          "round(cast(st as double) / nullif(cast(n as double), 0D), 6) AS var_total",
          """round(cast(s1 as double) / nullif(cast(st as double), 0D), 4)
            | AS pct_pc1""".stripMargin,
          """round(cast(s2 as double) / nullif(cast(st as double), 0D), 4)
            | AS pct_pc2""".stripMargin),
      Some(s"""WITH v AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
              |pr AS (
              |  SELECT ${projDuck("e", w1, c1)} AS p1,
              |    ${projDuck("e", w2, c2)} AS p2,
              |    ${sqDistDuck("e")} AS t
              |  FROM v),
              |p AS (
              |  SELECT
              |    cast(round(p1 * p1, 12) as decimal(38,12)) AS q1,
              |    cast(round(p2 * p2, 12) as decimal(38,12)) AS q2,
              |    cast(round(t, 12) as decimal(38,12)) AS qt
              |  FROM pr),
              |a AS (SELECT count(*) AS n, sum(q1) AS s1, sum(q2) AS s2, sum(qt) AS st FROM p)
              |SELECT cast(n as bigint) AS n_vecs,
              |  round(cast(s1 as double) / nullif(cast(n as double), 0.0), 6) AS var_pc1,
              |  round(cast(s2 as double) / nullif(cast(n as double), 0.0), 6) AS var_pc2,
              |  round(cast(st as double) / nullif(cast(n as double), 0.0), 6) AS var_total,
              |  round(cast(s1 as double) / nullif(cast(st as double), 0.0), 4)
              |   AS pct_pc1,
              |  round(cast(s2 as double) / nullif(cast(st as double), 0.0), 4)
              |   AS pct_pc2
              |FROM a""".stripMargin),
    ),
  )
}
