package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PCA tier's proof chain (graft.vec.Pca / PcaModel / TrainPca):
  * the inlined model literals are re-derived BIT-EXACTLY from the
  * training corpus (the KMeansSpec discipline), the rotation is a
  * genuine converged eigenpair, and the gated report replays from a
  * plain-Scala projection with the same quantized-exact-sum device. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows: Array[Array[Double]] =
    graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Double](1).toArray)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < a.length) { s += a(j) * b(j); j += 1 }
    s
  }

  test("PcaModel literals re-derive bit-exactly from the training corpus") {
    val (mean, w1, l1, w2, l2) = graft.vec.TrainPca.fit(rows, 1000)
    assert(mean.toSeq == graft.vec.PcaModel.mean.toSeq)
    assert(w1.toSeq == graft.vec.PcaModel.w1.toSeq)
    assert(w2.toSeq == graft.vec.PcaModel.w2.toSeq)
    assert(l1 == graft.vec.PcaModel.lam1 && l2 == graft.vec.PcaModel.lam2)
  }

  test("the rotation is a converged orthonormal eigenpair") {
    import graft.vec.PcaModel.{lam1, lam2, mean, w1, w2}
    val d = mean.length
    assert(math.abs(math.sqrt(dot(w1, w1)) - 1.0) < 1e-12)
    assert(math.abs(math.sqrt(dot(w2, w2)) - 1.0) < 1e-12)
    assert(math.abs(dot(w1, w2)) < 1e-9, s"w1.w2 = ${dot(w1, w2)}")
    assert(lam1 >= lam2 && lam2 > 0.0)
    // eigen residual ||C w − λ w||: rebuild C once from the corpus
    val n = rows.length
    val c = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val x = Array.tabulate(d)(j => r(j) - mean(j))
      for (i <- 0 until d; k <- 0 until d) c(i)(k) += x(i) * x(k) / n
    }
    def residual(w: Array[Double], lam: Double): Double = {
      val cw = Array.tabulate(d)(i => dot(c(i), w))
      math.sqrt(dot(
        Array.tabulate(d)(i => cw(i) - lam * w(i)),
        Array.tabulate(d)(i => cw(i) - lam * w(i))))
    }
    assert(residual(w1, lam1) < 1e-8 * lam1.max(1.0), s"r1=${residual(w1, lam1)}")
    // w2 is an eigenpair of the DEFLATED matrix; its residual on C is
    // bounded by the deflation cross-term — assert against C − λ1w1w1ᵀ
    val c2 = Array.tabulate(d, d)((i, k) => c(i)(k) - lam1 * w1(i) * w1(k))
    val c2w = Array.tabulate(d)(i => dot(c2(i), w2))
    val r2 = math.sqrt(dot(
      Array.tabulate(d)(i => c2w(i) - lam2 * w2(i)),
      Array.tabulate(d)(i => c2w(i) - lam2 * w2(i))))
    assert(r2 < 1e-6 * lam2.max(1.0), s"r2=$r2")
  }

  test("vec_pca_project replays from a plain-Scala quantized projection") {
    import graft.vec.PcaModel.{mean, w1, w2}
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def q6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP))
    val c1 = dot(mean, w1); val c2 = dot(mean, w2)
    val labeled = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
      .select(col("label").cast("long"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val want = labeled.groupBy(_._1).toSeq.sortBy(_._1).map { case (lbl, g) =>
      val s1 = g.map(r => q6(dot(r._2, w1) - c1)).sum
      val s2 = g.map(r => q6(dot(r._2, w2) - c2)).sum
      (lbl, g.length.toLong,
        r4(s1.toDouble / g.length), r4(s2.toDouble / g.length))
    }
    val got = graft.ops.Registry.queries("vec_pca_project")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("the variance report accounts the rotated energy consistently") {
    val rep = graft.ops.Registry.queries("vec_pca_var_report")(spark, TestSpark.sfSmoke).head()
    val (n, v1, v2, vt) = (rep.getLong(0), rep.getDouble(1), rep.getDouble(2), rep.getDouble(3))
    assert(n == rows.length.toLong)
    // on the TRAINING corpus the projection second moments ARE the
    // eigenvalues (up to the 6-dp quantization)
    assert(math.abs(v1 - graft.vec.PcaModel.lam1) < 1e-3, s"v1=$v1")
    assert(math.abs(v2 - graft.vec.PcaModel.lam2) < 1e-3, s"v2=$v2")
    assert(v1 + v2 <= vt && vt > 0.0)
    assert(rep.getDouble(4) > 0.0 && rep.getDouble(5) > 0.0)
  }
}
