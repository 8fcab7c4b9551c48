package graft.vec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline PCA trainer — the [[TrainPq]]/[[TrainIvf]] pattern applied
  * to the rotation itself: deterministic POWER ITERATION on the 64×64
  * sample covariance (fixed start vector e₀, fixed iteration count, no
  * RNG, no wall-clock), top-2 components extracted by deflation.
  * Prints the `PcaModel` constants that both the Spark queries and the
  * DuckDB oracles inline (double → shortest-string → double
  * round-trips exactly, the IvfCentroids device), so projection is
  * provably the same math in both engines and PcaSpec can re-derive
  * every literal bit-exactly from the corpus.
  *
  * Usage: runMain graft.vec.TrainPca <sfDir> [iters]
  *
  * SCALE POLICY: the model is 3·dim doubles + 2 scalars — size is
  * independent of corpus size. At 100 TB the mean/covariance moments
  * are one distributed agg (d² sums) and the eigen-solve is a
  * driver-side scalar problem; training here collects because the
  * trainer is OFFLINE (the PqCodebooks rule: train once on a sample,
  * inline, broadcast everywhere).
  */
object TrainPca {
  /** Deterministic top-2 PCA: (mean, w1, λ1, w2, λ2). `rows` must be
    * in a canonical order (vec_id ascending) — every fold below is a
    * sequential left fold over that order, so the same corpus always
    * yields the same bits. */
  def fit(rows: Array[Array[Double]], iters: Int = 1000)
      : (Array[Double], Array[Double], Double, Array[Double], Double) = {
    val n = rows.length
    val d = rows(0).length
    val mean = Array.tabulate(d) { j =>
      var s = 0.0; var i = 0
      while (i < n) { s += rows(i)(j); i += 1 }
      s / n
    }
    val c = Array.ofDim[Double](d, d)
    val x = new Array[Double](d)
    var r = 0
    while (r < n) {
      var j = 0
      while (j < d) { x(j) = rows(r)(j) - mean(j); j += 1 }
      var i = 0
      while (i < d) {
        var k = 0
        while (k < d) { c(i)(k) += x(i) * x(k); k += 1 }
        i += 1
      }
      r += 1
    }
    var i = 0
    while (i < d) {
      var k = 0
      while (k < d) { c(i)(k) /= n; k += 1 }
      i += 1
    }
    def matvec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }
        s
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < d) { s += a(j) * b(j); j += 1 }
      s
    }
    def power(m: Array[Array[Double]]): (Array[Double], Double) = {
      var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
      var it = 0
      while (it < iters) {
        val u = matvec(m, v)
        val nrm = math.sqrt(dot(u, u))
        v = u.map(_ / nrm)
        it += 1
      }
      (v, dot(v, matvec(m, v)))
    }
    val (w1, l1) = power(c)
    val c2 = Array.tabulate(d, d)((i, k) => c(i)(k) - l1 * w1(i) * w1(k))
    val (w2, l2) = power(c2)
    (mean, w1, l1, w2, l2)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Double](1).toArray)
    val (mean, w1, l1, w2, l2) = fit(rows, iters)
    def arr(a: Array[Double]): String =
      "Array(" + a.map(x => s"${x}d").mkString(", ") + ")"
    println(s"// trained by TrainPca on $dir iters=$iters n=${rows.length}")
    println(s"  val dim = ${mean.length}")
    println(s"  val lam1 = ${l1}d; val lam2 = ${l2}d")
    println(s"  val mean: Array[Double] = ${arr(mean)}")
    println(s"  val w1: Array[Double] = ${arr(w1)}")
    println(s"  val w2: Array[Double] = ${arr(w2)}")
    spark.stop()
  }
}
