package graft.vec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline residual-PQ codebook trainer — the second stage of the
  * IVF-PQ index (the standard billion-scale ANN layout: a coarse
  * k-means quantizer routes each vector to a cell, PQ encodes the
  * RESIDUAL e − c(cell), which is much smaller in norm than e and so
  * quantizes with far less error at the same code budget).
  *
  * Assigns cells with the SAME argmin device the gated queries use
  * (d = |c|² − 2e·c over the inlined [[IvfCentroids]], ties to the
  * lower cid), computes residuals, and runs the deterministic
  * [[KMeans]] per subspace on them. Prints `PqResidualCodebooks`.
  *
  * Usage: runMain graft.vec.TrainIvfPq <sfDir> [m] [ksub] [iters]
  */
object TrainIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val m = if (args.length > 1) args(1).toInt else 4
    val ksub = if (args.length > 2) args(2).toInt else 16
    val iters = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = IvfPq.residuals(graft.core.Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("r").as("embedding"))
    val dim = res.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val sub = dim / m
    println(s"// m=$m ksub=$ksub subDim=$sub iters=$iters corpus=$dir (residuals vs IvfCentroids)")
    println(s"  val m = $m; val ksub = $ksub; val subDim = $sub")
    println("  val codebooks: Array[Array[Array[Double]]] = Array(")
    (0 until m).foreach { s =>
      val subEmb = res.select(col("vec_id"),
        expr(s"slice(embedding, ${s * sub + 1}, $sub)").as("embedding"))
      val (_, cents, inertia) = KMeans.fit(subEmb, ksub, iters)
      println(s"    // subspace $s inertia=$inertia")
      println("    Array(")
      cents.foreach { c =>
        println("      Array(" + c.map(x => s"${x}d").mkString(", ") + "),")
      }
      println("    ),")
    }
    println("  )")
    spark.stop()
  }
}
