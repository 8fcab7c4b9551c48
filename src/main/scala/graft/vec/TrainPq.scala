package graft.vec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline product-quantization codebook trainer — the PQ counterpart
  * of [[TrainIvf]]: splits the embedding into `m` contiguous
  * subvectors and runs the deterministic [[KMeans]] on each subspace
  * independently (the classic PQ training recipe). Prints the
  * `PqCodebooks` constants that both the Spark queries and the DuckDB
  * oracles inline, so encode/ADC are provably the same math in both
  * engines.
  *
  * Usage: runMain graft.vec.TrainPq <sfDir> [m] [ksub] [iters]
  *
  * SCALE POLICY: codebooks are m·ksub·(dim/m) doubles — size is
  * independent of corpus size (train on a sample, broadcast
  * everywhere). ksub=16 → 4-bit codes; a 64-dim float vector (256 B)
  * compresses to m nibbles (2 B at m=4): 128× smaller, which is what
  * makes exhaustive ADC scans over billions of vectors feasible.
  */
object TrainPq {
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
    val emb = graft.core.Tables.embeddings(spark, dir)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val sub = dim / m
    println(s"// m=$m ksub=$ksub subDim=$sub iters=$iters corpus=$dir")
    println(s"  val m = $m; val ksub = $ksub; val subDim = $sub")
    println("  val codebooks: Array[Array[Array[Double]]] = Array(")
    (0 until m).foreach { s =>
      val subEmb = emb.select(col("vec_id"),
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
