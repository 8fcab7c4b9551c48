package graft.vec

import org.apache.spark.sql.SparkSession

/** Offline IVF coarse-quantizer training: run deterministic k-means
  * over an embeddings corpus and print the centroids as Scala source
  * for [[IvfCentroids]] — the standard IVF workflow (train the
  * quantizer on a fixed sample, index any corpus with it). Because
  * [[KMeans.fit]] is bit-deterministic (decimal sums, id-seeded init),
  * the printed constants are reproducible from the corpus; the
  * KMeansSpec regression test re-derives them.
  *
  * Usage: runMain graft.vec.TrainIvf <embeddingsDir> [k] [iters]
  */
object TrainIvf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 8
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (_, centroids, inertia) = KMeans.fit(graft.core.Tables.embeddings(spark, dir), k, iters)
    println(s"// k=$k iters=$iters corpus=$dir inertia=$inertia")
    println("  val centroids: Array[Array[Double]] = Array(")
    centroids.foreach { c =>
      println("    Array(" + c.map(x => s"${x}d").mkString(", ") + "),")
    }
    println("  )")
    spark.stop()
  }
}
