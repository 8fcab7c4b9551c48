package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the embed-LSH band knob at stress scale — the evidence
  * behind the documented 100 TB operating procedure (bits/band ≈
  * log₂(n / target-occupancy), BASELINE round 11): the gate-pinned
  * 4×8-bit family saturates its 256 buckets/band as the corpus grows
  * (measured 29× at sf3, spill-over-disk DNF at sf10), while the
  * auto-derived family keeps per-bucket occupancy — and therefore the
  * candidate pair mass — constant. Usage:
  *
  *   runMain graft.tools.LshKnobStress <sfDir> [reps] [bands:bits,...]
  *
  * Default families: auto (0:0 — what embedLshPairs derives from the
  * corpus count) plus the explicit 4:14 / 4:15 neighborhood of the
  * policy value for a 200k-vector corpus. Honest basis (toRdd.count),
  * min-of-reps, one JVM. */
object LshKnobStress {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "args: sfDir [reps] [bands:bits,...]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val fams: Seq[(Int, Int)] =
      if (args.length > 2) args(2).split(",").toSeq.map { s =>
        val Array(a, b) = s.split(":"); (a.toInt, b.toInt)
      } else Seq((0, 0), (4, 14), (4, 15))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = graft.core.Tables.embeddings(spark, dir)
    val n = vecs.count()
    val auto = graft.vec.VecOps.autoEmbedLshFamily(n)
    println(s"[lsh] corpus $dir n=$n auto=$auto")
    for ((nb, bits) <- fams) {
      val label = if (nb == 0) s"auto=$auto" else s"$nb x $bits"
      try {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val pairs = graft.vec.VecOps.embedLshPairs(
            vecs, "vec_id", "embedding", 0.4, nb, bits)
            .queryExecution.toRdd.count()
          ((System.nanoTime() - t0) / 1e9, pairs)
        }
        // reps must agree on the pair count — a divergence means the
        // measurement itself is broken, not just slow
        require(ts.map(_._2).distinct.size == 1,
          s"family $label: reps disagree on pairs ${ts.map(_._2)}")
        println(f"[lsh] family $label min=${ts.map(_._1).min}%.2f " +
          f"max=${ts.map(_._1).max}%.2f pairs=${ts.head._2}%d")
      } catch { case scala.util.control.NonFatal(e) =>
        // NonFatal only: an OOM/JVM error must kill the sweep, not
        // silently skew every later family's measurement
        println(s"[lsh] family $label DNF ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
