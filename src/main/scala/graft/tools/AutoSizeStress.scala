package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scale-stress harness for the AUTO-sized sketch band families
  * (round-12 verdict item 1): times `minhashPairs` / `embedLshPairs`
  * in AUTO mode (family derived from the corpus count) across SF
  * dirs, so the growth factor shows whether auto sizing keeps the
  * near-dup path near-linear where the pinned gate families were
  * measured superlinear (BASELINE.md "tenth axis").
  *
  * Usage: runMain graft.tools.AutoSizeStress <dirA> <dirB> [reps [tauText tauVec]]
  * (taus default to the gated 0.5 / 0.4; pass e.g. 0.9 0.9 to measure
  * the output-bound claim — at a real dedup threshold the qualifying
  * pair count is ~linear in n and growth should track it.)
  * Evidence consumer: BASELINE.md "auto-sized band families" section.
  */
object AutoSizeStress {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "args: dirA dirB [reps [tauText tauVec]]")
    val dirs = Seq(args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 2
    val tauText = if (args.length > 3) args(3).toDouble else 0.5
    val tauVec = if (args.length > 4) args(4).toDouble else 0.4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dirs.foreach(d => spark.read.parquet(s"$d/documents.parquet").count())

    def time(label: String, d: String)(body: => Long): Double = {
      // release BEFORE the rep loop (a fresh corpus pays its own
      // sketch), then min over warm reps — the ScaleStress
      // methodology BASELINE.md's tenth-axis rows were measured with,
      // so growth factors compare like with like
      graft.core.Caches.release(spark)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[auto-stress] $d $label rows=$n t=$dt%.2f")
        dt
      }
      ts.min
    }

    val res = for (d <- dirs) yield {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      val (mb, mr) = graft.text.NearDup.autoMinhashFamily(docs.count())
      val (eb, ebits) = graft.vec.VecOps.autoEmbedLshFamily(vecs.count())
      println(s"[auto-stress] $d minhash family ${mb}x$mr, embed family ${eb}x${ebits}bits")
      val tm = time("minhash_auto", d) {
        graft.text.NearDup.minhashPairs(docs, "doc_id", "text", tau = tauText).count()
      }
      val te = time("embed_auto", d) {
        graft.vec.VecOps.embedLshPairs(vecs, "vec_id", "embedding", tau = tauVec).count()
      }
      (d, tm, te)
    }
    println("dir".padTo(24, ' ') + " minhash_auto embed_auto")
    res.foreach { case (d, tm, te) => println(f"$d%-24s $tm%11.2f $te%10.2f") }
    val growthM = res(1)._2 / res(0)._2
    val growthE = res(1)._3 / res(0)._3
    println(f"growth B/A: minhash ${growthM}%.2fx embed ${growthE}%.2fx")
    spark.stop()
  }
}
