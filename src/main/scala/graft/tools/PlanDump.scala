package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared keys to files — the
  * round-18 optimization-evidence writer (`plans/r18/<key>_<tag>.txt`).
  *
  *   runMain graft.tools.PlanDump <outDir> <tag> key1,key2,...
  *
  * Uses the bench session shape (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, extensions installed) so the dumped plan is the
  * plan the bench actually executes, at the bench SF
  * ($SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "args: outDir tag key1,key2,...")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // joinTuned: dump the plan the bench actually executes (round 19 —
    // Bench/Verify/library share the join-strategy knobs)
    val spark = graft.core.GraftSession.joinTuned(SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    keys.foreach { k =>
      val op = graft.ops.Registry.all.find(_.key == k)
        .getOrElse(sys.error(s"unknown key $k"))
      val df = op.build(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        outDir.resolve(s"${k}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"[plandump] $k -> ${outDir.resolve(s"${k}_$tag.txt")}")
    }
    spark.stop()
  }
}
