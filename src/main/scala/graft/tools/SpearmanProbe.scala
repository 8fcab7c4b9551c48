package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off substep timer for the agg_spearman_grid plan (round-18
  * optimization diagnostics): times the joint-grid memo build, the
  * quantile sketch, each marginal rank, and the final composed query
  * separately, so the 7.5 s bench single-shot can be attributed.
  *
  *   runMain graft.tools.SpearmanProbe [sfDir]
  */
object SpearmanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"),
        col("l_quantity").cast("bigint").as("q"),
        col("l_extendedprice").cast("decimal(18,2)").as("p"))

    val joint = t("joint memo build+read") {
      val j = graft.core.DiskMemo.persist(
        fact.groupBy("l_returnflag", "q", "p").agg(count(lit(1)).as("c")),
        "spearman_joint")
      j.queryExecution.toRdd.count()
      j
    }
    println(s"[probe] joint rows: ${joint.count()}")
    val n = graft.core.ParallelRank.defaultBuckets(spark)
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bs = t("approxQuantile (2 cols)") {
      joint.select(col("q").cast("double").as("_qd"),
          col("p").cast("double").as("_pd"))
        .stat.approxQuantile(Array("_qd", "_pd"), probs, 0.01)
    }
    val qRank = graft.core.ParallelRank.fromCounts(
      joint.groupBy("l_returnflag", "q").agg(sum("c").as("cq")),
      Seq("l_returnflag"), "q", "cq", "ax", precomputedBounds = Some(bs(0)))
    t("qRank action")(qRank.queryExecution.toRdd.count())
    val pRank = graft.core.ParallelRank.fromCounts(
      joint.groupBy("l_returnflag", "p").agg(sum("c").as("cp")),
      Seq("l_returnflag"), "p", "cp", "bx", precomputedBounds = Some(bs(1)))
    t("pRank action")(pRank.queryExecution.toRdd.count())
    t("full declared query (warm)") {
      graft.ops.Registry.all.find(_.key == "agg_spearman_grid").get
        .build(spark, sfDir).queryExecution.toRdd.count()
    }
    t("full declared query (2nd)") {
      graft.ops.Registry.all.find(_.key == "agg_spearman_grid").get
        .build(spark, sfDir).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
