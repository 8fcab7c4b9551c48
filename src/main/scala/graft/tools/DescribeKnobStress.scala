package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the agg_describe scale knob (round-18 verdict item 3):
  * the declared exact-`percentile` spelling (a per-partition
  * value→count map merged through the agg buffer — 12.2 s at the sf10
  * stress, the aggregate family's biggest absolute), the
  * approx_percentile spelling the old comment advertised as the
  * 100 TB knob, and the round-18 describeColGrid device (exact
  * interpolation from doubled-rank order statistics). Usage:
  *
  *   runMain graft.tools.DescribeKnobStress <sfDir> [reps]
  *
  * Honest basis (toRdd.count), min-of-reps, one JVM; also prints the
  * exact-vs-grid row equality so the receipt certifies bit-parity,
  * not just speed. */
object DescribeKnobStress {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "args: sfDir [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.api.syntax._
    val orders = graft.core.Tables.orders(spark, dir)
    println(s"[describe] corpus $dir n=${orders.count()}")
    val approx = {
      val v = col("o_totalprice")
      val d2 = v.cast("decimal(18,2)")
      orders.agg(
        count(lit(1)).as("cnt"),
        sum(d2).cast("double").as("s"),
        sum((d2 * d2).cast("decimal(38,4)")).cast("double").as("q"),
        min(v).as("min_v"),
        round(expr("approx_percentile(o_totalprice, 0.25, 10000)"), 4).as("p25"),
        round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 4).as("p50"),
        round(expr("approx_percentile(o_totalprice, 0.75, 10000)"), 4).as("p75"),
        max(v).as("max_v"))
    }
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "exact_percentile" -> (() => orders.describeCol("o_totalprice")),
      "grid_device" -> (() => orders.describeColGrid("o_totalprice")),
      "approx_percentile" -> (() => approx))
    for ((label, mk) <- variants) {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[describe] $label min=${ts.min}%.2f max=${ts.max}%.2f")
    }
    val exact = variants(0)._2().collect().map(_.toString).toSeq
    val grid = variants(1)._2().collect().map(_.toString).toSeq
    println(s"[describe] exact == grid: ${exact == grid}")
    spark.stop()
  }
}
