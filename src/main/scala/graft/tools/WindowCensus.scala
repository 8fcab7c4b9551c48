package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Project, Window => LWindow}

/** Window-PARALLELISM census over the declared registry (round-18
  * verdict item 6). The filter_top_percent and agg_spearman diseases —
  * a window partitioned solely by a 3-value key, so three sort tasks
  * no matter the cluster — were found one at a time by the 100×
  * sweep; this tool finds the whole class mechanically: for EVERY
  * logical Window node in every declared plan, it counts the DISTINCT
  * partition-key values against the corpus and flags windows whose
  * key cardinality is below the shuffle parallelism (the number of
  * sort tasks a cluster could otherwise run). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     runMain graft.tools.WindowCensus [key1,key2,...]   (default: all)
  *
  * Output: one `[census]` line per (key, window) + a LOW summary.
  * A LOW flag is a lead, not a verdict: a low-cardinality window over
  * a tiny frame (e.g. per-day rollup reports) is harmless; the 100×
  * sweep decides which LOW windows are real scale killers and only
  * those get grid twins (the ParallelRank device). Evidence consumer:
  * BASELINE.md "window-parallelism census". */
object WindowCensus {
  def main(args: Array[String]): Unit = {
    val only = args.headOption.map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val threshold = cpus.toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val low = Seq.newBuilder[(String, Int, Long, Long, String)]
    graft.ops.Registry.all
      .filter(op => only.forall(_.contains(op.key)))
      .foreach { op =>
        try {
          val plan = op.build(spark, sfDir).queryExecution.optimizedPlan
          val wins = plan.collect { case w: LWindow => w }
          wins.zipWithIndex.foreach { case (w, i) =>
            val keys = w.partitionSpec.map(_.sql).mkString(", ")
            // distinct partition-key count, evaluated over the window's
            // OWN child plan (post-filter, pre-window — exactly the
            // rows the sort tasks would split on)
            val card =
              if (w.partitionSpec.isEmpty) 1L
              else org.apache.spark.sql.graftshim.GraftShims.ofRows(session,
                Project(w.partitionSpec.zipWithIndex.map { case (e, j) =>
                  Alias(e, s"p$j")()
                }, w.child)).distinct().count()
            // the frame the window actually sorts: LOW over a
            // corpus-sized child is the disease; LOW over a tiny
            // grid/report frame is the device's own prefix window
            val rows = org.apache.spark.sql.graftshim.GraftShims
              .ofRows(session, w.child).count()
            val isLow = card < threshold
            if (isLow) low += ((op.key, i, card, rows, keys))
            println(s"[census] ${op.key} window=$i card=$card rows=$rows " +
              s"low=$isLow keys=[$keys]")
          }
          if (wins.isEmpty) println(s"[census] ${op.key} windows=0")
        } catch { case scala.util.control.NonFatal(e) =>
          println(s"[census] ${op.key} ERROR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
      }
    val hits = low.result()
    println(s"[census] LOW (< $threshold distinct keys at $sfDir): ${hits.size}")
    hits.foreach { case (k, i, c, r, keys) =>
      println(s"[census]   $k window=$i card=$c rows=$r keys=[$keys]")
    }
    spark.stop()
  }
}
