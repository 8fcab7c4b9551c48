package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-stress harness: times a subset of declared Registry queries
  * against two (or more) SF dirs in ONE JVM, so the 10x growth factor
  * is measured free of JVM/codegen warmup noise (the round-8 verdict's
  * BENCH_r08 lesson: cold sub-second entries inflate ~2x).
  *
  * Usage:
  *   runMain graft.tools.ScaleStress <dirA> <dirB> <key1,key2,...> [reps]
  *
  * Per (dir, key): `reps` timed runs driving the query's own optimized
  * plan via `queryExecution.toRdd.count()` (NOT df.count(), which
  * re-optimizes with zero required columns and prunes every
  * projection-only Window out of the measured plan — Bench.scala's
  * round-16 honesty fix, same device here),
  * reporting min (steady-state cost — what a warm 1000-executor cluster
  * sees) and max (includes any per-plan codegen compile). One JSON line
  * per dir at the end, BENCH-style, plus a growth table across dirs.
  * Evidence consumer: BASELINE.md "sf1 scale-stress" section.
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "args: dirA dirB key1,key2,... [reps]")
    val dirs = Seq(args(0), args(1))
    val keys = args(2).split(",").toSeq
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ops = keys.map(k => graft.ops.Registry.all.find(_.key == k)
      .getOrElse(sys.error(s"unknown key $k")))

    // warmup: touch both dirs once so IO caches + codegen are even
    dirs.foreach(d => spark.read.parquet(s"$d/documents.parquet").count())

    // per-key try/catch (round 17): the stress fixtures ship only the
    // six driver-profile tables (no part/supplier/region/nation), so a
    // key over a missing table must SKIP, not kill the whole sweep
    val res = scala.collection.mutable.Map[(String, String), Seq[Double]]()
    for (d <- dirs; op <- ops) {
      try {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          op.build(spark, d).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        res((d, op.key)) = ts
        println(f"[stress] $d ${op.key} min=${ts.min}%.2f max=${ts.max}%.2f")
      } catch { case scala.util.control.NonFatal(e) =>
        // NonFatal only: an OOM/JVM error must kill the sweep — a
        // partially-broken JVM would skew every later measurement
        println(s"[stress] $d ${op.key} SKIP ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    for (d <- dirs) {
      val qs = ops.flatMap(op => res.get((d, op.key))
          .map(ts => s""""${op.key}":${ts.min}"""))
        .mkString("{", ",", "}")
      println(s"""{"metric":"stress","dir":"$d","reps":$reps,"min_sec":$qs}""")
    }
    println("key".padTo(28, ' ') + "   A_min    B_min     B/A")
    ops.foreach { op =>
      (res.get((dirs(0), op.key)), res.get((dirs(1), op.key))) match {
        case (Some(as), Some(bs)) =>
          val (a, b) = (as.min, bs.min)
          println(f"${op.key}%-28s $a%8.2f $b%8.2f ${b / a}%7.2f")
        case _ => println(f"${op.key}%-28s    (skipped)")
      }
    }
    spark.stop()
  }
}
