package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape census over the declared registry (round-16 verdict
  * item 5's measuring tool): per key, the executed plan's Exchange
  * count, Window count, and whether any window is UNPARTITIONED
  * (single-partition WindowExec — the shape that serializes at scale;
  * windowspecdefinition whose spec starts with an ordering instead of
  * partition columns). Run on the smoke corpus:
  *
  *   runMain graft.tools.PlanAudit [key1,key2,...]   (default: all)
  *
  * Output: one `[audit]` line per key + a summary of unpartitioned-
  * window offenders. Evidence consumer: PlanShapeSpec budgets.
  */
object PlanAudit {
  /** True iff any window spec in `plan` has NO partition columns: the
    * spec text is `windowspecdefinition(part..., order..., frame)`, so
    * unpartitioned means the FIRST argument is already an ordering
    * (" ASC"/" DESC") or — for by-less NO-ORDER windows like a global
    * unbounded frame — the frame spec itself (round-16 review: the
    * original ordering-only probe missed that class). */
  private[graft] def unpartitionedWindow(plan: String): Boolean =
    "windowspecdefinition\\(([^)]*)\\)".r.findAllMatchIn(plan).exists { m =>
      val firstArg = m.group(1).split(",").headOption.getOrElse("").trim
      firstArg.contains(" ASC") || firstArg.contains(" DESC") ||
        firstArg.startsWith("specifiedwindowframe")
    }

  /** SHUFFLE exchanges only — "Exchange " as a bare word also matches
    * inside BroadcastExchange/ReusedExchange, which move no shuffle
    * data (round-16 review; PlanShapeSpec budgets use this counter). */
  private[graft] def shuffleExchanges(plan: String): Int =
    "(?<!Broadcast)(?<!Reused)Exchange ".r.findAllIn(plan).size

  def main(args: Array[String]): Unit = {
    val only = args.headOption.map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val offenders = Seq.newBuilder[String]
    graft.ops.Registry.all
      .filter(op => only.forall(_.contains(op.key)))
      .foreach { op =>
        try {
          val p = op.build(spark, sfDir).queryExecution.executedPlan.toString
          val ex = shuffleExchanges(p)
          val win = "Window ".r.findAllIn(p).size
          val unpart = unpartitionedWindow(p)
          if (unpart) offenders += op.key
          println(s"[audit] ${op.key} exchanges=$ex windows=$win unpartitioned_window=$unpart")
        } catch { case e: Throwable =>
          println(s"[audit] ${op.key} ERROR ${e.getMessage}")
        }
      }
    println(s"[audit] unpartitioned-window keys: ${offenders.result().mkString(",")}")
    spark.stop()
  }
}
