package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: construct the same declared-key frame N times and report
  * whether DiskMemo resolves each construction to ONE artifact path
  * (memo hit) or mints new digests (key instability — every consumer
  * would silently rebuild). Round-17 probe for the grid-fed BPE chain;
  * generic over any key. */
object MemoProbe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("text_token_count_bpe")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val op = graft.ops.Registry.all.find(_.key == key).getOrElse(sys.error(key))
    val memoRoot = new java.io.File(sys.props("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_diskmemo_"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = op.build(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      println(f"[probe] rep$i%d build=${(t1 - t0) / 1e9}%.2f s exec=${(t2 - t1) / 1e9}%.2f s")
      val dt = (t2 - t0) / 1e9
      val dirs = new java.io.File(sys.props("java.io.tmpdir")).listFiles()
        .filter(_.getName.startsWith("graft_diskmemo_"))
        .flatMap(d => Option(d.listFiles).getOrElse(Array.empty))
        .map(_.getName).sorted
      println(f"[probe] rep$i%d $dt%.2f s, artifacts=${dirs.length}%d: ${dirs.mkString(",")}")
    }
    memoRoot.foreach(_ => ())
    spark.stop()
  }
}
