package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole suite (sessions are ~5 s to start;
  * per-spec sessions would dominate `sbt test`). Mirrors the driver's
  * Verify config. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions) // mirror Verify/Bench
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfSmoke = "/root/testdata/sf0.001"
}
