package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the round-10 headline bug: the testdata
  * generator has shipped `events.ts` as BOTH int64 ns-since-epoch
  * (rounds ≤ 9) and parquet timestamp[us] (the current era), and a
  * loader hard-coded for either era breaks every events query at
  * analysis time when the driver regenerates. `Tables.loadEvents`
  * must therefore normalize BOTH physical encodings of the same
  * instants to identical TimestampType values.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // one instant set, µs precision (ns-era values truncate to exactly
  // these), spelled as µs-since-epoch
  private val micros = Seq(
    1704067200000000L,          // 2024-01-01 00:00:00
    1704067200778549L,          // … 00:00:00.778549
    1706655985123456L)          // 2024-01-30 23:06:25.123456

  private def writeEra(dir: String, ns: Boolean): Unit = {
    import spark.implicits._
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, "click", 1.0 + i, "{\"k\": 1}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs =
      if (ns) base.withColumn("ts", col("us") * 1000L) // int64 ns column
      else base.withColumn("ts", timestamp_micros(col("us")))
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("ns-era (int64) and µs-era (timestamp) events load to identical instants") {
    val nsDir = java.nio.file.Files.createTempDirectory("graft_ns_era").toString
    val usDir = java.nio.file.Files.createTempDirectory("graft_us_era").toString
    writeEra(nsDir, ns = true)
    writeEra(usDir, ns = false)

    // raw physical schemas differ by construction
    assert(graft.core.Tables.eventsRaw(spark, nsDir).schema("ts").dataType == LongType)

    val fromNs = graft.core.Tables.events(spark, nsDir)
    val fromUs = graft.core.Tables.events(spark, usDir)
    assert(fromNs.schema("ts").dataType == TimestampType)
    assert(fromUs.schema("ts").dataType == TimestampType)

    def instants(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(_.getLong(1)).toSeq
    assert(instants(fromNs) == micros)
    assert(instants(fromUs) == micros)
  }

  test("an unsupported ts dtype fails loudly, not at first query") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bad_era").toString
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      graft.core.Tables.events(spark, dir)
    }
    assert(e.getMessage.contains("events.ts"))
  }
}
