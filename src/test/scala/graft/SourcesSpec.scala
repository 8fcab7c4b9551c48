package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.A capability tier: sources/sinks beyond the declared parquet
  * scans — partitioned (TSDB-layout) writes with partition pruning on
  * read, and CSV/JSON round-trips with schema inference. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("time-partitioned write + partition-pruned read (the TSDB storage layout)") {
    val dir = Files.createTempDirectory("graft_part").toString
    val ev = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)

    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    // the day predicate must prune partitions at planning, not filter rows
    assert(plan.contains("PartitionFilters") && plan.contains("isnotnull(day"), plan)
    val expected = ev.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(read.count() == expected && expected > 0)
  }

  test("CSV round-trip with header + schema inference") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val region = graft.core.Tables.region(spark, TestSpark.sfSmoke)
    region.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.columns.toSeq == region.columns.toSeq)
    assert(back.count() == region.count())
  }

  test("ORC round-trip preserves values (columnar alternative to parquet)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = graft.core.Tables.nation(spark, TestSpark.sfSmoke)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      src.collect().map(_.toString).sorted.toSeq)
  }

  test("JSON round-trip preserves values") {
    val dir = Files.createTempDirectory("graft_json").toString
    val nation = graft.core.Tables.nation(spark, TestSpark.sfSmoke)
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    val a = nation.select("n_nationkey", "n_name").collect().map(_.toString).sorted
    val b = back.select("n_nationkey", "n_name").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }
}
