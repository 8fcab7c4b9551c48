package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Schema is inferred from the parquet footers — the engine, like the
  * reference (a pandas extension: dynamic per-column dtypes), never
  * hand-declares schemas (SURVEY §1.3).
  *
  * At 100 TB each of these would be a directory of many files,
  * time/key-partitioned; `spark.read.parquet(path)` is unchanged — the
  * scan parallelism and partition pruning come from the file layout,
  * not the reader call.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet timestamp[ns], which Spark 4 refuses outright
    * (PARQUET_TYPE_ILLEGAL). Read it as raw nanos and rebuild the column
    * at Spark's native µs precision. Integer `div` (not /1000 double
    * division) — a double mantissa can't hold ns-since-epoch exactly and
    * rounding could flip a µs. The oracle side must `cast(ts as
    * timestamp)` to truncate DuckDB's ns the same way (SURVEY §2.0.4).
    */
  /** events with `ts` still a raw LongType of ns-since-epoch. Predicates
    * against ns literals on this column DO push down to parquet row-group
    * stats (plain int64 compare) — the TSDB range-scan fast path. */
  def eventsRawNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame =
    eventsRawNanos(spark, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
