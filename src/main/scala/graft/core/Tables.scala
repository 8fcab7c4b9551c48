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

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
