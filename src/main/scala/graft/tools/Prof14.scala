package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for round-14 headroom work — NOT part of the API. */
object Prof14 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    t("esd run 1") {
      graft.ops.Registry.queries("ts_esd_outliers")(spark, sfDir).count()
    }
    t("esd run 2") {
      graft.ops.Registry.queries("ts_esd_outliers")(spark, sfDir).count()
    }
    t("esd run 3") {
      graft.ops.Registry.queries("ts_esd_outliers")(spark, sfDir).count()
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val k = 10
    println(s"PROF docs partitions: ${docs.rdd.getNumPartitions}")
    // raw kgp pipeline (no DiskMemo)
    val kgp = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"), expr("transform(ws, _w -> xxhash64(_w))").as("hs"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(hs) - ${k - 1}), i -> xxhash64(slice(hs, i, $k)))"))
        .as(Seq("i0", "x")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("x"))
    t("kgp count (no write)") { kgp.count() }
    t("kgp count again") { kgp.count() }
    val kgp32 = docs.repartition(32)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"), expr("transform(ws, _w -> xxhash64(_w))").as("hs"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(hs) - ${k - 1}), i -> xxhash64(slice(hs, i, $k)))"))
        .as(Seq("i0", "x")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("x"))
    t("kgp32 count") { kgp32.count() }
    t("kgp32 count again") { kgp32.count() }
    t("kgp write parquet") { kgp32.write.mode("overwrite").parquet("/tmp/prof14_kgp") }
    val kgpR = spark.read.parquet("/tmp/prof14_kgp")
    val kg = kgpR.select("doc_id", "x").distinct()
    t("kg distinct write") { kg.write.mode("overwrite").parquet("/tmp/prof14_kg") }
    t("kg distinct write again") { kg.write.mode("overwrite").parquet("/tmp/prof14_kg2") }
    val kgR = spark.read.parquet("/tmp/prof14_kg")
    t("pair mining") {
      kgR.groupBy("x").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, 50))
        .select(expr(
          """explode(flatten(transform(sequence(1, size(ds) - 1),
            |  i -> transform(slice(ds, i + 1, size(ds) - i),
            |       y -> struct(element_at(ds, i) AS a, y AS b)))))""".stripMargin).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n_shared_spans"))
        .orderBy("a", "b").count()
    }
    // now the DiskMemo'd full query, fresh session state
    t("substringDupsOf via DiskMemo") {
      graft.ops.CurationOps.substringDupsOf(docs, "doc_id", "text", 10, 50)
        .orderBy("a", "b").count()
    }
    t("substringDupsOf 2nd call") {
      graft.ops.CurationOps.substringDupsOf(docs, "doc_id", "text", 10, 50)
        .orderBy("a", "b").count()
    }
    spark.stop()
  }
}
