package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** core/Spread.wide — the narrow-scan correction: engages only when
  * the plan has fewer partitions than the cluster, never on streams. */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("wide() spreads a narrow scan to defaultParallelism") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
    val p = spark.sparkContext.defaultParallelism
    assume(docs.rdd.getNumPartitions < p) // one-row-group corpus
    val spread = graft.core.Spread.wide(docs)
    assert(spread.rdd.getNumPartitions == p)
    // row set unchanged
    assert(spread.count() == docs.count())
  }

  test("wide() leaves an already-wide frame untouched (no added shuffle)") {
    val p = spark.sparkContext.defaultParallelism
    val wideDf = spark.range(0, 1000, 1, p * 2).toDF("id")
    val out = graft.core.Spread.wide(wideDf)
    assert(out.rdd.getNumPartitions == p * 2)
    // the SAME plan — no Exchange appended
    assert(out.queryExecution.executedPlan.toString ==
      wideDf.queryExecution.executedPlan.toString)
  }

  test("wide() passes streaming frames through untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val sdf = ms.toDS().toDF("v")
    val out = graft.core.Spread.wide(sdf)
    assert(out.isStreaming && (out eq sdf))
  }

  test("the substring_pairs TVF digest pipeline is xxhash64, not sha") {
    // round-14 swap receipt: the digest is output-invariant (pairs
    // derive from grouping on it; oracles keep their own sha). The
    // DataFrame tier's artifact hides behind a DiskMemo parquet read,
    // so the inspectable twin is the TVF expansion.
    graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .createOrReplaceTempView("spread_spec_docs")
    val plan = spark.sql(
      "SELECT * FROM substring_pairs('spread_spec_docs', 'doc_id', 'text', 10, 50)")
      .queryExecution.analyzed.toString
    assert(plan.contains("xxhash64"), "xxhash64 missing from the TVF digest path")
    assert(!plan.toLowerCase.contains("sha2"), "sha2 left in the TVF digest path")
  }
}
