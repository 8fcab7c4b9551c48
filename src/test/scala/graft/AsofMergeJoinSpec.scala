package graft

import graft.ts.{AsofJoin, AsofMergeJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The physical merge path must produce exactly the rows of the
  * union-and-window path (which is itself DuckDB-oracle-verified via
  * the declared join_asof_by query). */
class AsofMergeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def purchases = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts", "value")

  private def clicks = graft.core.Tables.events(spark, TestSpark.sfSmoke)
    .filter(col("event_type") === "click")
    .select(col("user_id"), col("ts"), col("value").as("click_value"))

  test("merge as-of equals the union-and-window as-of on events") {
    val a = AsofMergeJoin.backward(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted
    val b = AsofJoin.backward(purchases, clicks,
        on = "ts", by = Seq("user_id"), payload = Seq("click_value"))
      .select("event_id", "matched_ts", "click_value")
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("mismatched by-key dtypes are rejected, not silently mis-joined") {
    import spark.implicits._
    val probe = Seq((1L, 5, 100L)).toDF("id", "k", "us") // k: int
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val build = Seq((5L, 50L, 1.0)).toDF("k", "us", "v") // k: bigint
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val e = intercept[IllegalArgumentException] {
      AsofMergeJoin.backward(probe, build, "ts", Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("dtype mismatch"))
    // cast to a common type → joins correctly
    val ok = AsofMergeJoin.backward(
        probe.withColumn("k", col("k").cast("bigint")), build,
        "ts", Seq("k"), Seq("v"))
      .select("id", "v").head()
    assert(ok.getLong(0) == 1L && ok.getDouble(1) == 1.0)
  }

  test("unsupported by-key types are rejected") {
    import spark.implicits._
    val probe = Seq((1L, 2.5, 100L)).toDF("id", "k", "us") // k: double
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val build = Seq((2.5, 50L, 1.0)).toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val e = intercept[IllegalArgumentException] {
      AsofMergeJoin.backward(probe, build, "ts", Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("unsupported key type"))
  }

  test("merge as-of on randomized data equals brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val probe = (1L to 200L).map(i => (i, (i % 5) + 1, rnd.nextInt(100000).toLong))
      .toDF("id", "k", "us")
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val buildRows = (1 to 120).map(_ =>
      ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(100000).toLong, rnd.nextDouble()))
    val build = buildRows.toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val got = AsofMergeJoin.backward(probe, build, "ts", Seq("k"), Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val probeLocal = (1L to 200L).map(i => (i, (i % 5) + 1, (probe.filter(col("id") === i)
      .select(unix_micros(col("ts"))).head().getLong(0))))
    // brute force: latest build (k, ts<=pts); ties on ts take last-seen
    val expected = probeLocal.map { case (id, k, pts) =>
      val cand = buildRows.filter(b => b._1 == k && b._2 <= pts)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(b => (b._2, b._3))._3))
    }.toMap
    // ties in (k, ts) between distinct build rows: none (continuous us)
    assert(got == expected)
  }
}
