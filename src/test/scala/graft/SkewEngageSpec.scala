package graft

import graft.core.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew mitigation must actually ENGAGE on a hot key, not just agree
  * with the plain plan on uniform data (which SkewSpec already pins).
  * Fixture: one key owns 50% of the rows of a 100k-row frame.
  *
  *  - AQE skew-join split: with test-scaled thresholds, the executed
  *    plan's SortMergeJoin must carry the `isSkewJoin` flag after AQE
  *    re-plans — the same mechanism that splits a hot 100 TB partition
  *    across extra reducers.
  *  - saltedJoin: the hot key's rows must genuinely fan out over >1
  *    salt bucket AND the join must equal the plain join.
  *
  * Runs in a `newSession()` clone (own SQLConf) so the AQE/broadcast
  * conf overrides can't leak into concurrently running suites.
  */
class SkewEngageSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    // force SMJ + make the skew detector fire at test scale
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  /** 100k rows; key 0 holds 50%, the rest uniform over 1..1000.
    * A fat payload column gives the skewed partition real bytes. */
  private lazy val hot = {
    import spark.implicits._
    spark.range(100000)
      .select(
        when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(1000L)) + 1).as("k"),
        col("id").as("row_id"),
        concat(lit("p"), lpad(col("id").cast("string"), 200, "x")).as("payload"))
  }

  private lazy val dim = {
    import spark.implicits._
    spark.range(1001).select(col("id").as("k"), (col("id") * 10).as("dim_val"))
  }

  test("AQE splits the skewed join partition (isSkewJoin in executed plan)") {
    val joined = hot.join(dim, Seq("k")).select("k", "row_id", "payload", "dim_val")
    // correctness first: every row matched exactly once
    assert(joined.count() == 100000L)
    // then the mechanism: AQE must have marked the SMJ as skew-handled.
    // (A bare join, not join+agg: the skewed partition must carry the
    // fat payload through the shuffle for the byte threshold to see it.)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isSkewJoin=true") || plan.contains("skew=true"),
      s"no skew-split in executed plan:\n${plan.take(3000)}")
  }

  test("saltedJoin fans the hot key over >1 salt bucket and matches plain join") {
    val big = hot.select("k", "row_id")
    val small = dim
    // engagement: hot key 0 must occupy >1 of the 16 salt buckets
    val saltSpread = big
      .withColumn("_salt", pmod(hash(col("row_id")), lit(16)))
      .filter(col("k") === 0)
      .select("_salt").distinct().count()
    assert(saltSpread > 8, s"hot key only hit $saltSpread/16 salt buckets")

    val salted = Skew.saltedJoin(big, small, "k", "row_id")
      .agg(sum("dim_val").cast("long").as("s"), count(lit(1)).as("n")).collect()(0)
    val plain = big.join(small, Seq("k"))
      .agg(sum("dim_val").cast("long").as("s"), count(lit(1)).as("n")).collect()(0)
    assert(salted.getLong(0) == plain.getLong(0) && salted.getLong(1) == plain.getLong(1))
    assert(plain.getLong(1) == 100000L)
  }

  test("saltedAgg splits the hot key pre-merge and matches plain agg") {
    val partialsForHotKey = hot
      .withColumn("_salt", pmod(hash(col("row_id")), lit(16)))
      .filter(col("k") === 0)
      .groupBy("_salt").count().count()
    assert(partialsForHotKey > 8, s"hot key split into only $partialsForHotKey partials")

    val salted = Skew.saltedAgg(hot.withColumn("v", col("row_id").cast("double")),
        "k", "v", "row_id")
      .agg(sum("sum_value").as("s"), sum("n").as("n")).collect()(0)
    assert(salted.getLong(1) == 100000L)
  }
}
