package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Capability-tier coverage with no portable DuckDB oracle:
  *  - MapType surface (from_json → map, keys/values/lookup) — DuckDB's
  *    MAP is awkward in portable SQL (SURVEY §2.I capability row);
  *  - skewness/kurtosis — Spark uses population moments, pandas uses
  *    bias-corrected G1/G2, so cross-engine hashing is impossible
  *    (SURVEY §2.D); asserted against hand-computed values instead. */
class MapAndStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("from_json to MapType: keys, values, lookup") {
    val df = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .limit(100)
      .select(col("event_id"), col("props"),
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
    val rows = df.select(col("event_id"),
      map_keys(col("m")).as("ks"),
      element_at(col("m"), "k").as("k_val"),
      get_json_object(col("props"), "$.k").cast("bigint").as("k_ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == Seq("k"))
      assert(r.getLong(2) == r.getLong(3)) // map lookup == json path
    }
  }

  test("skewness/kurtosis match hand-computed population moments") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 2.0, 3.0, 9.0)
    val df = xs.toDF("x")
    val (sk, ku) = df.agg(skewness(col("x")), kurtosis(col("x")))
      .as[(Double, Double)].head()
    val n = xs.size
    val mean = xs.sum / n
    val m2 = xs.map(v => math.pow(v - mean, 2)).sum / n
    val m3 = xs.map(v => math.pow(v - mean, 3)).sum / n
    val m4 = xs.map(v => math.pow(v - mean, 4)).sum / n
    assert(math.abs(sk - m3 / math.pow(m2, 1.5)) < 1e-9)
    assert(math.abs(ku - (m4 / (m2 * m2) - 3.0)) < 1e-9) // excess kurtosis
  }

  test("describe() composes from declared aggregates") {
    val d = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
      .select("l_quantity").describe()
    assert(d.count() == 5) // count/mean/stddev/min/max
  }
}
