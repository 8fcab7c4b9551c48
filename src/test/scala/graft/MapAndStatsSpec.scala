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

  test("win_rolling_kurt matches hand-computed excess kurtosis; min_periods guard") {
    val out = graft.ops.Registry.queries("win_rolling_kurt")(spark, TestSpark.sfSmoke)
      .collect()
    // source frame in the same (user, event_id) order the window sees
    val src = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") < 10)
      .select("event_id", "user_id", "value")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.sortBy(_._2).map(_._3) }
    val byKey = out.map(r => (r.getLong(1), r.getLong(0)) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val ids = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .filter(col("user_id") < 10).select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).sorted }
    var checked = 0
    ids.foreach { case (u, eids) =>
      val vals = src(u)
      eids.zipWithIndex.foreach { case (eid, i) =>
        val got = byKey((u, eid))
        if (i < 4) assert(got.isEmpty, s"user $u row $i should be null (min_periods)")
        else {
          val w = vals.slice(i - 4, i + 1)
          val mean = w.sum / 5
          val m2 = w.map(v => math.pow(v - mean, 2)).sum / 5
          val m4 = w.map(v => math.pow(v - mean, 4)).sum / 5
          val want = m4 / (m2 * m2) - 3.0
          assert(math.abs(got.get - want) < 1e-3,
            s"user $u eid $eid: got ${got.get}, want $want")
          checked += 1
        }
      }
    }
    assert(checked > 50)
  }

  test("describe() composes from declared aggregates") {
    val d = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
      .select("l_quantity").describe()
    assert(d.count() == 5) // count/mean/stddev/min/max
  }
}
