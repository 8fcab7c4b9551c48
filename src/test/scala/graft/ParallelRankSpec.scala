package graft

import graft.core.ParallelRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-16 scale device for tie-averaged ranking: the bucketed
  * grid must reproduce the serial rank-window spelling EXACTLY —
  * doubled average ranks are exact integers, so equality is bitwise.
  * (The declared agg_spearman keeps the window spelling — measured
  * faster at bench scale; ParallelRank is the group-count-independent
  * path, crossover receipts in BASELINE round-16.) */
class ParallelRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("grid doubled ranks equal the serial window spelling on real data") {
    val base = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("bigint").as("v"))
    val byV = Window.partitionBy("g").orderBy("v")
    val cV = Window.partitionBy("g", "v")
    val viaWindow = base
      .select(col("g"), col("v"),
        (rank().over(byV).cast("bigint") * 2 + count(lit(1)).over(cV) - 1).as("r"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"), max(col("r")).as("r"),
        min(col("r")).as("rmin"))
    val viaGrid = ParallelRank.doubledAvgRankGrid(base, Seq("g"), "v", "r")
    val w = viaWindow.collect().map(x =>
      (x.getString(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    val g = viaGrid.collect().map(x =>
      (x.getAs[String]("g"), x.getAs[Long]("v")) ->
        (x.getAs[Long]("_c"), x.getAs[Long]("r"))).toMap
    assert(w.keySet == g.keySet)
    w.foreach { case (k, (c, r, rmin)) =>
      assert(r == rmin, s"window ranks disagree inside tie group $k") // sanity
      assert(g(k) == ((c, r)), s"$k: grid ${g(k)} != window ($c, $r)")
    }
  }

  test("few buckets, many buckets, and one bucket all agree") {
    val base = graft.core.Tables.events(spark, TestSpark.sfSmoke)
      .select(col("event_type").as("g"), P.cents(col("value")).as("v"))
    def ranks(n: Int) = ParallelRank.doubledAvgRankGrid(base, Seq("g"), "v", "r", n)
      .collect().map(x => (x.getAs[String]("g"), x.getAs[Long]("v")) -> x.getAs[Long]("r")).toMap
    val one = ranks(1)
    assert(one == ranks(7) && one == ranks(64))
  }

  test("a null group key is a real group, exactly like the serial window") {
    // round-16 review: the equi-join back to bucket totals would drop
    // the null group (null != null); the null-safe join keeps it
    import spark.implicits._
    val df = Seq((Some("a"), 1L), (Some("a"), 2L), (None, 5L), (None, 5L), (None, 9L))
      .toDF("g", "v")
    val got = ParallelRank.doubledAvgRankGrid(df, Seq("g"), "v", "r")
      .collect().map(x => (Option(x.getAs[String]("g")), x.getAs[Long]("v")) ->
        (x.getAs[Long]("_c"), x.getAs[Long]("r"))).toMap
    // null group: values 5,5,9 → doubled avg ranks: 5→(1+2)/2·2=3, 9→6
    assert(got((None, 5L)) == ((2L, 3L)) && got((None, 9L)) == ((1L, 6L)))
    assert(got((Some("a"), 1L)) == ((1L, 2L)) && got((Some("a"), 2L)) == ((1L, 4L)))
  }

  test("empty input yields an empty grid, no throw") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    assert(ParallelRank.doubledAvgRankGrid(empty, Seq("g"), "v", "r").count() == 0L)
  }

  test("a string valueCol is rejected up front (ADVICE round 16)") {
    // double-cast bucketing is only monotone for numeric/temporal
    // types; '10' vs '9' would bucket numerically but rank
    // lexicographically within buckets — silent divergence
    import spark.implicits._
    val df = Seq(("a", "10"), ("a", "9")).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      ParallelRank.doubledAvgRankGrid(df, Seq("g"), "v", "r")
    }
    assert(e.getMessage.contains("numeric or temporal"))
  }

  test("fromCounts over a pre-aggregated grid equals the raw-frame form") {
    val base = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("bigint").as("v"))
    val counts = base.groupBy("g", "v").agg(count(lit(1)).as("n"))
    val direct = ParallelRank.doubledAvgRankGrid(base, Seq("g"), "v", "r")
      .collect().map(x => (x.getAs[String]("g"), x.getAs[Long]("v")) ->
        (x.getAs[Long]("_c"), x.getAs[Long]("r"))).toMap
    val viaCounts = ParallelRank.fromCounts(counts, Seq("g"), "v", "n", "r")
    assert(!viaCounts.columns.contains("n")) // caller's count col dropped
    val got = viaCounts.collect().map(x => (x.getAs[String]("g"), x.getAs[Long]("v")) ->
      (x.getAs[Long]("_c"), x.getAs[Long]("r"))).toMap
    assert(got == direct)
  }

  private object P {
    def cents(c: org.apache.spark.sql.Column) =
      (c.cast("decimal(18,2)") * 100).cast("bigint")
  }
}
