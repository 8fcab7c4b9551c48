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

  test("a DATE valueCol ranks via unix_date, equal to the serial window") {
    // round-17 review: DATE does not CAST to double on this Spark, so
    // the bucketing key must ride unix_date — and the guard must not
    // advertise types the key cannot handle (NTZ/intervals rejected)
    import spark.implicits._
    val df = Seq(("a", "2024-01-05"), ("a", "2023-12-31"), ("a", "2024-01-05"),
        ("b", "2024-02-01"), ("a", "2024-03-01"))
      .toDF("g", "vs").select(col("g"), col("vs").cast("date").as("v"))
    val byV = Window.partitionBy("g").orderBy("v")
    val cV = Window.partitionBy("g", "v")
    val want = df.select(col("g"), col("v"),
        (rank().over(byV).cast("bigint") * 2 + count(lit(1)).over(cV) - 1).as("r"))
      .distinct().collect()
      .map(x => (x.getString(0), x.getDate(1).toString) -> x.getLong(2)).toMap
    val got = ParallelRank.doubledAvgRankGrid(df, Seq("g"), "v", "r")
      .collect()
      .map(x => (x.getAs[String]("g"), x.getAs[java.sql.Date]("v").toString) ->
        x.getAs[Long]("r")).toMap
    assert(got == want)
    val ntz = df.select(col("g"), col("v").cast("timestamp_ntz").as("v"))
    assert(intercept[IllegalArgumentException] {
      ParallelRank.doubledAvgRankGrid(ntz, Seq("g"), "v", "r")
    }.getMessage.contains("numeric or temporal"))
  }

  test("fromCounts refuses a caller frame with a conflicting '_c' column") {
    // round-17 review: withColumn("_c", ...) would silently overwrite
    // unrelated caller data
    import spark.implicits._
    val counts = Seq(("a", 1L, 2L, 99L)).toDF("g", "v", "n", "_c")
    assert(intercept[IllegalArgumentException] {
      ParallelRank.fromCounts(counts, Seq("g"), "v", "n", "r")
    }.getMessage.contains("_c"))
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

  test("spearman grid composition keeps null groups and values (round-17 review)") {
    // an equi-join back to the rank grids would silently drop rows the
    // window spelling ranks; the composition must agree on a frame
    // that actually carries nulls
    import spark.implicits._
    val fact = Seq(
      (Option("x"), Option(1L), Option(BigDecimal("10.00"))),
      (Option("x"), Option(2L), Option(BigDecimal("11.00"))),
      (Option("x"), Option(3L), Option(BigDecimal("9.00"))),
      (Option("x"), Option(3L), Option(BigDecimal("12.00"))),
      (None, Option(1L), Option(BigDecimal("5.00"))),
      (None, Option(2L), Option(BigDecimal("6.00"))),
      (None, Option(4L), Option(BigDecimal("7.00"))),
      (Option("y"), None, Option(BigDecimal("3.00"))),
      (Option("y"), Option(1L), None),
      (Option("y"), Option(2L), Option(BigDecimal("4.00"))),
      (Option("y"), Option(5L), Option(BigDecimal("2.00"))))
      .toDF("l_returnflag", "q", "pd")
      .select(col("l_returnflag"), col("q"),
        col("pd").cast("decimal(18,2)").as("p"))
    val grid = graft.ops.Aggs.spearmanGridOf(fact)
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), Option(r.get(2)).map(_.toString))).toMap
    // the serial window spelling, verbatim from agg_spearman
    val byQ = Window.partitionBy("l_returnflag").orderBy("q")
    val byP = Window.partitionBy("l_returnflag").orderBy("p")
    val cq = Window.partitionBy("l_returnflag", "q")
    val cp = Window.partitionBy("l_returnflag", "p")
    val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
    val want = fact
      .select(col("l_returnflag"),
        (rank().over(byQ).cast("bigint") * 2 + count(lit(1)).over(cq) - 1).as("ax"),
        (rank().over(byP).cast("bigint") * 2 + count(lit(1)).over(cp) - 1).as("bx"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("ax")).as("sa"), sum(col("bx")).as("sb"),
        sum(d19(col("ax")) * d19(col("ax"))).as("saa"),
        sum(d19(col("bx")) * d19(col("bx"))).as("sbb"),
        sum(d19(col("ax")) * d19(col("bx"))).as("sab"))
      .select(col("l_returnflag"), col("n"),
        round((col("n").cast("double") * col("sab").cast("double") -
          col("sa").cast("double") * col("sb").cast("double")) /
          sqrt((col("n").cast("double") * col("saa").cast("double") -
            col("sa").cast("double") * col("sa").cast("double")) *
            (col("n").cast("double") * col("sbb").cast("double") -
              col("sb").cast("double") * col("sb").cast("double"))), 4)
          .as("spearman_rho"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), Option(r.get(2)).map(_.toString))).toMap
    assert(grid.keySet == want.keySet) // null group survives
    assert(grid == want)
    assert(grid.contains(None) && grid(None)._1 == 3L)
  }

  test("round-18 grid twins are row-for-row equal to their window spellings") {
    // the census-driven twins (agg_trimmed_mean_grid /
    // agg_lorenz_curve_grid) gate against the SAME oracle text as
    // their window forms — this pins the unit-level claim directly:
    // identical row multisets on real data (sorted-Seq compare, not
    // Set — multiplicity matters)
    for ((win, grid) <- Seq(
        "agg_trimmed_mean" -> "agg_trimmed_mean_grid",
        "agg_lorenz_curve" -> "agg_lorenz_curve_grid",
        "agg_gini" -> "agg_gini_grid")) {
      val a = ops.Registry.queries(win)(spark, TestSpark.sfSmoke)
        .collect().map(_.toString).toSeq.sorted
      val b = ops.Registry.queries(grid)(spark, TestSpark.sfSmoke)
        .collect().map(_.toString).toSeq.sorted
      assert(a == b, s"$grid diverges from $win")
    }
  }

  test("describeColGrid is bit-identical to describeCol (exact percentile interpolation)") {
    import graft.api.syntax._
    val orders = graft.core.Tables.orders(spark, TestSpark.sfSmoke)
    val a = orders.describeCol("o_totalprice").collect().map(_.toString).toSeq
    val b = orders.describeColGrid("o_totalprice").collect().map(_.toString).toSeq
    assert(a == b)
    // n = 2 edge: h = p·1 is fractional for every p — both order
    // statistics of each interpolation live on distinct rows (n = 1 is
    // untestable: std_v's (n−1) divisor is an ANSI 0/0 in BOTH
    // spellings, identically)
    val two = orders.orderBy("o_orderkey").limit(2)
    assert(two.describeColGrid("o_totalprice").collect().map(_.toString).toSeq
      == two.describeCol("o_totalprice").collect().map(_.toString).toSeq)
    // empty edge: no throw, cnt = 0 both sides
    val empty = orders.filter(col("o_orderkey") < 0)
    val ge = empty.describeColGrid("o_totalprice").collect()
    val we = empty.describeCol("o_totalprice").collect()
    assert(ge.length == 1 && we.length == 1)
    assert(ge.head.getLong(0) == 0L && we.head.getLong(0) == 0L)
  }

  private object P {
    def cents(c: org.apache.spark.sql.Column) =
      (c.cast("decimal(18,2)") * 100).cast("bigint")
  }
}
