package graft

import graft.core.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting must change the shuffle layout, never the answer. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedAgg equals plain aggregation") {
    val li = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
    val salted = Skew.saltedAgg(li, "l_returnflag", "l_quantity", "l_orderkey")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedAgg spreads a key across salt partitions pre-merge") {
    val li = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
    val partials = li
      .withColumn("_salt", pmod(hash(col("l_orderkey")), lit(16)))
      .groupBy("l_returnflag", "_salt").count()
      .groupBy("l_returnflag").count()
      .collect().map(_.getLong(1))
    assert(partials.forall(_ > 1)) // each key genuinely split
  }

  test("saltedJoin equals plain inner join") {
    val li = graft.core.Tables.lineitem(spark, TestSpark.sfSmoke)
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    val part = graft.core.Tables.part(spark, TestSpark.sfSmoke)
      .select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val salted = Skew.saltedJoin(li, part, "l_partkey", "l_orderkey")
      .select("l_orderkey", "l_linenumber", "p_brand")
      .collect().map(_.toString).sorted
    val plain = li.join(part, Seq("l_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq && salted.nonEmpty)
  }
}
