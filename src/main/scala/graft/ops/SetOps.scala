package graft.ops

import graft.core.{Tables => T}
import org.apache.spark.sql.functions._

/** §2.G set operations (pd.concat / drop_duplicates analogues).
  * Projected to key columns so outputs are slim and NULL-free; distinct
  * variants shuffle once on the full row — fine, that IS the operator.
  */
object SetOps {
  private def side(s: org.apache.spark.sql.SparkSession, d: String, lo: Int, hi: Int) =
    T.customer(s, d)
      .filter(col("c_nationkey") >= lo && col("c_nationkey") <= hi)
      .select("c_custkey", "c_nationkey")

  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "set_union_all",
      (s, d) =>
        side(s, d, 0, 9).unionByName(side(s, d, 5, 15))
          .orderBy("c_custkey", "c_nationkey"),
      Some("""SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9
             |UNION ALL
             |SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15
             |ORDER BY c_custkey, c_nationkey""".stripMargin),
    ),
    OpSpec(
      "set_union_distinct",
      (s, d) =>
        side(s, d, 0, 9).union(side(s, d, 5, 15)).distinct()
          .orderBy("c_custkey", "c_nationkey"),
      Some("""SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9
             |UNION
             |SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15
             |ORDER BY c_custkey, c_nationkey""".stripMargin),
    ),
    OpSpec(
      "set_intersect",
      (s, d) =>
        side(s, d, 0, 9).intersect(side(s, d, 5, 15))
          .orderBy("c_custkey", "c_nationkey"),
      Some("""SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9
             |INTERSECT
             |SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15
             |ORDER BY c_custkey, c_nationkey""".stripMargin),
    ),
    OpSpec(
      "set_except",
      (s, d) =>
        side(s, d, 0, 9).except(side(s, d, 5, 15))
          .orderBy("c_custkey", "c_nationkey"),
      Some("""SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9
             |EXCEPT
             |SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15
             |ORDER BY c_custkey, c_nationkey""".stripMargin),
    ),
    // Multiset variants (SQL ALL semantics): duplicates survive with
    // min-count / count-difference multiplicity. Same single shuffle on
    // the full row as the distinct forms. The union-all side doubles one
    // input so multiplicity > 1 is actually exercised.
    OpSpec(
      "set_intersect_all",
      (s, d) => {
        val a = side(s, d, 0, 9)
        val b = side(s, d, 5, 15)
        // both sides doubled → min-count = 2: the output proves ALL
        // (each overlap row twice), not just DISTINCT with extra steps
        a.unionByName(a).intersectAll(b.unionByName(b))
          .orderBy("c_custkey", "c_nationkey")
      },
      Some("""(SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9
             | UNION ALL
             | SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9)
             |INTERSECT ALL
             |(SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15
             | UNION ALL
             | SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15)
             |ORDER BY c_custkey, c_nationkey""".stripMargin),
    ),
    OpSpec(
      "set_except_all",
      (s, d) => {
        val a = side(s, d, 0, 9)
        a.unionByName(a).exceptAll(side(s, d, 5, 15))
          .orderBy("c_custkey", "c_nationkey")
      },
      Some("""(SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9
             | UNION ALL
             | SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9)
             |EXCEPT ALL
             |SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15
             |ORDER BY c_custkey, c_nationkey""".stripMargin),
    ),
    // pandas Index.symmetric_difference — (A∖B) ∪ (B∖A) with a side
    // tag. Two left-antis (each a broadcast/shuffled hash join on the
    // key, never materializing the union of both sides), tagged then
    // unioned — the set-reconciliation query (what changed between two
    // snapshots) at any scale.
    OpSpec(
      "set_symmetric_diff",
      (s, d) => {
        val a = side(s, d, 0, 9)
        val b = side(s, d, 5, 15)
        a.join(b, Seq("c_custkey", "c_nationkey"), "left_anti")
          .withColumn("side", lit("left_only"))
          .unionByName(
            b.join(a, Seq("c_custkey", "c_nationkey"), "left_anti")
              .withColumn("side", lit("right_only")))
          .orderBy("c_custkey", "c_nationkey")
      },
      Some("""SELECT *, 'left_only' AS side
             |FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9
             |      EXCEPT
             |      SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15)
             |UNION ALL
             |SELECT *, 'right_only' AS side
             |FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 5 AND 15
             |      EXCEPT
             |      SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey BETWEEN 0 AND 9)
             |ORDER BY c_custkey, c_nationkey""".stripMargin),
    ),
  )
}
