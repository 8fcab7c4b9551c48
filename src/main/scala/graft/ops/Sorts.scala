package graft.ops

import graft.core.{Tables => T}
import org.apache.spark.sql.functions._

/** §2.F sorts / limits / top-k.
  *
  * sort+limit compiles to TakeOrderedAndProject — per-partition top-k
  * then a k-row merge on the driver, O(k) network instead of a global
  * sort. That is exactly the 100 TB shape (asserted in PlanShapeSpec).
  * Every ORDER BY ends in a unique key (§2.0 rule 1).
  */
object Sorts {
  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "sort_multi",
      (s, d) =>
        T.orders(s, d)
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
          .orderBy(desc("o_totalprice"), asc("o_orderstatus"), asc("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
             |ORDER BY o_totalprice DESC, o_orderstatus ASC, o_orderkey ASC""".stripMargin),
    ),
    OpSpec(
      "sort_topk",
      (s, d) =>
        T.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin),
    ),
    OpSpec(
      "limit_offset",
      (s, d) =>
        T.orders(s, d)
          .select("o_orderkey", "o_custkey")
          .orderBy("o_orderkey")
          .offset(10)
          .limit(50),
      Some("SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 10"),
    ),
  )
}
