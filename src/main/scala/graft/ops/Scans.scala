package graft.ops

import graft.core.{Policy => P, Tables => T}
import org.apache.spark.sql.functions._

/** §2.A scans/sources. The TSDB "range query" primitive maps to a
  * parquet scan with predicate pushdown — at 100 TB the ts filter
  * prunes row groups (and, with time-partitioned layout, whole files)
  * before any byte reaches an executor.
  */
object Scans {
  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "scan_parquet",
      (s, d) => T.region(s, d).orderBy("r_regionkey"),
      Some("SELECT * FROM region ORDER BY r_regionkey"),
    ),
    OpSpec(
      "scan_count",
      (s, d) => T.lineitem(s, d).agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM lineitem"),
    ),
    // Time-range scan: filter reaches the parquet reader as a pushed
    // predicate (asserted in PlanShapeSpec); whole-µs literals are safe
    // against the ns(DuckDB)/µs(Spark) precision split because floor-
    // truncation preserves >=/< against whole-µs bounds.
    OpSpec(
      "scan_pushdown_range",
      (s, d) =>
        T.events(s, d)
          .filter(
            col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
              col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
          .agg(
            count(lit(1)).as("n"),
            sum(P.dec2(col("value"))).cast("decimal(18,2)").as("sum_value")),
      Some("""SELECT count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as decimal(18,2)) AS sum_value
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND ts < TIMESTAMP '2024-01-20 00:00:00'""".stripMargin),
    ),
  )
}
