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
    // Time-range scan: the range predicate is applied to the RAW `ts`
    // column exactly as the parquet footer types it, so the comparison
    // reaches the reader as a pushed filter (row-group pruning; asserted
    // in PlanShapeSpec). Dtype-adaptive like the loader: against ns-era
    // data the column is int64 and the bounds are ns literals (plain
    // int64 compare); against µs-era data the column is a native
    // timestamp and the bounds are timestamp literals (cast to the
    // column's exact NTZ/LTZ flavor so no column-side cast blocks
    // pushdown — parquet min/max stats prune either way). Filtering a
    // rebuilt/cast column instead would defeat pushdown. Whole-second
    // bounds are exact at every precision, so Spark and DuckDB agree.
    OpSpec(
      "scan_pushdown_range",
      (s, d) => {
        val raw = T.eventsRaw(s, d)
        val (lo, hi) = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            (lit(1704844800L * 1000000000L), // 2024-01-10 00:00:00 UTC in ns
             lit(1705708800L * 1000000000L)) // 2024-01-20 00:00:00 UTC in ns
          case dt =>
            (lit("2024-01-10 00:00:00").cast(dt), lit("2024-01-20 00:00:00").cast(dt))
        }
        raw
          .filter(col("ts") >= lo && col("ts") < hi)
          .agg(
            count(lit(1)).as("n"),
            sum(P.dec2(col("value"))).cast("double").as("sum_value"))
      },
      Some("""SELECT count(*) AS n,
             |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND ts < TIMESTAMP '2024-01-20 00:00:00'""".stripMargin),
    ),
    // Deterministic 5% sample: RNG-based sampling can never hash-match
    // across engines (SURVEY §2.0.6), but hash-mod sampling — keep rows
    // whose sha-256 key prefix ≡ 0 (mod 20) — is the production pattern
    // anyway (stable across runs AND across engines, samples the same
    // logical rows as data moves between systems). Row-local, no
    // shuffle; composes with any downstream op.
    OpSpec(
      "scan_sample_hash",
      (s, d) =>
        T.orders(s, d)
          .filter(expr(graft.text.TextOps.tokenNumExpr("cast(o_orderkey as string)")) % 20 === 0)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(P.dec2(col("o_totalprice"))).cast("double").as("sum_price"))
          .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority, count(*) AS n,
              |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
              |FROM orders
              |WHERE ${graft.text.TextOps.tokenNumSql("cast(o_orderkey as varchar)")} % 20 = 0
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),
    // STRATIFIED deterministic sampling — the data-curation staple
    // ("keep 1/2 of web, 1/5 of forums, all of books"): per-stratum
    // keep-rates via the same sha-mod device, rate chosen by a CASE on
    // the stratum column. Row-local, no shuffle, stable across engines
    // and reruns; at 100 TB this is a pure scan-side filter.
    OpSpec(
      "scan_sample_stratified",
      (s, d) => {
        val keyNum = graft.text.TextOps.tokenNumExpr("cast(doc_id as string)")
        val rate = "CASE source WHEN 'src0' THEN 1 WHEN 'src1' THEN 2 ELSE 5 END"
        T.documents(s, d)
          .filter(expr(s"$keyNum % ($rate) = 0"))
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      },
      Some(s"""SELECT source, count(*) AS n, cast(sum(n_chars) as bigint) AS sum_chars
              |FROM documents
              |WHERE ${graft.text.TextOps.tokenNumSql("cast(doc_id as varchar)")} %
              |      (CASE source WHEN 'src0' THEN 1 WHEN 'src1' THEN 2 ELSE 5 END) = 0
              |GROUP BY source ORDER BY source""".stripMargin),
    ),
  )
}
