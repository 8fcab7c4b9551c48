package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers (SURVEY §2.0).
  *
  * Every declared query's output is hash-compared against DuckDB
  * executing the oracle SQL over the same parquet — so values must be
  * bit-identical. These helpers encode the policy:
  *
  *  - money-like doubles (2 dp) are summed as decimal(18,2): exact and
  *    summation-order-independent in both engines — safe under any
  *    partitioning / AQE re-plan at any scale;
  *  - continuous statistics (avg/stddev/corr/similarities) are rounded
  *    to 4 dp on both sides;
  *  - divisions are guarded with nullif (Spark /0 → NULL, DuckDB float
  *    /0 → inf — must never reach the comparator).
  */
object Policy {
  /** Exact, order-independent sum for 2-dp money-like doubles. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Round continuous stats to 4 dp — both engines agree at this precision. */
  def r4(c: Column): Column = round(c, 4)

  /** Guarded division: NULL on zero denominator in both engines. */
  def div(num: Column, den: Column): Column = num / nullif(den, lit(0))

  /** Timestamp OUTPUT policy: emit timestamp_ntz. Spark's tz-aware
    * TimestampType round-trips through parquet as datetime64[us, UTC] in
    * pandas while DuckDB's .df() is naive datetime64[us] — a dtype split
    * the driver's comparator fails. Session tz is pinned UTC, so the
    * ntz cast is value-identity. */
  def tsOut(c: Column): Column = c.cast("timestamp_ntz")

  private def nullif(c: Column, v: Column): Column = when(c === v, null).otherwise(c)
}
