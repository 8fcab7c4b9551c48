package graft.core

import org.apache.spark.sql.SparkSession

/** One-call session setup for library users: a `SparkSession.Builder`
  * pre-loaded with everything the engine's semantics assume —
  *
  *  - `GraftExtensions` (native `dot_native` Expression, the sound
  *    HOF→native optimizer rule, and the custom as-of planner strategy);
  *  - UTC session time zone and µs parquet timestamps (the
  *    cross-engine determinism contract, SURVEY §2.0);
  *  - ns-as-long parquet reads (the TSDB raw-ns range-scan fast path);
  *  - AQE on (runtime coalescing + skew-join splitting at scale).
  *
  * Callers still pick master/shuffle partitions for their cluster:
  * {{{
  * val spark = GraftSession.builder().master("local[8]")
  *   .config("spark.sql.shuffle.partitions", "8").getOrCreate()
  * }}}
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      // both forms: the conf string applies at cold SparkContext start
      // (spark-submit), withExtensions also covers new sessions built
      // over an already-running context (static conf is ignored then)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
}
