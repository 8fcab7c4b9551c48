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
    joinTuned(SparkSession.builder()
      .appName(appName)
      // both forms: the conf string applies at cold SparkContext start
      // (spark-submit), withExtensions also covers new sessions built
      // over an already-running context (static conf is ignored then)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true"))

  /** The engine's join-strategy defaults (guide §3.1 / §9), applied by
    * ONE helper from the library builder, `graft.Bench`, and
    * `graft.Verify` alike, so the oracle-certified config is exactly
    * the benched config (round-19, verdict item 7 — round 18 set these
    * in Bench only, leaving Verify to certify default-strategy plans).
    * Join strategy never changes results, only the physical plan.
    * Env-overridable so a smaller host — or an A/B — can restore Spark
    * defaults ("true"/"0"/"10m"):
    *  - preferSortMergeJoin=false lets the planner pick shuffled-hash
    *    when its per-partition build side fits (its own size checks
    *    still gate it — SMJ stays the fallback);
    *  - the AQE localMap threshold rewrites SMJ→SHJ at runtime per
    *    measured partition size — scale-adaptive by construction;
    *  - the 64m broadcast threshold is sized to executor memory
    *    (128 GiB / 32 tasks here → worst-case ~2 GiB of concurrent
    *    build relations); production sizes it the same way. */
  def joinTuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.join.preferSortMergeJoin",
      sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
    .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
      sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "64m"))
    .config("spark.sql.autoBroadcastJoinThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "64m"))
}
