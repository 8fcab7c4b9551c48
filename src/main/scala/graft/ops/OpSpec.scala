package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator: a named query, its Spark implementation, and
  * (when SQL-expressible) its DuckDB oracle (SURVEY §2).
  *
  * `oracle = None` → the driver records a weaker rows-only check
  * (used for sketches like approx_count_distinct and for ops whose
  * semantics DuckDB can't reproduce bit-exactly).
  */
final case class OpSpec(
    key: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Registry {
  /** All declared ops, every §2 category. Order is the bench order. */
  lazy val all: Seq[OpSpec] =
    Scans.ops ++ StoreOps.ops ++ Filters.ops ++ Joins.ops ++ Aggs.ops ++ Windows.ops ++
      Sorts.ops ++ SetOps.ops ++ TimeSeries.ops ++ StatsTests.ops ++ Inference.ops ++
      Scalars.ops ++ LlmOps.ops ++
      CurationOps.ops ++
      graft.text.TextOps.ops ++ graft.text.NearDup.ops ++
      graft.vec.VecOps.ops ++ graft.vec.Pq.ops ++ graft.vec.IvfPq.ops ++ graft.vec.Pca.ops ++
      Udfs.ops

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(op => op.key -> op.build).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(op => op.oracle.map(op.key -> _)).toMap

  /** Duplicate keys are a silent map-collision bug — assert in tests. */
  def duplicateKeys: Seq[String] =
    all.groupBy(_.key).filter(_._2.size > 1).keys.toSeq
}
