package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Minimal bridge into `private[sql]` Spark API surface: a custom
  * logical operator (graft.plans.AsofJoinNode) needs `Dataset.ofRows`
  * to become a user-facing DataFrame. This is the standard extension-
  * library pattern — one tiny object in an org.apache.spark.sql
  * subpackage, nothing else reaches into Spark internals. */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
