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

  /** ANSI divide-by-zero error, for CosineSim's failOnError path —
    * `QueryExecutionErrors` is private[sql] to Scala sources (codegen'd
    * Java sees the public bytecode and calls it directly). */
  def divideByZeroError(ctx: org.apache.spark.QueryContext): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(ctx)
}
