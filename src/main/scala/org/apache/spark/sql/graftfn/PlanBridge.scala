package org.apache.spark.sql.graftfn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge from raw Catalyst [[LogicalPlan]]s to user-facing
  * DataFrames. `Dataset.ofRows` and the analyzed plan accessor are
  * `private[sql]` in Spark 4, so — like [[ColumnBridge]] — this
  * one-pager sits in an `org.apache.spark.sql` subpackage to reach
  * them. Needed by custom whole-operator nodes (e.g. the native as-of
  * join) that construct logical plans directly. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
