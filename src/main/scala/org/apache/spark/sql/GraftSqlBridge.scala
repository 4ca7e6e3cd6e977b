package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: the one internal call a whole-operator
  * extension needs is `Dataset.ofRows` (turn a custom resolved
  * `LogicalPlan` into a user-facing DataFrame) — Spark offers no public
  * factory for that, so every planner-extension library carries this
  * one-liner in the `org.apache.spark.sql` package. Nothing else may be
  * added here.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
