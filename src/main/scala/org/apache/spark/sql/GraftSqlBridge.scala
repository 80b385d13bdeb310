package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-scoped bridge to `classic.Dataset.ofRows` (the companion is
  * `private[sql]`): the one supported way to turn an analyzed-or-not
  * LogicalPlan back into a DataFrame, needed by graft's SQL MERGE
  * command to execute its USING source plan. Same pattern Delta Lake
  * uses for its SQL surface; nothing else belongs in this package.
  */
object GraftSqlBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
}
