package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: wrap a hand-built [[LogicalPlan]] as a
  * DataFrame and expose a DataFrame's analyzed plan — the two hooks a
  * library needs to insert a custom logical operator (see
  * `graft.engine.plans.PatternMatchPlan`). Lives in the sql package for
  * visibility only; no Spark internals are modified. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
