package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's private[sql] Dataset constructor, so the
  * engine can hand Catalyst a custom [[graft.plans.BroadcastAsOfJoinPlan]]
  * logical node and get a normal DataFrame back. This is the standard
  * extension-library pattern (every Spark connector/extension that adds
  * a logical operator ships one of these).
  */
object GraftDataset {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
