package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` Spark internals, in the standard
  * extension-package idiom. One capability only: turning an already
  * optimized [[LogicalPlan]] subtree back into a runnable DataFrame —
  * what [[graft.sql.GraftRuntimeFilterRule]] needs to evaluate a join's
  * build side ahead of the probe-side scan (Spark's own DPP executes the
  * build side out-of-band the same way, via SubqueryBroadcastExec). */
object SparkInternals {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
