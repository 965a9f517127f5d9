package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal bridge into the `private[sql]` Dataset constructor — the one
  * sanctioned way for an extension library to hand a custom LogicalPlan
  * (e.g. [[graft.plans.AsOfJoinPlan]]) back to the public DataFrame API.
  * Lives under `org.apache.spark.sql` purely for access; contains no
  * engine logic.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Drain the async listener bus — lets a spec assert deterministically
    * that an action (e.g. EXPLAIN of an analysis-invoked table op) ran
    * zero jobs, instead of racing the listener delivery. `listenerBus`
    * is `private[spark]`, hence the shim. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
