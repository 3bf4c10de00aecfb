package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The package-private bridge every Spark extension library that adds its
  * own logical operators uses (Delta, Iceberg, GraphFrames all carry the
  * same shim): `Dataset.ofRows` — the only way to wrap a custom
  * [[LogicalPlan]] in a user-facing DataFrame — is `private[sql]`, so the
  * one call lives in this package and the whole graft.plans layer stays in
  * its own namespace.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

/** Same-package bridge for Column <-> Expression (ExpressionUtils is
  * private[sql]); used by operators that build native expressions carrying
  * driver-held state (e.g. the PQ codebook encoder).
  */
object GraftColumnBridge {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
