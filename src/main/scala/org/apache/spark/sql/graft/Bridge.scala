package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one FILE where this library touches `private[sql]` Spark APIs:
  * constructing a DataFrame from a custom [[LogicalPlan]] node requires
  * `Dataset.ofRows`, and constructing a Column from a raw Expression
  * requires `ExpressionUtils.column` — both scoped by Spark to its own
  * package, reached via the standard extension-library bridge (a
  * sub-package of `org.apache.spark.sql` is within the access scope).
  * Everything else this library does goes through public
  * `SparkSessionExtensions` injection points. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column over a raw catalyst [[Expression]] — needed for expressions
    * whose constructor takes non-Expression state (a `Broadcast`
    * handle, e.g. [[graft.expressions.BroadcastCentersExpr]]) and so
    * cannot be built through the `injectFunction` children-only
    * factory. Same access rationale as [[ofRows]]. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
