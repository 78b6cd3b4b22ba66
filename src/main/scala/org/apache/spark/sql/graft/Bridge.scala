package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one place this library touches a `private[sql]` Spark API:
  * constructing a DataFrame from a custom [[LogicalPlan]] node
  * requires `Dataset.ofRows`, which Spark scopes to its own package —
  * the standard extension-library bridge (a sub-package of
  * `org.apache.spark.sql` is within the access scope). Everything
  * else this library does goes through public `SparkSessionExtensions`
  * injection points. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
