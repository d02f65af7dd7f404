package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a custom whole-operator needs:
  * wrapping a hand-built [[LogicalPlan]] back into a DataFrame.
  * Spark exposes this to extension libraries only through the
  * `org.apache.spark.sql` package namespace (the same route every
  * connector that adds a logical operator takes); everything else in
  * graft's planner extension uses public extension points
  * (injectPlannerStrategy, SparkStrategy, BinaryExecNode). */
object Shim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
