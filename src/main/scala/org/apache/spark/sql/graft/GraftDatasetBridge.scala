package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` doorway a custom LOGICAL operator needs: turning a
  * hand-built [[LogicalPlan]] into a [[DataFrame]]
  * (`classic.Dataset.ofRows`). Spark scopes that constructor to the sql
  * package, so this shim — the standard extension-library pattern — lives
  * under `org.apache.spark.sql` and exports exactly one function. Everything
  * else in the graft library uses only public API.
  */
object GraftDatasetBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column → Catalyst expression (Spark 4 wraps Columns in ColumnNodes;
    * the converter is sql-package-scoped).
    */
  def expr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
