package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the custom plan node needs: wrapping a
  * hand-built [[LogicalPlan]] back into a [[DataFrame]]
  * (`Dataset.ofRows`). Lives under `org.apache.spark.sql` for access,
  * contains nothing else — every other graft⇄Catalyst surface
  * (expressions, strategies, exec nodes) uses public developer API. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 moved `Column.expr` behind the
    * ColumnNode indirection). EAGER conversion: `ExpressionUtils
    * .expression` returns a lazy non-serializable `ColumnNodeExpression`
    * that only standard Dataset entry points unwrap during analysis — a
    * custom plan node must hold the real Catalyst tree itself. */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
