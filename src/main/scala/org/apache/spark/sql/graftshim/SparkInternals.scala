package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Narrow bridge to `private[sql]` Spark internals the engine needs:
 * Column ⇄ Catalyst Expression (Spark 4 removed the public `Column.expr`)
 * and LogicalPlan → DataFrame. Lives under `org.apache.spark.sql` solely
 * for access; keep this surface minimal.
 */
object SparkInternals {
  /** Fully-converted Catalyst tree (ExpressionUtils.expression returns a
   *  lazy ColumnNodeExpression wrapper that hides the real node shapes). */
  def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Executed (physical) plan string, for plan-shape assertions. */
  def executedPlanString(df: DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString
}
