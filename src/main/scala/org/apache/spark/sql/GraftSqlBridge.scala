package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column lifting for the graft engine. Spark 4 moved the
  * classic Column internals behind `private[sql]`; extension libraries
  * that define native Catalyst expressions conventionally expose them
  * through a bridge in this package (the analyzer/optimizer surface the
  * expressions plug into is stable developer API).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Materialize a DataFrame over a custom logical plan (the entry
    * point for whole-operator extensions like graft's AsOfJoinPlan).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
