package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ↔ catalyst Expression bridge. Spark 4 made these converters
 * `private[sql]` (Column now wraps a ColumnNode); extensions that
 * define native Expressions access them from inside the sql package —
 * the established pattern for third-party Catalyst extensions.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4 — re-exported so
    * graft's native Expressions can declare `inputTypes` (analysis-time
    * type checks via ExpectsInputTypes instead of executor-side
    * ClassCastExceptions on mistyped SQL). */
  type SqlAbstractDataType = org.apache.spark.sql.types.AbstractDataType

  /** Run a (possibly hand-transformed) unresolved LogicalPlan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
