package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column ⇄ catalyst-Expression
 * conversions (Spark 4 moved Column onto ColumnNode; the classic
 * converters live behind `private[sql]`). Standard extension-library
 * pattern: a shim object placed in the `org.apache.spark.sql`
 * namespace. No Spark internals are modified.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
