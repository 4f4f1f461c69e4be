package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr: Expression)` constructor (the
  * Connect refactor routes columns through ColumnNode); the supported
  * classic-session wrapper lives behind `private[sql]`. This one-liner in
  * the sql package tree is the standard extension-library bridge for
  * exposing custom Catalyst expressions as Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
