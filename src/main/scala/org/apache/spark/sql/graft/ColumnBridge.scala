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

  /** Eager ColumnNode -> catalyst conversion. Unlike [[expression]] (which
    * defers behind an opaque wrapper the analyzer treats as a leaf), this
    * yields the real catalyst tree — with UnresolvedFunction nodes the
    * analyzer then resolves — which is what an injected FunctionBuilder
    * must return when its body is built with the Column API. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}

/** Test-support bridge into `private[spark]` scheduler internals (this
  * package is inside org.apache.spark, so the access is legal): lets
  * specs drain the async listener bus deterministically instead of
  * sleeping a fixed interval and hoping the event arrived. */
object ListenerBridge {
  def waitUntilListenerBusEmpty(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
