/* Bridge into Spark's private[sql] Column <-> Expression conversions for
 * registering custom Catalyst expressions as user-facing Columns — the
 * standard pattern for Spark extension libraries (a same-package object,
 * like Spark's own DatasetFactory users). Spark 4 wraps Column around
 * ColumnNode, so the old `new Column(expr)` / `col.expr` path goes through
 * ExpressionColumnNode / ColumnNodeToExpressionConverter instead. */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

object GraftColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  /** Resolve a Column back to its Catalyst expression (classic sessions). */
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
