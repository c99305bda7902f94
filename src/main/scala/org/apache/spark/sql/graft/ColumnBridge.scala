package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge into Spark 4's classic Column internals: build a [[Column]] from
  * a Catalyst [[Expression]] and back. Lives inside the org.apache.spark
  * .sql namespace to reach the `private[sql]` constructors — the standard
  * pattern for libraries shipping custom Catalyst expressions (cf. public
  * examples in SNIPPETS.md [1]/[3]).
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)
}
