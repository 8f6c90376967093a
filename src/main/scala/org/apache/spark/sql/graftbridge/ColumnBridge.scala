package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ catalyst-Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Lives
  * inside the org.apache.spark.sql package tree for access — the
  * standard pattern for libraries that ship custom Catalyst
  * expressions against Spark 4's Column-node API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
