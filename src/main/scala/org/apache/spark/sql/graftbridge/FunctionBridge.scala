package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the session's `FunctionRegistry` (`sessionState` is
  * `private[sql]`) for registering native-expression SQL functions on a
  * session built WITHOUT extensions — the runtime counterpart of
  * `GraftExtensions`' `injectFunction`, the same split as the two
  * optimizer-rule injection paths. Same package-tree access pattern as
  * [[ColumnBridge]]/[[RddBridge]]. */
object FunctionBridge {
  def registerFunction(
      session: SparkSession,
      fn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)): Unit =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(fn._1, fn._2, fn._3)
}
