package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Bridge to `SparkSessionExtensions.buildOptimizerRules`
  * (`private[sql]`) so the wiring of a build-time extensions class can
  * be asserted in tests without constructing a second SparkContext.
  * Same package-tree access pattern as [[ColumnBridge]]/[[RddBridge]]. */
object ExtensionsBridge {
  def optimizerRules(
      ext: SparkSessionExtensions,
      session: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(session)

  /** Same assertion surface for `injectPlannerStrategy` wiring. */
  def plannerStrategies(
      ext: SparkSessionExtensions,
      session: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(session)
}
