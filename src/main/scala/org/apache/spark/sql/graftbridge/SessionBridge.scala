package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Bridge to the `private[sql]` classic-SparkSession constructor so a
  * test can build a SECOND session with a given extensions set on the
  * SAME SparkContext. `SparkSession.builder().withExtensions(...)
  * .getOrCreate()` silently returns the already-running session (its
  * extensions fixed at first build), and `newSession()` inherits the
  * parent's extensions — so without this, the
  * `SparkSessionExtensions.injectOptimizerRule` path (where injected
  * rules run inside the fixed-point Operator Optimization batch, NOT
  * the end-of-pipeline `experimental.extraOptimizations` batch) is
  * untestable in one JVM. Same package-tree access pattern as
  * [[ColumnBridge]]/[[RddBridge]]. */
object SessionBridge {
  def withExtensions(
      base: SparkSession,
      configure: SparkSessionExtensions => Unit): SparkSession = {
    val classic = base.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ext = new SparkSessionExtensions
    configure(ext)
    // the 6-arg primary constructor is class-private in Scala (only the
    // builder calls it), but bytecode-public — reflective call, pinned
    // to the (sc, sharedState, sessionState, extensions, options, tags)
    // signature of the Spark 4.1 classic session
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession].getDeclaredConstructor(
      classOf[org.apache.spark.SparkContext],
      classOf[Option[_]], classOf[Option[_]],
      classOf[SparkSessionExtensions],
      classOf[Map[_, _]], classOf[Map[_, _]])
    ctor.setAccessible(true)
    ctor.newInstance(
      classic.sparkContext,
      Some(classic.sharedState), None,
      ext, Map.empty, Map.empty)
  }
}
