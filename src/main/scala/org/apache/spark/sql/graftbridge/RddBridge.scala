package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the RDD backing a `localCheckpoint`ed Dataset (its
  * LogicalRDD leaf). `Dataset.localCheckpoint` pins materialized blocks
  * in the block manager until the driver GCs the RDD reference; an
  * iterative algorithm that checkpoints per round (to cut its growing
  * lineage) would otherwise strand rounds × partitions blocks per call —
  * measured as a 3× slowdown on back-to-back invocations in one session.
  * This accessor lets the loop free the previous round's blocks
  * deterministically. Lives inside the org.apache.spark.sql package
  * tree for access, same pattern as [[ColumnBridge]]. */
object RddBridge {
  // Freeing a locally-checkpointed RDD makes org.apache.spark.rdd.RDD
  // WARN that the lineage cannot be recomputed — dozens of lines per
  // iterative-component run. Here the free is the deliberate protocol
  // (the next round's checkpoint owns the data; the freed RDD is never
  // read again), so that ONE logger is pinned above WARN once. Scoped
  // to the RDD class only — nothing else logs through it in this
  // engine's paths.
  // Spark's Logging trait logs through the CONCRETE class's logger, so
  // the checkpointed frames' MapPartitionsRDD needs its own pin beside
  // the RDD base class (still class-scoped, not the whole rdd package).
  try {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      classOf[RDD[_]].getName, org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
  } catch { case scala.util.control.NonFatal(_) => () }

  def checkpointedRdd(df: org.apache.spark.sql.DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Unpersist the checkpoint blocks behind `df`, if it is backed by one
    * (non-blocking; safe no-op otherwise). */
  def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    checkpointedRdd(df).foreach(_.unpersist(false))
}
