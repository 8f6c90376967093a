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
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Unpersist the checkpoint blocks behind `df`, if it is backed by one
    * (non-blocking; safe no-op otherwise). */
  def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    checkpointedRdd(df).foreach(_.unpersist(false))
}
