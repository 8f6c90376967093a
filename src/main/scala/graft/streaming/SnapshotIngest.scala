package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Generic snapshot-state streaming driver: each micro-batch folds into
  * a COMPLETE state snapshot (`state_N` = the state after batch N) via
  * a caller-supplied merge. The mechanics shared by every snapshot
  * consumer ([[IncrAggIngest]], [[CdcIngest]]):
  *
  *  - a batch reads the newest snapshot STRICTLY before its own
  *    batchId, so a retried batch ignores its failed attempt's output
  *    (exactly-once merges, same contract as DedupIngest's seen dirs);
  *  - superseded snapshots are pruned KEEPING the immediate
  *    predecessor — the checkpoint commits after foreachBatch returns,
  *    and a crash before the commit replays exactly this batch, which
  *    must still find state_{N-1};
  *  - [[finalState]] reads the newest snapshot: after a normal drain
  *    that is the last committed batch's view; after a crash-before-
  *    commit it is content-identical to what the replay rewrites.
  */
object SnapshotIngest {

  /** Drain `inDir` with AvailableNow semantics, folding each batch into
    * the snapshot chain with `merge(priorState, batch)`. Returns the
    * micro-batch count. */
  def run(
      spark: SparkSession,
      schema: StructType,
      inDir: String,
      stateDir: String,
      checkpoint: String)(
      merge: (Option[DataFrame], DataFrame) => DataFrame): Int = {
    StateDirs.ensure(spark.sparkContext.hadoopConfiguration, stateDir)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val fold = foldBatch(stateDir)(merge)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/*")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        fold(batch, batchId)
        batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** The per-batch snapshot fold as a plain `foreachBatch` function —
    * the building block [[run]] drives, reusable by any writeStream
    * (e.g. [[Sinks.upsertSink]]): read the newest snapshot strictly
    * before this batchId, merge, write `state_batchId`, prune keeping
    * the immediate predecessor. */
  def foldBatch(stateDir: String)(
      merge: (Option[DataFrame], DataFrame) => DataFrame): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val ss = batch.sparkSession
      val conf = ss.sparkContext.hadoopConfiguration
      StateDirs.ensure(conf, stateDir)
      val prior = newestSnapshot(conf, stateDir, batchId).map(ss.read.parquet(_))
      merge(prior, batch)
        .write.mode("overwrite").parquet(s"$stateDir/state_$batchId")
      StateDirs.list(conf, stateDir, "state_", batchId - 1)
        .foreach { case (_, p) => StateDirs.delete(conf, p) }
      ()
    }

  /** The newest snapshot — the queryable state. */
  def finalState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(
      newestSnapshot(spark.sparkContext.hadoopConfiguration, stateDir, Long.MaxValue)
        .getOrElse(throw new IllegalStateException(s"no state snapshots in $stateDir")))

  /** Newest `state_k` with k strictly below `beforeBatch` — discovered
    * through the path's own FileSystem ([[StateDirs]]), so the
    * exactly-once contract holds on non-local stores too. */
  private def newestSnapshot(
      conf: org.apache.hadoop.conf.Configuration,
      stateDir: String,
      beforeBatch: Long): Option[String] =
    StateDirs.list(conf, stateDir, "state_", beforeBatch)
      .sortBy(_._1).lastOption.map(_._2)
}
