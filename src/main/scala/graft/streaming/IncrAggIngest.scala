package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.IncrView

/** Streaming incremental aggregate view: [[graft.ops.IncrView]] under
  * Structured Streaming's delivery. Each micro-batch reduces to its own
  * tiny delta view and merges it with the newest state SNAPSHOT from a
  * batch strictly before it — per-batch cost ∝ delta keys + state size,
  * with the full fact stream never re-aggregated.
  *
  * State layout: `state_N` is the COMPLETE view after batch N (a
  * snapshot, unlike DedupIngest's append-only digest dirs — an
  * aggregate view must be read whole anyway, and a snapshot per batch
  * is what makes retries trivially idempotent). A retried micro-batch
  * re-reads the newest snapshot with id < its own batchId — its own
  * failed attempt's `state_N` is ignored and overwritten, so the
  * merge is exactly-once per batch (same contract, and the same
  * strictly-before guard, as DedupIngest's seen dirs; spec-certified
  * by the pre-planted failed-attempt case). Old snapshots are pruned
  * after each successful write, keeping the dir O(1); the newest
  * surviving snapshot IS the queryable view at all times.
  *
  * End-to-end contract (stream_incr_agg): after draining N batches,
  * [[finalState]] equals the one-shot [[IncrView.build]] over
  * everything the stream saw — certified against the same full
  * GROUP BY DuckDB oracle as the batch path.
  */
object IncrAggIngest {

  /** Drain `inDir` with AvailableNow semantics, maintaining the view
    * keyed by `keys` over `valueCol`. Returns micro-batch count. */
  def run(
      spark: SparkSession,
      schema: StructType,
      inDir: String,
      stateDir: String,
      checkpoint: String,
      keys: Seq[String],
      valueCol: String): Int = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/*")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val merged = newestSnapshot(stateDir, batchId) match {
          case None => IncrView.build(batch, keys, col(valueCol))
          case Some(prior) =>
            IncrView.merge(ss.read.parquet(prior), batch, keys, col(valueCol))
        }
        merged.write.mode("overwrite").parquet(s"$stateDir/state_$batchId")
        // prune superseded snapshots, KEEPING the immediate predecessor:
        // this batch's checkpoint commit happens after this function
        // returns, and a crash before it replays batch N — which must
        // still find state_{N-1} (streaming replays at most the last
        // uncommitted batch, so one predecessor is exactly enough).
        // Crash between write and prune leaves extra dirs; the next
        // batch's prune removes them, and reads always pick the newest
        stateDirs(stateDir).filter(_._1 < batchId - 1).foreach { case (_, p) =>
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(ss.sparkContext.hadoopConfiguration).delete(hp, true)
        }
        batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** The queryable view: the newest state snapshot. After a normal
    * (AvailableNow) drain this is the last committed batch's view; if
    * the writer crashed between snapshot write and checkpoint commit,
    * the newest snapshot is the uncommitted attempt — identical in
    * content to what the replay will rewrite, so reads stay correct. */
  def finalState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(newestSnapshot(stateDir, Long.MaxValue).getOrElse(
      throw new IllegalStateException(s"no state snapshots in $stateDir")))

  /** Newest `state_k` with k strictly below `beforeBatch` — a retried
    * batch must never merge against its own failed attempt's output. */
  private def newestSnapshot(stateDir: String, beforeBatch: Long): Option[String] =
    stateDirs(stateDir).filter(_._1 < beforeBatch)
      .sortBy(_._1).lastOption.map(_._2)

  private def stateDirs(stateDir: String): Seq[(Long, String)] = {
    val d = new java.io.File(stateDir)
    Option(d.listFiles()).toSeq.flatten
      .filter(_.isDirectory)
      .flatMap { f =>
        scala.util.Try(f.getName.stripPrefix("state_").toLong).toOption
          .filter(_ => f.getName.startsWith("state_"))
          .map(_ -> f.getAbsolutePath)
      }
  }
}
