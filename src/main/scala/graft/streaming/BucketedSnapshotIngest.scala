package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Key-bucketed snapshot-state streaming driver: the incremental form
  * of [[SnapshotIngest]] for state that is TABLE-sized rather than
  * view-sized.
  *
  * [[SnapshotIngest]] rewrites the complete state every micro-batch —
  * right when the state is a small aggregate view, a scale-killer when
  * the state is table state (a CDC-maintained table at 100 TB would be
  * a full-table rewrite per batch). Here the state is hash-bucketed by
  * key (`pmod(hash(keys), nBuckets)`), each bucket holding its own
  * `state_N` snapshot chain, and a batch rewrites ONLY the buckets its
  * keys touch — untouched buckets pass through by reference (their
  * newest snapshot simply stays the newest). Per-batch write volume is
  * thus proportional to touchedBuckets × bucketSize, not table size;
  * `nBuckets` is the knob that trades write amplification (fewer,
  * bigger buckets) against small-file count (more, smaller ones).
  *
  * The exactly-once contract is [[SnapshotIngest]]'s, applied per
  * bucket: a batch merges into the newest snapshot STRICTLY before its
  * own batchId (a retried batch touches the same buckets — the bucket
  * function is deterministic in the batch's keys — and ignores its
  * failed attempt's output), and pruning keeps each bucket's immediate
  * predecessor because the stream checkpoint commits only after
  * foreachBatch returns. Discovery runs through the path's FileSystem
  * ([[StateDirs]]): correct on HDFS/S3, not just local disk.
  *
  * The driver-side loop is over touched BUCKET IDS — at most
  * `nBuckets` elements (a configuration constant), never data-sized;
  * each iteration is a distributed merge job over one bucket.
  */
object BucketedSnapshotIngest {

  /** Drain `inDir` with AvailableNow semantics, folding each batch into
    * the per-bucket snapshot chains with `merge(priorBucketState,
    * bucketBatch)` — `merge` sees only one bucket's rows at a time,
    * which is transparent to any per-key merge (a key lives in exactly
    * one bucket). Returns the micro-batch count. */
  def run(
      spark: SparkSession,
      schema: StructType,
      inDir: String,
      stateDir: String,
      checkpoint: String,
      keys: Seq[String],
      nBuckets: Int)(
      merge: (Option[DataFrame], DataFrame) => DataFrame): Int = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    StateDirs.ensure(spark.sparkContext.hadoopConfiguration, stateDir)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/*")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val conf = ss.sparkContext.hadoopConfiguration
        // materialize the bucketed batch once — each touched bucket's
        // merge filters it instead of re-reading the source
        val bucketed = batch
          .withColumn("__bucket", pmod(hash(keys.map(col): _*), lit(nBuckets)))
          .localCheckpoint()
        // bounded driver data: at most nBuckets ids, never row-scaled
        val touched = bucketed.select(col("__bucket")).distinct()
          .collect().map(_.getInt(0)).sorted
        touched.foreach { b =>
          val bucketDir = s"$stateDir/bucket_$b"
          val snaps = StateDirs.list(conf, bucketDir, "state_", batchId)
          val prior = snaps.sortBy(_._1).lastOption
            .map { case (_, p) => ss.read.parquet(p) }
          val part = bucketed.filter(col("__bucket") === b).drop("__bucket")
          merge(prior, part)
            .write.mode("overwrite").parquet(s"$bucketDir/state_$batchId")
          // prune all but this bucket's immediate predecessor (chains
          // have gaps — a bucket advances only when touched)
          val keep = snaps.map(_._1).maxOption
          snaps.filterNot(s => keep.contains(s._1))
            .foreach { case (_, p) => StateDirs.delete(conf, p) }
        }
        org.apache.spark.sql.graftbridge.RddBridge.freeCheckpoint(bucketed)
        batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** The queryable state: the union of every bucket's newest snapshot. */
  def finalState(spark: SparkSession, stateDir: String): DataFrame = {
    val newest = bucketHeads(spark, stateDir)
    require(newest.nonEmpty, s"no state snapshots in $stateDir")
    spark.read.parquet(newest: _*)
  }

  /** Each bucket's newest snapshot path (the live state manifest). */
  def bucketHeads(spark: SparkSession, stateDir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    StateDirs.list(conf, stateDir, "bucket_", Long.MaxValue)
      .flatMap { case (_, bucketDir) =>
        StateDirs.list(conf, bucketDir, "state_", Long.MaxValue)
          .sortBy(_._1).lastOption.map(_._2)
      }
  }
}
