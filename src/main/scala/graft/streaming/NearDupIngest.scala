package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Streaming NEAR-dup admission: the online form of MinHash-LSH
  * dedup. Each arriving document claims its LSH band buckets
  * ((band, signature) pairs from [[graft.ops.Dedup.minhashSignatures]]);
  * a document is admitted only if NONE of its buckets were claimed by
  * any earlier-seen document — in accumulated state or earlier in the
  * same micro-batch by a lower doc_id. Claims are made by every seen
  * document, admitted or not, so admission means "novel w.r.t.
  * everything that has flowed past", the transitive policy (if B was
  * rejected as a near-dup of A, a near-dup of B is also rejected even
  * when it shares nothing with A — B's buckets are claimed).
  *
  * That claim-by-all rule is what makes the semantics closed-form:
  * when batches arrive in ascending doc_id order, a document is
  * admitted iff it holds the MINIMUM doc_id in every one of its band
  * buckets over the whole stream — a plain aggregate any engine can
  * check, no recursion over admission history (claim-by-admitted-only
  * would need exactly that, and its answer depends on arrival
  * batching; this one's doesn't).
  *
  * Scale shape: state is (band, 32-hex signature) pairs — ~133 bytes
  * per doc at 4 bands vs the document itself, 3 orders smaller than
  * corpus text. The per-batch work is the batch's signature
  * aggregation (shuffle by doc_id, then by (band, signature)) plus a
  * left-semi probe of batch signatures against state — digest-width
  * keys, AQE broadcasts the batch side. Per-batch overwrite dirs
  * keyed by batchId make retries idempotent, and only state from
  * batches strictly before the current one is read (the same
  * retry-idempotency contract as [[DedupIngest]]). [[DedupIngest
  * .compactState]]'s folding pattern applies to `claimed_N` dirs
  * identically.
  */
object NearDupIngest {

  val stateSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("signature", StringType, nullable = false)))

  /** Drain `inDir` with AvailableNow semantics, admitting near-dup-
    * novel documents to `outDir/batch_N`. Input files must partition
    * the stream in ascending doc_id order for the closed-form
    * admission contract (see class doc). Returns micro-batch count. */
  def run(
      spark: SparkSession,
      schema: StructType,
      inDir: String,
      outDir: String,
      stateDir: String,
      checkpoint: String,
      bands: Int = 4): Int = {
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
        val sigs = graft.ops.Dedup.minhashSignatures(batch, bands)
        // claims from batches strictly BEFORE this one (retry safety:
        // a failed attempt's own claimed_N must not reject its redo)
        val claimedDirs = listStateDirs(
          ss.sparkContext.hadoopConfiguration, stateDir, batchId)
        val rejectedByState =
          if (claimedDirs.isEmpty) sigs.limit(0).select(col("doc_id"))
          else sigs.join(
            ss.read.schema(stateSchema).parquet(claimedDirs: _*),
            Seq("band", "signature"), "left_semi").select(col("doc_id"))
        // intra-batch: the lowest doc_id in each bucket claims it
        val bucketMin = sigs.groupBy(col("band"), col("signature"))
          .agg(min(col("doc_id")).as("min_doc"))
        val rejectedInBatch = sigs.join(bucketMin, Seq("band", "signature"))
          .filter(col("min_doc") < col("doc_id")).select(col("doc_id"))
        val rejected = rejectedByState.union(rejectedInBatch).distinct()
        batch.join(rejected, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        // every seen doc claims its buckets, admitted or not — derived
        // from the batch input, so a retry rewrites identical state
        sigs.select(col("band"), col("signature")).distinct()
          .write.mode("overwrite").parquet(s"$stateDir/claimed_$batchId")
        batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** Fold the per-batch claim dirs into one ([[StateDirs.compactPrefix]]
    * — claims are a set, the probe is a semi-join). */
  def compactState(spark: SparkSession, stateDir: String): Int =
    StateDirs.compactPrefix(spark, stateDir, "claimed_", stateSchema)

  private def listStateDirs(
      conf: org.apache.hadoop.conf.Configuration,
      stateDir: String,
      beforeBatch: Long): Seq[String] =
    StateDirs.list(conf, stateDir, "claimed_", beforeBatch).map(_._2)
}
