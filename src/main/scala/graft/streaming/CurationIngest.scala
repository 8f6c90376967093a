package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming incremental curation: [[graft.ops.Curation]]'s recipe as
  * a continuously-fed admission pipeline — each micro-batch runs
  * quality filter → exact-dedup admission → LSH near-dup admission in
  * one `foreachBatch`, against state accumulated across the stream.
  *
  * Differences from the batch pipeline, and why:
  *  - The quality threshold is a FIXED score (`minScore`), not the
  *    corpus-histogram fraction: an online filter cannot see the
  *    final corpus distribution, so production streams run a
  *    calibrated constant (or a model score — [[graft.ops.Classifier]])
  *    and recalibrate out of band.
  *  - No split/decontamination stage: a benchmark set is a static
  *    artifact; streaming admission would just anti-join each batch
  *    against its (precomputed) gram set — the batch op already
  *    certifies that join shape.
  *
  * Admission is closed-form despite the statefulness (the
  * [[NearDupIngest]] discipline): with input files in ascending
  * doc_id order, a document is admitted iff
  *   (a) its quality score ≥ `minScore`,
  *   (b) its doc_id is the minimum among quality-passing docs with
  *       its exact content digest, and
  *   (c) for EVERY LSH band, its doc_id is the minimum among
  *       exact-admission survivors claiming that (band, signature)
  *       bucket
  * — three plain aggregates over the whole corpus, which is exactly
  * what the DuckDB oracle replays. Digest claims are written by
  * exact-stage survivors and bucket claims by all of them (admitted
  * to output or not), which is what keeps (b) and (c) independent of
  * how the stream was batched.
  *
  * Scale/retry shape: both state tables are digest-width (32-hex md5
  * rows; (band, signature) pairs) — orders of magnitude smaller than
  * text, shuffled as equi-joins that AQE broadcasts when the batch
  * side is small. All writes are per-batch overwrite dirs keyed by
  * batchId, state reads see only batches strictly before their own
  * (a retried batch ignores its failed attempt), and discovery runs
  * through the path's Hadoop FileSystem ([[StateDirs]]) so HDFS/S3
  * behave like local disk.
  */
object CurationIngest {

  /** Drain `inDir` with AvailableNow semantics, writing admitted docs
    * to `outDir/batch_N`. Returns the micro-batch count.
    *
    * `split` = (trainFrac, salt) routes only the train side of the
    * deterministic md5 split through curation (the benchmark side is
    * someone else's artifact — a stream must never admit it);
    * `benchGrams` is that artifact's precomputed `decontamN`-gram set
    * (column `shingle`), anti-joined per batch — a STATIC frame, so
    * decontamination adds no state, just one digest-width equi-join
    * per batch. With both set, the driver is the full batch recipe
    * ([[graft.ops.Curation]]) running incrementally. */
  def run(
      spark: SparkSession,
      schema: StructType,
      inDir: String,
      outDir: String,
      stateDir: String,
      checkpoint: String,
      minScore: Int = 2,
      bands: Int = 4,
      split: Option[(Double, String)] = None,
      benchGrams: Option[org.apache.spark.sql.DataFrame] = None,
      decontamN: Int = 5): Int = {
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

        // stage 0: route only the train side through curation
        // (map-only deterministic hash predicate, no lookup)
        val routed = split match {
          case Some((frac, salt)) => batch.filter(
            graft.ops.Sampling.bucketHash(col("doc_id"), salt) <
              lit(graft.ops.Sampling.hexThreshold(frac)))
          case None => batch
        }
        // stage 1: fixed-threshold quality gate (stateless, map-only)
        val scored = routed.join(
          graft.ops.TextOps.qualityScores(routed)
            .filter(col("quality_score") >= minScore).select(col("doc_id")),
          Seq("doc_id"), "left_semi")

        // stage 2: exact-dedup admission — in-batch digest keeper,
        // then anti-join against digests from batches strictly before
        val keeper = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
        val inBatch = scored
          .withColumn("content_hash", md5(col("text")))
          .withColumn("__rn", row_number().over(keeper))
          .filter(col("__rn") === 1).drop("__rn")
        val seenDirs = StateDirs.list(conf, stateDir, "seen_", batchId).map(_._2)
        val exactFresh0 =
          if (seenDirs.isEmpty) inBatch
          else inBatch.join(
            ss.read.schema(DedupIngest.stateSchema).parquet(seenDirs: _*),
            Seq("content_hash"), "left_anti")
        // one materialization: three consumers below (sigs, output,
        // state) must not re-run the quality+digest chain each
        val exactFresh = exactFresh0.localCheckpoint()

        // stage 3: near-dup admission over exact survivors
        val sigs = graft.ops.Dedup.minhashSignatures(exactFresh, bands)
        val claimedDirs = StateDirs.list(conf, stateDir, "claimed_", batchId).map(_._2)
        val rejectedByState =
          if (claimedDirs.isEmpty) sigs.limit(0).select(col("doc_id"))
          else sigs.join(
            ss.read.schema(NearDupIngest.stateSchema).parquet(claimedDirs: _*),
            Seq("band", "signature"), "left_semi").select(col("doc_id"))
        val bucketMin = sigs.groupBy(col("band"), col("signature"))
          .agg(min(col("doc_id")).as("min_doc"))
        val rejectedInBatch = sigs.join(bucketMin, Seq("band", "signature"))
          .filter(col("min_doc") < col("doc_id")).select(col("doc_id"))
        val rejected = rejectedByState.union(rejectedInBatch).distinct()

        val admitted = exactFresh.drop("content_hash")
          .join(rejected, Seq("doc_id"), "left_anti")
        // stage 4: benchmark decontamination — static gram artifact,
        // one stateless equi-join per batch
        val clean = benchGrams match {
          case Some(bg) =>
            val contaminated = graft.ops.TextOps
              .shinglePostings(admitted, decontamN)
              .join(bg.select(col("shingle")), Seq("shingle"), "left_semi")
              .select(col("doc_id")).distinct()
            admitted.join(contaminated, Seq("doc_id"), "left_anti")
          case None => admitted
        }
        clean.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        // claims derive from the batch input, so a retry rewrites
        // byte-identical state
        exactFresh.select(col("content_hash")).distinct()
          .write.mode("overwrite").parquet(s"$stateDir/seen_$batchId")
        sigs.select(col("band"), col("signature")).distinct()
          .write.mode("overwrite").parquet(s"$stateDir/claimed_$batchId")
        org.apache.spark.sql.graftbridge.RddBridge.freeCheckpoint(exactFresh)
        batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** Fold both state families' per-batch dirs into one each — after N
    * batches the probe unions N small dirs and listing overhead
    * dominates the digest-width data. Run between [[run]] invocations. */
  def compactState(spark: SparkSession, stateDir: String): Int =
    StateDirs.compactPrefix(spark, stateDir, "seen_", DedupIngest.stateSchema) +
      StateDirs.compactPrefix(spark, stateDir, "claimed_", NearDupIngest.stateSchema)

  /** Backfill → streaming cutover: seed `stateDir` with exactly the
    * state an equivalent stream would have accumulated having already
    * seen `corpus` — the offline-built corpus keeps priority, and the
    * stream continues incrementally from it (the operational handoff
    * every "we curate nightly, now make it continuous" migration
    * needs). Seen digests = distinct content digests of
    * quality-passing docs; bucket claims = their band signatures
    * (signatures are a function of text alone, so WHICH duplicate
    * represents a content group cannot matter). Writes `seen_-1` /
    * `claimed_-1`: state reads are strictly-before-batchId, and the
    * first micro-batch is batchId 0 — a seed keyed 0 would be both
    * invisible to it and clobbered by it. ([[StateDirs.compactPrefix]]
    * folds into the MINIMUM key for the same reason.) */
  def bootstrapState(
      spark: SparkSession,
      stateDir: String,
      corpus: org.apache.spark.sql.DataFrame,
      minScore: Int = 2,
      bands: Int = 4): Unit = {
    StateDirs.ensure(spark.sparkContext.hadoopConfiguration, stateDir)
    val scored = corpus.join(
      graft.ops.TextOps.qualityScores(corpus)
        .filter(col("quality_score") >= minScore).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val keeper = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val exact = scored
      .withColumn("content_hash", md5(col("text")))
      .withColumn("__rn", row_number().over(keeper))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint()
    exact.select(col("content_hash")).distinct()
      .write.mode("overwrite").parquet(s"$stateDir/seen_-1")
    graft.ops.Dedup.minhashSignatures(exact, bands)
      .select(col("band"), col("signature")).distinct()
      .write.mode("overwrite").parquet(s"$stateDir/claimed_-1")
    org.apache.spark.sql.graftbridge.RddBridge.freeCheckpoint(exact)
  }
}
