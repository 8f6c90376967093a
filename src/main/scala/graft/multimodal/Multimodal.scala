package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video treated as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batched per-partition passes.
  *
  * The decode step is STUBBED (this container ships no image/audio
  * codecs): [[StubDecoder]] produces deterministic fake features from
  * the bytes. Everything around it — the schema contract, partition
  * sizing, batch shape, and the mapPartitions pipeline (the JVM analog
  * of a Pandas-UDF `mapInPandas` micro-batch loop) — is real and tested.
  *
  * Scale notes (100 TB of media):
  *  - Blobs ride in parquet binary columns; metadata (dims, codec,
  *    duration) rides beside them so filters prune *before* decode.
  *  - Decode is a narrow per-partition pass; `maxPartitionBytes` sizes
  *    partitions so a partition of blobs fits executor memory.
  *  - Features (fixed-size float vectors) are columnar outputs that feed
  *    straight into graft.ops.Similarity for ANN dedup/search.
  */
object Multimodal {

  /** Typed media record: opaque payload + prunable metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Extracted feature row — what the decode stage emits. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Deterministic stand-in for a real codec: in production this calls
    * an image/audio library per batch; here it derives a fake-but-stable
    * feature vector from the payload bytes so the pipeline is testable
    * end-to-end. Swap point is exactly this function. */
  object StubDecoder {
    val dim = 8

    def decode(content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < content.length) {
        out(i % dim) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    def checksum(content: Array[Byte]): Long = {
      var h = 1125899906842597L // FNV-ish rolling hash
      var i = 0
      while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
      h
    }
  }

  /** Batched per-partition decode — one decoder instance per partition,
    * rows processed in a streaming iterator (never materialize the
    * partition), the same batch shape `mapInPandas` gives Python. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would open the codec once here
      rows.map { r =>
        MediaFeatures(
          r.media_id, r.kind, r.content.length,
          StubDecoder.checksum(r.content), StubDecoder.decode(r.content))
      }
    }
  }

  /** Column-level variant for untyped pipelines: metadata-only pruning
    * (no decode) — the filter that must run BEFORE any codec touches
    * bytes at 100 TB. */
  def prunableMedia(df: DataFrame, kind: String, maxBytes: Int): DataFrame =
    df.filter(col("kind") === kind && octet_length(col("content")) <= maxBytes)

  /** Uniform frame-sampling schedule — the video-path planning step
    * that decides WHICH frames to decode before any codec touches
    * bytes: up to `maxFrames` midpoint-rule timestamps per media item,
    * capped at ~1 frame/second for short clips. Frame i of n lands at
    * floor(duration·(2i+1)/(2n)) ms, so samples are centered in equal
    * duration slices (no 0 ms / end-of-file frames). Pure codegen'd
    * arithmetic + one narrow explode; the schedule then drives the
    * batched [[extractFeatures]] decode with metadata-pruned inputs. */
  def frameSchedule(media: DataFrame, maxFrames: Int): DataFrame = {
    require(maxFrames > 0, "maxFrames must be positive")
    media
      .withColumn("n_frames",
        least(lit(maxFrames),
          greatest(floor(col("duration_ms") / 1000), lit(1L))).cast("int"))
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("duration_ms"))
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        floor(col("duration_ms") * (col("frame_idx") * 2 + 1) / (col("n_frames") * 2))
          .cast("long").as("ts_ms"))
  }

  /** Build a deterministic media table from the documents corpus (text
    * bytes as payload) — the test harness for the plumbing. */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit(64).as("width"),
      lit(64).as("height"),
      lit(0L).as("duration_ms")).as[MediaRecord]
  }
}
