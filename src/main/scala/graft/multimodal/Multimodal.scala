package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video treated as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batched per-partition passes.
  *
  * IMAGE decode is REAL: [[ImageDecoder]] drives the JDK's built-in
  * `javax.imageio` codecs (PNG/JPEG/GIF/BMP — public, offline, zero
  * extra dependencies) and [[decodeImageStats]] emits exact per-channel
  * pixel sums, oracle-certified end-to-end against closed-form expected
  * values (encode → PNG bytes → ImageIO decode → stats). AUDIO decode
  * is REAL too: [[AudioDecoder]] parses WAV through the JDK's
  * `javax.sound.sampled` and [[decodeAudioStats]] emits exact PCM
  * sample statistics, oracle-certified the same way. Video codecs
  * don't ship with the JDK, so those payloads fall back to
  * [[StubDecoder]]'s deterministic fake features — the schema contract,
  * partition sizing, batch shape, and the mapPartitions pipeline (the
  * JVM analog of a Pandas-UDF `mapInPandas` micro-batch loop) are the
  * same either way.
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

  /** Real image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP
    * readers ship with the JDK — no external codec dependency). A
    * magic-byte sniff gates the decode attempt so arbitrary binary
    * payloads don't pay a parse failure. */
  object ImageDecoder {
    /** PNG / JPEG / GIF / BMP signatures — the formats the built-in
      * ImageIO readers handle. */
    def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
        (b(0) == 'B' && b(1) == 'M'))

    def read(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!looksLikeImage(content)) None
      else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))

    /** dim-8 feature vector from real pixels: width, height, mean
      * R/G/B in [0,1], mean luma (Rec.601), fill-degree of the byte
      * payload vs pixel count. Deterministic row-major scan. */
    def features(img: java.awt.image.BufferedImage, nBytes: Int): Array[Float] = {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val (mr, mg, mb) = (sr.toFloat / (255f * n), sg.toFloat / (255f * n), sb.toFloat / (255f * n))
      Array(w.toFloat, h.toFloat, mr, mg, mb,
        0.299f * mr + 0.587f * mg + 0.114f * mb, nBytes.toFloat / n, 0f)
    }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (the WAV/
    * AIFF/AU container parsers and PCM codec ship with the JDK — same
    * zero-dependency story as ImageIO for images). A RIFF/WAVE
    * magic-byte sniff gates the parse attempt. */
  object AudioDecoder {
    def looksLikeWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** Parse a WAV payload to (format, raw PCM bytes); None for
      * non-WAV or corrupt payloads (the DLQ tail at scale). */
    def read(content: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
      if (!looksLikeWav(content)) None
      else try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(content))
        try Some((ais.getFormat, ais.readAllBytes()))
        finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Exact decoded-audio statistics — all integers (frame counts and
    * 16-bit sample sums), hash-comparable against a closed-form oracle
    * with zero float parity risk. */
  final case class AudioStats(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      sum_abs: Long,
      peak: Int)

  /** Decode WAV payloads and emit exact PCM sample statistics
    * (16-bit signed little-endian, the canonical WAV encoding).
    * Non-decodable payloads are dropped — corrupt tails route to a
    * DLQ at scale, not into features. */
  def decodeAudioStats(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        AudioDecoder.read(r.content).collect {
          case (fmt, pcm) if fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian =>
            var (sumAbs, peak) = (0L, 0)
            var i = 0
            while (i + 1 < pcm.length) {
              val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toInt
              val a = math.abs(s)
              sumAbs += a
              if (a > peak) peak = a
              i += 2
            }
            AudioStats(r.media_id, fmt.getSampleRate.toInt, fmt.getChannels,
              pcm.length / (2L * fmt.getChannels), sumAbs, peak)
        }
      }
    }
  }

  /** Deterministic synthetic WAV corpus from doc ids — the test/oracle
    * harness for the REAL audio path, mirroring [[syntheticImages]]:
    * each doc becomes a mono 8 kHz 16-bit square wave with
    * formula-derived amplitude and length. Square waves keep every
    * sample at ±A exactly, so the decoded stats have closed forms the
    * oracle can state in SQL (sum_abs = n·A, peak = A) — certifying
    * the whole encode → WAV bytes → AudioSystem decode → PCM parse
    * chain with integer-exact comparisons. */
  def syntheticAudio(documents: DataFrame): Dataset[MediaRecord] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val amp = ((d * 97) % 16384 + 1000).toInt
        val halfPeriod = (4 + d % 7).toInt
        val n = (400 + d % 50).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = if ((i / halfPeriod) % 2 == 0) amp else -amp
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        MediaRecord(d, "audio", baos.toByteArray, 0, 0, n * 1000L / 8000)
      }
    }
  }

  /** Exact decoded-pixel statistics — all integers, so the row is
    * hash-comparable against a closed-form oracle with zero float
    * parity risk. */
  final case class ImageStats(
      media_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Exact statistics of a nearest-neighbor-resized decode — the resize
    * half of the multimodal pipeline (SURVEY §"multimodal": decode /
    * feature-extract / RESIZE / frame-sample), certified with the same
    * closed-form-oracle shape as [[decodeImageStats]]. */
  final case class ResizedStats(
      media_id: Long,
      src_w: Int,
      src_h: Int,
      out_w: Int,
      out_h: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** REAL image resize to a fixed (outW x outH) thumbnail — the
    * normalization step every vision-training pipeline runs before
    * batching (models take fixed tensors; corpora don't). Decode is
    * ImageIO; the resample is an explicit nearest-neighbor raster loop
    * with the integer sampling convention `src_x = x * srcW / outW`
    * (floor division) — pinned HERE rather than delegated to
    * Graphics2D so the operator's output is a closed-form function of
    * the input pixels that the DuckDB oracle can state in SQL
    * (AffineTransformOp's rounding convention is an implementation
    * detail no oracle should have to reverse-engineer). Per-channel
    * sums over the resized raster are exact integers — zero float
    * parity risk. Non-decodable payloads drop (DLQ at scale, as in
    * [[decodeImageStats]]). Map-only: scales to any corpus with no
    * shuffle; at 100 TB the cost is decode IO, exactly where it
    * belongs. */
  def resizeImageStats(
      media: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageDecoder.read(r.content).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val p = img.getRGB(x * w / outW, sy)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          ResizedStats(r.media_id, w, h, outW, outH, sr, sg, sb)
        }
      }
    }
  }

  /** Batched per-partition decode — one decoder instance per partition,
    * rows processed in a streaming iterator (never materialize the
    * partition), the same batch shape `mapInPandas` gives Python.
    * Image payloads (by magic bytes) decode for REAL through ImageIO;
    * everything else falls back to the deterministic stub features. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would open a non-JDK codec once here
      rows.map { r =>
        val feats = ImageDecoder.read(r.content) match {
          case Some(img) => ImageDecoder.features(img, r.content.length)
          case None => StubDecoder.decode(r.content)
        }
        MediaFeatures(
          r.media_id, r.kind, r.content.length,
          StubDecoder.checksum(r.content), feats)
      }
    }
  }

  /** Decode images and emit exact per-channel pixel sums (row-major
    * scan over the decoded raster). Non-decodable payloads are dropped —
    * at 100 TB the corrupt tail routes to a DLQ, not into features. */
  def decodeImageStats(media: Dataset[MediaRecord]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageDecoder.read(r.content).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          ImageStats(r.media_id, w, h, w.toLong * h, sr, sg, sb)
        }
      }
    }
  }

  /** Deterministic synthetic PNG corpus from doc ids — the test/oracle
    * harness for the REAL decode path: each doc becomes a two-band
    * image (left/right halves in formula-derived colors), encoded to
    * PNG bytes on the executors. PNG is lossless, so ImageIO decode
    * must return exactly these pixels — the oracle checks the pixel
    * sums against the same closed-form formulas in SQL, certifying the
    * whole encode → bytes → decode → stats chain. */
  def syntheticImages(documents: DataFrame): Dataset[MediaRecord] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val w = (8 + d % 9).toInt
        val h = (8 + d % 7).toInt
        val wa = w / 2
        def c(m: Long): Int = ((d * m) % 256).toInt
        val colA = (c(37) << 16) | (c(59) << 8) | c(83)
        val colB = (c(101) << 16) | (c(131) << 8) | c(151)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, if (x < wa) colA else colB); x += 1 }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        MediaRecord(d, "image", baos.toByteArray, w, h, 0L)
      }
    }
  }

  /** Deterministic synthetic gradient-PNG corpus for the perceptual-hash
    * path ([[Phash]]): docs come in groups of 4 (`doc_id / 4`) sharing a
    * diagonal gray gradient (distinct column and row slopes, so the
    * hash uses all 64 bits and cross-group collisions stay rare);
    * within a group, variant `v = doc_id % 4`
    * shifts EVERY pixel's gray by +v — a global brightness shift, the
    * classic near-duplicate that byte/checksum dedup cannot see but
    * dHash is invariant to. Variant 3 additionally perturbs one pixel
    * of the bottom sampled row (copying its left sampled neighbor's
    * gray), planting a genuine small-Hamming pair (≤ 2 bits) so the
    * pairing exercises nonzero distances too.
    *
    * Gray pixels (r=g=b) plus the 299+587+114=1000 luma identity make
    * the decoded 9×8 luma grid — and therefore the dHash — a closed-form
    * function of doc_id the DuckDB oracle states in SQL. Gradient base
    * stays in [0, 251] so +v never clamps or wraps. */
  def syntheticGradientImages(documents: DataFrame): Dataset[MediaRecord] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val grp = d / 4
        val v = (d % 4).toInt
        val base = (grp * 37 % 252).toInt
        val k = (7 + grp % 11).toInt
        val j = (3 + grp % 5).toInt // per-row term: hashes use all 64 bits
        val (w, h) = (18, 16)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // variant-3 perturbation at exactly the pixel the 9×8
            // downsample reads for (x=4, y=7): copy sampled x=3's gray
            val g =
              if (v == 3 && x == 8 && y == 14) (base + 6 * k + 14 * j) % 252 + v
              else (base + x * k + y * j) % 252 + v
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        MediaRecord(d, "image", baos.toByteArray, w, h, 0L)
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
