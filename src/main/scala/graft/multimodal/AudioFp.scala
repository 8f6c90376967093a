package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ops.Hamming

/** Acoustic fingerprinting for audio dedup — the audio analog of
  * [[Phash]]: decode REAL PCM (JDK `javax.sound.sampled`, see
  * [[Multimodal.AudioDecoder]]), reduce each clip to a 64-bit
  * energy-envelope delta hash, and pair near-duplicates with the shared
  * banded-Hamming join.
  *
  * The fingerprint is the chromaprint idea at its integer-exact core:
  * split the PCM stream into fixed windows, take each window's total
  * absolute amplitude (its energy — a Long, no floats anywhere), and
  * set bit k iff energy rises from window k to k+1. Encoding the
  * envelope's SHAPE rather than its level makes the hash invariant to
  * constant gain: a volume-normalized or re-mastered copy has every
  * sample scaled/offset but the same rise/fall pattern, so it hashes
  * identically while byte-level dedup sees a different file. That is
  * the duplicate class this catches (mm_audio_dup_pairs certifies it
  * on planted volume-shifted copies).
  *
  * Scale shape: decode is the per-partition imperative codec exception
  * (same as image decode — a Catalyst expression cannot host a codec);
  * everything after is 8 bytes per clip. Pairing is the 4×16-bit-chunk
  * equi-join of [[graft.ops.Hamming]] — complete recall at Hamming ≤ 3
  * by pigeonhole, never all-pairs. 100 TB of audio reduces to a
  * #clips × 8-byte signature table before any join.
  */
object AudioFp {

  /** Per-clip 64-bit envelope fingerprint from decoded 16-bit mono PCM:
    * `nWindows` windows of `window` samples, bit k = energy(k+1) >
    * energy(k) (k < nWindows-1 bits used). Clips that decode to fewer
    * than `window * nWindows` samples are dropped (the DLQ tail). */
  def fingerprints(media: Dataset[Multimodal.MediaRecord],
                   window: Int = 16, nWindows: Int = 32): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        Multimodal.AudioDecoder.read(r.content).collect {
          case (fmt, pcm)
            if fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
              fmt.getChannels == 1 && pcm.length >= 2 * window * nWindows =>
            val energy = new Array[Long](nWindows)
            var k = 0
            while (k < nWindows) {
              var e = 0L
              var i = 0
              while (i < window) {
                val off = 2 * (k * window + i)
                e += math.abs(((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toShort.toInt)
                i += 1
              }
              energy(k) = e
              k += 1
            }
            var h = 0L
            k = 0
            while (k < nWindows - 1) {
              if (energy(k + 1) > energy(k)) h |= 1L << k
              k += 1
            }
            (r.media_id, h)
        }
      }
    }.toDF("media_id", "afp")
  }

  /** Near-duplicate clip pairs at Hamming ≤ `maxHamming` over the
    * envelope fingerprints — banded join, complete recall ≤ 3. */
  def pairs(media: Dataset[Multimodal.MediaRecord], maxHamming: Int): DataFrame =
    Hamming.bandedPairs(fingerprints(media), "media_id", "afp", "media", maxHamming)
      .orderBy(col("media_a"), col("media_b"))

  /** Deterministic amplitude-modulated synthetic WAV corpus — the
    * oracle harness for the fingerprint path, mirroring
    * [[Multimodal.syntheticAudio]] (which is constant-amplitude and so
    * has a FLAT envelope — useless for an envelope hash). Docs sharing
    * `doc_id % 50` get the same 32-window amplitude pattern; the
    * per-doc volume offset `(doc_id / 50) * 10` shifts every window's
    * level without changing any rise/fall comparison, planting exact
    * fingerprint-duplicate classes whose WAV bytes all differ. Square
    * sign flips every 4 samples keep |sample| = the window amplitude
    * exactly, so window energies — and every hash bit — have closed
    * forms the DuckDB oracle states directly. */
  def syntheticAmAudio(documents: DataFrame): Dataset[Multimodal.MediaRecord] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val cls = (d % 50).toInt
        val off = ((d / 50) * 10).toInt
        val (window, nWindows) = (16, 32)
        val n = window * nWindows
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val k = i / window
          // (c+7)(k+3)·13 mixes the class into every window DELTA (not
          // just the level), giving 50 fully distinct envelope classes
          val amp = 600 + ((cls + 7) * (k + 3) * 13) % 900 + off
          val s = if ((i / 4) % 2 == 0) amp else -amp
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
        Multimodal.MediaRecord(d, "audio", baos.toByteArray, 0, 0, n * 1000L / 8000)
      }
    }
  }
}
