package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.multimodal.Multimodal.{ImageDecoder, MediaRecord}

/** Perceptual image hashing (dHash) + near-duplicate pairing — the
  * image analog of text SimHash: byte-level dedup misses re-encoded or
  * brightness-shifted copies of the same picture; a 64-bit gradient
  * hash over a fixed-size luma downsample catches them, and the banded
  * Hamming join ([[graft.ops.Hamming.bandedPairs]]) finds candidate
  * pairs without ever materializing all-pairs.
  *
  * dHash (difference hash): decode → nearest-neighbor downsample to a
  * 9×8 integer-luma grid → bit (y·8+x) set iff gray(x+1,y) > gray(x,y).
  * Comparing ADJACENT pixels makes the hash invariant to any global
  * brightness shift (both sides of every comparison move together) —
  * exactly the near-dup class exact dedup can't see.
  *
  * Everything is integer arithmetic (the 299/587/114 Rec.601 luma
  * weights sum to 1000, so gray pixels decode to their exact gray
  * value), which is what lets the DuckDB oracle state the expected
  * hash of the synthetic corpus in closed form and brute-force-verify
  * the banded join's complete recall at Hamming ≤ 3.
  *
  * Scale: decode+hash is one narrow mapPartitions pass (same batch
  * shape as [[Multimodal.extractFeatures]]); pairing shuffles 8-byte
  * chunk keys. Reference analog: none — LLM-pipeline extension
  * (BASELINE.json).
  */
object Phash {

  /** 64-bit dHash of a decoded image: 9×8 NN-downsampled integer luma,
    * row-major adjacent-pixel gradient bits. */
  def dhash(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        // floor-division NN sampling; integer Rec.601 luma (sums to /1000)
        val p = img.getRGB(x * w / 9, y * h / 8)
        gray(y)(x) =
          (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    var hash = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(y)(x + 1) > gray(y)(x)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** (media_id, phash) signatures — REAL decode via ImageIO, one
    * streaming per-partition pass; non-image payloads are dropped
    * (corrupt tails route to a DLQ at scale, not into signatures). */
  def signatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => ImageDecoder.read(r.content).map(img => (r.media_id, dhash(img))))
    }.toDF("media_id", "phash")
  }

  /** Near-dup image pairs `(media_a, media_b, hamming)` with Hamming
    * distance ≤ maxHamming (≤ 3 for complete banded recall). */
  def pairs(media: Dataset[MediaRecord], maxHamming: Int = 3): DataFrame =
    graft.ops.Hamming.bandedPairs(signatures(media), "media_id", "phash", "media", maxHamming)
      .orderBy(col("media_a"), col("media_b"))
}
