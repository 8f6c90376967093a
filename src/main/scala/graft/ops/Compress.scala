package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deflate-compression quality signal — the classic "compressibility"
  * heuristic of large-scale corpus filtering: highly repetitive or
  * templated documents compress far below natural prose, and machine-
  * generated spam compresses below both, so `compressed_bytes /
  * raw_bytes` is a cheap one-pass quality feature alongside the
  * relational ones in [[TextOps]] (length / punctuation / stopword
  * ratios). Public-knowledge technique (used by the Gopher/MassiveText
  * and RefinedWeb filtering rules, among others).
  *
  * Unlike the other text signals this one is NOT expressible as a
  * Catalyst column tree — DEFLATE is an imperative LZ77+Huffman coder
  * — so it runs as `mapPartitions` with ONE `java.util.zip.Deflater`
  * instance reused (reset) across the partition's rows: the genuine
  * per-partition-imperative-logic case the engine reserves RDD-shaped
  * execution for. Map-only, no shuffle, O(bytes) per row — at 100 TB
  * the cost is the scan plus ~30 MB/s/core of deflate, and the
  * operator chains before the quality filter so rejected docs never
  * reach a shuffle.
  *
  * Certification is by ScalaTest spec, not DuckDB oracle: the byte-
  * exact DEFLATE output is a zlib implementation detail no SQL engine
  * re-derives (same reason the video codec stays a documented stub).
  * The spec pins (a) determinism across runs, (b) ratio bounds,
  * (c) the discriminating property the signal exists for — repetitive
  * text compresses well below natural prose, which compresses below
  * incompressible noise.
  */
object Compress {

  /** (doc_id, n_bytes, n_deflated, compress_ratio) for every document;
    * `level` is the standard zlib 1..9 trade-off (default 6). Empty
    * documents get ratio 1.0 (no evidence either way — they are the
    * length filter's job, not this one's). */
  def compressionSignals(docs: DataFrame, level: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val out = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        rows.map { case (id, text) =>
          val raw = Option(text).getOrElse("").getBytes("UTF-8")
          if (raw.isEmpty) (id, 0, 0, 1.0)
          else {
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var n = 0
            while (!deflater.finished()) n += deflater.deflate(buf)
            (id, raw.length, n, n.toDouble / raw.length)
          }
        }
      }
    out.toDF("doc_id", "n_bytes", "n_deflated", "compress_ratio")
  }

  /** The filter the signal feeds: keep documents whose ratio sits in
    * [lo, hi] — below `lo` is template/repetition spam, above `hi` is
    * binary junk or noise masquerading as text. */
  def compressionFilter(docs: DataFrame, lo: Double, hi: Double, level: Int = 6): DataFrame =
    docs.join(
      compressionSignals(docs, level)
        .filter(col("compress_ratio").between(lo, hi))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
}
