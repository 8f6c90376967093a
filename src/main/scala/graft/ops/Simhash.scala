package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** 64-bit SimHash as a typed `Aggregator` — the custom-UDAF surface of
  * the engine (SURVEY.md §2.7). SimHash of a document = sign-vector of
  * the per-bit vote sum over its tokens' 64-bit hashes; near-duplicate
  * docs have small Hamming distance between their SimHashes.
  *
  * The token hash is the first 8 bytes (big-endian) of md5 over the
  * UTF-8 token — deterministic, seed-free, and engine-neutral: any SQL
  * engine with md5 can reproduce it from the hex digest (bit i of the
  * hash is bit i%4 of hex nibble 16 - i/4), which is exactly how the
  * driver's DuckDB oracle re-derives the bit votes.
  *
  * Scale: one map-side-combining aggregation per doc (merge is a 64-int
  * vector add), then candidate pairing by Hamming distance over the
  * band-rotated signature — never all-pairs.
  */
object Simhash {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(token), big-endian — h's most significant
    * nibble is the digest's first hex character. */
  private[graft] def hash64(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    h
  }

  private val agg: Aggregator[String, Array[Int], Long] =
    new Aggregator[String, Array[Int], Long] {
      override def zero: Array[Int] = new Array[Int](64)

      override def reduce(b: Array[Int], word: String): Array[Int] = {
        val h = hash64(word)
        var i = 0
        while (i < 64) {
          b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
        b
      }

      override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
        var i = 0
        while (i < 64) { a(i) += b(i); i += 1 }
        a
      }

      override def finish(b: Array[Int]): Long = {
        var r = 0L
        var i = 0
        while (i < 64) { if (b(i) > 0) r |= (1L << i); i += 1 }
        r
      }

      override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
      override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
    }

  /** Column form: `simhash(wordCol)` inside a groupBy-agg. */
  def simhash(word: Column): Column = udaf(agg).apply(word)

  /** Hamming distance between two SimHash columns. */
  def hamming(a: Column, b: Column): Column = Hamming.hamming(a, b)

  /** Per-doc SimHash signatures over whitespace tokens. */
  def signatures(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"))
      .agg(simhash(col("word")).as("simhash"))

  /** Near-dup pairs by Hamming distance over BANDED signatures — never
    * all-pairs: the 64-bit signature splits into 4×16-bit chunks and
    * candidate pairs come from an equi-join on (chunk_idx, chunk). By
    * pigeonhole a pair within Hamming distance 3 has its ≤3 differing
    * bits in ≤3 chunks, so it agrees on ≥1 chunk — for maxHamming ≤ 3
    * recall is COMPLETE and the result equals brute-force pairing
    * (exactly how the DuckDB oracle cross-checks it). At scale the
    * chunk equi-join shuffles 8-byte keys and buckets the corpus;
    * the all-pairs comparison never materializes. */
  def hammingPairs(docs: org.apache.spark.sql.DataFrame, maxHamming: Int = 3): org.apache.spark.sql.DataFrame =
    Hamming.bandedPairs(signatures(docs), "doc_id", "simhash", "doc", maxHamming)
}
