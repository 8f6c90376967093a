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
  * The token hash is FNV-1a (deterministic, seed-free, engine-neutral —
  * no dependence on Spark's Murmur seed). Not oracle-checkable in SQL
  * (bit-vote aggregation has no reasonable ANSI form), so this op is
  * covered by ScalaTest + a rows-only driver check.
  *
  * Scale: one map-side-combining aggregation per doc (merge is a 64-int
  * vector add), then candidate pairing by Hamming distance over the
  * band-rotated signature — never all-pairs.
  */
object Simhash {

  /** FNV-1a 64-bit. */
  private[ops] def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
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
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Per-doc SimHash signatures over whitespace tokens. */
  def signatures(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"))
      .agg(simhash(col("word")).as("simhash"))
}
