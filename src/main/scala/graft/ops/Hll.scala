package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch as a RELATIONAL register frame.
  *
  * An exact per-group `count(distinct x)` shuffles every distinct value
  * as a key: at web-corpus scale that is the vocabulary itself, most of
  * it singletons. The HLL register table bounds the shuffle at m = 2^p
  * rows per group REGARDLESS of cardinality: each occurrence votes a
  * (register, rho) pair, map-side combine collapses every partition to
  * ≤ m rows per group, and the final shuffle carries at most m keys per
  * group. Sketches are mergeable across shards/corpora by unioning the
  * frames and re-taking the max — `max` is associative and idempotent,
  * so shard-then-merge is EXACTLY the direct sketch (asserted in
  * OpsSpec, not just approximately equal).
  *
  * Spark-first shape: the sketch IS a DataFrame (group, register,
  * max_rho) built from codegen'd builtins — no UDAF, no binary blob the
  * engine can't inspect, and any engine with md5 reproduces it
  * bit-for-bit (the DuckDB oracle replays sketch AND estimate).
  *
  * Determinism of the estimate, exactly: every 2^-rho term is a power
  * of two and the register count fits 2^p, so all partial sums span
  * < 53 bits of exponent — every intermediate double is EXACT and the
  * estimate is independent of Spark's aggregation order. The oracle's
  * equality check is therefore bit-for-bit, not tolerance-based.
  *
  * Standard HLL (Flajolet et al. 2007): hash to 32 bits (md5's first 8
  * hex chars), register = top p bits, rho = position of the first 1-bit
  * in the remaining w = 32-p bits (w+1 if zero). rho is computed with
  * INTEGER string ops — `w + 1 - length(bin(rem))` (0 for rem=0) — never
  * floor(log2(x)), whose float rounding at exact powers of two would
  * silently disagree between engines.
  *
  * Reference analog: none (the reference keeps exact counts at its
  * scale); this is the BASELINE.json LLM-pipeline north star — corpus
  * vocabulary / distinct-URL telemetry at 100 TB.
  */
object Hll {

  /** 32-bit hash of `value`: first 8 md5 hex chars as an unsigned int,
    * the same engine-portable construction as Cms.bucket. */
  def hash32(value: Column): Column =
    conv(substring(md5(value), 1, 8), 16, 10).cast("long")

  /** Register frame over `value` occurrences, grouped by `groupCols`:
    * (group..., register, max_rho), ≤ 2^p register rows per group.
    * Duplicate values hash identically, so multiplicity never moves a
    * register — no pre-distinct needed. */
  def sketch(items: DataFrame, groupCols: Seq[String], value: Column, p: Int): DataFrame = {
    val w = 32 - p
    val h = hash32(value)
    val rem = h % lit(1L << w)
    items
      .select(
        groupCols.map(col) :+
          floor(h / lit(1L << w)).cast("int").as("register") :+
          // first-1-bit position in the w-bit remainder: bin() emits no
          // leading zeros, so its length IS 1 + floor(log2(rem)) for
          // rem > 0, and rem = 0 contributes 0 digits, giving w+1 —
          // integer-exact, and avoids the deprecated two-arg ltrim
          (lit(w + 1) - when(rem === 0, lit(0)).otherwise(length(bin(rem))))
            .cast("int").as("rho"): _*)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Merge shard sketches (same p): union the frames, re-take the max.
    * max is associative + idempotent ⇒ identical to the direct sketch. */
  def merge(shards: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(shards.nonEmpty, "merge needs at least one shard sketch")
    shards.reduce(_ unionByName _)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("max_rho")).as("max_rho"))
  }

  /** Cardinality estimate per group from a register frame: the standard
    * bias-corrected harmonic mean with the linear-counting branch for
    * the small range. Absent registers contribute 2^0 = 1 to the sum
    * and count as zeros. All arithmetic mirrors the oracle SQL token
    * for token so the rounded estimate matches bit-for-bit. */
  def estimate(sk: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val agg = sk
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("np"),
        sum(pow(lit(2.0), -col("max_rho"))).as("sp"))
    val raw = alpha * lit(m.toDouble) * lit(m.toDouble) /
      ((lit(m.toDouble) - col("np")) + col("sp"))
    val zeros = lit(m.toDouble) - col("np")
    agg
      .withColumn("raw", raw)
      .select(
        groupCols.map(col) :+
          round(
            when(col("raw") <= lit(2.5 * m) && zeros > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / zeros))
              .otherwise(col("raw")),
            4).as("n_est"): _*)
  }
}
