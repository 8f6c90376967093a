package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hand-built runtime bloom-filter join pruning — the semi-join
  * reduction that matters at 100 TB: when a selective dimension filter
  * keeps only a sliver of join keys, the fact side should be pruned
  * BEFORE it shuffles (or even before it leaves the scan's codegen
  * stage), not carried to the join to be dropped there. Catalyst's own
  * InjectRuntimeFilter does this opportunistically; this operator is
  * the explicit, always-on form with the same correctness contract:
  * `mightContain` has NO false negatives, so prefilter + join ≡ join
  * (certified by running the pruned join against the plain join's
  * DuckDB oracle).
  *
  * Everything is codegen'd builtins — no UDF, no custom Expression:
  *  - build: DISTINCT keys → explode k hash-bit positions →
  *    (word, mask) → `bit_or` aggregate; only the m/64-long word
  *    array returns to the driver (the build is fully distributed,
  *    with map-side partial bit_or).
  *  - probe: AND over k tests of
  *    `element_at(words, pos/64 + 1) & (1 << pos%64) != 0` with
  *    `pos = pmod(xxhash64(seed_i, key), m)` — a literal array lookup
  *    plus integer ops, all inside whole-stage codegen (the repeated
  *    xxhash64 calls collapse under subexpression elimination).
  *
  * The words array is a plain broadcast-sized literal (1 MiB per ~1M
  * keys at 1% fpp, capped at 16 MiB) — the same budget as broadcasting
  * the dim itself, but the probe is a hash + bit test instead of a
  * hash-table lookup, and it composes with ANY downstream join
  * strategy (sort-merge included, where it cuts the fact shuffle).
  */
object Bloom {

  /** A built filter: bitset words + geometry. */
  final case class Filter(words: Array[Long], mBits: Long, k: Int) {
    def sizeBytes: Long = words.length * 8L
  }

  /** Standard sizing: m = -n·ln(p)/ln²2 bits, k = (m/n)·ln 2 probes. */
  def optimalBits(n: Long, fpp: Double): Long =
    math.max(64L, math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

  def optimalK(m: Long, n: Long): Int =
    math.max(1, math.round(m.toDouble / n.toDouble * math.log(2)).toInt)

  private[graft] def bitPos(key: Column, seed: Int, m: Long): Column =
    pmod(xxhash64(lit(seed), key), lit(m))

  private[graft] def bitMask(pos: Column): Column =
    call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast("int"))

  /** Distributed build over the DISTINCT values of `keyCol`.
    * `expectedDistinct` sizes the bitset (production passes a stats
    * estimate; an overshoot only wastes bits, an undershoot only raises
    * fpp — correctness never depends on it). */
  def build(keys: DataFrame, keyCol: String, expectedDistinct: Long, fpp: Double = 0.01): Filter = {
    val n = math.max(1L, expectedDistinct)
    val m = math.min(optimalBits(n, fpp), 1L << 27) // cap the literal at 16 MiB
    val k = optimalK(m, n)
    val rows = keys.select(col(keyCol).as("key")).distinct()
      .select(explode(array((0 until k).map(i => bitPos(col("key"), i, m)): _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"), bitMask(col("pos")).as("mask"))
      .groupBy(col("w")).agg(bit_or(col("mask")).as("word"))
      .collect()
    val words = new Array[Long](((m + 63) / 64).toInt)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    Filter(words, m, k)
  }

  /** Membership probe predicate — false positives possible (bounded by
    * fpp), false negatives impossible; safe as a join prefilter. */
  def mightContain(f: Filter, key: Column): Column = {
    val words = typedlit(f.words.toSeq)
    (0 until f.k).map { i =>
      val pos = bitPos(key, i, f.mBits)
      element_at(words, (pos / 64).cast("int") + 1)
        .bitwiseAND(bitMask(pos)) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Bloom-pruned equi-join: prefilter the (big) probe side with a
    * filter built from the (small/filtered) build side, then run the
    * real join — identical result, reduced probe-side shuffle. */
  def prunedJoin(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      expectedDistinct: Long,
      fpp: Double = 0.01): DataFrame = {
    val f = Bloom.build(build, keyCol, expectedDistinct, fpp)
    probe.filter(mightContain(f, col(keyCol))).join(build, Seq(keyCol))
  }
}
