package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys.
  *
  * When a join key's distribution is heavily skewed (one product in 30%
  * of lines), the shuffle partition holding the hot key becomes the
  * straggler. Salting splits each hot key into `salts` sub-keys: the
  * fact side gets a random-but-deterministic salt from its row identity,
  * the dimension side is replicated once per salt value, and the join
  * runs on (key, salt) — same result set, `salts`× the parallelism on
  * the hot key at the cost of replicating the (small) dimension side.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) handles sort-merge skew at runtime; explicit salting
  * remains the tool for skewed *aggregations* and for joins where the
  * dim side must broadcast anyway.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways. The salt is
    * derived by hashing the fact row's own key + partition-stable id —
    * uniform enough to split hot keys, and irrelevant to the result
    * (every fact row still meets its dim row exactly once). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn(
      "__salt", pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(replicatedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Derive the salt fan-out from the MANIFEST skew statistic instead
    * of a caller guess (r16 — the move that turns the frequency
    * histogram from planner-advisory into engine-actionable, as the
    * NDV statistic already drives join reordering): the straggler is
    * the shuffle slot holding the hottest key, so size the split to
    * bring that key's mass down to `targetRowsPerSlot` —
    * `ceil(hottestCount / target)`, clamped to [1, maxSalts] (each
    * salt replicates the dim side once; past ~maxSalts the
    * replication cost dominates what straggler relief buys).
    * `counts` are the frequency map's counts — either value arm of
    * `Manifest.histMerged` / `shistMerged` or a
    * `CALL graft.system.histogram` result; the values themselves are
    * irrelevant here. None / empty (undeclared, or overflowed past
    * the caps — exactly the high-cardinality case where no single key
    * can be hot) falls back to `fallback`, the caller constant that
    * was the only option before the statistic existed. At 100 TB this
    * reads O(cap) manifest entries where the alternative is a full
    * GROUP-BY pass over the fact table — or a guessed constant that
    * under-splits (straggler survives) or over-splits (dim replicated
    * for nothing). */
  def saltsFromHistogram(counts: Option[Array[Long]], fallback: Int,
      targetRowsPerSlot: Long, maxSalts: Int = 64): Int = {
    require(targetRowsPerSlot > 0, "targetRowsPerSlot must be positive")
    counts.filter(_.nonEmpty) match {
      case Some(cs) =>
        val hot = cs.max
        math.max(1, math.min(maxSalts.toLong,
          (hot + targetRowsPerSlot - 1) / targetRowsPerSlot).toInt)
      case None => fallback
    }
  }

  /** The counts of a manifest's merged frequency map for `key` — both
    * value arms (only counts matter here); None when undeclared or
    * overflowed. ONE resolution shared by [[saltsForTable]] and the
    * `CALL graft.system.salts` SQL face. */
  def mapCounts(m: graft.sources.segment.Manifest,
      key: String): Option[Array[Long]] = {
    import graft.sources.segment.SegmentHistogram
    m.histMerged.get(key).map(SegmentHistogram.decode(_).map(_._2))
      .orElse(m.shistMerged.get(key)
        .map(SegmentHistogram.decodeStr(_).map(_._2)))
  }

  /** [[saltsFromHistogram]] reading a graft-segment table's manifest
    * directly — both the long and string arms of the merged maps
    * (only counts matter). */
  def saltsForTable(spark: org.apache.spark.sql.SparkSession, dir: String,
      key: String, fallback: Int, targetRowsPerSlot: Long,
      maxSalts: Int = 64): Int = {
    import graft.sources.segment.SegmentLog
    val fs = SegmentLog.fs(dir, spark.sessionState.newHadoopConf())
    val counts = SegmentLog.read(fs, dir).map(SegmentLog.logicalView)
      .flatMap(mapCounts(_, key))
    saltsFromHistogram(counts, fallback, targetRowsPerSlot, maxSalts)
  }
}
