package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join at scale.
  *
  * `points.p BETWEEN intervals.s AND intervals.e` has no equi-key, so
  * Catalyst plans it as BroadcastNestedLoopJoin (or a cartesian) — an
  * O(|P|·|I|) scan that is the canonical 100 TB cliff: fine at test SF,
  * catastrophic the day the interval side no longer broadcasts.
  *
  * The scale path is binning: quantize the domain into fixed-width bins,
  * explode each interval into the bins it covers, tag each point with
  * its single bin, and equi-join on the bin with the exact BETWEEN as a
  * residual filter. The join becomes a shuffle on bin ids —
  * partitionable, AQE-skew-splittable, broadcast-able when one side is
  * small — and the pair candidates drop from |P|·|I| to only those
  * sharing a bin. A point lives in exactly one bin, so each (point,
  * interval) pair meets at most once: no post-join dedup.
  *
  * Binning uses integer `div`, never floating division — at epoch-micros
  * magnitudes a double quotient can misround bin boundaries. `div`
  * truncates toward zero but is monotone, so interval enumeration
  * `[s div w, e div w]` covers every point bin even on negative domains.
  *
  * Bin width tunes the shuffle/residual trade-off: ~the typical interval
  * length keeps the per-interval fan-out at 1–2 bins. Degenerate giant
  * intervals (≫ width) fan out proportionally — cap them upstream or
  * widen the bins.
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing them
    * (inclusive bounds). `pointCol`/`startCol`/`endCol` are integral
    * columns on the same scale (e.g. epoch micros); column sets must be
    * disjoint. Output: all point columns + all interval columns. */
  def binnedPointIntervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "point and interval column names must be disjoint")
    val binned = intervals.withColumn("graft_bin",
      explode(sequence(
        expr(s"$startCol div ${binWidth}L"),
        expr(s"$endCol div ${binWidth}L"))))
    points
      .withColumn("graft_bin", expr(s"$pointCol div ${binWidth}L"))
      .join(binned, "graft_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("graft_bin")
  }

  /** Inner join of interval pairs that OVERLAP (inclusive bounds:
    * aStart ≤ bEnd ∧ bStart ≤ aEnd) — the sibling of the point form
    * for interval×interval workloads (temporal conflict detection,
    * genomic region intersection). Both sides explode to the bins
    * they touch and equi-join on (keys…, bin); a pair overlapping
    * several shared bins would duplicate, so the join keeps only the
    * FIRST shared bin (the larger of the two start bins — a pure
    * function of the pair, no distinct pass needed). Candidate count
    * is Σ per-bin |A||B| within each key group: `binWidth` trades
    * explode factor against per-bin density exactly as in the point
    * form, and the equi-keys keep it partitioned — never all-pairs
    * across keys. */
  def binnedOverlapJoin(
      a: DataFrame,
      aStart: String,
      aEnd: String,
      b: DataFrame,
      bStart: String,
      bEnd: String,
      keys: Seq[String],
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(a.columns.toSet.intersect(b.columns.toSet) == keys.toSet,
      "sides may share exactly the key columns")
    def expand(df: DataFrame, s: String, e: String) = df.withColumn("graft_bin",
      explode(sequence(expr(s"$s div ${binWidth}L"), expr(s"$e div ${binWidth}L"))))
    expand(a, aStart, aEnd)
      .join(expand(b, bStart, bEnd), keys :+ "graft_bin")
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      // dedupe multi-bin pairs arithmetically: keep the first bin both
      // touch = max of the two start bins
      .filter(col("graft_bin") ===
        greatest(expr(s"$aStart div ${binWidth}L"), expr(s"$bStart div ${binWidth}L")))
      .drop("graft_bin")
  }
}
