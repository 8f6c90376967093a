package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact percentile WITHOUT a global sort — distributed selection by
  * iterative histogram narrowing. `sort().limit(r)` or a global
  * row_number is the textbook formulation and serializes the corpus
  * through one task's sort at 100 TB; `approx_percentile` gives up
  * exactness. This gives both: each round histograms the current value
  * range into `buckets` equi-width bins (one filtered aggregate, ≤
  * `buckets` rows to the driver — the embBits-style O(1) exception),
  * locates the bin containing the target rank, and recurses into it.
  * The range shrinks ×buckets per round, so an integer domain resolves
  * in ceil(log_buckets(range)) rounds — 2 scans for a million-wide
  * domain — and the answer falls out when the bin narrows to a single
  * value: NO sort, NO per-row driver data, exact by construction.
  *
  * Rank semantics: value at rank ceil(p·n), 1-based ascending — the
  * discrete (no-interpolation) percentile, certified against direct
  * rank selection in DuckDB (text_exact_percentiles). Works on any
  * integral column; ties are value-identical so bin selection is
  * unambiguous. The degenerate all-equal-values corpus converges in
  * one round (everything lands in one bin that is already one value
  * wide) — the case where a "sort just the candidate bucket" fallback
  * would have silently degraded to the global sort.
  */
object Quantiles {

  /** (p, value) rows for each requested percentile of `value`. */
  def exactPercentiles(df: DataFrame, value: String,
                       ps: Seq[Double], buckets: Int = 1024): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "percentiles must be in (0, 1]")
    require(buckets >= 2, "need at least 2 buckets")
    val base = df.select(col(value).cast("long").as("v")).filter(col("v").isNotNull)
    val st = base.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    require(!st.isNullAt(0), s"no non-null values in $value")
    val (mn, mx, n) = (st.getLong(0), st.getLong(1), st.getLong(2))
    val spark = df.sparkSession
    import spark.implicits._
    ps.map(p => (p, kth(base, math.ceil(p * n).toLong, mn, mx, buckets)))
      .toDF("p", "value")
  }

  /** k-th smallest (1-based) of base.v within [lo0, hi0], by histogram
    * narrowing until the live range is one value wide. */
  private def kth(base: DataFrame, k: Long, lo0: Long, hi0: Long, buckets: Int): Long = {
    var lo = lo0
    var hi = hi0 + 1 // exclusive
    var kk = k
    while (hi - lo > 1) {
      val width = math.max(1L, math.ceil((hi - lo).toDouble / buckets).toLong)
      val hist = base
        .filter(col("v") >= lo && col("v") < hi)
        .groupBy(floor((col("v") - lo) / width).cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      var chosen = -1L
      var before = 0L
      for ((b, c) <- hist if chosen < 0) {
        if (acc + c >= kk) { chosen = b; before = acc }
        acc += c
      }
      require(chosen >= 0, s"rank $kk fell outside the histogram — " +
        "value distribution changed mid-computation")
      kk -= before
      lo = lo + chosen * width
      hi = math.min(hi, lo + width)
    }
    lo
  }

  /** MERGEABLE quantile sketch — the third sketch beside [[Hll]]
    * (distinct counts) and [[Cms]] (frequencies): a per-key equi-width
    * histogram over a declared [lo, hi) domain. Shards sketch
    * independently and merge by ADDING bin counts (sum is associative
    * and exact on integers), so the estimate after any merge tree is
    * bit-identical to the one-shot sketch — certified by sharing one
    * oracle between the direct and shard-merged paths, the Hll
    * discipline. Unlike [[exactPercentiles]] (exact, but iterative),
    * one pass and O(keys × nBins) state; error is bounded by the bin
    * width — the declared-domain tradeoff every serving system takes
    * for dashboard percentiles. Values outside [lo, hi) clamp into the
    * edge bins, where they can shift the estimate by at most one bin. */
  def histogramSketch(df: DataFrame, keys: Seq[String], value: String,
                      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo, "need hi > lo and at least 2 bins")
    val width = (hi - lo) / nBins
    // NaN policy, explicit: top bin, per Spark's NaN-is-largest
    // ordering. Without the guard NaN PROPAGATES through
    // least/greatest and the int cast lands it at bin 0 — an
    // incidental artifact, not a policy. The native twin
    // [[graft.functions.HistQuantiles]] bins NaN identically.
    val v = col(value).cast("double")
    val bin = when(isnan(v), lit(nBins - 1)).otherwise(
        least(greatest(floor((v - lit(lo)) / lit(width)), lit(0)), lit(nBins - 1)))
      .cast("int")
    df.select(keys.map(col) :+ bin.as("bin"): _*)
      .groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a (possibly merged) sketch: for each
    * requested q, the first bin whose cumulative count reaches
    * q·n, linearly interpolated inside the bin. Integer cumulative
    * counts and one fixed-order double expression per estimate, so
    * every engine computes the identical rounded value. */
  def estimateFromSketch(sketch: DataFrame, keys: Seq[String],
                         lo: Double, hi: Double, nBins: Int,
                         qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val width = (hi - lo) / nBins
    val spark = sketch.sparkSession
    import spark.implicits._
    val qdf = qs.toDF("q")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("bin"))
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n_total",
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)))
    cum.crossJoin(qdf)
      .withColumn("target", col("q") * col("n_total"))
      .filter(col("cum") >= col("target") &&
        (col("cum") - col("cnt")).cast("double") < col("target"))
      .select(keys.map(col) ++ Seq(col("q"),
        round(lit(lo) + col("bin") * lit(width) +
          lit(width) * (col("target") - (col("cum") - col("cnt"))) / col("cnt"), 4)
          .as("q_est")): _*)
  }
}
