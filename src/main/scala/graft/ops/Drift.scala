package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution drift between two table versions by Population
  * Stability Index: band a numeric column into fixed-width buckets,
  * compare the banded shares, PSI term per band
  * `(p - q) * ln(p / q)` — the monitoring statistic every production
  * scoring pipeline watches (rule of thumb: Σ < 0.1 stable, > 0.25
  * investigate). The drift complement of [[Diff]]: Diff recovers
  * WHICH rows changed, PSI says whether the SHAPE of the data moved.
  *
  * Two keyed aggregates (map-side combined, band-cardinality output)
  * + one broadcast-sized outer join on the band id — at 100 TB each
  * side is one scan; nothing about the comparison touches row pairs.
  * Determinism: bands and counts are exact integers, add-one
  * smoothing keeps empty bands finite (and is itself part of the
  * certified contract), shares divide exact integers in one fixed
  * expression order, and the per-band term is rounded only at the
  * output edge — no cross-band float accumulation, so there is no
  * summation-order hazard anywhere. */
object Drift {

  private def band(c: Column, width: Double, nBands: Int): Column =
    least(greatest(floor(c / width), lit(0)), lit(nBands - 1)).cast("int")

  /** Per-band PSI terms between `oldDf` and `newDf` on `valueCol`:
    * (band, n_old, n_new, psi_term). */
  def psi(
      oldDf: DataFrame, newDf: DataFrame, valueCol: String,
      width: Double, nBands: Int): DataFrame = {
    require(nBands >= 2, "need at least two bands")
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(band(col(valueCol), width, nBands).as("band"))
        .groupBy(col("band")).agg(count(lit(1)).as(as))
    val bands = oldDf.sparkSession.range(nBands).select(col("id").cast("int").as("band"))
    val joined = bands
      .join(counts(oldDf, "n_old"), Seq("band"), "left")
      .join(counts(newDf, "n_new"), Seq("band"), "left")
      .select(col("band"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = joined.agg(
      sum(col("n_old")).as("t_old"), sum(col("n_new")).as("t_new"))
    joined.crossJoin(broadcast(totals))
      .select(col("band"), col("n_old"), col("n_new"),
        round(
          (((col("n_old") + 1).cast("double") / (col("t_old") + nBands)) -
            ((col("n_new") + 1).cast("double") / (col("t_new") + nBands))) *
            log(((col("n_old") + 1).cast("double") / (col("t_old") + nBands)) /
              ((col("n_new") + 1).cast("double") / (col("t_new") + nBands))), 6)
          .as("psi_term"))
  }

  /** Embedding-distribution drift — the vector complement of [[psi]]:
    * compare two corpus versions by their per-dimension MEAN vectors,
    * reporting cosine-of-means and the relative L2 shift
    * ‖m_old − m_new‖/‖m_old‖ (the centroid-shift monitor an embedding
    * pipeline watches for encoder or upstream-distribution changes;
    * per-dimension variances would extend the same shape).
    *
    * Scale: one narrow posexplode + per-dimension aggregate per side
    * (map-side combined, d-row output), then a d-row join and a 1-row
    * aggregate — corpus-size-linear scans, constant-size everything
    * after. Determinism: the means are FLOAT-QUANTIZED before any
    * cross-dimension arithmetic (the [[Pca]] iterate discipline), so
    * partial-aggregation order cannot move the rounded outputs. */
  def embeddingShift(oldE: DataFrame, newE: DataFrame,
                     embCol: String = "embedding"): DataFrame = {
    def dimMeans(df: DataFrame, as: String): DataFrame =
      df.select(posexplode(col(embCol)).as(Seq("dim", "v")))
        .groupBy(col("dim"))
        .agg(avg(col("v").cast("double")).cast("float").cast("double").as(as))
    val j = dimMeans(oldE, "a").join(dimMeans(newE, "b"), Seq("dim"))
    j.agg(
      count(lit(1)).cast("int").as("n_dims"),
      round(sum(col("a") * col("b")) /
        (sqrt(sum(col("a") * col("a"))) * sqrt(sum(col("b") * col("b")))), 6)
        .as("cos_means"),
      round(sqrt(sum((col("a") - col("b")) * (col("a") - col("b")))) /
        sqrt(sum(col("a") * col("a"))), 6).as("shift_ratio"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic — the
    * banding-free complement of [[psi]]: D = max_v |F_a(v) − F_b(v)|,
    * the supremum CDF discrepancy, attained at a step point and so
    * evaluated exactly over the distinct values of the union. PSI's
    * verdict depends on the band width; KS has no knob, which is why
    * it is the standard drift TEST (reject at D > c(α)·√((nA+nB)/nA·nB))
    * where PSI is the drift MONITOR.
    *
    * The scale problem is the CDF: a global `ORDER BY v` cumulative
    * window funnels the whole value set through ONE partition. Here
    * the prefix sum is DISTRIBUTED: range-partition the per-value
    * counts by v, take P per-partition subtotals (P rows), turn them
    * into per-partition starting offsets with a P-row window, and add
    * local in-partition cumsums — two cheap shuffles plus a broadcast
    * of P offset rows, no single-partition stage anywhere. The range
    * exchange is consumed twice (subtotals + local scan) and reused
    * by Spark's exchange reuse.
    *
    * Determinism: counts are integers and the discrepancy is compared
    * as the integer |cumA·nB − cumB·nA| (exact while nA·nB < 2^63 —
    * past ~3·10^9 rows per side cast the products to DECIMAL(38,0));
    * the single final division is the only float op. */
  def ksStatistic(a: DataFrame, valueA: Column, b: DataFrame, valueB: Column,
                  parts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perValue = a.select(valueA.as("v"), lit(1).as("is_a"))
      .unionByName(b.select(valueB.as("v"), lit(0).as("is_a")))
      .groupBy(col("v"))
      .agg(sum(col("is_a")).as("n_a"), sum(lit(1) - col("is_a")).as("n_b"))
    val ranged = perValue.repartitionByRange(parts, col("v"))
      .withColumn("pid", spark_partition_id())
    // single-partition by DESIGN (O(parts) rows — the distributed
    // prefix-sum's tiny driver-adjacent step); the key must not be
    // foldable or EliminateWindowPartitions strips it and WindowExec
    // logs the global-sort warning this deliberately is not
    val offW = Window.partitionBy(pmod(hash(col("pid")), lit(1))).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("pid"))
      .agg(sum(col("n_a")).as("pa"), sum(col("n_b")).as("pb"))
      .select(col("pid"),
        coalesce(sum(col("pa")).over(offW), lit(0L)).as("off_a"),
        coalesce(sum(col("pb")).over(offW), lit(0L)).as("off_b"))
    val localW = Window.partitionBy(col("pid")).orderBy(col("v"))
    val totals = perValue.agg(sum(col("n_a")).as("na"), sum(col("n_b")).as("nb"))
    ranged.join(broadcast(offsets), Seq("pid"))
      .select(col("v"),
        (sum(col("n_a")).over(localW) + col("off_a")).as("ca"),
        (sum(col("n_b")).over(localW) + col("off_b")).as("cb"))
      .crossJoin(broadcast(totals))
      .agg(
        max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("num"),
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"))
      .select(
        round(col("num").cast("double") / (col("n_a") * col("n_b")).cast("double"), 6)
          .as("ks_d"),
        col("n_a"), col("n_b"))
  }
}
