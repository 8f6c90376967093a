package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct sketch — the SET-OPERATION
  * sketch beside [[Hll]].
  *
  * HLL registers union perfectly but cannot intersect: there is no
  * register arithmetic for |A ∩ B|, and the inclusion–exclusion detour
  * |A|+|B|−|A∪B| amplifies relative error catastrophically when the
  * intersection is small (the common case: vocabulary overlap between
  * languages, contamination between corpus shards). A KMV sketch — the
  * k smallest hash values of the distinct elements — supports
  * intersection DIRECTLY (Beyer et al., SIGMOD 2007): the k smallest of
  * A ∪ B are a uniform sample of the union, so the fraction of them
  * present in both sketches estimates Jaccard, and Ĵ · |A∪B|^ estimates
  * the intersection.
  *
  * Spark-first shape: the sketch IS a DataFrame (group..., hv) with
  * ≤ k rows per group — inspectable, mergeable by union + re-min-k
  * (min-k is associative + idempotent, so shard-then-merge ≡ direct,
  * the same exactness argument as [[Hll.merge]]), and reproducible by
  * any engine with md5 (the DuckDB oracle replays sketch AND estimates
  * bit-for-bit; estimates use single divisions of exact integers, so
  * no float-order ambiguity exists).
  *
  * Scale: the heavy step is deduplicating (group, hv) — one shuffle of
  * distinct hashes, the same cost class as [[Hll.sketch]]'s register
  * collapse. Selection then runs through [[graft.functions.BoundedTopK]]
  * (k-bounded PARTIAL aggregate): each map task keeps ≤ k values per
  * group, the exchange moves #groups × k rows, never the vocabulary.
  * A sketch row is 8 bytes; k = 1024 bounds every group's sketch at
  * ~8 KiB regardless of corpus size.
  *
  * Reference analog: none (exact counts at reference scale); this is
  * the overlap/contamination telemetry a 100 TB curation pipeline runs
  * between every pair of shards.
  */
object Kmv {

  /** Sketch frame (group..., hv): the k smallest 32-bit hashes of the
    * DISTINCT values per group. Hash space [0, 2^32) via the
    * engine-portable md5 construction shared with [[Hll.hash32]]. */
  def sketch(items: DataFrame, groupCols: Seq[String], value: Column, k: Int): DataFrame = {
    require(k > 1, "KMV needs k > 1 (the estimator divides by the k-th minimum)")
    val distinctHashes = items
      .select(groupCols.map(col) :+ Hll.hash32(value).as("hv"): _*)
      .distinct()
    distinctHashes
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopK.topKSmallest(col("hv"), k).as("mins"))
      .select(groupCols.map(col) :+ explode(col("mins")).as("hv"): _*)
  }

  /** Merge shard sketches (same k): union, re-take the k minima per
    * group. Distinct first — the same element sketched in two shards
    * appears once per shard with the same hash. */
  def merge(shards: Seq[DataFrame], groupCols: Seq[String], k: Int): DataFrame = {
    require(shards.nonEmpty, "merge needs at least one shard sketch")
    val all = shards.reduce(_ unionByName _).distinct()
    all.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopK.topKSmallest(col("hv"), k).as("mins"))
      .select(groupCols.map(col) :+ explode(col("mins")).as("hv"): _*)
  }

  /** Distinct-cardinality estimate per group. With n_sk = rows in the
    * sketch: exact n_sk when the group never filled its sketch
    * (n_sk < k — the sketch IS the distinct hash set), else the
    * classic unbiased (k−1) · 2^32 / h_(k) with h_(k) = the largest
    * retained hash. One division of exact integers — bit-deterministic
    * across engines and aggregation orders. */
  def estimateDistinct(sk: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sk"), max(col("hv")).as("h_k"))
      .select(
        groupCols.map(col) :+
          round(
            when(col("n_sk") < k, col("n_sk").cast("double"))
              .otherwise(lit((k - 1).toDouble * 4294967296.0) / col("h_k")),
            4).as("n_est"): _*)

  /** Pairwise overlap between the per-group sketches in `sk`, for every
    * unordered group pair (a < b): Jaccard and intersection estimates.
    *
    * Per pair: the k smallest of the UNION of the two sketches are a
    * uniform sample of A ∪ B (each sketch contains every union-minimum
    * that belongs to its set, so the union of sketches contains the k
    * union minima). Ĵ = |{union minima present in BOTH}| / k', and
    * |A∩B|^ = Ĵ · |A∪B|^ with the union cardinality estimated from the
    * k'-th union minimum. k' = min(k, union rows) handles unfilled
    * sketches exactly.
    *
    * Plan: self-join on hv (equi-join on the hash — posting-list shape,
    * never all-pairs), then one bounded window per pair to rank union
    * minima. Pair count is #groups², fine for group-typed sets
    * (languages, shards); per-DOCUMENT similarity goes through the
    * MinHash/LSH family instead. */
  def pairOverlap(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sk.select(col(groupCol).as("g_a"), col("hv"))
    val b = sk.select(col(groupCol).as("g_b"), col("hv"))
    // all hv rows of both sides per pair, tagged with membership; a
    // full outer per pair is just the union of the two sketch row sets
    // with a both-flag — build it as union + groupBy (hash-collision
    // safe: same hv in both sets is ONE union element by construction)
    val pairs = a.select(col("g_a")).distinct()
      .join(b.select(col("g_b")).distinct(), col("g_a") < col("g_b"))
    val tagged = pairs.join(a, Seq("g_a"))
      .select(col("g_a"), col("g_b"), col("hv"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(pairs.join(b, Seq("g_b"))
        .select(col("g_a"), col("g_b"), col("hv"), lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("g_a"), col("g_b"), col("hv"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("hv"))
    val ranked = tagged
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    val unionEst =
      when(col("kp") < k, col("kp").cast("double"))
        .otherwise(lit((k - 1).toDouble * 4294967296.0) / col("h_k"))
    ranked.groupBy(col("g_a"), col("g_b"))
      .agg(
        count(lit(1)).as("kp"),
        max(col("hv")).as("h_k"),
        sum((col("in_a") * col("in_b")).cast("long")).as("n_both"),
        sum((col("in_a") * (lit(1) - col("in_b"))).cast("long")).as("n_a_only"),
        sum(((lit(1) - col("in_a")) * col("in_b")).cast("long")).as("n_b_only"))
      .select(
        col("g_a"), col("g_b"),
        round(col("n_both").cast("double") / col("kp"), 4).as("jaccard_est"),
        round((col("n_both").cast("double") / col("kp")) * unionEst, 4)
          .as("inter_est"),
        // full set algebra from the same union sample: the minima in
        // exactly one sketch estimate the set differences
        round((col("n_a_only").cast("double") / col("kp")) * unionEst, 4)
          .as("a_only_est"),
        round((col("n_b_only").cast("double") / col("kp")) * unionEst, 4)
          .as("b_only_est"))
  }
}
