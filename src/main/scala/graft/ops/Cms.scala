package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a RELATIONAL frame — bounded-cardinality
  * frequency estimation for heavy-hitter queries.
  *
  * The exact term-frequency aggregate shuffles one key per distinct
  * term: at web-corpus scale that is billions of keys, most of them
  * singletons nobody will ever query. The CMS bounds the aggregation
  * cardinality at d·w cells REGARDLESS of vocabulary size: each token
  * occurrence votes into d (row, bucket) cells, map-side combine
  * collapses every partition to ≤ d·w rows, and the final shuffle
  * carries at most d·w keys. Estimates carry the classic one-sided
  * guarantee — est ≥ exact always, overshooting by collision mass
  * ≈ N·d/w with probability decaying in d.
  *
  * Spark-first shape: the sketch IS a DataFrame ((row, bucket) → cnt),
  * built from codegen'd builtins — no UDAF, no driver state, and
  * mergeable across corpora by unioning frames and re-aggregating.
  * The bucket hash is md5-derived (first 8 hex chars as a 32-bit
  * value, mod w) so any engine with md5 reproduces it bit-for-bit —
  * `text_cms_topk` replays sketch, point queries, and the estimate
  * min in SQL.
  */
object Cms {

  /** Bucket of `word` under hash row `i`: first 8 md5 hex chars of
    * (i ++ word) as an unsigned 32-bit value, mod `w`. */
  def bucket(word: Column, i: Column, w: Int): Column =
    conv(substring(md5(concat(i.cast("string"), word)), 1, 8), 16, 10)
      .cast("long") % w

  /** The d×w counter table over token occurrences: (row, bucket, cnt).
    * Cells nothing hashed into are absent (semantically zero). */
  def sketch(docs: DataFrame, d: Int, w: Int): DataFrame =
    sketchValues(
      TextOps.withTokens(docs).select(explode(col("words")).as("word")),
      col("word"), d, w)

  /** The same counter table over an arbitrary value column — each row's
    * value votes into d (row, bucket) cells. */
  def sketchValues(df: DataFrame, value: Column, d: Int, w: Int): DataFrame =
    df
      .select(explode(array((0 until d).map(i =>
        struct(lit(i).as("row"),
          bucket(value.cast("string"), lit(i), w).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Equi-join cardinality estimate from two sketches over the join
    * keys (the CMS inner product): per hash row, Σ_buckets cntA·cntB
    * counts every true matching pair once PLUS collision mass, so each
    * row overestimates |A ⋈ B| one-sidedly and the min over the d rows
    * is the estimate — join-size estimation without touching either
    * table again, the optimizer primitive behind join-order and
    * broadcast decisions when stats are stale. Sketches are d·w cells
    * regardless of table size and mergeable across partitions/shards,
    * so the estimate costs two bounded aggregates, not a join. */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame): DataFrame = {
    // a hash row whose cell sets don't overlap at all has TRUE inner
    // product 0 — it must stay in the min as 0, not vanish from the
    // inner join's groupBy (disjoint key sets would otherwise return
    // an empty frame, and partial overlap would inflate the min)
    val rows = skA.select(col("row"))
      .unionByName(skB.select(col("row"))).distinct()
    val prod = skA.withColumnRenamed("cnt", "cnt_a")
      .join(skB.withColumnRenamed("cnt", "cnt_b"), Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("est"))
    rows.join(prod, Seq("row"), "left")
      .agg(coalesce(min(coalesce(col("est"), lit(0L))), lit(0L)).as("n_est"))
  }

  /** Point-query `queries` (a frame with a `word` column) against a
    * sketch: estimate = min over the d rows of the counter each hash
    * lands in. Absent cells are zero, but a queried word that was
    * sketched always finds its own votes, so the min never sees an
    * absent cell for corpus words. */
  def estimate(sk: DataFrame, queries: DataFrame, d: Int, w: Int): DataFrame =
    queries
      .select(col("*"), explode(array((0 until d).map(i =>
        struct(lit(i).as("row"), bucket(col("word"), lit(i), w).as("bucket"))): _*)).as("c"))
      .join(sk, col("c.row") === sk("row") && col("c.bucket") === sk("bucket"))
      .groupBy(queries.columns.map(col): _*)
      .agg(min(col("cnt")).as("n_est"))
}
