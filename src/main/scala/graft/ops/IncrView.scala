package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregate view: a per-key summary table
  * (count / sum / min / max) refreshed by DELTA batches instead of
  * recomputed from the full fact table.
  *
  * At 100 TB a nightly full `GROUP BY` over the fact table rescans
  * everything to refresh a summary that yesterday's run already knew;
  * the incremental path aggregates only the delta (map-side combined to
  * ≤ |delta keys| rows) and merges it into the state frame with one
  * equi-join. Cost ∝ delta, not table. `merge(build(a), b) ≡
  * build(a ∪ b)` for insert-only deltas — certified against the
  * full-rebuild DuckDB oracle (store_incr_agg) and pinned as a
  * property in OpsSpec at several batch boundaries.
  *
  * Only MERGEABLE aggregates are maintained (count/sum add; min/max
  * combine under insert-only deltas — a retraction would need the
  * full per-key history, which is what [[Scd2]] keeps). The summed
  * measure must live in an EXACT domain (integer cents, decimal — not
  * raw doubles): an incremental view adds in a different order than a
  * rebuild, and float addition is not associative, so a double-summed
  * view silently drifts from its own definition. The query surface
  * converts price→cents before summing for exactly this reason.
  *
  * Scale note: the merge join shuffles the state frame on the key
  * unless the state is stored bucketed by it — write the state table
  * with [[graft.sources.Bucketing]] on the view key and the state side
  * of every refresh plans exchange-free (the same amortized-shuffle
  * design BucketingSpec asserts on the physical plan).
  *
  * Reference analog: the running inventory/status tables (SURVEY.md
  * §2.4 A1/A4) are 1-row-per-key upserts; this is their aggregate
  * generalization.
  */
object IncrView {

  /** Aggregate `rows` into the view shape: keys, n_rows, sum_v, min_v,
    * max_v. One shuffle on the keys, partial aggregation map-side. */
  def build(rows: DataFrame, keys: Seq[String], value: Column): DataFrame =
    rows
      .select(keys.map(col) :+ value.as("v"): _*)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))

  /** Incremental maintenance of an equi-JOIN view — the other classic
    * delta rule: with stored pre-batch sides A, B and insert-only
    * deltas ΔA, ΔB,
    *
    *   Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * so a refresh appends rows at cost ∝ |Δ| × match-rate, never
    * |A ⋈ B| — the reason a 100 TB denormalized view is refreshable
    * at all. Insert-only, like [[merge]]: a retraction needs the
    * keyed history ([[Scd2]]). Each arm is one equi-join whose delta
    * side AQE broadcasts when small; store the big sides bucketed on
    * the key ([[graft.sources.Bucketing]]) and the stored-side scans
    * plan exchange-free. Certified by store_incr_join: stored view ∪
    * this delta ≡ the full rebuild over the unioned sides. */
  def joinDelta(aOld: DataFrame, bOld: DataFrame,
                aDelta: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** Merge an insert-only delta batch into existing state: the delta
    * reduces to its own tiny view first, then one full-outer equi-join
    * combines per key (count/sum add, min/max via null-skipping
    * least/greatest). Keys absent from the delta pass through; keys
    * new in the delta appear. */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val d = build(delta, keys, value)
      .withColumnRenamed("n_rows", "d_n")
      .withColumnRenamed("sum_v", "d_sum")
      .withColumnRenamed("min_v", "d_min")
      .withColumnRenamed("max_v", "d_max")
    state
      .join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("d_sum"), lit(0L))).as("sum_v"),
        least(col("min_v"), col("d_min")).as("min_v"),
        greatest(col("max_v"), col("d_max")).as("max_v")): _*)
  }
}
