package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: every change row becomes a
  * validity interval `[valid_from, valid_to)` per key, `valid_to` open
  * (null) on the current row. The upsert semantics of the reference's
  * status table (SURVEY.md §2.4 A4/A5) keep only the latest row; SCD2
  * is the audit-grade generalization a warehouse needs — the full
  * status timeline, point-in-time queryable.
  *
  * Scale design:
  *  - [[build]] is ONE window pass — one shuffle on the key, `lead`
  *    over (ts, tie) within each key's partition. No self-join.
  *  - [[merge]] is the incremental path: a new change batch rebuilds
  *    ONLY the touched keys (left_semi replay + union with the batch),
  *    while untouched history passes through with a left_anti — cost
  *    scales with the batch's key set, not table size. The touched-key
  *    frame is batch-sized, so both the semi and anti joins broadcast.
  *    `merge(build(early), late) ≡ build(early ∪ late)` — certified
  *    against the full-rebuild DuckDB oracle (store_scd2_merge) and
  *    pinned as a property in OpsSpec.
  *  - [[pointInTime]] is a filter, not a window: the snapshot at t is
  *    the rows whose interval covers t — partition-prunable when the
  *    history is stored partitioned on `valid_to IS NULL` / date.
  */
object Scd2 {

  /** Full SCD2 build from a change log: `valid_to` = next change's ts
    * per key (ties broken by `tie`, which must be unique per key). */
  def build(changes: DataFrame, key: String, ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    changes
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental merge of a change batch into existing history:
    * untouched keys pass through, touched keys replay their history
    * rows plus the new changes through [[build]]. */
  def merge(history: DataFrame, changes: DataFrame, key: String, ts: String, tie: String): DataFrame = {
    val touched = changes.select(col(key)).distinct()
    val untouched = history.join(touched, Seq(key), "left_anti")
    val replayed = history.join(touched, Seq(key), "left_semi")
      .drop("valid_to", "is_current")
    untouched.unionByName(build(replayed.unionByName(changes), key, ts, tie))
  }

  /** Snapshot as of `asOf`: the one interval per key covering it. */
  def pointInTime(history: DataFrame, ts: String, asOf: org.apache.spark.sql.Column): DataFrame =
    history.filter(col(ts) <= asOf && (col("valid_to").isNull || col("valid_to") > asOf))

  /** Temporal join: each FACT row picks the dimension version valid
    * at its own timestamp — the event-time lookup every warehouse
    * fact load performs against an SCD2 dimension ("what tier was
    * this customer in WHEN the order happened", not now). The join
    * carries the KEY as its equi conjunct — Catalyst plans a hash or
    * sort-merge join on the key with the interval cover as residual
    * condition, so the shuffle is the key shuffle a plain dimension
    * join would pay; at 100 TB both sides co-locate when bucketed on
    * the key (sources.Bucketing). Intervals per key partition time
    * (lead-built, half-open), so at most ONE version matches each
    * fact — no post-join dedup. Facts predating their key's first
    * version survive with null dimension columns (left join):
    * dropping them would silently shrink the fact table. */
  def temporalJoin(
      facts: DataFrame, history: DataFrame,
      key: String, factTs: String, histTs: String): DataFrame =
    facts.join(history,
      facts(key) === history(key) &&
        history(histTs) <= facts(factTs) &&
        (history("valid_to").isNull || history("valid_to") > facts(factTs)),
      "left")
      .drop(history(key))
}
