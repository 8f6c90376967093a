package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an ordered operations log
  * (insert/update/delete per key) into the table state it describes.
  *
  * The complement to [[Scd2]] (which keeps the full history): CDC
  * apply answers "what does the table look like NOW", the operation a
  * replication consumer runs on every synced batch. One window pass —
  * rank the log per key by (seq desc), keep the newest op, drop keys
  * whose newest op is a delete. A key deleted and later re-inserted
  * survives with the re-inserted payload: ONLY the newest op decides,
  * which is exactly upsert-with-tombstone semantics (pinned in
  * OpsSpec; certified end-to-end by store_cdc_apply against the
  * QUALIFY-window DuckDB oracle).
  *
  * Scale: one shuffle on the key, no self-join, no driver state. The
  * per-key rank never sorts more than one key's ops — a hot key pays
  * its own cost. For an incremental consumer the same function applies
  * a batch's log to produce a batch-sized upsert/delete set, which
  * merges into stored state with the [[Scd2.merge]]-style
  * touched-key replay; the one-shot form here is the semantics
  * contract both paths must satisfy.
  *
  * `seq` must be unique per key (a log sequence number / LSN — ties
  * would make "newest" ambiguous in any engine).
  */
object Cdc {

  /** Apply `log` (op ∈ {I, U, D} in `opCol`, ordered by `seqCol`
    * within each key) and return the final rows: every non-deleted
    * key's newest payload. */
  def apply(log: DataFrame, keyCols: Seq[String], seqCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    log
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn", opCol)
  }
}
