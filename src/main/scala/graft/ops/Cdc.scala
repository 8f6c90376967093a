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

  /** Time travel by log replay: the table as of `version` — ops with
    * seq beyond it simply have not happened yet. The semantics
    * contract for any faster read path. */
  def applyAt(log: DataFrame, keyCols: Seq[String], seqCol: String,
              opCol: String, version: Long): DataFrame =
    apply(log.filter(col(seqCol) <= version), keyCols, seqCol, opCol)

  /** Time travel the way a table format actually serves it: the
    * nearest checkpoint at-or-before the requested version plus the
    * delta tail in `(checkpointVersion, version]` — read cost is
    * checkpoint size + tail size, never full history (the Delta/
    * Iceberg snapshot-plus-log read shape; at 100 TB replaying a
    * year's log to answer "last Tuesday" is not a plan). Checkpoint
    * rows re-enter as inserts carrying their ORIGINAL seq (all
    * strictly below the tail's), so newest-op-wins arbitration is
    * unchanged — certified equal to full replay in OpsSpec and, end
    * to end, by store_time_travel's full-replay oracle.
    *
    * `checkpointState` must be [[apply]]'s output at
    * `checkpointVersion` (keys live, tombstones resolved, `seqCol`
    * retained). Retention policy falls out for free: a log prefix may
    * be dropped once a checkpoint at-or-after it exists.
    */
  def applyAt(log: DataFrame, keyCols: Seq[String], seqCol: String,
              opCol: String, version: Long,
              checkpointVersion: Long, checkpointState: DataFrame): DataFrame = {
    require(checkpointVersion <= version,
      s"checkpoint $checkpointVersion is past the requested version $version")
    val tail = log.filter(col(seqCol) > checkpointVersion && col(seqCol) <= version)
    val base = checkpointState.withColumn(opCol, lit("I"))
    apply(base.unionByName(tail), keyCols, seqCol, opCol)
  }

  /** Log compaction — the retention operation time travel needs: the
    * prefix at-or-before `checkpointVersion` collapses to the
    * checkpoint state re-expressed as inserts (original seqs kept),
    * the tail passes through untouched. Versions ≥ the checkpoint
    * remain exactly readable (OpsSpec pins [[applyAt]] equality over
    * the compacted log); versions before it are the retention
    * casualty, by choice. The Kafka-compacted-topic / Delta-vacuum
    * semantics, as one shuffle-free union. */
  def compactLog(log: DataFrame, keyCols: Seq[String], seqCol: String,
                 opCol: String, checkpointVersion: Long): DataFrame =
    applyAt(log, keyCols, seqCol, opCol, checkpointVersion)
      .withColumn(opCol, lit("I"))
      .unionByName(log.filter(col(seqCol) > checkpointVersion))
}
