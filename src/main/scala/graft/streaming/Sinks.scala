package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._

/** Sink-side semantics: dead-letter routing (S4/ST2), at-most-once
  * notification (S8/ST3).
  *
  * The reference's DLQ is SQS redrive after maxReceiveCount=3
  * (iac/main.tf:21-24). Structured Streaming retries whole micro-batches,
  * so per-record attempt counts are tracked explicitly: the delivery log
  * records (key, attempt, outcome) and rows whose failures reach
  * maxAttempts divert to the dead-letter sink instead of blocking the
  * stream.
  */
object Sinks {

  /** Split a batch into (retryable, dead) given per-key attempt counts.
    * `attempts` is the count of prior failed deliveries per key. */
  def deadLetterSplit(
      batch: DataFrame,
      attempts: DataFrame, // (key, n_failures)
      keyCol: String,
      maxAttempts: Int = 3): (DataFrame, DataFrame) = {
    val joined = batch.join(attempts, Seq(keyCol), "left")
      .withColumn("n_failures", coalesce(col("n_failures"), lit(0)))
    (joined.filter(col("n_failures") < maxAttempts).drop("n_failures"),
      joined.filter(col("n_failures") >= maxAttempts))
  }

  /** S5's optional external-DB half (SURVEY §2 S5): a generic upsert
    * (MERGE) sink for `writeStream.foreachBatch` — each batch's rows
    * REPLACE the table's same-key rows, all other rows pass through,
    * mirroring the reference's per-order `INSERT ... / UPDATE orders
    * SET status=...` transaction (reference src/order_processor/
    * app.py:66-118). Engine-native target: a parquet snapshot chain
    * with [[SnapshotIngest]]'s exactly-once retry contract (read
    * newest-strictly-before, overwrite own batchId, prune keeping the
    * predecessor); read it back with [[SnapshotIngest.finalState]].
    *
    * Against a live external DB, the swap is the fold body only:
    * `(b, _) => b.write.mode("append").jdbc(url, table, props)` onto a
    * PRIMARY-KEY table with an upsert handler (MySQL `ON DUPLICATE KEY
    * UPDATE`, Postgres `ON CONFLICT DO UPDATE`), which is then
    * idempotent under batch retry BY KEY the same way this chain is.
    * No MySQL ships in this sandbox, so the parquet analog is the
    * certified path.
    *
    * Rows are replaced per KEY; if one batch carries several rows of a
    * key, all survive — pre-aggregate the batch (e.g. newest per key)
    * when last-write-wins within a batch is wanted, exactly as a JDBC
    * upsert loop would need. */
  def upsertSink(stateDir: String, keys: Seq[String]): (DataFrame, Long) => Unit =
    SnapshotIngest.foldBatch(stateDir) {
      case (None, batch) => batch
      case (Some(table), batch) =>
        table
          .join(batch.select(keys.map(col): _*).distinct(), keys, "left_anti")
          .unionByName(batch)
    }

  /** ST3 — the notifier deliberately swallows per-record errors
    * (reference src/notification_sender/app.py:24-26): log-and-drop,
    * never fail the batch. */
  final class LogSink(format: Row => String) extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(row: Row): Unit =
      try println(format(row))
      catch { case _: Exception => () } // at-most-once: drop malformed
    override def close(errorOrNull: Throwable): Unit = ()
  }
}
