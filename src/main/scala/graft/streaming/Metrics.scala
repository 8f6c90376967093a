package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a [[StreamingQueryListener]] that
  * accumulates per-micro-batch progress — batchId, input rows, state
  * rows (total/updated), event-time watermark — into a DataFrame. The
  * reference pipeline surfaces per-message outcomes and queue depth in
  * its hosted monitoring (reference src/notification_sender/app.py:21-22
  * logs per-notification; iac/main.tf:15-25 queue depth); this is the
  * engine-native analog an operator of a 100 TB/day pipeline reads
  * first: rows/batch (throughput), state size (memory pressure),
  * watermark lag (late-data horizon).
  *
  * Listener events are delivered asynchronously on the listener bus,
  * in per-query FIFO order (started → progress* → terminated).
  * [[Metrics.observe]] brackets a block: register, run, wait until
  * every query started inside the block has delivered its terminated
  * event (which, by FIFO, means all its progress rows have landed),
  * deregister. Only queries started while registered are recorded, so
  * concurrent suites don't leak into each other's frames.
  *
  * The collected metrics are driver-side and O(batches) — a handful of
  * numbers per micro-batch, never row-scaled.
  */
final class Metrics extends StreamingQueryListener {

  private case class BatchMetric(
      runId: String,
      name: String,
      batchId: Long,
      inputRows: Long,
      stateRows: Long,
      stateRowsUpdated: Long,
      rowsDroppedLate: Long,
      watermark: String)

  private val started = java.util.concurrent.ConcurrentHashMap.newKeySet[UUID]()
  private val terminated = java.util.concurrent.ConcurrentHashMap.newKeySet[UUID]()
  private val batches = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetric]()

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = {
    started.add(event.runId)
    ()
  }

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    if (started.contains(p.runId)) {
      val state = p.stateOperators
      batches.add(BatchMetric(
        p.runId.toString,
        Option(p.name).getOrElse(""),
        p.batchId,
        p.numInputRows,
        state.map(_.numRowsTotal).sum,
        state.map(_.numRowsUpdated).sum,
        state.map(_.numRowsDroppedByWatermark).sum,
        Option(p.eventTime.get("watermark")).getOrElse("")))
      ()
    }
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    if (started.contains(event.runId)) terminated.add(event.runId)
    ()
  }

  /** True once every started query's terminated event has arrived —
    * per-query FIFO then guarantees the progress rows are all here. */
  def drained: Boolean = {
    val s = new java.util.HashSet[UUID](started)
    terminated.containsAll(s)
  }

  /** Poll until [[drained]] or timeout; returns whether it drained. */
  def awaitDrained(timeoutMs: Long = 60000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!drained && System.nanoTime() < deadline) Thread.sleep(20)
    drained
  }

  /** The accumulated per-batch metrics as a DataFrame:
    * (query_name, run_id, batch_id, input_rows, state_rows,
    * state_rows_updated, rows_dropped_late, watermark). */
  def frame(spark: SparkSession): DataFrame = {
    val rows = batches.toArray(Array.empty[BatchMetric]).toSeq
      .map(m => (m.name, m.runId, m.batchId, m.inputRows,
        m.stateRows, m.stateRowsUpdated, m.rowsDroppedLate, m.watermark))
    import spark.implicits._
    rows.toDF("query_name", "run_id", "batch_id", "input_rows",
      "state_rows", "state_rows_updated", "rows_dropped_late", "watermark")
  }
}

object Metrics {

  /** Run `body` with a fresh [[Metrics]] listener registered on
    * `spark`, wait for the queries it started to drain their events,
    * and return (result, metrics). The listener is always removed. */
  def observe[A](spark: SparkSession)(body: => A): (A, Metrics) = {
    val m = new Metrics
    spark.streams.addListener(m)
    try {
      val a = body
      m.awaitDrained()
      (a, m)
    } finally spark.streams.removeListener(m)
  }
}
