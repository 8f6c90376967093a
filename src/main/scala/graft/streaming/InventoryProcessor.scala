package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset, functions => F}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}

/** A2 v2 — the reserve phase of the transactional inventory on Spark 4's
  * `transformWithState` (RocksDB state store): per-product keyed state,
  * sequential check-and-decrement per micro-batch.
  *
  * This is the streaming-native analog of the reference's
  * `SELECT ... FOR UPDATE` + `UPDATE inventory SET qty = qty - n`
  * (reference src/order_processor/app.py:85-94): Spark guarantees a key's
  * rows are handled serially by one task per micro-batch, which subsumes
  * the row lock (SURVEY.md §2.3-J1, §4). Requests within a batch are
  * served in order_id order — the same deterministic serialization the
  * batch path declares.
  *
  * Scale: state is sharded by product across the cluster (RocksDB,
  * checkpointed incrementally); throughput scales with distinct keys,
  * and a hot product degrades to its single state partition — the same
  * bound the reference's row lock imposes, minus the network round trips.
  *
  * The order-level all-or-nothing composition (grant per line here →
  * group by order → compensate failed orders with +quantity re-entries)
  * is phase 2 of the v2 design; the exact-parity v1 path lives in
  * [[CheckoutStream.InventoryTable]].
  */
object InventoryProcessor {

  final case class LineRequest(order_id: String, product_id: String, quantity: Long)
  final case class LineVerdict(order_id: String, product_id: String, quantity: Long, granted: Boolean)
  final case class ProductStock(product_id: String, stock: Long)

  final class Processor
      extends StatefulProcessorWithInitialState[String, LineRequest, LineVerdict, ProductStock] {

    @transient private var stock: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stock = getHandle.getValueState[Long]("stock", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInitialState(
        key: String, initial: ProductStock, timerValues: TimerValues): Unit =
      stock.update(initial.stock)

    override def handleInputRows(
        key: String,
        rows: Iterator[LineRequest],
        timerValues: TimerValues): Iterator[LineVerdict] = {
      var available = if (stock.exists()) stock.get() else 0L
      // compensation credits (quantity < 0) apply first, then requests in
      // deterministic within-batch serialization by order_id (ST5).
      // NOTE: toSeq materializes one product's batch slice on this
      // task's heap to sort it — fine for checkout-shaped traffic
      // (requests per product per batch is small); a pathologically hot
      // key in a huge micro-batch would need a bounded/spilling sort
      // here, or rate control upstream (maxFilesPerTrigger).
      val verdicts = rows.toSeq.sortBy(r => (r.quantity >= 0, r.order_id)).map { r =>
        if (r.quantity < 0) { // saga rollback credit: always applied
          available -= r.quantity
          LineVerdict(r.order_id, r.product_id, r.quantity, granted = true)
        } else {
          val ok = available >= r.quantity
          if (ok) available -= r.quantity
          LineVerdict(r.order_id, r.product_id, r.quantity, ok)
        }
      }
      stock.update(available)
      verdicts.iterator
    }
  }

  /** Wire the processor over a keyed request stream with seeded stock. */
  def reserve(
      requests: KeyValueGroupedDataset[String, LineRequest],
      initialStock: KeyValueGroupedDataset[String, ProductStock]): Dataset[LineVerdict] = {
    implicit val verdictEnc: org.apache.spark.sql.Encoder[LineVerdict] =
      Encoders.product[LineVerdict]
    implicit val stockEnc: org.apache.spark.sql.Encoder[ProductStock] =
      Encoders.product[ProductStock]
    requests.transformWithState(
      new Processor, TimeMode.None(), OutputMode.Append(), initialStock)
  }

  // ---------------------------------------------------------------------
  // Phase 2 — order-level all-or-nothing as a saga over the keyed
  // reserve: grant per line above → group verdicts by order → emit
  // compensating +quantity credits for orders with any denied line. The
  // credits hop back into the SAME request stream (a queue hop, S3) and
  // are applied ahead of the next batch's requests, restoring stock —
  // the distributed rollback of the reference's transaction
  // (src/order_processor/app.py:60-108) with no per-batch full-table
  // rewrite: state stays sharded per product in RocksDB at any scale.
  // ---------------------------------------------------------------------

  /** All-or-nothing order verdict over line verdicts; credits (negative
    * quantities) are bookkeeping rows, not order lines. */
  def orderVerdicts(verdicts: Dataset[LineVerdict]): org.apache.spark.sql.DataFrame =
    verdicts.toDF()
      .filter(F.col("quantity") >= 0)
      .groupBy(F.col("order_id"))
      .agg(F.bool_and(F.col("granted")).as("all_granted"))

  /** Compensating credits: negate each granted line of every order with
    * a denied line. Feeding these back through `reserve` completes the
    * saga — conservation holds because a failed order's net effect on
    * every product is zero after its credits land. */
  def compensations(verdicts: Dataset[LineVerdict]): Dataset[LineRequest] = {
    implicit val reqEnc: org.apache.spark.sql.Encoder[LineRequest] =
      Encoders.product[LineRequest]
    // re-alias the key to fresh attributes: both join sides derive from
    // the same verdicts relation (a self-join Catalyst cannot always
    // deduplicate, e.g. over a streaming memory sink)
    val failed = orderVerdicts(verdicts)
      .filter(!F.col("all_granted"))
      .select(F.col("order_id")).toDF("failed_order_id")
    verdicts.toDF()
      .filter(F.col("granted") && F.col("quantity") > 0)
      .join(failed, F.col("order_id") === F.col("failed_order_id"))
      .select(F.col("order_id"), F.col("product_id"),
        (-F.col("quantity")).as("quantity"))
      .as[LineRequest]
  }
}
