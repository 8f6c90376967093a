package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
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
      // deterministic within-batch serialization by order_id (ST5)
      val verdicts = rows.toSeq.sortBy(_.order_id).map { r =>
        val ok = available >= r.quantity && r.quantity >= 0
        if (ok) available -= r.quantity
        LineVerdict(r.order_id, r.product_id, r.quantity, ok)
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
}
