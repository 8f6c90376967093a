package graft.process

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Model

/** The checkout core, batch formulation: dedup (A3), unnest (G1),
  * inventory lookup join (J1/J1a), per-key decrement (A1), all-or-nothing
  * order verdict (A2), status upsert (A4/A5) — reference
  * src/order_processor/app.py:32-124.
  *
  * Scale design (100 TB):
  *  - The inventory side of J1 is a dimension table (5 rows in the
  *    reference, `part`-derived here) — always `broadcast()`, so the
  *    per-line verdict is a map-side hash join with zero shuffle of the
  *    fact table.
  *  - A1/A2 aggregate by key (`l_orderkey` / product id) — one shuffle
  *    each, with map-side partial aggregation; AQE coalesces the
  *    post-shuffle partitions. There is no per-row driver round trip
  *    anywhere (the reference does ≥4 DB round trips per order,
  *    SURVEY.md §4).
  *  - Batch-mode verdicts are contention-free by construction: demand is
  *    compared against the full stock per line, and the final-inventory
  *    roll-up only deducts PROCESSED orders. Arrival-order-dependent
  *    contention semantics live in the streaming path
  *    (graft.streaming.CheckoutStream), per SURVEY.md §5.2.2.
  */
object Checkout {

  // ---------------------------------------------------------------------
  // A3 — dedup by key, deterministically. The reference's INSERT IGNORE
  // keeps the FIRST delivery of an order_id (app.py:66-75); batch analog
  // keeps the row with the smallest tiebreaker per key. row_number (not
  // dropDuplicates) so "which row survives" is defined, testable, and
  // oracle-checkable.
  // ---------------------------------------------------------------------
  def dedupFirstBy(df: DataFrame, key: Seq[String], tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(col(tiebreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Redelivery simulation + idempotent consume (ST4): every order
    * delivered twice, consumed once. Output is a one-row conservation
    * check: distinct orders, total deliveries, duplicates skipped. */
  def idempotentConsume(orders: DataFrame): DataFrame = {
    val redelivered = orders.select(col("o_orderkey")).unionAll(orders.select(col("o_orderkey")))
    redelivered
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("deliveries"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("deliveries")).as("n_deliveries"),
        (sum(col("deliveries")) - count(lit(1))).as("n_skipped"))
  }

  // ---------------------------------------------------------------------
  // Inventory — the `part` table plays the reference's inventory
  // (db/init_schema.sql:2-6): product_id ≙ p_partkey, stock derived
  // deterministically from p_size so the oracle can reproduce it.
  // ---------------------------------------------------------------------
  def inventoryFromParts(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey").as("product_id"),
      (col("p_size") * 10).as("stock"))

  // ---------------------------------------------------------------------
  // G1 — unnest round trip: orders-with-items built from lineitem
  // (collect_list of item structs, sorted for determinism), then exploded
  // back to per-(order, product) work units — the `for item in items`
  // loop at reference src/order_processor/app.py:80 as a Generator.
  // ---------------------------------------------------------------------
  def ordersWithItems(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber").as("line"),
        col("l_partkey").as("product_id"),
        col("l_quantity").cast("int").as("quantity")))).as("items"))

  def explodeItems(ordersWithItems: DataFrame): DataFrame =
    ordersWithItems
      .select(col("l_orderkey"), explode(col("items")).as("item"))
      .select(
        col("l_orderkey"),
        col("item.line").as("line"),
        col("item.product_id").as("product_id"),
        col("item.quantity").as("quantity"))

  // ---------------------------------------------------------------------
  // J1 — point-lookup equi-join of the stream against inventory
  // (reference src/order_processor/app.py:85, SELECT ... FOR UPDATE).
  // Inventory is a dimension ⇒ broadcast hash join; the lock is
  // irrelevant in batch (pure), and subsumed by per-key serial state in
  // streaming. `sufficient` is the per-line verdict of app.py:88.
  // ---------------------------------------------------------------------
  def lineVerdicts(lineitem: DataFrame, inventory: DataFrame): DataFrame =
    lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_quantity").cast("int").as("qty"))
      .join(broadcast(inventory), col("l_partkey") === inventory("product_id"), "left")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("qty"),
        coalesce(col("stock"), lit(0)).as("stock"),
        (coalesce(col("stock"), lit(0)) >= col("qty")).as("sufficient"))

  // J1a — missing-key detection (reference app.py:88 `if not result`):
  // lines whose product is absent from inventory, isolated with a
  // left-anti join.
  def unknownProducts(lineitem: DataFrame, inventory: DataFrame): DataFrame =
    lineitem
      .join(broadcast(inventory), col("l_partkey") === inventory("product_id"), "left_anti")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"))

  // ---------------------------------------------------------------------
  // A2 — all-or-nothing order verdict: an order is PROCESSED iff every
  // line is sufficient (the transaction at reference app.py:60-108 —
  // commit iff no item failed, rollback otherwise). bool_and ≙ the `break`
  // on first insufficiency: short-circuit inside codegen.
  // ---------------------------------------------------------------------
  def orderVerdicts(lineVerdicts: DataFrame): DataFrame =
    lineVerdicts
      .groupBy(col("l_orderkey"))
      .agg(
        bool_and(col("sufficient")).as("ok"),
        count(lit(1)).as("n_items"))
      .select(
        col("l_orderkey"),
        when(col("ok"), Model.StatusProcessed).otherwise(Model.StatusFailed).as("status"),
        col("n_items"))

  // ---------------------------------------------------------------------
  // A1 — per-key running decrement, rolled up: final inventory = stock −
  // demand of PROCESSED orders only (FAILED orders roll back fully,
  // reference app.py:108: ROLLBACK undoes all decrements).
  // ---------------------------------------------------------------------
  def finalInventory(
      inventory: DataFrame,
      lineVerdicts: DataFrame,
      orderVerdicts: DataFrame): DataFrame = {
    val processedDemand = lineVerdicts
      .join(orderVerdicts.filter(col("status") === Model.StatusProcessed)
        .select(col("l_orderkey")), Seq("l_orderkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("demand"))
    inventory
      .join(processedDemand, inventory("product_id") === col("l_partkey"), "left")
      .select(
        col("product_id"),
        col("stock"),
        coalesce(col("demand"), lit(0L)).as("demand"),
        (col("stock") - coalesce(col("demand"), lit(0L))).as("remaining"))
  }

  // ---------------------------------------------------------------------
  // A4/A5 — status upsert: merge verdicts into the orders table
  // (reference app.py:99 UPDATE→PROCESSED; app.py:112-118 upsert FAILED).
  // Batch merge = left join + coalesce; the streaming upsert sink lives in
  // graft.streaming (foreachBatch merge).
  // ---------------------------------------------------------------------
  def statusUpsert(orders: DataFrame, orderVerdicts: DataFrame): DataFrame =
    orders
      .join(orderVerdicts.select(col("l_orderkey"), col("status")),
        orders("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        coalesce(col("status"), lit(Model.StatusPending)).as("final_status"))

  /** Full pipeline: lineitem+part → per-order verdict. The flagship
    * composition (explode-shaped fact scan → broadcast lookup →
    * all-or-nothing aggregate). */
  def checkout(lineitem: DataFrame, part: DataFrame): DataFrame =
    orderVerdicts(lineVerdicts(lineitem, inventoryFromParts(part)))
}
