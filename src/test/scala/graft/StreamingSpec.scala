package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Model
import graft.streaming.{CheckoutStream, Sinks}

/** Structured Streaming semantics (M3 / ST1-ST7): micro-batch delivery,
  * watermarked dedup, transactional inventory via foreachBatch, DLQ. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("ST1/ST4: dropDuplicates over a memory stream dedups across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val dedup = mem.toDF().toDF("order_id", "seq")
      .dropDuplicates("order_id")
    val q = dedup.writeStream
      .format("memory").queryName("dedup_out").outputMode("update")
      .option("checkpointLocation", tmp("graft-ckpt")).start()
    mem.addData(("o-1", 1L), ("o-2", 2L))
    q.processAllAvailable()
    mem.addData(("o-1", 3L)) // redelivery in a later micro-batch
    q.processAllAvailable()
    val rows = spark.table("dedup_out").collect()
    q.stop()
    assert(rows.map(_.getString(0)).toSeq.sorted === Seq("o-1", "o-2"))
  }

  test("end-to-end: raw JSON stream -> parse/validate -> dedup -> inventory -> verdict sink") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val (valid, _) = CheckoutStream.parseOrderStream(mem.toDF().toDF("body"), "body")

    val invDir = tmp("graft-inv")
    val inv = new CheckoutStream.InventoryTable(spark, invDir)
    inv.initialize(Seq(("prod-101", 50), ("prod-105", 5)).toDF("product_id", "stock"))

    val verdictsPath = tmp("graft-verdicts")
    val q = CheckoutStream.start(valid, inv, verdictsPath, tmp("graft-ckpt2"))
      .trigger(Trigger.ProcessingTime(0)) // MemoryStream + AvailableNow don't mix in tests
      .start()

    mem.addData(
      """{"order_id":"o-1","customer_id":"c1","items":[{"product_id":"prod-101","quantity":2}]}""",
      """{"order_id":"o-2","customer_id":"c2","items":[{"product_id":"prod-105","quantity":9}]}""")
    q.processAllAvailable()
    q.stop()

    val verdicts = spark.read.parquet(verdictsPath)
    val byOrder = verdicts.collect()
      .map(r => r.getAs[String]("order_id") -> r.getAs[String]("status")).toMap
    assert(byOrder === Map("o-1" -> Model.StatusProcessed, "o-2" -> Model.StatusFailed))
    // inventory decremented only for the PROCESSED order
    val stock = inv.current().collect()
      .map(r => r.getAs[String]("product_id") -> r.getAs[Int]("stock")).toMap
    assert(stock === Map("prod-101" -> 48, "prod-105" -> 5))
  }

  test("ST2: dead-letter split diverts keys at maxAttempts, keeps the rest") {
    val batch = Seq(("k1", "payload1"), ("k2", "payload2")).toDF("key", "payload")
    val attempts = Seq(("k1", 3)).toDF("key", "n_failures")
    val (ok, dead) = Sinks.deadLetterSplit(batch, attempts, "key", maxAttempts = 3)
    assert(ok.collect().map(_.getString(0)).toSeq === Seq("k2"))
    assert(dead.collect().map(_.getString(0)).toSeq === Seq("k1"))
  }

  test("ST6: event-time windows run identically over a stream with watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val windowed = mem.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = windowed.writeStream
      .format("memory").queryName("win_out").outputMode("complete").start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:50:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), "click"))
    q.processAllAvailable()
    val rows = spark.table("win_out").collect()
    q.stop()
    assert(rows.map(_.getAs[Long]("n")).sorted.toSeq === Seq(1L, 2L))
  }
}
