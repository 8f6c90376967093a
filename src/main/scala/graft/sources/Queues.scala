package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queue-source adapters: the reference's SQS hops (SURVEY §2 S2–S3;
  * iac/main.tf:15-25 queue, iac/processor.tf:95-100 trigger) modeled
  * over interchangeable transports. Every certified streaming
  * pipeline in this engine consumes ONE shape — a streaming frame
  * with a raw JSON string column `value` — so the transport is a
  * plug: the file queue below is what the oracle gate certifies, and
  * the Kafka form yields the identical frame for a deployment with a
  * real broker.
  *
  * SQS-knob mapping (the part with no testable analog offline):
  *  - 24 h retention (iac/main.tf:17) ≙ broker `retention.ms` /
  *    file-queue dir pruning — source-side config, not engine code.
  *  - 30 s visibility timeout (iac/main.tf:18) has NO analog: a
  *    Structured Streaming epoch owns its batch exclusively, so the
  *    redelivery race the timeout guards against cannot occur; the
  *    at-least-once retry loop ([[graft.streaming.RetryLoop]]) models
  *    redelivery explicitly instead.
  *  - `batch_size = 1` trigger pacing ≙ `maxFilesPerTrigger` /
  *    `maxOffsetsPerTrigger`.
  */
object Queues {

  /** The file-queue transport: every line of every file under `dir`
    * is one queue message (the certified path — stream_checkout/dlq/
    * saga run over exactly this). */
  def fileJson(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** The Kafka transport, same output shape. Compiles against core
    * Spark — `format("kafka")` resolves through the DataSource
    * registry at RUNTIME — but running it requires the
    * `spark-sql-kafka-0-10` package on the cluster classpath (not
    * bundled: this build is dependency-free by design; every Spark
    * distro ships the connector). Offline this fails fast at `load()`
    * with DATA_SOURCE_NOT_FOUND, which the spec pins so the
    * requirement is documented as behavior, not a comment. */
  def kafkaJson(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      maxOffsetsPerTrigger: Long = 10000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(col("value").cast("string").as("value"))
}
