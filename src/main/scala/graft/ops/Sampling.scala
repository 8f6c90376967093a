package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and train/eval splitting.
  *
  * The scale-correct replacement for `rand()`-based sampling in a
  * training-data pipeline: membership is a pure function of
  * (salt, key), so a sample is reproducible across runs, clusters and
  * engines, stable under retries/speculative execution (a re-executed
  * task cannot flip a row's fate, which `rand()` can), and consistent
  * across tables sharing the key. Map-only — no shuffle, no RNG state,
  * nothing driver-side; at 100 TB it fuses into the scan's codegen
  * stage.
  *
  * Mechanism: the first 8 hex chars of `md5(salt || key)` are uniform
  * over [0, 16^8); comparing them LEXICOGRAPHICALLY against a
  * fixed-width hex threshold avoids any hex→integer conversion, so the
  * exact same predicate runs in any engine with md5 (the DuckDB oracle
  * uses the identical string compare).
  */
object Sampling {

  /** Uniform 8-hex-digit bucket hash of (salt, key) — the sampling
    * coordinate. Lowercase hex in Spark and DuckDB alike. */
  def bucketHash(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** The zero-padded hex threshold t such that
    * P[bucketHash < t] = rate (to 1/2^32 resolution). */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Keep a deterministic `rate` fraction of rows, keyed by `key`. */
  def sample(df: DataFrame, key: Column, rate: Double, salt: String): DataFrame =
    df.filter(bucketHash(key, salt) < lit(hexThreshold(rate)))

  /** Tag every row with its bucket hash and a train/heldout split at
    * `trainFrac`. Rows with the same key always land on the same side —
    * the contamination guard a real pipeline needs (an eval doc can
    * never leak into training no matter how often the job reruns). */
  def trainEvalSplit(df: DataFrame, key: Column, trainFrac: Double, salt: String): DataFrame = {
    val h = bucketHash(key, salt)
    df.withColumn("bucket_hash", h)
      .withColumn("split",
        when(col("bucket_hash") < lit(hexThreshold(trainFrac)), "train")
          .otherwise("heldout"))
  }
}
