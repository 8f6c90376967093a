package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Head-to-head probe of the two as-of formulations — composed
  * union+window ([[graft.ops.AsOf]]) vs the native merge-sweep
  * physical operator ([[graft.plans.AsOfJoinExec]]) — on synthetic
  * frames big and WIDE enough for the shuffle-width difference to be
  * the dominant term (the composed plan shuffles |L|+|R| rows at
  * combined width; the native plan shuffles each side at its own
  * width).
  *
  * `runMain graft.AsOfBench [nLeft] [nRight] [nKeys] [payloadCols]`
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val nLeft = if (args.length > 0) args(0).toLong else 5000000L
    val nRight = if (args.length > 1) args(1).toLong else 2000000L
    val nKeys = if (args.length > 2) args(2).toLong else 100000L
    val nPayload = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic frames: key from a hash walk, time strided so each
    // key's right rows interleave the left times; payload columns are
    // sized strings so row width is honest
    def payloadCols(prefix: String) = (1 to nPayload).map(i =>
      concat(lit(prefix * 8), (col("id") * i).cast("string")).as(s"p$i"))
    val left = spark.range(nLeft).select(
      pmod(hash(col("id")), lit(nKeys)).as("k") +:
        (col("id") * 7 % 1000000).as("t") +: payloadCols("l"): _*)
    // right side deduped to one row per (k, t) by construction (unique t stride)
    val right = spark.range(nRight).select(
      pmod(hash(col("id") + 1), lit(nKeys)).as("k") +:
        (col("id") * 13 % 1000003).as("t") +: payloadCols("r"): _*)
      .dropDuplicates("k", "t")
    val pNames = (1 to nPayload).map(i => s"p$i")

    // the consumer must FORCE every output column: a bare count() lets
    // Catalyst prune the composed plan's entire window carry (the
    // custom node, being opaque to ColumnPruning, gets no such break),
    // which would compare full work against no work. Hashing the whole
    // row is the same cost for both plans.
    def consume(df: DataFrame): Long = {
      val all = struct(df.columns.map(col).toIndexedSeq: _*)
      df.select(xxhash64(all).as("h"))
        .agg(sum(col("h").cast("decimal(38,0)")), count(lit(1)))
        .collect()(0).getLong(1)
    }
    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime(); val n0 = consume(f)
      val t1 = System.nanoTime(); consume(f)
      val t2 = System.nanoTime()
      println(f"ASOFBENCH $label rows=$n0%d cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    }
    time("composed") {
      graft.ops.AsOf.asofJoinBackward(left, right, "k", "t", pNames)
    }
    time("native") {
      graft.plans.AsOfJoinNative.asofJoinBackward(left, right, "k", "t", pNames)
    }
    spark.stop()
  }
}
