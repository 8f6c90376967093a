package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage layout — the shuffle-free co-located join.
  *
  * At 100 TB the single biggest join cost is the exchange: re-hashing
  * both sides of a fact-fact join moves the whole dataset across the
  * network. Writing both tables bucketed (hash-clustered and sorted)
  * on the join key fixes the partitioning AT WRITE TIME, so every
  * subsequent join or aggregation on that key is exchange-free: each
  * task sort-merges bucket i of A with bucket i of B locally. The
  * shuffle is paid once, at ingest, and amortized over every later
  * query — the classic layout decision a warehouse makes for its
  * largest fact tables.
  *
  * Uses Spark's v1 parquet bucketing (`bucketBy` + `sortBy` +
  * `saveAsTable` with an explicit `path`, i.e. an EXTERNAL table —
  * no warehouse-dir dependency; metadata lives in the session's
  * in-memory catalog, data at the caller's path).
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed AND sorted on
    * `key` into `numBuckets` hash buckets at `path`, and return the
    * catalog-backed frame (the one whose scan reports the bucket
    * layout to the planner). */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    key: String, numBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Drop the catalog entry (data at the external path is untouched —
    * callers owning a temp dir delete it themselves). */
  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** Range-clustered compaction writer — the small-files/data-skipping
    * answer at ingest time. `repartitionByRange` gives each of
    * `numFiles` output tasks a disjoint `sortCol` range (sampled range
    * bounds — one pass, no global sort), `sortWithinPartitions` orders
    * rows inside each, and `maxRecordsPerFile` caps file size, so
    * every emitted parquet file covers a contiguous, pairwise-disjoint
    * key range. Parquet min/max footer stats then let ANY later range
    * predicate skip whole files — the poor engine's Z-order, and the
    * compaction pass a 100 TB ingest runs instead of accumulating
    * thousands of tiny unclustered files. */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
                  numFiles: Int, maxRecordsPerFile: Long = 0L): Unit =
    df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Z-value: interleave the low `bits` bits of two non-negative ints
    * (a's bit i at position 2i, b's at 2i+1). Locality along the
    * Z-curve preserves locality in BOTH dimensions — the building block
    * of multi-dimensional clustering. Pure bit arithmetic, codegen'd,
    * no UDF. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order clustered compaction — [[writeSorted]] generalized to TWO
    * range-predicate columns. A single-column sort gives perfect
    * file-level min/max skipping on that column and NONE on any other;
    * interleaving the bits of both (min-max scaled to `bits`-bit ints —
    * one tiny 4-scalar aggregate up front) and range-clustering on the
    * Z-value bounds every file's extent in BOTH dimensions, so parquet
    * footer stats skip files for predicates on either column. That
    * trade — slightly worse than a dedicated sort per dimension, vastly
    * better than unsorted for each — is the standard layout for a
    * 100 TB table queried along two axes (user×time, key×date).
    * The Z column is write-time scaffolding: dropped before write,
    * invisible to readers (the store_zorder_scan oracle certifies). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    val Array(loA, hiA, loB, hiB) = df
      .agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
        min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .head().toSeq.map(v => Option(v).fold(0.0)(_.asInstanceOf[Double])).toArray
    val cap = (1L << bits) - 1
    def scaled(c: String, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else least(lit(cap), floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * cap).cast("long"))
    df.withColumn("graft_z",
        zValue(scaled(colA, loA, hiA), scaled(colB, loB, hiB), bits))
      .repartitionByRange(numFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
      .write.mode("overwrite")
      .parquet(path)
  }

  /** Write `df` hive-partitioned on `partCol` — the other half of the
    * layout story: a predicate on the partition column prunes whole
    * directories at PLANNING time (PartitionFilters on the scan), so a
    * one-partition query over a 100 TB table reads one partition's
    * files and zero bytes of the rest. Choose low-cardinality columns
    * (lang, date, source); high-cardinality keys belong in buckets. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Small-file compaction: rewrite a fragmented directory into
    * ceil(totalBytes / targetBytes) files. Streaming sinks and
    * per-batch overwrites (DedupIngest, RetryLoop) accrete thousands
    * of small files whose listing + footer overhead eventually
    * dominates scans; compaction restores the scan-friendly layout.
    * Uses `coalesce`, NOT `repartition`: merging files needs no
    * shuffle — each output task concatenates whole input partitions —
    * and content is preserved exactly (certified by
    * store_compacted_scan; the file-count bound is spec-asserted).
    * Returns the target file count. Input sizing comes from the
    * FileSystem listing, so the op works against any Hadoop-visible
    * storage. For clustered layouts compact through [[writeSorted]] /
    * [[writeZOrdered]] instead — coalesce preserves content, not
    * ordering guarantees. */
  def compactFiles(spark: SparkSession, inDir: String, outDir: String,
                   targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // mode(overwrite) deletes the target before the LAZY read executes —
    // compacting in place would destroy the source mid-job
    require(fs.makeQualified(new org.apache.hadoop.fs.Path(outDir)) !=
      fs.makeQualified(p),
      s"outDir must differ from inDir ($inDir): overwrite would delete the source before the read runs")
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    // coalesce can only DECREASE partition count: a fragmented input
    // that reads as fewer partitions than n (small files merged by
    // maxPartitionBytes) must repartition up or the promised file
    // count/sizes are silently not met
    val sized =
      if (df.rdd.getNumPartitions < n) df.repartition(n) else df.coalesce(n)
    sized.write.mode("overwrite").parquet(outDir)
    n
  }
}
