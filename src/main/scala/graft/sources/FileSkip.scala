package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the Delta/Iceberg-style scan
  * index, as plain parquet.
  *
  * Spark's parquet reader already prunes ROW GROUPS from pushed
  * filters, but only after listing the directory and reading every
  * file's footer — at 100 TB that is millions of S3 listings and
  * footer GETs per query, paid even when the predicate matches 0.1%
  * of files. A table-format's skipping index inverts that: per-file
  * min/max stats live in ONE tiny side table read at planning time,
  * and the scan is constructed over only the files whose range
  * intersects the predicate. This module is that index over a plain
  * parquet directory: stats are built with one scan at write time
  * (amortized exactly like bucketing's ingest shuffle) and stored
  * under `_stats` inside the data dir — an underscore-prefixed path,
  * which Spark's file index ignores, so normal readers of the
  * directory are completely unaffected.
  *
  * Pairs with [[Bucketing.writeSorted]]: range-clustered files have
  * pairwise-disjoint key ranges, so a range predicate prunes to
  * exactly the overlapping files. On unclustered data the index is
  * still correct, just unselective (every file's [min,max] spans the
  * domain) — the layout decision and the index are the SAME decision,
  * as in every lakehouse.
  *
  * The pruned file list passes through the driver — bounded by file
  * count, the same O(#files) planning-time cost Spark's own
  * InMemoryFileIndex pays, and the entire point is that it replaces
  * an O(#files) footer-read pass with an O(matching files) one.
  */
object FileSkip {

  /** One scan over the parquet files at `dir` → per-file min/max for
    * `statCols`, written to `dir/_stats` (overwriting any previous
    * index) and returned. Call after (re)writing the data files. */
  def buildStats(spark: SparkSession, dir: String, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "need at least one stat column")
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // the index is #files rows — one file reads fastest
      .write.mode("overwrite").parquet(s"$dir/_stats")
    spark.read.parquet(s"$dir/_stats")
  }

  /** The files whose [min,max] range on `column` intersects [lo, hi] —
    * the planning-time index probe. */
  def candidateFiles(spark: SparkSession, dir: String, column: String,
                     lo: Any, hi: Any): Array[String] =
    spark.read.parquet(s"$dir/_stats")
      .filter(col(s"max_$column") >= lit(lo) && col(s"min_$column") <= lit(hi))
      .select(col("file"))
      .collect().map(_.getString(0)).sorted

  /** Range scan of `dir` that reads ONLY the files the stats index
    * admits, then applies the exact predicate (file pruning is
    * necessarily conservative: a file may cover the range yet hold no
    * matching row). Result ≡ a full scan with the same filter —
    * certified by store_fileskip_scan. */
  def scanPruned(spark: SparkSession, dir: String, column: String,
                 lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(spark, dir, column, lo, hi)
    val exact: Column = col(column).between(lit(lo), lit(hi))
    if (files.isEmpty)
      // zero matching files: keep the schema, return no rows, touch no data
      spark.read.parquet(dir).filter(lit(false))
    else
      spark.read.parquet(files.toIndexedSeq: _*).filter(exact)
  }

  // ---- per-file bloom index: EQUALITY skipping on unclustered columns

  /** Per-file bloom filters for `column` — the equality-predicate
    * complement of min/max stats. On a column the file layout is NOT
    * clustered by (every file's [min,max] spans the domain) the range
    * index admits everything; a point lookup still only needs the few
    * files actually containing the key. Same mechanism as Delta's
    * bloom indexes and parquet's own bloom pages, kept in one tiny
    * side table probed at planning time.
    *
    * One scan builds all files' filters: explode each row's k hash-bit
    * positions, `bit_or` per (file, word) — the [[graft.ops.Bloom]]
    * build, keyed by file. Geometry is FIXED across files (uniform
    * index rows; an oversized file only raises its fpp, never breaks
    * the no-false-negative contract). ~`mBits/8` bytes per file. */
  def buildBloom(spark: SparkSession, dir: String, column: String,
                 mBits: Long = 1L << 16, k: Int = 5): DataFrame = {
    import graft.ops.Bloom
    require(mBits % 64 == 0, "mBits must be word-aligned")
    spark.read.parquet(dir)
      .select(input_file_name().as("file"), col(column).as("key"))
      .select(col("file"),
        explode(array((0 until k).map(i => Bloom.bitPos(col("key"), i, mBits)): _*)).as("pos"))
      .select(col("file"), (col("pos") / 64).cast("int").as("w"), Bloom.bitMask(col("pos")).as("mask"))
      .groupBy(col("file"), col("w")).agg(bit_or(col("mask")).as("word"))
      .withColumn("m_bits", lit(mBits)).withColumn("k", lit(k))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_bloom_$column")
    spark.read.parquet(s"$dir/_bloom_$column")
  }

  /** The files whose bloom filter might contain `value` — planning-time
    * probe of the index frame itself: fold each file's sparse words
    * into a map, test the k bit positions of the (column-typed) probe
    * key against it. False positives read a useless file; false
    * negatives are impossible, so pruned ≡ full scan. */
  def candidateFilesEq(spark: SparkSession, dir: String, column: String,
                       value: Any): Array[String] = {
    import graft.ops.Bloom
    val idx = spark.read.parquet(s"$dir/_bloom_$column")
    val meta = idx.select(col("m_bits"), col("k")).head()
    val (m, k) = (meta.getLong(0), meta.getInt(1))
    // the probe key must hash AS the column's type, not the literal's
    val keyLit = lit(value).cast(spark.read.parquet(dir).schema(column).dataType)
    val perFile = idx.groupBy(col("file"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word")))).as("words"))
    val hit = (0 until k).map { i =>
      val pos = Bloom.bitPos(keyLit, i, m)
      coalesce(element_at(col("words"), (pos / 64).cast("int")), lit(0L))
        .bitwiseAND(Bloom.bitMask(pos)) =!= lit(0L)
    }.reduce(_ && _)
    perFile.filter(hit).select(col("file")).collect().map(_.getString(0)).sorted
  }

  /** Point-lookup scan of `dir` reading ONLY bloom-admitted files, with
    * the exact equality applied after — result ≡ a full scan with the
    * same filter. Certified by store_bloomskip_scan. */
  def scanPrunedEq(spark: SparkSession, dir: String, column: String,
                   value: Any): DataFrame = {
    val files = candidateFilesEq(spark, dir, column, value)
    if (files.isEmpty) spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*).filter(col(column) === lit(value))
  }
}
