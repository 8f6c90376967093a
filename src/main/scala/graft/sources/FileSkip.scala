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
}
