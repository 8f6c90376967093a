package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-group layout decision harness:
  * `runMain graft.ColGroupBench [rows] [outBase]` — measures what a
  * two-group segment layout (hot scalars | wide text) WOULD buy on
  * narrow projections of a text-heavy table, before building one.
  *
  * The graft-segment body is row-major: a narrow projection must SKIP
  * the unrequested columns' bytes per row (linear traversal), where
  * parquet's columnar chunks are never touched — measured ×~3 on
  * narrow-projection-of-wide-row scans (BENCH_NOTES r15). A
  * column-group layout would store the hot scalar columns in their own
  * per-segment file, so a hot-group projection reads ONLY those bytes.
  * This harness bounds that win honestly by writing the SAME rows
  * twice — the current single-body table, and a scalars-only table
  * whose scan cost is exactly what the hot group's file would cost —
  * plus parquet as the columnar reference, then timing (min-of-5, the
  * r15 deep-shape methodology: min is the robust statistic on a noisy
  * box):
  *   - narrow  : SELECT sum(doc_id), sum(len(lang))   — the group win
  *   - wide    : SELECT sum(len(text))                — the no-win case
  * Ship column groups only if narrow(single-body) / narrow(hot-only)
  * clears the ×1.5 materiality bar; the simulation is an UPPER bound
  * (a real implementation adds per-group file management and, for
  * projections spanning groups, a positional zip). */
object ColGroupBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 4000000L
    val outBase = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-colgroup").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // reclaim a GENERATED outBase even on a failed run (ENOSPC mid-
    // write is exactly the disk-pressure mode this guards against); an
    // explicit [outBase] arg is the caller's to keep
    if (args.length <= 1)
      Runtime.getRuntime.addShutdownHook(new Thread(() => TempDirs.deleteTree(outBase)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the documents-table shape at synthetic volume: ~300-byte text
    // dominating ~25 bytes of hot scalars
    val df = spark.range(0, rows).select(
      col("id").as("doc_id"),
      concat(lit("l"), (col("id") % 11).cast("string")).as("lang"),
      concat(lit("src"), (col("id") % 97).cast("string")).as("source"),
      concat(lit("body-"), col("id").cast("string"), lit(" "),
        rpad(lit("x"), 280, "lorem ipsum dolor sit ")).as("text"),
      (col("id") % 1000).as("n_chars")).cache()
    df.count()
    // overwrite everywhere: a reused [outBase] must not APPEND into
    // the segment tables while parquet overwrites — the variants would
    // silently compare different row counts
    df.write.format("graft-segment").mode("overwrite").save(s"$outBase/seg_all")
    df.drop("text").write.format("graft-segment").mode("overwrite")
      .save(s"$outBase/seg_hot")
    df.write.mode("overwrite").parquet(s"$outBase/pq_all")
    df.unpersist()

    def segAll = spark.read.format("graft-segment").load(s"$outBase/seg_all")
    def segHot = spark.read.format("graft-segment").load(s"$outBase/seg_hot")
    def pq = spark.read.parquet(s"$outBase/pq_all")
    def narrow(t: DataFrame) =
      t.select(sum(col("doc_id")).as("s"), sum(length(col("lang"))).as("l"))
    def wide(t: DataFrame) = t.select(sum(length(col("text"))).as("tl"))

    // INTERLEAVED min-of-5 (the WriteBench r15 lesson: variant-
    // consecutive reps charge page-cache/GC position effects to whole
    // variants): each round times every variant once, min per variant
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("narrow_seg_single_body", () => narrow(segAll)),
      ("narrow_seg_hot_group", () => narrow(segHot)),
      ("narrow_parquet", () => narrow(pq)),
      ("wide_seg", () => wide(segAll)),
      ("wide_parquet", () => wide(pq)))
    variants.foreach(_._2().collect()) // warm codegen/readers/page cache
    val times = Array.fill(variants.size)(Double.MaxValue)
    for (_ <- 1 to 5; i <- variants.indices) {
      val t0 = System.nanoTime()
      variants(i)._2().collect()
      times(i) = math.min(times(i), (System.nanoTime() - t0) / 1e9)
    }
    val Seq(nAll, nHot, nPq, wAll, wPq) = times.toSeq
    def f(v: Double) = f"$v%.3f"
    println(s"""{"bench":"colgroup","rows":$rows,""" +
      s""""narrow_seg_single_body":${f(nAll)},"narrow_seg_hot_group":${f(nHot)},""" +
      s""""narrow_parquet":${f(nPq)},"group_win":${f(nAll / nHot)},""" +
      s""""wide_seg":${f(wAll)},"wide_parquet":${f(wPq)}}""")
    spark.stop()
    if (args.length <= 1) TempDirs.deleteTree(outBase) // ~GBs of temp per run
  }

  private def deleteTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(base)) return
    val st = java.nio.file.Files.walk(base)
    try st.iterator().asScala.toSeq.sortBy(-_.getNameCount)
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally st.close()
  }
}
