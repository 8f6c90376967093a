package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-path statistics overhead harness:
  * `runMain graft.WriteBench [rows] [outBase]` — times the SAME
  * segment write under four statistics declarations (none / ndvFor /
  * histFor / both) so the manifest-statistics write tax is a measured
  * number, not an assumption. The collectors ride the encoder loop
  * (one TreeMap/digest op per declared column-row), so the expected
  * shape is a small constant per declared column; this harness is how
  * BENCH_NOTES records it per round when the stats write path changes. */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 4000000L
    val outBase = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-writebench").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a skew-shaped declared column (800 distinct — inside the hist
    // cap), a high-card column, and a payload: the realistic mix
    // CACHE the input: without it every timed save() re-synthesizes
    // the projection, charging input CPU to each variant's "write"
    // time and diluting the overhead percentages this harness exists
    // to measure
    val df = spark.range(0, rows).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id") % 799 + 1).as("k"),
      col("id").as("v"),
      concat(lit("payload-"), (col("id") % 1000).cast("string")).as("s"))
      .cache()
    df.count() // materialize into the cache
    val variants = Seq(
      ("none", Map.empty[String, String]),
      ("ndv", Map("ndvFor" -> "k,v")),
      ("hist", Map("histFor" -> "k")),
      ("both", Map("ndvFor" -> "k,v", "histFor" -> "k")),
      // the STRING arm (r16): the payload column's 1000 distinct
      // values sit inside the 1024 cap, so this measures the string
      // collector's live cost (UTF8String compare + clone per
      // distinct-run), not the poisoned fast path
      ("shist", Map("histFor" -> "s")))
    // warm the write path once (JIT, codec classes)
    df.limit(1000).write.format("graft-segment").mode("append")
      .save(s"$outBase/warm")
    // INTERLEAVED repeats (rep-outer, variant-inner — consecutive
    // same-variant runs would let monotone JIT/page-cache drift bias
    // later variants), report the MINIMUM per variant: write times at
    // this scale are dominated by fs/GC noise, and the min is the
    // cleanest estimator of the added CPU work
    // reps rounds UP to a multiple of the variant count: rotation only
    // parks every variant in every slot equally often when it divides
    // evenly — a remainder would re-introduce the position bias
    val reps = {
      val asked = if (args.length > 2) args(2).toInt else 8
      val n = variants.size
      ((asked + n - 1) / n) * n
    }
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    // ROTATE the variant order per rep: a fixed order showed a strong
    // position effect (the slot right after the rep boundary measured
    // ~30% fast regardless of variant); rotation parks every variant
    // in every slot equally often, so min-per-variant compares like
    // positions
    for (r <- 0 until reps;
         (label, opts) <- variants.indices.map(i =>
           variants((i + r) % variants.size))) {
      val t0 = System.nanoTime()
      opts.foldLeft(
          df.write.format("graft-segment").mode("append"))((w, o) =>
          w.option(o._1, o._2))
        .save(s"$outBase/$label-$r")
      samples(label) = ((System.nanoTime() - t0) / 1e9) :: samples(label)
    }
    val times = variants.map { case (label, _) =>
      val best = samples(label).min
      println(f"WRITEBENCH $label%-5s rows=$rows min-of-$reps $best%7.2fs")
      label -> best
    }
    val base = times.head._2
    times.tail.foreach { case (l, t) =>
      println(f"WRITEBENCH overhead $l%-5s ${(t / base - 1) * 100}%+6.1f%% vs none")
    }
    spark.stop()
  }
}
