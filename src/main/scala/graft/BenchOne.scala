package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench harness: `runMain graft.BenchOne <name> [sfDir]` —
  * isolates one registered query in a fresh JVM for plan/perf work. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // ObjectHashAggregateExec falls back to SORT-BASED aggregation at
      // 128 distinct keys per partition (the default is sized for huge
      // per-key state like collect_list) — BoundedTopK's per-group
      // state is O(k), so the map is the cheap part; without this the
      // partial top-k silently degrades into the full-partition sort
      // it exists to avoid (measured 260x at the x10 kNN edge build)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 22).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val t1 = System.nanoTime()
    // second run in the warmed JVM separates JIT/codegen cost from plan cost
    val n2 = fn(spark, sfDir).count()
    val t2 = System.nanoTime()
    println(f"BENCHONE $name rows=$n cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    if (args.length > 2 && args(2) == "explain")
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
