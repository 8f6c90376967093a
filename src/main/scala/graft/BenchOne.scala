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
    // optional integer arg (any position ≥ 2): extra warm repetitions —
    // box-noise protocol: median of several in-JVM warm samples beats
    // any pair of single samples on a drifting machine
    val reps = args.drop(2).flatMap(a => scala.util.Try(a.toInt).toOption)
      .headOption.getOrElse(1)
    // deterministic work counters (jobs/stages/tasks, shuffle bytes,
    // input records): on a co-tenant-noisy box these, not wall times,
    // are the trustworthy before/after evidence for a recompute or
    // shuffle elimination
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val inRec = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks.toLong)
          shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          inRec.addAndGet(s.stageInfo.taskMetrics.inputMetrics.recordsRead)
        }
      })
    def snap() = (jobs.get, stages.get, tasks.get, shufW.get, inRec.get)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val t1 = System.nanoTime()
    // warm runs in the warmed JVM separate JIT/codegen cost from plan cost;
    // the same per-run hygiene as Bench so samples are independent
    val warms = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val before = snap()
      val w0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - w0) / 1e9
      // listener events drain asynchronously; give the bus a moment so
      // the per-run deltas attribute to the right run
      Thread.sleep(300)
      val after = snap()
      (dt, after._1 - before._1, after._2 - before._2, after._3 - before._3,
        after._4 - before._4, after._5 - before._5)
    }
    val warmStr = warms.map(w => f"${w._1}%.2f").mkString(",")
    println(f"BENCHONE $name rows=$n cold=${(t1 - t0) / 1e9}%.2fs warm=${warmStr}s")
    warms.zipWithIndex.foreach { case ((dt, j, st, tk, sw, ir), i) =>
      println(f"BENCHONE_WORK $name rep=${i + 1} sec=$dt%.2f jobs=$j stages=$st tasks=$tk shuffleMB=${sw / 1e6}%.1f inputRecords=$ir")
    }
    if (args.length > 2 && args(2) == "explain")
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
