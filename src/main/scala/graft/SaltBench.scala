package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Hot-key skew rehearsal (r17 verdict item 3): the store_join_autosalt
  * shape — a 75%-hot fact (one key holds 3/4 of the rows) joined to its
  * key dimension — measured across the mitigation space, plus the
  * aggregation face, to decide whether a SaltJoinRule planner rewrite
  * would pay or AQE already covers the join case.
  *
  * Join arms (broadcast disabled on the SMJ arms — the big-big shape;
  * a dim small enough to broadcast has NO join-side skew problem, the
  * hot key never shuffles, measured by the `broadcast` arm):
  *  1. smj-aqe-off    — the naive sort-merge straggler baseline
  *  2. smj-aqe-skew   — AQE skew-join split (thresholds lowered to
  *                      fire at bench scale; at 100 TB the 256 MB
  *                      default fires naturally on a 75%-hot fact)
  *  3. salted-smj     — Skew.saltedJoin, fan-out from the manifest
  *                      statistic, AQE off (isolates the rewrite)
  *  4. salted-aqe     — the rewrite under AQE (both may fire)
  *
  * Composite-key arms (r18, the SaltJoinRule scope decision): the same
  * hot fact joined on (k, k2 = cents % 3) — the composite hot key is
  * bounded by the declared k map (count(k=a ∧ k2=b) ≤ count(k=a)), so
  * the k-derived fan-out is what a planner rule would use. Arms mirror
  * the single-key set: comp-smj-aqe-off / comp-smj-aqe-skew /
  * comp-salted-smj / comp-salted-aqe.
  *
  * Fact-preserving left-outer arms (r18): left-plain / left-aqe-skew /
  * left-salted with the hot key MATCHED (dimHalf), and leftmiss-* with
  * the hot key UNMATCHED (the null-extended straggler still
  * sort-merges the hot partition, so salting should pay there too).
  *
  * Aggregation arms (the face AQE does NOT cover — no runtime split
  * exists for a skewed hash aggregate):
  *  5. agg-plain      — groupBy(k).agg(sum, count): map-side partial
  *                      aggregation should keep this flat despite skew
  *  6. agg-salted     — Skew.saltedAgg two-phase (expected: pure
  *                      overhead here — partial agg already collapsed
  *                      the hot key map-side; kept as the honesty arm)
  *  7. distinct-plain — groupBy(k).agg(count_distinct(v)), hot key
  *                      owning ~3/4 of a wide value domain
  *  8. distinct-salted— Skew.saltedCountDistinct (value-hash salt)
  *
  * `runMain graft.SaltBench [sfDir] [mult] [repeat]` — mult replicates
  * the sf0.1 fact (10 ≈ 6 M rows at sf0.1).
  */
object SaltBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val repeat = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the certificate's shape, replicated mult× and WRITTEN to the
    // native format so the salted arms derive their fan-out from the
    // manifest statistic exactly as production would (zero scans).
    // try/finally around EVERYTHING after the tempdir exists: a failed
    // arm must not leak the multi-GB fact dir (the documented
    // disk-pressure failure mode — / at 98% once produced a x5
    // phantom slowdown)
    val base = java.nio.file.Files.createTempDirectory("graft-saltbench").toString
    try {
      val dir = s"$base/fact"
      Tables.lineitem(spark, sfDir)
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select(
          when(col("l_orderkey") % 4 < 3, lit(7L))
            .otherwise(col("l_orderkey") % 97).as("k"),
          (round(col("l_extendedprice") * 100, 0).cast("long") + col("rep")).as("cents"),
          (col("l_partkey") * mult + col("rep")).as("v"))
        // write cpus files, as a production table would have: AQE's skew
        // split works at MAP-OUTPUT granularity — a single-file table
        // gives the join's shuffle ONE mapper and OptimizeSkewedJoin
        // finds "0 skewed partitions" no matter how hot the key (the
        // r17 harness's first finding; manifest salting has no such
        // floor because it splits BEFORE the shuffle is written)
        .repartition(cpus.toInt)
        .write.format("graft-segment").option("histFor", "k")
        .mode("append").save(dir)
      def fact = spark.read.format("graft-segment").load(dir)
      val n = fact.count()
      val salts = graft.ops.Skew.saltsForTable(spark, dir, "k",
        fallback = 8, targetRowsPerSlot = math.max(1L, n / cpus.toInt))
      println(s"SALTBENCH rows=$n hot_share~0.75 derived_salts=$salts cpus=$cpus")
      // materialize the (97-row) dim once — rebuilding it per arm would
      // add a full fact scan+distinct to every measurement equally and
      // blur the arm separation this harness exists to read
      val dim = fact.select(col("k")).distinct()
        .withColumn("grp", concat(lit("g"), pmod(col("k"), lit(5))))
        .localCheckpoint()

      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("s"))

      def time(label: String, build: () => org.apache.spark.sql.DataFrame,
          confs: (String, String)*): Unit = {
        val olds = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
        confs.foreach { case (c, v) => spark.conf.set(c, v) }
        try {
          build().count() // warm (codegen, file listing)
          val times = (1 to repeat).map { _ =>
            val s = System.nanoTime()
            build().count()
            (System.nanoTime() - s) / 1e9
          }
          // which join ran, and did AQE's skew split actually fire? the
          // conclusion this harness feeds is worthless without that.
          // collect(), not count(): count() spawns a SEPARATE query
          // execution and leaves df's own AQE plan unfinalized (every
          // arm's result is <= 97 aggregate rows)
          val df = build(); df.collect()
          def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
              : org.apache.spark.sql.execution.SparkPlan = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case other => other
          }
          var joins = List.empty[String]
          def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
            p match {
              case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
                joins ::= (if (j.isSkewJoin) "SMJ(skew-split)" else "SMJ")
              case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
                joins ::= (if (j.isSkewJoin) "SHJ(skew-split)" else "SHJ")
              case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
                joins ::= "BHJ"
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                walk(q.plan)
              case _ =>
            }
            p.children.foreach(walk)
          }
          walk(finalPlan(df.queryExecution.executedPlan))
          println(f"SALTBENCH $label%-16s best=${times.min}%6.2fs " +
            f"median=${times.sorted.apply(times.size / 2)}%6.2fs " +
            s"joins=${joins.reverse.mkString("+")}")
        } finally olds.foreach {
          case (c, Some(v)) => spark.conf.set(c, v)
          case (c, None) => spark.conf.unset(c)
        }
      }

      val noBcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
      val aqeOff = "spark.sql.adaptive.enabled" -> "false"
      val aqeOn = "spark.sql.adaptive.enabled" -> "true"
      // fire the skew split at bench scale: the hot partition here is
      // tens of MB, not the 256 MB production default
      val skewTuned = Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        // without force, OptimizeSkewedJoin bails whenever the split
        // might introduce an extra shuffle (ValidateRequirements) —
        // which it conservatively assumes here
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

      time("smj-aqe-off", () => agg(fact.join(dim, Seq("k"))), noBcast, aqeOff)
      time("smj-aqe-skew", () => agg(fact.join(dim, Seq("k"))),
        (Seq(noBcast, aqeOn) ++ skewTuned): _*)
      // AQE's best shot: same firing thresholds, default-ish 64 MB
      // advisory so the split makes ~7 chunks instead of ~100
      time("smj-aqe-skew64", () => agg(fact.join(dim, Seq("k"))),
        (Seq(noBcast, aqeOn) ++ skewTuned.map {
          case (c, _) if c.endsWith("advisoryPartitionSizeInBytes") => (c, "64m")
          case kv => kv
        }): _*)
      time("salted-smj", () => agg(graft.ops.Skew.saltedJoin(fact, dim, "k", salts)),
        noBcast, aqeOff)
      time("salted-aqe", () => agg(graft.ops.Skew.saltedJoin(fact, dim, "k", salts)),
        (Seq(noBcast, aqeOn) ++ skewTuned): _*)
      // explicit hint: the checkpointed dim's stats are opaque, so the
      // size-based auto-broadcast can't see the 97 rows
      time("broadcast", () => agg(fact.join(broadcast(dim), Seq("k"))), aqeOff)

      // COMPOSITE-KEY arms (r18, rule-scope decision): the same 75%-hot
      // fact joined on (k, k2) with k2 = cents % 3 — the hot COMPOSITE
      // key (7, x) still owns ~25% of the rows each, and the manifest
      // statistic on k alone upper-bounds the composite hot mass
      // (count(k=a, k2=b) <= count(k=a)), so the k-derived fan-out is
      // the bound a planner rule would use. Same salts as the
      // single-key arms by that argument.
      val fact2 = fact.withColumn("k2", pmod(col("cents"), lit(3)))
      val dim2 = fact2.select(col("k"), col("k2")).distinct()
        .withColumn("grp", concat(lit("g"), pmod(col("k") + col("k2"), lit(5))))
        .localCheckpoint()
      time("comp-smj-aqe-off", () => agg(fact2.join(dim2, Seq("k", "k2"))),
        noBcast, aqeOff)
      time("comp-smj-aqe-skew", () => agg(fact2.join(dim2, Seq("k", "k2"))),
        (Seq(noBcast, aqeOn) ++ skewTuned): _*)
      time("comp-salted-smj", () => agg(
        graft.ops.Skew.saltedJoin(fact2, dim2, Seq("k", "k2"), salts)),
        noBcast, aqeOff)
      time("comp-salted-aqe", () => agg(
        graft.ops.Skew.saltedJoin(fact2, dim2, Seq("k", "k2"), salts)),
        (Seq(noBcast, aqeOn) ++ skewTuned): _*)

      // FACT-PRESERVING LEFT-OUTER arms (r18): the preserved side is
      // the salted fact, so every unmatched fact row survives exactly
      // once with its single salt. Two sub-shapes: the hot key MATCHED
      // (dimHalf keeps k=7 — the typical enrich-with-nulls shape) and
      // the hot key UNMATCHED (dimMiss drops it — the null-extended
      // straggler still sort-merges the hot partition, so salting
      // should pay there too)
      val dimHalf = dim.filter(col("k") < 50).localCheckpoint() // keeps hot k=7
      val dimMiss = dim.filter(col("k") =!= 7).localCheckpoint()
      def aggL(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(coalesce(col("grp"), lit("null")).as("g"))
        .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("s"))
      time("left-plain", () => aggL(fact.join(dimHalf, Seq("k"), "left")),
        noBcast, aqeOff)
      time("left-aqe-skew", () => aggL(fact.join(dimHalf, Seq("k"), "left")),
        (Seq(noBcast, aqeOn) ++ skewTuned): _*)
      time("left-salted", () => aggL(
        graft.ops.Skew.saltedJoin(fact, dimHalf, Seq("k"), salts, "left")),
        noBcast, aqeOff)
      time("leftmiss-plain", () => aggL(fact.join(dimMiss, Seq("k"), "left")),
        noBcast, aqeOff)
      time("leftmiss-salted", () => aggL(
        graft.ops.Skew.saltedJoin(fact, dimMiss, Seq("k"), salts, "left")),
        noBcast, aqeOff)

      def plainAgg() = fact.groupBy(col("k"))
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("c"))
      time("agg-plain", () => plainAgg(), aqeOff)
      time("agg-salted", () => graft.ops.Skew.saltedAgg(fact, "k", salts,
        Seq(("sum", "cents", "s"), ("count", "*", "c"))), aqeOff)
      time("distinct-plain", () => fact.groupBy(col("k"))
        .agg(count_distinct(col("v")).as("nd")), aqeOff)
      time("distinct-salted", () => graft.ops.Skew.saltedCountDistinct(
        fact, "k", "v", salts, "nd"), aqeOff)

      spark.stop()
    } finally {
      // bench temp hygiene on EVERY exit path: multi-GB segment dirs
      // add up run-over-run
      TempDirs.deleteTree(base)
    }
  }
}
