package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The reason frequency histograms exist: NDV alone assumes UNIFORM
  * values, so an equality filter on a skewed key estimates 1/ndv of
  * the rows — on a key whose hot value carries 90% of a table that
  * misestimate declares a near-full relation "tiny" and BROADCASTS it,
  * the classic skew OOM at scale. Twin dims with identical data, both
  * carrying NDV sketches; one also declares `histFor`. Under CBO the
  * NDV-only twin plans a BroadcastHashJoin for the filtered dim (1/2000
  * of 200k rows ≈ 100 — believed tiny); the histogram twin sees the
  * true ~90% mass in the equi-height bins and keeps the SortMergeJoin —
  * byte-identical results, opposite (and on the hist side, survivable)
  * plans. At 100 TB the flip direction REFUSES a ~90 TB broadcast. */
class HistCboSpec extends SparkSpec {

  private val Fmt = "graft-segment"
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def joinNodes(df: DataFrame): (Int, Int) = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    (plan.collect { case b: BroadcastHashJoinExec => b }.size,
      plan.collect { case s: SortMergeJoinExec => s }.size)
  }

  test("manifest histogram exposes skew: the hot-value filter keeps sort-merge where NDV-only wrongly broadcasts") {
    val factDir = tmp("graft-histcbo-fact")
    val ndvOnly = tmp("graft-histcbo-ndv")
    val withHist = tmp("graft-histcbo-hist")
    // fact: 100k rows, k uniform over 0..1999 — well above the
    // broadcast threshold raw
    spark.range(0, 100000)
      .select((col("id") % 2000).as("k"), col("id").as("v"))
      .repartition(4)
      .write.format(Fmt).mode("append").save(factDir)
    // dim twins: 60k rows, 90% at k=0, the rest uniform over 1..999
    // (inside the per-segment exact cap) → ndv ≈ 1000 but the mass is
    // NOT 1/1000 anywhere
    val dim = spark.range(0, 60000)
      .select(when(col("id") % 10 < 9, 0L)
        .otherwise(col("id") % 999 + 1).as("k"), (col("id") * 2).as("w"))
      .repartition(4)
    dim.write.format(Fmt).option("ndvFor", "k")
      .mode("append").save(ndvOnly)
    dim.write.format(Fmt).option("ndvFor", "k").option("histFor", "k")
      .mode("append").save(withHist)

    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // static plan: AQE would re-plan from runtime sizes and mask
      // whether the STATISTIC drove the decision
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (512 * 1024).toString)

      def q(dimDir: String): DataFrame =
        spark.read.format(Fmt).load(factDir)
          .join(spark.read.format(Fmt).load(dimDir).filter(col("k") === 0), "k")
          .select(col("k"), col("v"), col("w"))

      // sanity: neither dim qualifies for broadcast UNFILTERED
      val dimBytes = spark.read.format(Fmt).load(ndvOnly)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(dimBytes > 512 * 1024, s"dim must exceed the threshold raw, got $dimBytes")

      val (bNdv, smNdv) = joinNodes(q(ndvOnly))
      val (bHist, smHist) = joinNodes(q(withHist))
      assert(bNdv == 1 && smNdv == 0,
        s"NDV-only twin: the uniform assumption (60 of 60k rows) should " +
          s"broadcast, got b=$bNdv sm=$smNdv\n" +
          q(ndvOnly).queryExecution.executedPlan.toString)
      assert(bHist == 0 && smHist == 1,
        s"histogram twin: the bins carry the true 90% mass — must KEEP " +
          s"sort-merge, got b=$bHist sm=$smHist\n" +
          q(withHist).queryExecution.executedPlan.toString)

      // identical answers — the statistic changes the plan, never the
      // data. 50 fact rows at k=0 × 54,000 filtered dim rows:
      def digest(df: DataFrame) = df
        .agg(count(lit(1)).as("n"), sum("v").as("sv"), sum("w").as("sw"))
        .collect()(0)
      val a = digest(q(ndvOnly))
      val b = digest(q(withHist))
      assert(a == b, s"twin answers diverged: $a vs $b")
      assert(a.getLong(0) == 50L * 54000L, s"unexpected row count ${a.getLong(0)}")
    } finally {
      saved.foreach { case (k, v) =>
        v match {
          case Some(x) => spark.conf.set(k, x)
          case None => spark.conf.unset(k)
        }
      }
    }
  }

  test("join cardinality: histograms on both sides expose the hot-key blowup NDV math divides away") {
    // catalyst JoinEstimation.computeByHistogram engages when BOTH
    // join sides carry a histogram for the key. Two tables, each 90%
    // at key 0: the true join output is ~45k × 18k ≈ 810M rows; the
    // uniform estimate |L|·|R|/max(ndv) says ~2M — a 400× lie that
    // tells the planner the join OUTPUT is broadcastable downstream.
    // Assert on ESTIMATES only (nothing executes the 810M-row join).
    val lNdv = tmp("graft-histcbo-l-ndv"); val rNdv = tmp("graft-histcbo-r-ndv")
    val lHist = tmp("graft-histcbo-l-hist"); val rHist = tmp("graft-histcbo-r-hist")
    def skewed(rows: Int, cold: Int) = spark.range(0, rows)
      .select(when(col("id") % 10 < 9, 0L)
        .otherwise(col("id") % cold + 1).as("k"), col("id").as("p"))
      .repartition(2)
    val l = skewed(50000, 499)
    val r = skewed(20000, 499)
    l.write.format(Fmt).option("ndvFor", "k").mode("append").save(lNdv)
    r.write.format(Fmt).option("ndvFor", "k").mode("append").save(rNdv)
    l.write.format(Fmt).option("histFor", "k").mode("append").save(lHist)
    r.write.format(Fmt).option("histFor", "k").mode("append").save(rHist)
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def est(ldir: String, rdir: String): BigInt =
        spark.read.format(Fmt).load(ldir)
          .join(spark.read.format(Fmt).load(rdir), "k")
          .queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(fail("join estimate must produce a rowCount"))
      val uniform = est(lNdv, rNdv)
      val skewAware = est(lHist, rHist)
      assert(uniform < BigInt(10000000),
        s"uniform NDV math divides the hot key away, got $uniform")
      assert(skewAware > BigInt(100000000),
        s"histogram overlap must surface the ~810M hot-key product, got $skewAware")
      assert(skewAware > uniform * 50,
        s"skew-aware estimate should dwarf the uniform one: $skewAware vs $uniform")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }
}
