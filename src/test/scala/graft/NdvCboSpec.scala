package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The reason NDV statistics exist: Spark's cost-based optimizer must
  * CONSUME the manifest-resident distinctCount and make a different
  * PLAN. Twin tables with identical data — one with `ndvFor` sketches,
  * one without — and a grouped-then-joined query whose aggregate
  * output-row estimate collapses from "child row count" (no column
  * stats) to "NDV of the grouping key" (with them): the declared table
  * plans a BroadcastHashJoin where the undeclared twin plans a
  * SortMergeJoin, with byte-identical results. At 100 TB this flip is
  * the difference between shipping kilobytes and shuffling the join's
  * full left side. */
class NdvCboSpec extends SparkSpec {

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

  test("manifest NDV flips the post-aggregate join to broadcast; without it the plan stays sort-merge") {
    val withNdv = tmp("graft-cbo-ndv")
    val without = tmp("graft-cbo-raw")
    val dimDir = tmp("graft-cbo-dim")
    // 200k fact rows over 8 distinct grouping keys; a 200k-row dim.
    // Raw sizes put BOTH base relations above the broadcast threshold,
    // so only a believed-tiny AGGREGATE output can broadcast.
    val facts = spark.range(0, 200000).select(
      (col("id") % 8).as("grp"), col("id").as("v"))
    facts.repartition(4).write.format(Fmt)
      .option("ndvFor", "grp").mode("append").save(withNdv)
    facts.repartition(4).write.format(Fmt).mode("append").save(without)
    spark.range(0, 200000).select(col("id").as("grp"), (col("id") * 2).as("w"))
      .repartition(4).write.format(Fmt).mode("append").save(dimDir)

    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // assert on the STATIC plan: AQE would re-plan from runtime sizes
      // and mask whether the STATISTIC drove the decision
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (512 * 1024).toString)

      def q(dir: String): DataFrame =
        spark.read.format(Fmt).load(dir)
          .groupBy("grp").agg(sum("v").as("sv"))
          .join(spark.read.format(Fmt).load(dimDir), "grp")
          .select(col("grp"), col("sv"), col("w"))

      // sanity: neither BASE relation qualifies for broadcast by size
      val factsBytes = spark.read.format(Fmt).load(without)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(factsBytes > 512 * 1024, s"facts must exceed the threshold, got $factsBytes")

      val (bWith, smWith) = joinNodes(q(withNdv))
      val (bWithout, smWithout) = joinNodes(q(without))
      assert(bWith == 1 && smWith == 0,
        s"ndvFor table: expected BroadcastHashJoin, got b=$bWith sm=$smWith\n" +
          q(withNdv).queryExecution.executedPlan.toString)
      assert(bWithout == 0 && smWithout == 1,
        s"undeclared twin: expected SortMergeJoin, got b=$bWithout sm=$smWithout\n" +
          q(without).queryExecution.executedPlan.toString)

      // the flip changed the PLAN, never the ANSWER
      val a = q(withNdv).orderBy("grp").collect().toSeq
      val b = q(without).orderBy("grp").collect().toSeq
      assert(a == b && a.size == 8)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
