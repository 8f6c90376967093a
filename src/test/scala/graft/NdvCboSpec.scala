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

  test("manifest NDV drives cost-based join REORDER: the provably-tiny filtered dim joins first") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // fact ⋈ dim1 (small, unfiltered) ⋈ dim2 (8× larger,
    // equality-filtered) — the query WRITES dim1 first. Without column
    // NDV, join cardinality falls back to |L|×|R| and the equality
    // filter cannot reduce dim2's 40k rows, so the cheapest order keeps
    // the SMALL dim1 in the bottom join (5e8 < 4e9 intermediate rows).
    // With the manifest NDV the optimizer proves the filter leaves ~40
    // of dim2's rows (1/ndv(code)) and the b-join collapses to ~4k
    // intermediate rows vs dim1-first's 500k — the order FLIPS, on the
    // statistic alone (same data, same query). Both plans return
    // byte-identical rows. At 100 TB this is the second half of the
    // statistic's value: the broadcast flip (test above) picks the
    // STRATEGY, the reorder picks which intermediate result ever exists.
    def writeTwin(df: org.apache.spark.sql.DataFrame, ndvFor: Option[String]):
        (String, String) = {
      val d1 = tmp("graft-cbo-jr"); val d2 = tmp("graft-cbo-jr")
      val w = df.repartition(4).write.format(Fmt)
      ndvFor.fold(w)(c => w.option("ndvFor", c)).mode("append").save(d1)
      df.repartition(4).write.format(Fmt).mode("append").save(d2)
      (d1, d2)
    }
    val facts = spark.range(0, 100000).select(
      (col("id") % 1000).as("a"), ((col("id") + 7) % 1000).as("b"),
      col("id").as("v"))
    val dim1 = spark.range(0, 5000).select(
      (col("id") % 1000).as("a"), (col("id") * 3).as("w1"))
    val dim2 = spark.range(0, 40000).select(
      (col("id") % 1000).as("b"), (col("id") % 1000).as("code"),
      (col("id") * 5).as("w2"))
    val (fN, fR) = writeTwin(facts, Some("a,b"))
    val (d1N, d1R) = writeTwin(dim1, Some("a"))
    val (d2N, d2R) = writeTwin(dim2, Some("b,code"))

    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      def q(f: String, d1: String, d2: String) =
        spark.read.format(Fmt).load(f)
          .join(spark.read.format(Fmt).load(d1), "a")
          .join(spark.read.format(Fmt).load(d2).filter(col("code") === 7), "b")
          .select(col("a"), col("b"), col("v"), col("w1"), col("w2"))

      // which dim shares the BOTTOM (deepest) join with the fact table?
      def bottomJoinCols(df: org.apache.spark.sql.DataFrame): Set[String] = {
        val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
        assert(joins.size == 2, df.queryExecution.optimizedPlan.toString)
        joins.last.children.flatMap(_.output).map(_.name).toSet
      }
      val withNdv = bottomJoinCols(q(fN, d1N, d2N))
      val without = bottomJoinCols(q(fR, d1R, d2R))
      assert(withNdv.contains("w2") && !withNdv.contains("w1"),
        s"NDV twin: the filtered dim2 must join first, bottom join saw $withNdv")
      assert(without.contains("w1") && !without.contains("w2"),
        s"undeclared twin: the written order must stand, bottom join saw $without")

      // the reorder changed the PLAN, never the ANSWER
      val a = q(fN, d1N, d2N).orderBy("v", "w1", "w2").collect().toSeq
      val b = q(fR, d1R, d2R).orderBy("v", "w1", "w2").collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
