package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Storage-partitioned-join rehearsal: the same orders ⋈ customer
  * aggregate three ways at a given SF —
  *  1. parquet + shuffle join (broadcast disabled: the big-big shape),
  *  2. co-bucketed graft-segment tables + SPJ (zero exchanges),
  *  3. parquet + broadcast (the small-dim fast path, for context) —
  * printing per-variant times and the exchange counts from each plan.
  * The point at 100 TB: variant 2 deletes variant 1's TWO full-table
  * shuffles by making co-location a table property; the one-time cost
  * is the clustered write, amortized over every co-keyed join after.
  *
  * `runMain graft.SpjBench [sfDir] [repeat]`
  */
object SpjBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.sessionState

    val wh = java.nio.file.Files.createTempDirectory("graft-spjbench").toString
    spark.conf.set("spark.sql.catalog.graft_sb",
      classOf[graft.sources.segment.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sb.warehouse", wh)
    spark.sql("CREATE NAMESPACE graft_sb.db")

    Tables.orders(spark, sfDir).createOrReplaceTempView("sb_orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("sb_customer")
    val buckets = 32
    spark.sql("CREATE TABLE graft_sb.db.o (o_custkey BIGINT, cents BIGINT) " +
      s"PARTITIONED BY (bucket($buckets, o_custkey))")
    spark.sql("CREATE TABLE graft_sb.db.c (c_custkey BIGINT, c_mktsegment STRING) " +
      s"PARTITIONED BY (bucket($buckets, c_custkey))")
    val t0 = System.nanoTime()
    spark.sql("INSERT INTO graft_sb.db.o SELECT o_custkey, " +
      "CAST(round(o_totalprice * 100, 0) AS BIGINT) FROM sb_orders")
    spark.sql("INSERT INTO graft_sb.db.c SELECT c_custkey, c_mktsegment FROM sb_customer")
    val loadSec = (System.nanoTime() - t0) / 1e9

    val spjSql =
      """SELECT c.c_mktsegment, count(*) AS n, sum(o.cents) AS s
        |FROM graft_sb.db.o o JOIN graft_sb.db.c c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment""".stripMargin
    val pqSql =
      """SELECT c.c_mktsegment, count(*) AS n,
        |       sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS s
        |FROM sb_orders o JOIN sb_customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment""".stripMargin

    def exchanges(sql: String): Int = {
      val df = spark.sql(sql)
      df.count()
      var n = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => n += 1
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case s: org.apache.spark.sql.execution.ReusedSubqueryExec => walk(s.child)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      n
    }

    def time(label: String, sql: String, confs: (String, String)*): Unit = {
      val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        spark.sql(sql).count() // warm
        val times = (1 to repeat).map { _ =>
          val s = System.nanoTime()
          spark.sql(sql).count()
          (System.nanoTime() - s) / 1e9
        }
        val ex = exchanges(sql)
        println(f"SPJBENCH $label%-22s best=${times.min}%6.2fs median=${times.sorted.apply(times.size / 2)}%6.2fs exchanges=$ex")
      } finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    println(f"SPJBENCH clustered-load           ${loadSec}%6.2fs (one-time, both tables)")
    time("parquet-shuffle", pqSql,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    time("segment-spj", spjSql,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    time("parquet-broadcast", pqSql,
      "spark.sql.adaptive.enabled" -> "false")
    spark.stop()
  }
}
