package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.segment.{GraftCatalog, SegmentLog}

/** The graft catalog plugin: SQL DDL/DML over segment tables, declared
  * bucket layouts preserved by plain INSERTs, and the payoff —
  * storage-partitioned joins between co-bucketed tables planning with
  * ZERO exchanges. */
class GraftCatalogSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private lazy val warehouse = Files.createTempDirectory("graft-warehouse").toString

  private def initCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
  }

  test("SQL DDL + INSERT + SELECT round-trip through the catalog") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.kv (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graft.db.kv SELECT id AS k, concat('v', id) AS v FROM range(0, 100)")
    val back = spark.sql("SELECT k, v FROM graft.db.kv ORDER BY k").collect()
    assert(back.length == 100)
    assert(back(42).getLong(0) == 42L && back(42).getString(1) == "v42")

    // the declared layout flowed into the write: segments are labeled,
    // the manifest carries the spec
    val fs = SegmentLog.fs(warehouse, spark.sessionState.newHadoopConf())
    val m = SegmentLog.read(fs, s"$warehouse/db/kv").get
    assert(m.bucketing.exists(b => b.cols == Seq("k") && b.n == 4))
    assert(m.segments.nonEmpty && m.segments.forall(_.bucket.isDefined))
    assert(m.segments.flatMap(_.bucket).distinct.size > 1)

    assert(spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("kv"))
  }

  test("storage-partitioned join: co-bucketed tables join with zero exchanges") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.spj_a (k BIGINT, a STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE graft.db.spj_b (k BIGINT, b STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graft.db.spj_a SELECT id AS k, concat('a', id) FROM range(0, 500)")
    spark.sql("INSERT INTO graft.db.spj_b SELECT id AS k, concat('b', id) FROM range(0, 500)")

    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = spark.sql(
        "SELECT a.k, a.a, b.b FROM graft.db.spj_a a JOIN graft.db.spj_b b ON a.k = b.k")
      assert(j.count() == 500)
      val shuffles = collect(j.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"storage-partitioned join must plan no exchange:\n${j.queryExecution.executedPlan}")
    }
  }

  test("bucketed aggregation: group-by on the bucket key plans without a shuffle") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.agg_t (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO graft.db.agg_t SELECT id % 50 AS k, id AS v FROM range(0, 1000)")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      val a = spark.sql("SELECT k, count(*) AS n, sum(v) AS s FROM graft.db.agg_t GROUP BY k")
      assert(a.count() == 50)
      assert(a.filter(col("k") === 7).head().getLong(1) == 20)
      val shuffles = collect(a.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucket-clustered group-by must plan no exchange:\n${a.queryExecution.executedPlan}")
    }
  }

  test("catalog maintenance: drop and rename") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tmpns")
    spark.sql("CREATE TABLE graft.tmpns.t1 (x INT)")
    spark.sql("INSERT INTO graft.tmpns.t1 VALUES (1), (2)")
    // the RENAME target resolves within the same catalog: no prefix
    spark.sql("ALTER TABLE graft.tmpns.t1 RENAME TO tmpns.t2")
    assert(spark.sql("SELECT sum(x) FROM graft.tmpns.t2").head().getLong(0) == 3L)
    spark.sql("DROP TABLE graft.tmpns.t2")
    assert(spark.sql("SHOW TABLES IN graft.tmpns").collect().isEmpty)
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
