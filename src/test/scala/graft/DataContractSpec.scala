package graft

import org.apache.spark.sql.functions._

/** Pins the DATA contracts the oracle suite silently depends on.
  *
  * The correctness gate proves Spark ≡ DuckDB on the data as it IS;
  * these tests prove the data still has the shape that makes those
  * oracles deterministic in the first place. The driver regenerated
  * /root/testdata mid-round-7 (same seed/content, but events.ts
  * changed physical type from TIMESTAMP(NANOS) to TIMESTAMP(MICROS))
  * and silently broke 28 queries — this spec exists so the NEXT
  * regeneration fails here, with the dependent oracle family named,
  * instead of inside a query plan.
  *
  * Contracts and their dependents:
  *  - money columns are exact 2-decimal values → every integer-cents
  *    oracle (rel_q8/q9/q11/q15, rel_decimal_exact, saga grants)
  *  - l_quantity is integer-valued → exact HAVING thresholds
  *    (rel_q17/q18/q20, checkout quantities)
  *  - l_discount ∈ {0.00 … 0.10} → the (1-disc)*100 cents factor
  *  - events.ts loads as TimestampType via Tables.events whatever the
  *    parquet physical layout → all 28 events-derived queries
  *  - documents/doc_id unique, embeddings fixed-dim finite → dedup,
  *    ANN, and every per-doc join
  */
class DataContractSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def centsExact(tbl: String, column: String): Long =
    spark.read.parquet(s"$d/$tbl.parquet")
      .filter(abs(col(column) * 100 - round(col(column) * 100, 0)) > 1e-6)
      .count()

  test("money columns are exact 2-decimal values (integer-cents oracles)") {
    assert(centsExact("lineitem", "l_extendedprice") === 0L)
    assert(centsExact("orders", "o_totalprice") === 0L)
    assert(centsExact("customer", "c_acctbal") === 0L)
    assert(centsExact("part", "p_retailprice") === 0L)
    assert(centsExact("supplier", "s_acctbal") === 0L)
  }

  test("l_quantity is integer-valued and l_discount is a 2-dec fraction in [0, 0.1]") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    assert(li.filter(col("l_quantity") =!= round(col("l_quantity"), 0)).count() === 0L)
    assert(li.filter(col("l_discount") < 0 || col("l_discount") > 0.1).count() === 0L)
    assert(li.filter(abs(col("l_discount") * 100 - round(col("l_discount") * 100, 0)) > 1e-9)
      .count() === 0L)
  }

  test("events loads as ts: TIMESTAMP through Tables.events regardless of physical layout") {
    val ev = graft.sources.Tables.events(spark, d)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(ev.filter(col("ts").isNull).count() === 0L)
    assert(ev.count() > 0L)
  }

  test("Tables.events' micros-ntz branch reads a Spark-written TIMESTAMP_NTZ file") {
    val base = java.nio.file.Files.createTempDirectory("contract-ntz").toString
    spark.sql(
      """SELECT id AS event_id,
        |  CAST(timestamp_ntz'2001-02-03 04:05:06' + make_interval(0,0,0,0,0,0,id) AS TIMESTAMP_NTZ) AS ts,
        |  id AS user_id, 'click' AS event_type, 1.0 AS value, '{}' AS props
        |FROM range(5)""".stripMargin)
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val ev = graft.sources.Tables.events(spark, base)
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    // UTC session: ntz wall-clock == instant; the cast must not shift it
    val first = ev.orderBy(col("event_id")).select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0)
    assert(first === "2001-02-03 04:05:06")
  }

  test("Tables.events' legacy nanos-as-long branch converts with integer division") {
    val base = java.nio.file.Files.createTempDirectory("contract-nanos").toString
    // what the legacy nanosAsLong conf yields from a TIMESTAMP(NANOS)
    // file: a raw int64 nanosecond epoch — write that shape directly
    val ns = 981173106000000000L // 2001-02-03 04:05:06 UTC in ns
    spark.range(3).select(
      col("id").as("event_id"),
      (lit(ns) + col("id") * 1000000000L).as("ts"),
      col("id").as("user_id"),
      lit("click").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val ev = graft.sources.Tables.events(spark, base)
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val first = ev.orderBy(col("event_id")).select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0)
    assert(first === "2001-02-03 04:05:06")
  }

  test("documents ids are unique and text non-null; embeddings fixed-dim finite") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    assert(docs.count() === docs.select("doc_id").distinct().count())
    assert(docs.filter(col("text").isNull).count() === 0L)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val dims = emb.select(size(col("embedding")).as("n")).distinct().collect().map(_.getInt(0))
    assert(dims.length === 1, s"embedding dims not uniform: ${dims.mkString(",")}")
    assert(emb.filter(exists(col("embedding"), x => isnan(x) || x === Float.PositiveInfinity ||
      x === Float.NegativeInfinity)).count() === 0L)
  }

  test("star-schema keys referenced by the TPC-H suite are non-null") {
    def nulls(tbl: String, cols: Seq[String]): Long =
      spark.read.parquet(s"$d/$tbl.parquet")
        .filter(cols.map(c => col(c).isNull).reduce(_ || _)).count()
    assert(nulls("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")) === 0L)
    assert(nulls("orders", Seq("o_orderkey", "o_custkey", "o_orderdate")) === 0L)
    assert(nulls("customer", Seq("c_custkey", "c_nationkey")) === 0L)
    assert(nulls("supplier", Seq("s_suppkey", "s_nationkey")) === 0L)
    assert(nulls("part", Seq("p_partkey", "p_retailprice")) === 0L)
  }
}
