package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.segment.{GraftCatalog, SegmentLog}

/** DEFAULT column values on the segment format: CREATE/ADD COLUMN
  * defaults are ONE metadata-only manifest commit; rows written before
  * the column existed read the folded EXISTS_DEFAULT constant (row AND
  * vectorized paths, and the change feed); SET/DROP DEFAULT changes
  * future inserts only — the SQL-standard CURRENT/EXISTS split. */
class SegmentDefaultsSpec extends SparkSpec {

  private val Fmt = "graft-segment"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val warehouse = {
    val wh = Files.createTempDirectory("graft-defaults-wh").toString
    spark.conf.set("spark.sql.catalog.gd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gd.db")
    wh
  }

  test("defaults on the round-12 types: tinyint/smallint/binary/decimal constants fill") {
    warehouse // force the catalog registration
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gd.db")
    spark.sql("CREATE TABLE gd.db.newtypes (k BIGINT, " +
      "y TINYINT DEFAULT 7, w SMALLINT DEFAULT 300, " +
      "m DECIMAL(12,2) DEFAULT 9.75, b BINARY DEFAULT X'CAFE')")
    spark.sql("INSERT INTO gd.db.newtypes (k) VALUES (1), (2)")
    // ADD COLUMN with a default: old rows read the folded constant
    spark.sql("ALTER TABLE gd.db.newtypes ADD COLUMN y2 SMALLINT DEFAULT 12")
    val r = spark.sql("SELECT y, w, m, b, y2 FROM gd.db.newtypes WHERE k = 1").head()
    assert(r.getByte(0) == 7.toByte && r.getShort(1) == 300.toShort)
    assert(r.getDecimal(2) == new java.math.BigDecimal("9.75"))
    assert(r.getAs[Array[Byte]](3).toSeq == Seq(0xCA.toByte, 0xFE.toByte))
    assert(r.getShort(4) == 12.toShort)
  }

  test("CREATE TABLE defaults: analyzer fills omitted columns and the DEFAULT keyword") {
    warehouse
    spark.sql("CREATE TABLE gd.db.c1 (k BIGINT, status STRING DEFAULT 'PENDING', " +
      "retries INT DEFAULT 0)")
    spark.sql("INSERT INTO gd.db.c1 (k) VALUES (1), (2)")
    spark.sql("INSERT INTO gd.db.c1 (k, status, retries) VALUES (3, DEFAULT, 5)")
    spark.sql("INSERT INTO gd.db.c1 (k, status) VALUES (4, 'DONE')")
    val got = spark.sql("SELECT k, status, retries FROM gd.db.c1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "PENDING", 0), (2L, "PENDING", 0),
      (3L, "PENDING", 5), (4L, "DONE", 0)))
  }

  test("ADD COLUMN DEFAULT is metadata-only; old rows read the constant on BOTH decode paths") {
    warehouse
    spark.sql("CREATE TABLE gd.db.a1 (k BIGINT, vec ARRAY<FLOAT>)")
    spark.sql("INSERT INTO gd.db.a1 SELECT id, array(CAST(id AS FLOAT)) FROM range(0, 100)")
    val dir = s"$warehouse/db/a1"
    val fs = SegmentLog.fs(dir, spark.sessionState.newHadoopConf())
    val before = SegmentLog.read(fs, dir).get
    spark.sql("ALTER TABLE gd.db.a1 ADD COLUMN score BIGINT DEFAULT 7")
    spark.sql("ALTER TABLE gd.db.a1 ADD COLUMN tag STRING DEFAULT 'none'")
    val after = SegmentLog.read(fs, dir).get
    assert(after.segments.map(_.path) == before.segments.map(_.path),
      "ADD COLUMN DEFAULT must rewrite no segment")
    // vectorized path: atomic-only projection
    val vec = spark.sql("SELECT k, score, tag FROM gd.db.a1 ORDER BY k").collect()
    assert(vec.length == 100 && vec.forall(r => r.getLong(1) == 7L && r.getString(2) == "none"))
    // row path: the array column drops the scan to the row reader
    val row = spark.sql("SELECT k, vec, score, tag FROM gd.db.a1 ORDER BY k").collect()
    assert(row.forall(r => r.getLong(2) == 7L && r.getString(3) == "none"))
    // new inserts omitting the columns take the CURRENT default too
    spark.sql("INSERT INTO gd.db.a1 (k, vec) VALUES (100, array(CAST(1 AS FLOAT)))")
    spark.sql("INSERT INTO gd.db.a1 (k, vec, score, tag) " +
      "VALUES (101, array(CAST(1 AS FLOAT)), 9, 'set')")
    val tail = spark.sql("SELECT k, score, tag FROM gd.db.a1 WHERE k >= 100 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(tail == Seq((100L, 7L, "none"), (101L, 9L, "set")))
    // a filter ON the defaulted value must surface the old rows — the
    // default-serving segments carry no stats for the column, so
    // pruning may not touch them
    assert(spark.sql("SELECT count(*) FROM gd.db.a1 WHERE score = 7").head().getLong(0) == 101L)
    assert(spark.sql("SELECT count(*) FROM gd.db.a1 WHERE score IS NOT NULL")
      .head().getLong(0) == 102L)
  }

  test("SET/DROP DEFAULT are future-only; a mergeSchema column stays null-backfilled") {
    warehouse
    spark.sql("CREATE TABLE gd.db.s1 (k BIGINT)")
    spark.sql("INSERT INTO gd.db.s1 VALUES (0)")
    val dir = s"$warehouse/db/s1"
    import spark.implicits._
    // mergeSchema evolution adds `n` with NO default: old rows are null
    Seq((1L, 10L)).toDF("k", "n").write.format(Fmt)
      .option("mergeSchema", "true").mode("append").save(dir)
    // SET DEFAULT paints FUTURE inserts only — row 0 must stay null
    spark.sql("ALTER TABLE gd.db.s1 ALTER COLUMN n SET DEFAULT 42")
    spark.sql("INSERT INTO gd.db.s1 (k) VALUES (2)")
    spark.sql("ALTER TABLE gd.db.s1 ALTER COLUMN n DROP DEFAULT")
    spark.sql("INSERT INTO gd.db.s1 (k) VALUES (3)")
    val got = spark.sql("SELECT k, n FROM gd.db.s1 ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    assert(got == Seq((0L, None), (1L, Some(10L)), (2L, Some(42L)), (3L, None)))
    // and on a column ADDed with a default, SET DEFAULT must not
    // repaint history: old rows keep the ADD-time EXISTS default
    spark.sql("ALTER TABLE gd.db.s1 ADD COLUMN p BIGINT DEFAULT 1")
    spark.sql("ALTER TABLE gd.db.s1 ALTER COLUMN p SET DEFAULT 2")
    spark.sql("INSERT INTO gd.db.s1 (k) VALUES (4)")
    val p = spark.sql("SELECT k, p FROM gd.db.s1 ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(p == Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L)))
  }

  test("non-atomic defaults are refused with the backfill recipe; renames keep defaults") {
    warehouse
    spark.sql("CREATE TABLE gd.db.r1 (k BIGINT)")
    spark.sql("INSERT INTO gd.db.r1 VALUES (0)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gd.db.r1 ADD COLUMN xs ARRAY<INT> DEFAULT array(1, 2)")
    }
    assert(e.getMessage.contains("backfill with UPDATE"), e.getMessage)
    spark.sql("ALTER TABLE gd.db.r1 ADD COLUMN st STRING DEFAULT 'x'")
    spark.sql("ALTER TABLE gd.db.r1 RENAME COLUMN st TO status")
    assert(spark.sql("SELECT status FROM gd.db.r1").head().getString(0) == "x")
    spark.sql("INSERT INTO gd.db.r1 (k) VALUES (1)")
    assert(spark.sql("SELECT count(*) FROM gd.db.r1 WHERE status = 'x'")
      .head().getLong(0) == 2L)
  }

  test("the change feed serves existence defaults for pre-add segments") {
    warehouse
    spark.sql("CREATE TABLE gd.db.f1 (k BIGINT)")
    spark.sql("INSERT INTO gd.db.f1 VALUES (0), (1)") // v1
    spark.sql("ALTER TABLE gd.db.f1 ADD COLUMN src STRING DEFAULT 'seed'") // v2
    spark.sql("INSERT INTO gd.db.f1 (k, src) VALUES (2, 'live')") // v3
    val dir = s"$warehouse/db/f1"
    val feed = spark.read.format(Fmt)
      .option("readChangeFeed", "true")
      .option("startingVersion", "0").option("endingVersion", "3")
      .load(dir)
      .select(col("k"), col("src"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(feed == Seq((0L, "seed", "insert"), (1L, "seed", "insert"),
      (2L, "live", "insert")))
  }
}
