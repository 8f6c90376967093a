package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.segment.SegmentCodec

/** Spark 4 VariantType on the graft-segment format: stored as the
  * binary (value, metadata) pair it already is — one parse_json pass
  * upstream, path probes downstream, no schema inference and no
  * re-tokenization at read. Top-level columns only; no zone maps,
  * blooms, DEFAULTs, or widening (all refused or absent by the same
  * sound defaults as binary); scans with a variant column take the
  * row reader. */
class SegmentVariantSpec extends SparkSpec {

  private val Fmt = "graft-segment"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("variant roundtrip: values, nulls, and path probes survive the storage hop") {
    val dir = tmp("graft-var-rt")
    import spark.implicits._
    val src = (0 until 300).map { i =>
      val js =
        if (i % 11 == 0) null // null variant: the column's marker byte
        else s"""{"id": $i, "tags": ["a$i", "b"], "nested": {"x": ${i % 7}}}"""
      (i.toLong, js)
    }.toDF("k", "js")
      .select(col("k"), when(col("js").isNotNull, parse_json(col("js"))).as("v"))
    src.write.format(Fmt).mode("append").save(dir)
    val back = spark.read.format(Fmt).load(dir)
    assert(back.schema("v").dataType == VariantType)
    // canonical JSON text must match exactly, null rows included
    val got = back.select(col("k"), to_json(col("v")).as("js")).orderBy("k").collect()
    val want = src.select(col("k"), to_json(col("v")).as("js")).orderBy("k").collect()
    assert(got.toSeq == want.toSeq)
    // typed path probes off the stored bytes
    val sumX = back.agg(sum(variant_get(col("v"), "$.nested.x", "bigint"))).head().getLong(0)
    val wantX = (0 until 300).filter(_ % 11 != 0).map(_ % 7).sum.toLong
    assert(sumX == wantX)
  }

  test("column pruning skips variant bytes; compression carries them") {
    val dir = tmp("graft-var-z")
    import spark.implicits._
    val src = (0 until 100).map(i => (i.toLong, s"""{"n": $i}"""))
      .toDF("k", "js").select(col("k"), parse_json(col("js")).as("v"))
    src.write.format(Fmt).option("compress", "deflate").mode("append").save(dir)
    // projection WITHOUT the variant column exercises the skip arm
    assert(spark.read.format(Fmt).load(dir).select("k").count() == 100)
    val total = spark.read.format(Fmt).load(dir)
      .agg(sum(variant_get(col("v"), "$.n", "bigint"))).head().getLong(0)
    assert(total == (0 until 100).sum.toLong)
  }

  test("variant is top-level only: struct/array/map nesting refused loudly") {
    assert(SegmentCodec.supported(VariantType))
    assert(!SegmentCodec.supported(StructType(Seq(StructField("v", VariantType)))))
    assert(!SegmentCodec.supported(ArrayType(VariantType)))
    assert(!SegmentCodec.supported(MapType(StringType, VariantType)))
    import spark.implicits._
    val df = Seq((1L, "{}")).toDF("k", "js")
      .select(col("k"), struct(parse_json(col("js")).as("inner")).as("s"))
    val e = intercept[Exception] {
      df.write.format(Fmt).mode("append").save(tmp("graft-var-bad"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unsupported")), s"got: ${msgs(e)}")
  }
}
