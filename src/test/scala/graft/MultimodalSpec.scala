package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, batched per-partition decode (stubbed),
  * metadata pruning. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures runs the batched decode over partitions deterministically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length === 20)
    assert(rows.forall(_.features.length === Multimodal.StubDecoder.dim))
    // deterministic: same input -> same checksum on a second run
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.map(r => r.media_id -> r.checksum).toMap ===
      again.map(r => r.media_id -> r.checksum).toMap)
  }

  test("metadata pruning filters without touching payload bytes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val media = Multimodal.mediaFromDocuments(spark, docs).toDF()
    val small = Multimodal.prunableMedia(media, "image", maxBytes = 200)
    assert(small.count() > 0)
    assert(small.count() < 50)
  }
}
