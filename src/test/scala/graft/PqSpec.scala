package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}

/** Product quantization: encode contract (M codes per vector, codebook
  * range), seed fixed points, determinism, and ADC recall against the
  * exact brute-force ranking. */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.embeddings(spark, sf)
  private def dsub = emb.select(size(col("embedding"))).head().getInt(0) / 4

  test("encode emits exactly M in-range codes per vector") {
    val (codes, books) = Pq.encode(emb, 4, dsub, 8)
    val n = emb.count()
    assert(codes.count() === 4 * n) // M codes per vector — the 4-byte row
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 4).count() === 0)
    assert(codes.filter(col("code") < 0 || col("code") >= 8).count() === 0)
    assert(books.count() === 4 * 8) // M×k codebook entries
  }

  test("with seed codebooks, the seed vectors encode to their own ids") {
    val (codes, _) = Pq.encode(emb, 4, dsub, 8, iters = 1)
    // vec v < 8 contributed its own sub-vectors as codebook entry v:
    // cosine(sub, itself) = 1 is the unique argmax on this corpus
    val own = codes.filter(col("vec_id") < 8)
      .filter(col("code") === col("vec_id").cast("int"))
    assert(own.count() === 8 * 4)
  }

  test("ADC recovers true neighbors on clustered data; deterministic") {
    import spark.implicits._
    // 6 well-separated clusters × 10 near-copies (deterministic integer
    // base + 1% perturbation): the exact top-9 of any member are its
    // cluster mates. On RANDOM vectors exact ranking is noise and no
    // quantizer preserves it — structure is what PQ is for.
    val vecs = for (c <- 0 until 6; j <- 0 until 10) yield {
      val v = Array.tabulate(16) { i =>
        ((c * 31 + i * 17) % 13 - 6).toFloat + ((j * 7 + i * 3 + c) % 5 - 2) * 0.01f
      }
      (c * 10L + j, v)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val (codes, books) = Pq.encode(corpus, 4, 4, 8)
    val queries = corpus.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def adc = Pq.adcTopK(codes, books, queries, 4, 4, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = adc
    assert(adc === first) // reproducible run-to-run
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (first & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"ADC recall@10 = $recall")
  }

  test("a stored-and-reloaded IVF-PQ index answers identically to in-memory") {
    import graft.ops.{AnnIndex, Ivf}
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // in-memory composition: route on the trained centroids, ADC within
    val (idx, cents) = Ivf.index(emb, 8, 2)
    val (codes, books) = Pq.encode(emb, 4, dsub, 8)
    val cands = Ivf.route(cents, queries, 2)
      .join(idx, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
    val mem = Pq.adcTopKWithin(cands, codes, books, queries, 4, dsub, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("annidx-spec").toString
    AnnIndex.writeIvfPq(emb, dir, kIvf = 8, nSub = 4, dsub = dsub, kPq = 8)
    val stored = AnnIndex.ivfPqTopK(spark, dir, queries, 4, dsub, 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(stored === mem)
    // the persisted index never stores raw embeddings
    val cols = spark.read.parquet(s"$dir/assignments").columns.toSet
    assert(cols === Set("vec_id", "centroid_id"))
  }

  test("appendVectors: frozen-table adds route and encode exactly like their originals") {
    import graft.ops.AnnIndex
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dsub = emb.select(org.apache.spark.sql.functions.size(col("embedding"))).head().getInt(0) / 4
    val dir = java.nio.file.Files.createTempDirectory("annincr-spec").toString
    AnnIndex.writeIvfPq(emb, dir, kIvf = 8, nSub = 4, dsub = dsub, kPq = 8)
    val nBase = spark.read.parquet(s"$dir/assignments").count()
    // append EXACT duplicates under shifted ids: with frozen centroids
    // and codebooks they must land in identical buckets with identical
    // codes — the determinism contract of the no-retrain ingest path
    val dupes = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    AnnIndex.appendVectors(spark, dir, dupes, 4, dsub)
    val asg = spark.read.parquet(s"$dir/assignments")
    assert(asg.count() === nBase + 20)
    val byId = asg.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val codes = spark.read.parquet(s"$dir/codes").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    for (v <- 0L until 20L) {
      assert(byId(v + 500000L) === byId(v), s"bucket drift for $v")
      for (m <- 0 until 4)
        assert(codes((v + 500000L, m)) === codes((v, m)), s"code drift for $v/$m")
    }
  }
}
