package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the correctness baseline, and a
  * sign-bit-LSH bucketed variant as the scale path.
  *
  * Scale design (100 TB):
  *  - All arithmetic is higher-order built-ins (`zip_with`/`aggregate`)
  *    in double precision — no UDF, no serialization off Tungsten rows.
  *  - Brute force broadcasts the (small) query set against the corpus:
  *    O(|corpus|·|queries|·dim) with zero shuffle of the corpus; the
  *    per-query top-k is a windowed rank over a (query) partition.
  *  - The LSH path buckets both sides on deterministic sign bits of the
  *    embedding (random-hyperplane LSH with axis-aligned planes), so the
  *    candidate join is an equi-join on bucket id: at 1000 executors the
  *    corpus is hash-partitioned by bucket and each query probes only
  *    its bucket — the 1/2^bits candidate fraction is the recall/cost
  *    knob. An IVF variant would replace sign buckets with k-means
  *    centroid ids; the join/partitioning shape is identical.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Cosine similarity of two float vectors, computed in double:
    * dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Brute-force cosine top-k: every query vector against the full
    * corpus. The query side is broadcast (it is small by contract);
    * rank is deterministic via (sim desc, vec_id) tiebreak. `score`
    * swaps the similarity implementation (HOF default vs the fused
    * codegen expression) without changing the plan shape. */
  def bruteForceTopKWith(
      corpus: DataFrame, queries: DataFrame, k: Int,
      score: (Column, Column) => Column): DataFrame = {
    val scored = corpus
      .join(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id"),
        round(score(col("q_emb"), col("embedding")), 4).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    bruteForceTopKWith(corpus, queries, k, cosine)

  /** Same plan with the fused native expression
    * (graft.functions.VectorExpressions) — bit-identical results, one
    * codegen'd loop per pair instead of zip_with + three folds. */
  def bruteForceTopKNative(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    bruteForceTopKWith(corpus, queries, k,
      graft.functions.VectorExpressions.cosineNative)

  /** Bucket-width knob scaled to corpus size: bits ≈ log2(n/targetBucket)
    * keeps expected bucket occupancy near `targetBucket` as the corpus
    * grows. A FIXED bits degrades to all-pairs/2^bits at scale — at
    * 100 TB the bucket count must grow with the corpus (or the buckets
    * be replaced by IVF centroids with k ∝ n, same join shape). */
  def scaledBits(n: Long, targetBucket: Int = 32, minBits: Int = 4, maxBits: Int = 24): Int =
    math.min(maxBits, math.max(minBits,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt))

  /** As `scaledBits`, clamped to the embedding dimensionality `dim` —
    * sign bits beyond the vector length carry no signal, so a knob that
    * exceeds dim would only pretend to grow the bucket count. Named
    * (not an overload): a second (Long, Int) signature would make a
    * positional `scaledBits(n, 64)` meant as targetBucket silently
    * resolve to a dim clamp. */
  def scaledBitsForDim(n: Long, dim: Int): Int = math.min(dim, scaledBits(n))

  /** Deterministic sign-bit LSH bucket id from the first `bits` vector
    * components (axis-aligned random-hyperplane LSH). `get` (0-based,
    * null out of range under ANSI and non-ANSI alike) makes components
    * past the vector length contribute 0 instead of erroring, but
    * callers should still clamp bits to the dimensionality via
    * `scaledBitsForDim(n, dim)` — see that doc. */
  def signBucket(emb: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(get(emb, lit(i)) > 0f, lit(1 << (bits - 1 - i))).otherwise(lit(0))
    }.reduce(_ + _)

  /** Bucket occupancy histogram — the data-skew view of the LSH index. */
  def bucketHistogram(corpus: DataFrame, bits: Int = 4): DataFrame =
    corpus
      .groupBy(signBucket(col("embedding"), bits).as("bucket"))
      .agg(
        count(lit(1)).as("n_vectors"),
        countDistinct(col("label")).as("n_labels"))

  /** LSH-bucketed ANN top-k: queries probe only their own bucket —
    * the equi-join on bucket id replaces the cross join. Scoring uses
    * the fused native cosine (bit-identical to the HOF fold — proven by
    * OpsSpec — in one codegen'd loop per pair). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 4): DataFrame = {
    val c = corpus.withColumn("bucket", signBucket(col("embedding"), bits))
    val q = queries.withColumn("bucket", signBucket(col("q_emb"), bits))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id"),
        round(graft.functions.VectorExpressions.cosineNative(col("q_emb"), col("embedding")), 4)
          .as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Multi-probe LSH top-k: each query probes its own bucket PLUS its
    * `bits` Hamming-1 neighbor buckets — the standard fix for the
    * single-probe recall cliff, where a vector near a hyperplane
    * boundary loses its true neighbors to the adjacent bucket. Still a
    * bucket equi-join: the probe set explodes to bits+1 rows per query
    * (the query side is small by contract and stays broadcast), the
    * corpus is never replicated, and a corpus vector lives in exactly
    * one bucket so a (query, vector) candidate can only arise once —
    * no dedup needed. Candidate volume ×(bits+1) is the recall/cost
    * knob between single-probe and brute force. */
  def multiProbeTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 4): DataFrame = {
    val c = corpus.withColumn("bucket", signBucket(col("embedding"), bits))
    val base = signBucket(col("q_emb"), bits)
    val probes = array(base +: (0 until bits).map(i => base.bitwiseXOR(lit(1 << i))): _*)
    val q = queries.select(col("q_id"), col("q_emb"), explode(probes).as("bucket"))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id"),
        round(graft.functions.VectorExpressions.cosineNative(col("q_emb"), col("embedding")), 4)
          .as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive/embedding training: per
    * query, the top-k most-similar corpus vectors whose `label`
    * DIFFERS from the query's — the near-miss examples that carry the
    * gradient signal (random negatives are trivially separable; the
    * informative ones sit just across the decision boundary, exactly
    * the highest-cosine cross-label neighbors selected here).
    *
    * Certification runs the exact scorer over the full corpus (this
    * is the oracle-checkable shape); production swaps the cross join
    * for the LSH/IVF candidate generators above and applies the same
    * cross-label filter + rank AFTER the probe — the filter commutes
    * with candidate generation, so the ANN index needs no label
    * awareness. The query side broadcasts (queries are the small
    * side by contract); the corpus is never shuffled, and the
    * per-query rank window keys on q_id. */
  /** Matryoshka-style two-stage retrieval: a COARSE pass ranks by
    * cosine over only the first `prefixDims` dimensions, keeps the
    * top `coarseK` candidates per query, and an exact full-dimension
    * rerank picks the final top `k`. With MRL-trained embeddings the
    * leading dimensions carry most of the signal, so the coarse pass
    * reads prefixDims/d of the vector bytes — in a columnar store
    * with the prefix materialized as its own column, that is a
    * physical-scan reduction, not just fewer multiplies. Both stages
    * are deterministic (ties by vec_id), so the composition is
    * oracle-checkable end to end; the candidate set is the certified
    * contract, unlike recall-based ANN. At 100 TB the coarse pass
    * composes with the LSH/IVF generators above (prefix-dim scoring
    * inside each probed bucket), keeping the full-width vectors
    * touched only for coarseK rows per query. */
  def prefixRerank(
      corpus: DataFrame, queries: DataFrame,
      prefixDims: Int, coarseK: Int, k: Int): DataFrame = {
    val q = queries.select(col("q_id"), col("q_emb"),
      slice(col("q_emb"), 1, prefixDims).as("q_prefix"))
    val coarseW = Window.partitionBy(col("q_id"))
      .orderBy(col("coarse_sim").desc, col("vec_id"))
    val candidates = corpus
      .select(col("vec_id"), col("embedding"),
        slice(col("embedding"), 1, prefixDims).as("emb_prefix"))
      .join(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("vec_id"), col("embedding"),
        round(graft.functions.VectorExpressions.cosineNative(col("q_prefix"), col("emb_prefix")), 4)
          .as("coarse_sim"))
      .withColumn("coarse_rank", row_number().over(coarseW))
      .filter(col("coarse_rank") <= coarseK)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    candidates
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.VectorExpressions.cosineNative(col("q_emb"), col("embedding")), 4)
          .as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .select(
        col("q_id"), col("vec_id"), col("label"),
        round(graft.functions.VectorExpressions.cosineNative(col("q_emb"), col("embedding")), 4)
          .as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
