package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): compress each embedding dimension to an
  * 8-bit code against per-dimension [min, max] trained from the
  * corpus, and serve top-k by asymmetric distance — the query stays
  * full-precision, the corpus is reconstructed per dimension from its
  * codes. The faiss `SQ8` / Lucene `int8_hnsw` storage tier: 4x
  * smaller vectors than float32 with near-identical recall, simpler
  * and CPU-cheaper than PQ (no codebook train, no subspace argmin —
  * encode is a map-only affine transform).
  *
  * 100 TB shape mirrors [[Pq]]: training is ONE map-side-combined
  * aggregate producing d (min, max) pairs packed into a 1-row frame
  * (broadcast everywhere — never a driver collect of corpus data);
  * encode is map-only; the served index stores only (vec_id, codes)
  * at ~1/4 the corpus bytes, raw vectors never touched at query
  * time. All arithmetic is double with a fixed operation order and
  * `floor(x + 0.5)` rounding, so codes — and therefore scores — are
  * bit-portable across engines (oracle-checkable, unlike recall-
  * gated ANN).
  */
object Sq {

  /** Per-dimension training stats packed as one row
    * (mins: array<double>, maxs: array<double>), ordered by
    * dimension. The per-dim aggregate shuffles d rows; the pack is a
    * d-element array_sort — both corpus-size-independent after the
    * map-side combine. */
  def stats(corpus: DataFrame): DataFrame =
    corpus
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("s"))
      .select(
        transform(col("s"), x => x.getField("mn")).as("mins"),
        transform(col("s"), x => x.getField("mx")).as("maxs"))

  private def code(v: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L))
      .otherwise(floor((v.cast("double") - mn) / (mx - mn) * 255 + 0.5))

  /** (vec_id, codes: array<int>) — map-only encode against the
    * broadcast stats row; a constant dimension codes to 0. */
  def encode(corpus: DataFrame, statsRow: DataFrame): DataFrame =
    corpus
      .crossJoin(broadcast(statsRow))
      .select(col("vec_id"),
        transform(sequence(lit(1), size(col("embedding"))),
          i => code(element_at(col("embedding"), i),
            element_at(col("mins"), i), element_at(col("maxs"), i)).cast("int"))
          .as("codes"))

  /** Per-dimension affine reconstruction mn + code/255*(mx-mn). */
  private def rec: Column =
    transform(sequence(lit(1), size(col("codes"))),
      i => element_at(col("mins"), i) +
        element_at(col("codes"), i).cast("double") / 255.0 *
          (element_at(col("maxs"), i) - element_at(col("mins"), i)))

  /** Asymmetric top-k: full-precision queries against per-dimension
    * reconstructions. Queries broadcast; the rank window keys on
    * q_id; ties break by vec_id. */
  def adcTopK(codes: DataFrame, statsRow: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    codes
      .crossJoin(broadcast(statsRow))
      .join(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Similarity.cosine(col("q_emb"), rec), 4).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ADC top-k restricted to a candidate set (q_id, vec_id) — the
    * IVF-SQ composition ([[Ivf.route]] picks the buckets, only those
    * members' codes are scored): the scan is nprobe/k of the corpus
    * and each candidate reads 1/4 of the vector bytes. The third cell
    * of the ANN quantization matrix next to IVF-flat (Ivf.topK) and
    * IVF-PQ (Pq.adcTopKWithin). */
  def adcTopKWithin(
      candidates: DataFrame, codes: DataFrame, statsRow: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    candidates
      .join(codes, Seq("vec_id"))
      .crossJoin(broadcast(statsRow))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Similarity.cosine(col("q_emb"), rec), 4).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
