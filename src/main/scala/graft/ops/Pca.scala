package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PCA over the embedding corpus — the dominant
  * principal direction as RELATIONAL aggregates, no linear-algebra
  * library, no driver-side matrix: the corpus is never materialized as
  * a matrix at all.
  *
  * One iteration of v ← normalize(Σ_rows e·(e·v)) is two corpus-shaped
  * operations: a per-row sequential dot fold (codegen'd HOFs, the
  * cosine discipline), and ONE per-dim aggregate (posexplode →
  * groupBy(dim) — `dim` cells to the driver, the embBits-style O(dim)
  * exception). The driver holds only the current dim-length iterate,
  * re-broadcast as a literal; 100 TB of embeddings flow through two
  * shuffle-free scans per iteration.
  *
  * Cross-engine determinism uses the Lloyd-chain trick (see ivfSql):
  * every aggregate that sums over ROWS (whose order Spark does not
  * fix) is quantized to FLOAT before further use — the ~n·ulp double
  * noise of aggregation order is far below float resolution, so both
  * engines see identical iterates; dot folds and the norm are
  * dim-ordered sequential folds, exact by construction. Sign is
  * pinned by the deterministic e₁ seed. emb_pca_power replays the
  * full iteration chain in SQL.
  */
object Pca {

  /** The converged iterate itself — dim-indexed, unit norm, each cell
    * a float-valued double (the quantization contract above). */
  def direction(corpus: DataFrame, iters: Int = 2): Array[Double] = {
    require(iters >= 1, "need at least one iteration")
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    var v: Array[Double] = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val vLit = array(v.map(lit): _*)
      val dot = aggregate(
        zip_with(col("embedding"), vLit, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      val s = corpus
        .select(dot.as("dot"), posexplode(col("embedding")).as(Seq("dim", "ev")))
        .groupBy(col("dim"))
        .agg(sum(col("ev") * col("dot")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // quantize the row-order-dependent sums to float, THEN normalize
      // with a dim-ascending sequential fold (both mirrored in SQL)
      val sf = Array.tabulate(dim)(d => s.getOrElse(d, 0.0).toFloat.toDouble)
      var nsq = 0.0
      var i = 0
      while (i < dim) { nsq += sf(i) * sf(i); i += 1 }
      val norm = math.sqrt(nsq)
      v = sf.map(x => (x / norm).toFloat.toDouble)
    }
    v
  }

  /** The dominant principal direction after `iters` power iterations
    * from the e₁ seed: (dim, loading) rows, loadings rounded to 4 dp.
    * Mean-centering is the caller's choice (append it upstream); the
    * raw second-moment direction is what a dedup/whitening pipeline
    * wants for scale normalization. */
  def powerIteration(corpus: DataFrame, iters: Int = 2): DataFrame = {
    val v = direction(corpus, iters)
    val spark = corpus.sparkSession
    import spark.implicits._
    v.zipWithIndex.map { case (x, d) =>
      (d, BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.toDF("dim", "loading")
  }

  /** Common-component removal (the SIF embedding post-process): each
    * vector minus its projection on `v`, reported as the residual
    * norm — how much of a vector the dominant direction does NOT
    * explain. Map-only over the corpus: `v` rides along as a literal
    * array, the projection is one sequential fold per row. A vector
    * parallel to `v` residualizes to ~0; orthogonal ones keep their
    * full norm (spec-pinned). */
  def residualNorms(corpus: DataFrame, v: Array[Double]): DataFrame = {
    val vLit = array(v.map(lit): _*)
    val dot = aggregate(
      zip_with(col("embedding"), vLit, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    corpus
      .withColumn("dot", dot)
      .withColumn("res", zip_with(col("embedding"), vLit,
        (x, y) => x - col("dot") * y))
      .select(col("vec_id"),
        round(sqrt(aggregate(col("res"), lit(0.0), (acc, x) => acc + x * x)), 4)
          .as("residual_norm"))
  }
}
