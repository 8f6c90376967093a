package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranker
  * (BM25) with a vector ranker (embedding cosine) is the standard
  * retrieval shape for curation and RAG pipelines, and reciprocal
  * rank fusion (RRF; Cormack et al., SIGIR'09) is the
  * score-calibration-free way to do it: each system contributes
  * `1/(c + rank)` for every item it ranked, unranked systems
  * contribute nothing, and the fused ordering needs no comparable
  * score scales at all.
  *
  * Scale shape: every input frame is already top-k-bounded PER QUERY
  * by its ranker, so fusion joins #queries × k-row frames on
  * (q_id, doc_id) — cost ∝ queries × k × systems, independent of
  * corpus size. The expensive work stays in the upstream rankers
  * (which have their own sub-quadratic paths: Bm25's query-term
  * postings, the ANN families). The fused frame is re-ranked with a
  * window over ≤ systems × k rows per query.
  *
  * Determinism: ranks are integers, each RRF term is one IEEE
  * division, and terms are summed in input order via a left-to-right
  * fold — both engines compute bit-identical doubles, so the
  * (score DESC, doc_id) tiebreak is total and `text_hybrid_rrf`
  * hash-matches without any quantization step.
  */
object Fusion {

  /** Fuse rank frames (columns `q_id`, `doc_id`, `rank`) with RRF:
    * score(d) = Σ_systems 1/(c + rank_sys(d)), top `k` per query,
    * ties broken by doc_id. Returns (q_id, doc_id, rrf, rank). */
  def rrf(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(c >= 0, "rank offset must be non-negative")
    val terms = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("q_id"), col("doc_id"),
        (lit(1.0) / (lit(c) + col("rank"))).as(s"rrf_t$i"))
    }
    val joined = terms.reduce((a, b) => a.join(b, Seq("q_id", "doc_id"), "full_outer"))
    val score = terms.indices.map(i => coalesce(col(s"rrf_t$i"), lit(0.0))).reduce(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    joined
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), round(col("score"), 6).as("rrf"), col("rank"))
  }
}
