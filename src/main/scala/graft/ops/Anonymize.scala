package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity by suppression: rows whose QUASI-IDENTIFIER
  * combination is shared by fewer than k rows get those identifiers
  * NULLed, so every surviving combination describes at least k
  * people — the release criterion that stops linkage attacks joining
  * a "de-identified" table back to a voter roll on (zip, birthdate,
  * sex). The privacy complement of [[graft.ops.Forget]] (erasure on
  * request) and TextOps.scrubPii (direct identifiers): quasi-
  * identifiers are the columns that are harmless alone and
  * identifying TOGETHER.
  *
  * Suppression (NULL the cell) rather than generalization (coarsen
  * until k holds) keeps the operator deterministic and single-pass:
  * ONE window count over the quasi-identifier combination — the same
  * shuffle a groupBy on those columns pays — and a conditional NULL.
  * Generalization hierarchies compose on top by pre-bucketing the
  * columns (the caller picks the coarsening; this operator enforces
  * the k floor). At 100 TB the count and the conditional rewrite are
  * one shuffle + one map pass; nothing is collected.
  */
object Anonymize {

  /** NULL `quasiCols` on every row whose quasi-identifier combination
    * has fewer than `k` rows. Non-quasi columns pass through. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    val counted = df.withColumn("graft_qi_n", count(lit(1)).over(w))
    val out = quasiCols.foldLeft(counted) { (acc, c) =>
      acc.withColumn(c, when(col("graft_qi_n") >= k, col(c)))
    }
    out.withColumn("suppressed", col("graft_qi_n") < k).drop("graft_qi_n")
  }

  /** l-diversity audit over an already-k-anonymous release: for each
    * surviving quasi-identifier group, how many DISTINCT sensitive
    * values it carries. k-anonymity alone is defeated by a uniform
    * group (every member shares the sensitive value, so linkage
    * learns it without identifying anyone — the homogeneity attack);
    * distinct-l-diversity is the standard counter-criterion. Returns
    * one row per group with its size and l; the caller's release
    * gate is `min(l) >= threshold`. Same scale shape as
    * [[kAnonymize]]: one groupBy on the quasi columns (map-side
    * combined, group-cardinality output), nothing collected.
    * Suppressed groups (NULLed identifiers) aggregate under the NULL
    * combination like any other — their l is the diversity of the
    * suppressed POOL, which is exactly what a release reviewer wants
    * to see. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))

  /** t-closeness audit — the third rung of the release-criteria
    * ladder (k-anonymity → l-diversity → t-closeness): per
    * quasi-identifier group, the distance between the group's
    * SENSITIVE-value distribution and the global one. l-diversity is
    * defeated by skew (a group with values {flu:99, HIV:1} is
    * 2-diverse yet discloses near-certain flu); t-closeness bounds
    * what linkage to a group reveals BEYOND the public global
    * distribution. For categorical sensitive values with uniform
    * ground distance, the Earth-Mover's Distance reduces to total
    * variation: t = ½ Σ_v |p_v − q_v|.
    *
    * Exactness discipline: float sums over |p−q| terms would make the
    * result order-dependent; instead every term is the INTEGER
    * |n_gv·N − n_v·n_g| over the common denominator n_g·N, values
    * absent from the group contribute via the closed form
    * N·n_g − Σ_present n_v·n_g (no dense group×value frame needed),
    * and the single final division is the only float op —
    * bit-deterministic under any aggregation order. Long products
    * bound exactness at N·n_g < 2^63 (~3·10^9 rows either factor);
    * past that, cast the products to DECIMAL(38,0) — same plan.
    *
    * Scale: one groupBy on (quasi, sensitive), a broadcast join
    * against the value marginals (|V| rows) and the 1-row total —
    * group-cardinality output, nothing collected. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String): DataFrame = {
    val gv = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n_gv"))
    val v = df.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("n_v"))
    val total = df.agg(count(lit(1)).as("n_total"))
    // n_g via a window over the (group, value) cardinality frame —
    // already group-scale rows, so the window is cheap and saves a
    // second scan-side aggregate
    val w = Window.partitionBy(quasiCols.map(col): _*)
    gv.join(broadcast(v), Seq(sensitiveCol))
      .crossJoin(broadcast(total))
      .withColumn("n_g", sum(col("n_gv")).over(w))
      .groupBy(quasiCols.map(col): _*)
      .agg(
        max(col("n_g")).as("group_n"),
        max(col("n_total")).as("nn"),
        sum(abs(col("n_gv") * col("n_total") - col("n_v") * col("n_g")))
          .as("present_abs"),
        sum(col("n_v") * col("n_g")).as("present_q"))
      .select(
        quasiCols.map(col) :+ col("group_n") :+
          round(
            (col("present_abs") + (col("nn") * col("group_n") - col("present_q")))
              .cast("double") /
              (lit(2.0) * col("group_n") * col("nn")), 4).as("t_closeness"): _*)
  }

  /** Laplace-mechanism noisy counts: per-key count + Laplace(1/ε)
    * noise via the inverse CDF over a SEEDED uniform (salted-md5, the
    * repo's hash-uniform discipline; u = (h32 + 0.5)/2^32 is strictly
    * inside (0,1), so the ln never sees 0). Sensitivity of a count is
    * 1, so scale b = 1/ε is the textbook calibration.
    *
    * The honest caveat, stated plainly: REPLAYABLE noise is what
    * makes the mechanism oracle-certifiable, and it is exactly what
    * real differential privacy forbids (a key-derived seed leaks
    * through repetition). Production swaps the salt for a
    * non-replayable random source and keeps everything else — this
    * certifies the MECHANISM (inverse-CDF shape, calibration,
    * exact-count base), not a privacy guarantee. One map-side-
    * combined count; noise is a map expression over key-cardinality
    * rows. */
  def noisyCounts(df: DataFrame, key: String, salt: String, epsilon: Double): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val u = (conv(substring(md5(concat(lit(salt), col(key).cast("string"))), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .select(col(key),
        round(col("n") +
          lit(-1.0 / epsilon) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5)), 4)
          .as("noisy_count"))
  }
}
