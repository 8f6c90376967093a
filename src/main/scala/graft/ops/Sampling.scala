package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and train/eval splitting.
  *
  * The scale-correct replacement for `rand()`-based sampling in a
  * training-data pipeline: membership is a pure function of
  * (salt, key), so a sample is reproducible across runs, clusters and
  * engines, stable under retries/speculative execution (a re-executed
  * task cannot flip a row's fate, which `rand()` can), and consistent
  * across tables sharing the key. Map-only — no shuffle, no RNG state,
  * nothing driver-side; at 100 TB it fuses into the scan's codegen
  * stage.
  *
  * Mechanism: the first 8 hex chars of `md5(salt || key)` are uniform
  * over [0, 16^8); comparing them LEXICOGRAPHICALLY against a
  * fixed-width hex threshold avoids any hex→integer conversion, so the
  * exact same predicate runs in any engine with md5 (the DuckDB oracle
  * uses the identical string compare).
  */
object Sampling {

  /** Uniform 8-hex-digit bucket hash of (salt, key) — the sampling
    * coordinate. Lowercase hex in Spark and DuckDB alike. */
  def bucketHash(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** The zero-padded hex threshold t such that
    * P[bucketHash < t] = rate (to 1/2^32 resolution). */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Keep a deterministic `rate` fraction of rows, keyed by `key`. */
  def sample(df: DataFrame, key: Column, rate: Double, salt: String): DataFrame =
    df.filter(bucketHash(key, salt) < lit(hexThreshold(rate)))

  /** Tag every row with its bucket hash and a train/heldout split at
    * `trainFrac`. Rows with the same key always land on the same side —
    * the contamination guard a real pipeline needs (an eval doc can
    * never leak into training no matter how often the job reruns). */
  def trainEvalSplit(df: DataFrame, key: Column, trainFrac: Double, salt: String): DataFrame = {
    val h = bucketHash(key, salt)
    df.withColumn("bucket_hash", h)
      .withColumn("split",
        when(col("bucket_hash") < lit(hexThreshold(trainFrac)), "train")
          .otherwise("heldout"))
  }

  /** Per-stratum deterministic sampling — rebalance a corpus (e.g.
    * upweight rare languages) with a different keep-rate per stratum
    * value. Still map-only: the rate table compiles into a chained
    * codegen'd predicate, so nothing is joined, shuffled or
    * randomized; rows in strata absent from `rates` are dropped. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Double], salt: String): DataFrame = {
    require(rates.nonEmpty, "rates must be non-empty")
    val h = bucketHash(key, salt)
    val cond = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => (stratum === s) && (h < lit(hexThreshold(r))) }
      .reduce(_ || _)
    df.filter(cond)
  }

  /** Per-source keep-rates that rebalance a corpus toward target TOKEN
    * shares — the "data mixture" step of a pre-training pipeline
    * (e.g. 30% web, 30% code, 40% books) executed as downsampling
    * only, never upsampling: the scale factor c is chosen so the most
    * over-asked-for source keeps rate 1.0 and every other source is
    * downsampled proportionally (c = min over sources of
    * tokens_s / share_s; rate_s = min(1, c·share_s / tokens_s)).
    *
    * `tokenTotals` is the per-source token-count aggregate — one tiny
    * map-side-combined groupBy, collected to the driver as an
    * O(#sources) rate table (the same scalar-aggregate exception as
    * the corpus-scaled LSH bits). Sources absent from `shares` get no
    * rate and are dropped by [[mixtureSample]]'s stratified predicate.
    * The arithmetic is plain double ops in a fixed order so an oracle
    * can reproduce the rates bit-for-bit from the same counts. */
  def mixtureRates(tokenTotals: Map[String, Long],
                   shares: Map[String, Double]): Map[String, Double] = {
    require(shares.nonEmpty, "shares must be non-empty")
    val both = shares.toSeq.sortBy(_._1).collect {
      case (s, share) if share > 0.0 && tokenTotals.contains(s) =>
        (s, share, tokenTotals(s))
    }
    require(both.nonEmpty, "no shared sources between corpus and shares")
    val c = both.map { case (_, share, toks) => toks.toDouble / share }.min
    both.map { case (s, share, toks) =>
      s -> math.min(1.0, c * share / toks.toDouble)
    }.toMap
  }

  /** Temperature-scaled mixture shares: share_s ∝ tokens_s^alpha —
    * the standard LLM data-mixing move (alpha=1 keeps natural
    * proportions, alpha=0 equalizes sources, alpha∈(0,1) upweights
    * the tail). Returned UNNORMALIZED (t^alpha): [[mixtureRates]]'
    * arithmetic is scale-invariant in the shares (the normalizer
    * cancels inside c·share/toks), and by monotonicity the composed
    * keep-rate has the closed form rate_s = min(1,
    * (t_min/t_s)^(1-alpha)) — so no cross-source double SUM ever
    * enters the chain, which is what keeps it engine-portable.
    * alpha = 0.5 additionally makes it bit-for-bit replayable (sqrt
    * is IEEE-correctly-rounded everywhere; general pow may differ in
    * the last ulp across libms — fine in production, not for a
    * hash-equality oracle). */
  def temperatureShares(tokenTotals: Map[String, Long],
                        alpha: Double): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    tokenTotals.map { case (s, n) =>
      s -> (if (alpha == 0.5) math.sqrt(n.toDouble)
            else math.pow(n.toDouble, alpha))
    }
  }

  /** Deterministic mixture rebalancing: downsample each source at the
    * [[mixtureRates]] rate via the same (salt, key) hash predicate as
    * [[stratifiedSample]] — map-only after the one tiny rate
    * aggregate, retry-stable, engine-portable. */
  def mixtureSample(df: DataFrame, key: Column, source: Column,
                    tokenTotals: Map[String, Long],
                    shares: Map[String, Double], salt: String): DataFrame =
    stratifiedSample(df, key, source, mixtureRates(tokenTotals, shares), salt)

  /** Importance sampling with a PER-ROW keep probability: keep a row
    * iff its (salt, key) hash fraction falls below `weight` (clamped
    * to [0,1]) — the DSIR-style "sample proportionally to a quality /
    * domain-relevance weight" primitive. Deterministic like [[sample]],
    * but the threshold is a row-local expression instead of a literal:
    * the weight is converted to the same 8-hex-digit string space as
    * the bucket hash (floor(w·2^32), zero-padded lowercase hex) and
    * compared lexicographically, so the predicate is still map-only,
    * codegen'd, and portable to any engine with md5 + printf. Rows
    * with null weight are dropped (null threshold ⇒ null predicate). */
  def importanceSample(df: DataFrame, key: Column, weight: Column,
                       salt: String): DataFrame = {
    val w = least(lit(1.0), greatest(lit(0.0), weight))
    val thr = lower(lpad(hex(
      least(floor(w * lit(4294967296.0)).cast("long"), lit(4294967295L))),
      8, "0"))
    df.filter(bucketHash(key, salt) < thr)
  }

  /** Per-stratum cap: keep at most `n` rows per stratum value, lowest
    * `order` first — the per-domain document cap a crawl pipeline
    * applies so no single site dominates the corpus. One window per
    * stratum (rank, not a global sort); a skewed mega-stratum pays its
    * own sort cost and nothing else's. At extreme skew swap in the
    * histogram-threshold trick on the order key ([[graft.ops.TextOps
    * .qualityFilter]]'s mechanism) to avoid ranking the whole
    * stratum. */
  def stratumCap(df: DataFrame, stratum: Column, order: Column, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(order)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n).drop("rn")
  }

  /** Weighted sampling WITHOUT replacement, deterministic — the
    * Efraimidis–Spirakis exponential-key scheme with the RNG replaced
    * by the (salt, key) hash: each row gets the key ln(u)/w where
    * u = (hash32+1)/2^32 ∈ (0,1] and w its weight, and the top-k keys
    * are the sample (equivalent to ranking by u^(1/w): a row with
    * twice the weight is twice as likely to make the cut). One
    * map-only key computation + a distributed top-k (per-partition
    * heaps, k rows to the driver) — no global sort materializes, no
    * sequential reservoir, and a retry can't change the sample. The
    * oracle replays the identical arithmetic; keys of distinct rows
    * are ~1e-16-separated doubles, so cross-engine libm differences
    * cannot flip the selection. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
                     salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967296.0)
    df.withColumn("es_key", log(u) / weight)
      .orderBy(col("es_key").desc, key)
      .limit(k)
      .drop("es_key")
  }

  /** N-gram collision decontamination — the classic "report every eval
    * document sharing any n-gram with the training side" check (the
    * GPT-3-style 13-gram overlap test, here parameterized). Stricter
    * than [[splitContamination]]'s fingerprint key: a single quoted
    * span is enough to flag, no near-dup signature required. Returns
    * (doc_id, n_shared_grams) for contaminated heldout docs —
    * n_shared_grams counts gram OCCURRENCES (a doc repeating a
    * training gram k times reports k).
    *
    * Scale shape: the training side reduces to DISTINCT grams before
    * the join (at 100 TB the gram string becomes its md5 digest — the
    * standard posting swap), the heldout side joins gram-to-gram
    * (digest-width shuffle keys), and the report is one per-doc
    * aggregate. Nothing is pairwise: cost is linear in postings. */
  def ngramContamination(docs: DataFrame, trainFrac: Double, salt: String,
                         n: Int = 5): DataFrame = {
    val tagged = trainEvalSplit(docs.select(col("doc_id")), col("doc_id"), trainFrac, salt)
      .select(col("doc_id"), col("split"))
    val grams = TextOps.shinglePostings(docs, n).join(tagged, Seq("doc_id"))
    val trainGrams = grams.filter(col("split") === "train")
      .select(col("shingle")).distinct()
    grams.filter(col("split") === "heldout")
      .join(trainGrams, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Split-decontamination report: heldout docs whose content key also
    * appears on the train side of the same (salt, doc_id) split — the
    * leak check run before any eval set is trusted. Key-consistent
    * splitting already prevents same-doc leakage; this catches
    * DIFFERENT docs carrying the same content. `keyed` is any
    * (doc_id, contentCol) representation — `md5(text)` for exact
    * leakage, `TextOps.fingerprints` or an LSH signature for near-dup
    * leakage. Scale shape: both sides reduce to digests before the
    * left-semi join, so the shuffle carries 32-byte keys, not
    * documents, and AQE broadcasts the train side when small. Rows
    * with a null content key (docs too short to key) can never match
    * and drop out of the report. */
  def splitContamination(keyed: DataFrame, contentCol: String,
                         trainFrac: Double, salt: String): DataFrame = {
    val tagged = trainEvalSplit(keyed, col("doc_id"), trainFrac, salt)
    val trainKeys = tagged.filter(col("split") === "train")
      .select(col(contentCol)).distinct()
    tagged.filter(col("split") === "heldout")
      .join(trainKeys, Seq(contentCol), "left_semi")
      .select(col("doc_id"), col(contentCol))
  }
}
