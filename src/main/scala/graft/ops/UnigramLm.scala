package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (the SentencePiece algorithm, Kudo
  * 2018) in its hard-EM/Viterbi form — the OTHER production tokenizer
  * family next to [[Bpe]]: instead of greedy merges, a piece
  * vocabulary with probabilities, each word segmented by the
  * minimum-cost (max-likelihood) piece path, probabilities re-fit
  * from the chosen paths.
  *
  * Pipeline: corpus → word counts (the ONE corpus-scale aggregate,
  * [[Bpe.vocab]]'s discipline) → seed pieces = all substrings up to
  * `maxPieceLen`, top `topV` by corpus frequency plus every single
  * character (coverage guarantee) → Viterbi DP per word → piece
  * counts on the best paths → re-fit → second Viterbi. Everything
  * after the first aggregate runs at VOCABULARY × word-length scale.
  *
  * The DP is relational: `spans` enumerates every (word, end, piece)
  * occurrence ONCE, pieces attach by a plain EQUI join on the span
  * text, and step j extends the frontier with spans ending at j —
  * `maxWordLen` vocabulary-scale joins per Viterbi, plan depth held
  * O(1) by [[Lineage]] cuts. No theta join anywhere.
  *
  * Determinism across engines (the Lloyd/Pca discipline): piece
  * costs -ln(freq/total) are FLOAT-quantized before any comparison,
  * so libm ulp noise cannot flip an argmin; path costs are exact
  * same-order sums of those quantized terms; ties break by
  * (cost, piece length DESC, piece) at every DP cell. Words longer
  * than `maxWordLen` are excluded by contract (pre-split upstream —
  * the oracle replays a FIXED step count).
  */
object UnigramLm {

  private def q(c: Column): Column = c.cast("float").cast("double")

  /** (word, freq) — corpus reduced to its vocabulary. */
  def wordCounts(docs: DataFrame, maxWordLen: Int): DataFrame =
    TextOps.withTokens(docs)
      .select(explode(col("words")).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Every (word, end_pos, pred_pos, piece-text) occurrence of a
    * substring of length ≤ maxPieceLen — enumerated once, reused by
    * both Viterbi passes. */
  def spans(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"),
        explode(sequence(lit(1), least(lit(maxPieceLen), length(col("word"))))).as("l"))
      .select(col("word"), col("l"),
        explode(sequence(col("l"), length(col("word")))).as("end_pos"))
      .select(col("word"), col("end_pos"), (col("end_pos") - col("l")).as("pred_pos"),
        col("word").substr(col("end_pos") - col("l") + 1, col("l")).as("span"))

  /** Seed vocabulary: top `topV` substrings by corpus-weighted
    * occurrence count, plus all single characters. Returns
    * (piece, pfreq). */
  def seedPieces(words: DataFrame, maxPieceLen: Int, topV: Int): DataFrame = {
    val occ = spans(words, maxPieceLen)
      .join(words, Seq("word"))
      .groupBy(col("span")).agg(sum(col("freq")).as("pfreq"))
    // vocabulary-scale global rank; single partition keyed off a real
    // column (the repo's WindowExec-WARN discipline)
    val w = Window.partitionBy(pmod(hash(col("span")), lit(1)))
      .orderBy(col("pfreq").desc, col("span"))
    occ.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topV || length(col("span")) === 1)
      .select(col("span").as("piece"), col("pfreq"))
  }

  /** Float-quantized piece costs -ln(pfreq / total) over the given
    * piece set; total is the set's own mass (broadcast 1-row). */
  def pieceCosts(pieces: DataFrame): DataFrame =
    pieces
      .crossJoin(broadcast(pieces.agg(sum(col("pfreq")).as("t"))))
      .select(col("piece"),
        q(-log(col("pfreq").cast("double") / col("t"))).as("nlp"))

  /** Minimum-cost segmentation per word: (word, path, cost) with
    * path = pieces joined by '|'. One equi-join per position step;
    * ties break (cost, piece length DESC, piece). */
  def viterbi(
      words: DataFrame, costs: DataFrame,
      maxPieceLen: Int, maxWordLen: Int, reliable: Boolean): DataFrame = {
    val cand = spans(words, maxPieceLen)
      .join(costs, col("span") === col("piece"))
      .select(col("word"), col("end_pos"), col("pred_pos"), col("span"), col("nlp"))
    var dp = words.select(col("word"), lit(0).as("pos"),
      lit(0.0).as("cost"), lit("").as("path"))
    (1 to maxWordLen).foreach { j =>
      // both sides descend from `words`, so qualify the join columns
      // through explicit subquery aliases — positional attribute
      // disambiguation (the `word == word` WARN) is fragile across
      // Catalyst versions
      val step = dp.as("dp")
        .join(cand.filter(col("end_pos") === j).as("cand"), // only spans ending at j
          col("dp.word") === col("cand.word") && col("dp.pos") === col("cand.pred_pos"))
        .select(col("dp.word").as("word"), col("cand.end_pos").as("npos"),
          (col("dp.cost") + col("cand.nlp")).as("ncost"),
          when(col("dp.path") === "", col("cand.span"))
            .otherwise(concat(col("dp.path"), lit("|"), col("cand.span"))).as("npath"),
          length(col("cand.span")).as("plen"), col("cand.span").as("span"))
      val win = Window.partitionBy(col("word"), col("npos"))
        .orderBy(col("ncost"), col("plen").desc, col("span"))
      val best = step.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select(col("word"), col("npos").as("pos"),
          col("ncost").as("cost"), col("npath").as("path"))
      dp = Lineage.cut(dp.unionByName(best), reliable)
    }
    dp.join(words, Seq("word"))
      .filter(col("pos") === length(col("word")))
      .select(col("word"), col("freq"), col("path"), col("cost"))
  }

  /** Piece counts over chosen paths, corpus-weighted — the hard-EM
    * M-step input. */
  def pathCounts(segmented: DataFrame): DataFrame =
    segmented
      .select(col("freq"), explode(split(col("path"), "\\|")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("pfreq"))

  /** Full train: seed → Viterbi → re-fit → Viterbi. Output one row
    * per vocabulary word: (word, freq, path, n_pieces). */
  def train(
      docs: DataFrame, maxPieceLen: Int, topV: Int, maxWordLen: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    Lineage.prepare(docs, checkpointDir)
    val reliable = checkpointDir.isDefined
    val words = Lineage.cut(wordCounts(docs, maxWordLen), reliable)
    val seg1 = viterbi(words,
      pieceCosts(seedPieces(words, maxPieceLen, topV)),
      maxPieceLen, maxWordLen, reliable)
    val seg2 = viterbi(words,
      pieceCosts(Lineage.cut(pathCounts(seg1), reliable)),
      maxPieceLen, maxWordLen, reliable)
    seg2.select(col("word"), col("freq"), col("path"),
      size(split(col("path"), "\\|")).as("n_pieces"))
  }

  /** Serving path: tokenize the corpus with a trained segmentation
    * table — a map-only broadcast lookup per word (the table is
    * vocabulary-sized by construction), aggregated to per-document
    * token-expansion stats. Words absent from the table (longer than
    * the training maxWordLen) are excluded by the same contract that
    * excluded them from training. */
  def encode(docs: DataFrame, segmented: DataFrame): DataFrame =
    TextOps.withTokens(docs)
      .select(col("doc_id"), explode(col("words")).as("word"))
      .join(broadcast(segmented.select(col("word"), col("n_pieces"))), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces_total"))
      .withColumn("pieces_per_word",
        round(col("n_pieces_total").cast("double") / col("n_words"), 4))
}
