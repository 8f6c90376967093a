package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string join: edit-distance matching without the n²
  * cross join, via the symmetric-delete (SymSpell) neighborhood.
  *
  * A naive similarity join compares every left string to every right
  * string — a BroadcastNestedLoopJoin that dies at scale. The deletion
  * neighborhood turns it into an EQUI-join: each string generates
  * itself plus every string reachable by ≤ k character deletions, and
  * candidates are pairs sharing any variant. Recall is COMPLETE for
  * edit distance ≤ k (pigeonhole over the alignment, same proof shape
  * as Simhash's banded Hamming): an optimal alignment has ≤ k non-copy
  * ops; deleting from each side the characters those ops touch leaves
  * the common subsequence, reached with ≤ k deletions on either side —
  * so a qualifying pair ALWAYS shares a variant, and the final
  * `levenshtein ≤ k` filter restores precision. Candidates that merely
  * collide are discarded; true pairs cannot be missed (pinned in
  * OpsSpec against the quadratic join, and certified end-to-end by
  * rel_fuzzy_join against DuckDB's quadratic levenshtein join).
  *
  * Cost: k=1 explodes n+1 variants per string (n = length), k=2
  * O(n²/2) — the classic SymSpell space/time trade. The variant join
  * is a plain shuffle equi-join; very common variants (short strings'
  * stubs) skew like any hot key and take the usual salting treatment
  * ([[Skew]]) if a corpus needs it.
  *
  * Reference analog: none (the reference equi-joins exact keys only);
  * this is the record-linkage/entity-resolution operator a cleaning
  * pipeline needs at 100 TB.
  */
object Fuzzy {

  /** `s` with the character at 1-based position `i` removed. */
  private def deleteAt(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))

  /** The ≤1-deletion neighborhood: s plus every single-char deletion.
    * Guarded for the empty string — sequence(1, 0) would count DOWN. */
  def deletionVariants(s: Column): Column =
    when(length(s) === 0, array(s))
      .otherwise(array_distinct(concat(
        array(s),
        transform(sequence(lit(1), length(s)), i => deleteAt(s, i)))))

  /** The ≤k-deletion neighborhood (k ∈ {1, 2}). */
  def variants(s: Column, k: Int): Column = k match {
    case 1 => deletionVariants(s)
    case 2 => array_distinct(flatten(transform(deletionVariants(s), v => deletionVariants(v))))
    case _ => throw new IllegalArgumentException(s"maxDist $k unsupported (1 or 2)")
  }

  /** Join rows of `left` and `right` whose `leftName`/`rightName`
    * strings are within edit distance `maxDist`, carrying all other
    * columns plus `dist`. Column names must not collide across sides.
    * Candidate generation is the variant equi-join above; verification
    * is one codegen'd `levenshtein` per DISTINCT candidate pair.
    * SET semantics: duplicate input rows collapse (the distinct that
    * dedups multi-variant candidate hits cannot tell them apart). For
    * exact multiplicity preservation use the optimizer-rule path
    * ([[graft.plans.FuzzyJoinRule]]), whose min-shared-variant filter
    * keeps one row per qualifying input pair without a distinct. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftName: String, rightName: String, maxDist: Int = 1): DataFrame = {
    val lv = left.withColumn("__variant", explode(variants(col(leftName), maxDist)))
    val rv = right.withColumn("__variant", explode(variants(col(rightName), maxDist)))
    lv.join(rv, "__variant")
      .drop("__variant")
      .distinct()
      .withColumn("dist", levenshtein(col(leftName), col(rightName)))
      .filter(col("dist") <= maxDist)
  }
}
