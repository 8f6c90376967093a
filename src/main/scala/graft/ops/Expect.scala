package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data expectations — the constraint layer a pipeline
  * runs before publishing a table: each check reduces to a violation
  * FRAME (inspectable, joinable back to the data), and [[report]]
  * folds any set of named checks into one (check_name, n_violations)
  * summary. A constraint that holds reports 0 — the report certifies
  * presence of validation, not just presence of violations.
  *
  * Every check is a plain relational shape with the scale behavior
  * already established elsewhere in the engine: row predicates are
  * map-only filters; uniqueness is one keyed count (the exact-dedup
  * aggregate); referential integrity is a left-anti join against the
  * (broadcastable) parent key set. Nothing collects; the summary is a
  * union of O(1)-row aggregates.
  */
object Expect {

  /** Rows where `c` is null. */
  def notNullViolations(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** Rows where the row-level predicate `pred` does NOT hold (null
    * predicate counts as a violation — unknown is not a pass). */
  def predicateViolations(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))

  /** One row per key appearing more than once: (keys..., n_rows). */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Child rows whose `childKey` has no match in `parent.parentKey`
    * (null child keys are not orphans — pair with notNull if
    * required). */
  def fkViolations(child: DataFrame, parent: DataFrame,
                   childKey: String, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")

  /** Fold named violation frames into (check_name, n_violations). */
  def report(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, frame) =>
      frame.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_ unionByName _)
}
