package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every key across two table versions as
  * added / removed / changed — the reconciliation primitive behind
  * data-migration validation, replication drift checks, and CDC
  * backfill audits (the inverse direction of [[Cdc]]: Cdc applies a
  * known change log; diff RECOVERS the change set from two states).
  *
  * One full-outer equi-join on the key; change detection is
  * null-safe (`IS DISTINCT FROM` semantics per compared column), so
  * NULL→value and value→NULL both count as changes while NULL→NULL
  * does not. Unchanged keys are dropped — the result is
  * change-proportional, which is what makes the op usable at 100 TB:
  * stored bucketed on the key (sources.Bucketing), the join plans
  * exchange-free and the output is only the drift.
  */
object Diff {

  /** (keys..., change_type) for every key whose presence or compared
    * columns differ between `oldDf` and `newDf`. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__old", lit(1))
      .withColumnsRenamed(compareCols.map(c => c -> s"__o_$c").toMap)
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__new", lit(1))
      .withColumnsRenamed(compareCols.map(c => c -> s"__n_$c").toMap)
    val changed = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}
