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
    * columns differ between `oldDf` and `newDf`. Keys join NULL-SAFELY
    * (`<=>` — still a hash-joinable equi-key), so a row whose key
    * columns contain NULL matches its counterpart instead of being
    * reported as both removed and added; working columns carry a
    * `__graft_` prefix so user columns cannot collide with them. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__graft_old", lit(1))
      .withColumnsRenamed(
        (keys.map(c => c -> s"__graft_ko_$c") ++
          compareCols.map(c => c -> s"__graft_o_$c")).toMap)
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__graft_new", lit(1))
      .withColumnsRenamed(
        (keys.map(c => c -> s"__graft_kn_$c") ++
          compareCols.map(c => c -> s"__graft_n_$c")).toMap)
    val keyCond = keys
      .map(k => col(s"__graft_ko_$k") <=> col(s"__graft_kn_$k"))
      .reduce(_ && _)
    val changed = compareCols
      .map(c => !(col(s"__graft_o_$c") <=> col(s"__graft_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keyCond, "full_outer")
      .withColumn("change_type",
        when(col("__graft_old").isNull, lit("added"))
          .when(col("__graft_new").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(k =>
        coalesce(col(s"__graft_ko_$k"), col(s"__graft_kn_$k")).as(k))
        :+ col("change_type"): _*)
  }
}
