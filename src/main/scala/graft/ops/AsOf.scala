package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the most recent
  * right row with `right.time <= left.time` on the same key. The staple
  * of feature lookups ("the user's last purchase before this click"),
  * slowly-changing-dimension reads, and market-data alignment; DuckDB
  * ships it natively (`ASOF JOIN`), Spark does not.
  *
  * Spark-first plan: NOT a join at all. A naive range join
  * (`l.key = r.key AND r.ts <= l.ts` + keep latest) explodes to every
  * (left, earlier-right) pair before pruning — quadratic per key. And a
  * per-left subquery is a driver loop. Instead, tag both sides, union
  * them, and run ONE window pass per key ordered by (time, side):
  * `last(payload, ignoreNulls)` over rows unbounded-preceding..current
  * carries the latest right payload forward into each left row. One
  * shuffle on the key, a sort within partitions, zero row explosion —
  * the classic merge-scan shape, and exactly what a 1000-executor
  * cluster wants: cost is O(|L|+|R|) per key, not O(|L|·|R|).
  *
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
  * giving the inclusive `right.time <= left.time` bound — the same
  * boundary DuckDB's `ON l.ts >= r.ts` uses. Determinism: callers must
  * dedupe the right side to one row per (key, time) (e.g. keep the max
  * id); tied LEFT rows are all emitted and all see the same carried
  * payload, so their relative window order cannot matter.
  *
  * Skew note: a pathologically hot key serializes into one partition's
  * sort — the same bound any per-key ordered scan has; salt by time
  * range upstream if a single key outgrows a partition.
  */
object AsOf {

  /** Backward as-of join. Carries `payloadCols` (and the right
    * timestamp) from the matched right row into every left row, as
    * `<prefix><name>` columns — null where the key has no right row at
    * or before the left time (left-outer semantics). Left columns pass
    * through untouched; `left` must not already contain the prefixed
    * names. */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val carried = (payloadCols :+ time).map(c => s"$prefix$c")
    require(left.columns.toSet.intersect(carried.toSet).isEmpty,
      s"left already defines ${carried.mkString(", ")}")
    val rightTypes: Map[String, org.apache.spark.sql.types.DataType] =
      right.schema.fields.map(f => f.name -> f.dataType).toMap
    // the union schema: left's own columns + prefixed right payload;
    // each side fills the other's slots with typed nulls
    val lTagged = left
      .withColumn("graft_side", lit(1))
      .select(col("*") +: (payloadCols :+ time).map(c =>
        lit(null).cast(rightTypes(c)).as(s"$prefix$c")): _*)
    val rTagged = right
      .select(
        Seq(col(key), col(time), lit(0).as("graft_side")) ++
          left.columns.filterNot(Set(key, time, "graft_side")).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) ++
          (payloadCols :+ time).map(c => col(c).as(s"$prefix$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedCols: Seq[Column] =
      carried.map(c => last(col(c), ignoreNulls = true).over(w).as(c))
    lTagged.unionByName(rTagged)
      .select(left.columns.map(col).toSeq ++ Seq(col("graft_side")) ++ carriedCols: _*)
      .filter(col("graft_side") === 1)
      .drop("graft_side")
  }

  /** NEAREST as-of join — for every left row, the right row minimizing
    * |Δt| on the same key, ties to the EARLIER right row (sensor
    * alignment, closest-quote matching; backward-only is wrong when
    * the nearest reading sits just ahead). Same tagged-union shape,
    * TWO window passes over the one per-key sort order: a backward
    * carry (`last` ignoreNulls, ≤ bound) and a forward carry (`first`
    * ignoreNulls over the following frame, ≥ bound), then a row-local
    * arithmetic choice — still O(|L|+|R|) per key, zero row explosion.
    * `time` must be NUMERIC (pass `unix_micros(ts)`): the choice
    * subtracts it. Right side must be pre-deduped to one row per
    * (key, time), as in [[asofJoinBackward]]. */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payloadCols: Seq[String],
      prefix: String = "near_"): DataFrame = {
    val carried = (payloadCols :+ time).map(c => s"$prefix$c")
    require(left.columns.toSet.intersect(carried.toSet).isEmpty,
      s"left already defines ${carried.mkString(", ")}")
    val rightTypes: Map[String, org.apache.spark.sql.types.DataType] =
      right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lTagged = left
      .withColumn("graft_side", lit(1))
      .select(col("*") +: (payloadCols :+ time).map(c =>
        lit(null).cast(rightTypes(c)).as(s"$prefix$c")): _*)
    val rTagged = right
      .select(
        Seq(col(key), col(time), lit(0).as("graft_side")) ++
          left.columns.filterNot(Set(key, time, "graft_side")).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) ++
          (payloadCols :+ time).map(c => col(c).as(s"$prefix$c")): _*)
    // at equal timestamps: the right row sorts before left in the
    // backward pass (inclusive ≤) and after left in the forward pass
    // (inclusive ≥) — side asc vs desc under one time ordering
    val wB = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("graft_side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = lTagged.unionByName(rTagged)
      .select(
        (left.columns.map(col).toSeq :+ col("graft_side")) ++
          carried.map(c => last(col(c), ignoreNulls = true).over(wB).as(s"b_$c")) ++
          carried.map(c => first(col(c), ignoreNulls = true).over(wF).as(s"f_$c")): _*)
      .filter(col("graft_side") === 1)
    val (bt, ft) = (col(s"b_$prefix$time"), col(s"f_$prefix$time"))
    // backward wins on missing forward OR on distance (ties included:
    // back is the earlier row)
    val useBack = ft.isNull || (bt.isNotNull && (col(time) - bt) <= (ft - col(time)))
    both.select(
      left.columns.map(col).toSeq ++
        carried.map(c => when(useBack, col(s"b_$c")).otherwise(col(s"f_$c")).as(c)): _*)
  }
}
