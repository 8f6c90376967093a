package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a pipeline computes
  * before trusting a new table: per column, null count, distinct
  * count, and min/max, in ONE aggregation pass over the table (every
  * per-column statistic is an aggregate expression in the same global
  * agg; the result row pivots into per-column rows with a map-only
  * explode — the table is scanned once, never per column).
  *
  * Distinct counts here are EXACT, and exactness has a named cost:
  * Spark plans the multi-distinct agg with one Expand that multiplies
  * scanned rows by (distinct columns + 1) before the shuffle. At
  * 100 TB swap the per-column exact distinct for the [[Hll]] register
  * frame — same output shape, 2^p bounded state per column, no
  * Expand, and the estimate itself is certified by text_hll_vocab. Min/max surface as strings (a display contract like
  * EventWindows' window starts); profile numeric-or-string columns —
  * float columns would couple the contract to engine float-formatting.
  */
object Profile {

  /** One row per profiled column: (col_name, n_rows, n_nulls,
    * n_distinct, min_value, max_value). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__c_$c"),
      countDistinct(col(c)).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("n_rows"), explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__c_$c").as("n_non_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))): _*)).as("p"))
      .select(
        col("p.col_name").as("col_name"),
        col("n_rows"),
        (col("n_rows") - col("p.n_non_null")).as("n_nulls"),
        col("p.n_distinct").as("n_distinct"),
        col("p.min_value").as("min_value"),
        col("p.max_value").as("max_value"))
  }
}
