package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-surface certification (SURVEY.md §2.4 note, §7.2-M2):
  * joins (inner/left/semi/anti/broadcast), aggregation (distinct, rollup,
  * cube), window functions (rank/lag/frames), sort/limit/top-k, set
  * operations, scalar string/date/math expressions — each registered in
  * SparkEntry with a DuckDB oracle.
  *
  * Scale notes (100 TB):
  *  - Dimensions (region/nation, and customer where it qualifies) are
  *    broadcast; the fact tables (lineitem/orders) shuffle at most once
  *    per aggregation key.
  *  - Aggregates are declarative `groupBy().agg()` ⇒ map-side partial
  *    aggregation + AQE partition coalescing for free.
  *  - Filters appear before joins so Catalyst pushes them into the
  *    parquet scans (PushedFilters), and projections are minimal so
  *    ReadSchema stays narrow.
  *  - Floating-point aggregates are rounded at the output edge only
  *    (display contract), never mid-plan.
  */
object StarQueries {

  /** TPC-H Q1-shaped pricing summary: wide aggregate over the biggest
    * fact table; one shuffle on a 6-value grouping key. */
  def q1PricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped: selective dimension filter → join → top-k revenue.
    * customer(BUILDING) is small after the filter ⇒ broadcast to the
    * orders⋈lineitem side; top-k is a single global sort-limit. */
  def q3TopRevenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: Int): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)

  /** TPC-H Q5-shaped: five-way join, revenue per nation within a region.
    * region/nation/supplier broadcast; lineitem shuffles once on the
    * grouping key. */
  def q5RegionRevenue(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  /** Full TPC-H Q5 shape including the local-supplier condition: lineitem
    * joins supplier on BOTH l_suppkey and the customer's nation — the
    * classic multi-equi-join the optimizer must order well. supplier/
    * nation/region broadcast; lineitem shuffles once for the aggregate. */
  def q5LocalSupplier(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  /** TPC-H Q4-shaped EXISTS through the SQL TEXT surface: the point is
    * not the semi-join (rel_join_semi certifies that) but Catalyst's
    * RewritePredicateSubquery — a correlated EXISTS written as SQL must
    * decorrelate into the same left-semi plan a DataFrame author would
    * hand-build. lineitem's correlated scan keeps its returnflag filter
    * pushed below the semi-join. */
  def q4PriorityExists(spark: SparkSession, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("q4_orders")
    lineitem.createOrReplaceTempView("q4_lineitem")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM q4_orders
        |WHERE EXISTS (SELECT 1 FROM q4_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** TPC-H Q17-shaped correlated SCALAR subquery: per-part average
    * quantity threshold — Catalyst decorrelates the aggregate subquery
    * into a per-key aggregate joined back (one extra shuffle on
    * l_partkey, not one subquery execution per outer row, which at
    * 100 TB is the difference between a plan and a timeout).
    * l_quantity is integer-valued, so sum/avg are IEEE-exact and the
    * threshold comparison is engine-stable with no quantization. */
  def q17SmallQuantity(spark: SparkSession, part: DataFrame, lineitem: DataFrame): DataFrame = {
    part.createOrReplaceTempView("q17_part")
    lineitem.createOrReplaceTempView("q17_lineitem")
    spark.sql(
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM q17_lineitem JOIN q17_part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM q17_lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  /** TPC-H Q22-shaped: uncorrelated scalar subquery (global average
    * balance threshold) + correlated NOT EXISTS (never placed a large
    * order — every customer has SOME order in this data, so the plain
    * no-orders predicate would certify an empty result), both in one
    * SQL text. The scalar average is float-quantized in BOTH engines'
    * texts — a row-order-dependent double sum used as a comparison
    * threshold is the one place aggregate noise could flip a row
    * across engines. */
  def q22IdleCustomers(spark: SparkSession, customer: DataFrame, orders: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("q22_customer")
    orders.createOrReplaceTempView("q22_orders")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
        |FROM q22_customer
        |WHERE c_acctbal > (SELECT CAST(CAST(avg(c_acctbal) AS FLOAT) AS DOUBLE)
        |                   FROM q22_customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM q22_orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment""".stripMargin)
  }

  /** TPC-H Q7-shaped: bidirectional nation-pair volume by ship year —
    * a five-way star join whose nation filter broadcasts through BOTH
    * dimension arms before the fact joins, with the symmetric pair
    * predicate as a residual OR. Revenue terms are 4-decimal exact in
    * double (2-dec price x 2-dec discount), so the per-(pair, year)
    * sums are order-independent and the output rounding is cosmetic. */
  def q7NationVolume(
      spark: SparkSession, supplier: DataFrame, lineitem: DataFrame,
      orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    supplier.createOrReplaceTempView("q7_supplier")
    lineitem.createOrReplaceTempView("q7_lineitem")
    orders.createOrReplaceTempView("q7_orders")
    customer.createOrReplaceTempView("q7_customer")
    nation.createOrReplaceTempView("q7_nation")
    spark.sql(
      """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(year(l_shipdate) AS INT) AS l_year,
        |             l_extendedprice * (1 - l_discount) AS volume
        |      FROM q7_supplier, q7_lineitem, q7_orders, q7_customer,
        |           q7_nation n1, q7_nation n2
        |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey
        |        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  /** TPC-H Q10-shaped: top returned-revenue customers in a year — the
    * classic fact-filtered star with a total-ordered top-k (rounded
    * exact revenue desc, custkey tiebreak). */
  def q10ReturnedRevenue(
      spark: SparkSession, customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("q10_customer")
    orders.createOrReplaceTempView("q10_orders")
    lineitem.createOrReplaceTempView("q10_lineitem")
    nation.createOrReplaceTempView("q10_nation")
    spark.sql(
      """SELECT c_custkey, c_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM q10_customer, q10_orders, q10_lineitem, q10_nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
  }

  /** TPC-H Q13-shaped: customer order-count distribution — LEFT join
    * with an extra ON-clause predicate (zero-order customers must
    * survive into the c_count = 0 bucket), then a histogram over the
    * per-customer counts. */
  def q13OrderHistogram(
      spark: SparkSession, customer: DataFrame, orders: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("q13_customer")
    orders.createOrReplaceTempView("q13_orders")
    spark.sql(
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM q13_customer LEFT JOIN q13_orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** TPC-H Q14-shaped: promo revenue share in one ship month — the
    * conditional-aggregate ratio; both sums are exact in double so
    * the division is engine-identical before the output rounding. */
  def q14PromoShare(
      spark: SparkSession, lineitem: DataFrame, part: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("q14_lineitem")
    part.createOrReplaceTempView("q14_part")
    spark.sql(
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        |             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
        |FROM q14_lineitem JOIN q14_part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin)
  }

  /** Recursive CTE (Spark 4.x `WITH RECURSIVE`): walk the synthetic
    * management tree parent(k) = k div 10 rooted at custkeys < 10,
    * accumulating the root-to-node balance along each path. The
    * recursion is the one relational shape the engine's fixed
    * DataFrame pipelines cannot express statically (depth is data-
    * dependent); Catalyst plans it as an iterative union loop — each
    * iteration is ONE equi-join of the frontier against the (small,
    * broadcastable) customer dimension, so a D-level hierarchy costs
    * D joins, not D scans of the fact side. Path sums accumulate in
    * exact integer cents along the UNIQUE root path (one parent per
    * node), so the per-depth totals are order-free and engine-
    * portable. The `c_custkey >= 10` guard excludes key 0, whose
    * div-10 parent is itself — without it the loop never converges
    * (the recursive-CTE analog of the fuzzyPred re-fire hazard in
    * plans/JoinRewriteGuard). */
  def recursivePathSum(spark: SparkSession, customer: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("rec_customer")
    spark.sql(
      """WITH RECURSIVE tree AS (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS path_cents,
        |         0 AS depth
        |  FROM rec_customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey,
        |         t.path_cents + CAST(round(c.c_acctbal * 100, 0) AS BIGINT),
        |         t.depth + 1
        |  FROM rec_customer c JOIN tree t
        |    ON c.c_custkey div 10 = t.c_custkey AND c.c_custkey >= 10
        |)
        |SELECT depth, count(*) AS n_nodes, sum(path_cents) AS total_path_cents
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  /** TPC-H Q21-shaped: correlated EXISTS and NOT EXISTS against the
    * SAME fact table at once — suppliers in two nations who were the
    * SOLE at-fault supplier (l_returnflag = 'R', standing in for
    * Q21's receipt-after-commit predicate, absent from this trimmed
    * lineitem schema) on finalized multi-supplier orders. Catalyst
    * decorrelates both subqueries into one left-semi and one
    * left-anti join on l_orderkey, each with the `l_suppkey <>`
    * disequality as residual join condition — three shuffles of the
    * fact table keyed on the SAME column, which AQE coalesces and a
    * l_orderkey-bucketed layout (sources.Bucketing) plans entirely
    * exchange-free. The nation filter broadcasts through the
    * supplier dimension before the fact join, so only matching
    * suppliers' lineitems survive into the heavy subquery joins.
    * Top-10 by (numwait desc, s_name) is total-ordered. */
  def q21LoneFaultSupplier(
      spark: SparkSession, supplier: DataFrame, lineitem: DataFrame,
      orders: DataFrame, nation: DataFrame): DataFrame = {
    supplier.createOrReplaceTempView("q21_supplier")
    lineitem.createOrReplaceTempView("q21_lineitem")
    orders.createOrReplaceTempView("q21_orders")
    nation.createOrReplaceTempView("q21_nation")
    spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM q21_supplier, q21_lineitem l1, q21_orders, q21_nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM q21_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey AND n_name IN ('NATION_3', 'NATION_7')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin)
  }

  /** Extended window-function surface: ntile quartiles, percent_rank,
    * first_value over the default frame. */
  def windowExtras(customer: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer.select(
      col("c_mktsegment"), col("c_custkey"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 4).as("pct_rank"),
      first(col("c_custkey")).over(w).as("segment_top"))
  }

  /** left_semi — customers that have at least one order (EXISTS). */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** left_anti — customers with no orders (NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))

  /** full_outer — per-nation rich-customer vs cheap-supplier counts.
    * The two filtered aggregates leave each side missing some nations,
    * so both null-extension directions are genuinely exercised; the
    * join key count is tiny (≤ nations) and AQE plans it local. */
  def nationActivityFullOuter(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val c = customer.filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_rich_customers"))
    val s = supplier.filter(col("s_acctbal") < 0)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_poor_suppliers"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_rich_customers"), lit(0L)).as("n_rich_customers"),
        coalesce(col("n_poor_suppliers"), lit(0L)).as("n_poor_suppliers"))
  }

  /** Broadcast dimension enrichment: customer ⋈ nation ⋈ region with both
    * dims broadcast — zero shuffle before the aggregate. */
  def customersPerRegion(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))

  /** Exact distinct aggregation (count + countDistinct in one pass). */
  def segmentStats(customer: DataFrame): DataFrame =
    customer
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        round(avg(col("c_acctbal")), 2).as("avg_acctbal"))

  /** ROLLUP over (region, nation); rolled-up groups surfaced as 'ALL'
    * (sentinel instead of NULL so ordering semantics are engine-neutral). */
  def acctbalRollup(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("total_acctbal"))

  /** CUBE over (mktsegment, orderpriority). */
  def orderCube(customer: DataFrame, orders: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"))

  /** Window functions: row_number / rank / dense_rank / lag over a
    * deterministic per-segment ordering; top-3 per segment. */
  def topCustomersPerSegment(customer: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        lag(col("c_acctbal"), 1).over(w).as("prev_acctbal"))
      .filter(col("rn") <= k)
  }

  /** Running total (ROWS UNBOUNDED PRECEDING frame) of order value per
    * customer in date order. */
  def runningOrderTotal(orders: DataFrame, maxCustkey: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .filter(col("o_custkey") <= maxCustkey)
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("orderdate"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
  }

  /** Global sort + limit top-k. */
  def topOrders(orders: DataFrame, k: Int): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** Set operations: buyers (distinct o_custkey) vs positive-balance
    * customers — union / intersect / except cardinalities. */
  def setOps(customer: DataFrame, orders: DataFrame): DataFrame = {
    val buyers = orders.select(col("o_custkey").as("custkey")).distinct()
    val positive = customer.filter(col("c_acctbal") > 0).select(col("c_custkey").as("custkey"))
    val u = buyers.union(positive).distinct().agg(count(lit(1)).as("n")).select(lit("union").as("op"), col("n"))
    val i = buyers.intersect(positive).agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
    val e = buyers.except(positive).agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
    u.unionAll(i).unionAll(e)
  }

  /** Scalar string/math expression surface over `part`. */
  def scalarStringMath(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
      length(col("p_name")).as("name_len"),
      replace(col("p_type"), lit(" "), lit("_")).as("type_slug"),
      (col("p_size") % 5).as("size_mod"),
      round(col("p_retailprice") * 1.1, 2).as("uplifted"),
      concat_ws(":", col("p_brand"), col("p_size")).as("brand_size"))

  /** Scalar date expression surface over `orders`. */
  def scalarDates(orders: DataFrame): DataFrame = {
    val d = col("o_orderdate").cast("date")
    orders.select(
      col("o_orderkey"),
      d.as("orderdate"),
      year(d).as("y"),
      month(d).as("m"),
      dayofmonth(d).as("d"),
      quarter(d).as("q"),
      date_add(d, 30).as("due_date"),
      last_day(d).as("month_end"),
      datediff(lit(java.sql.Date.valueOf("2026-01-01")), d).as("age_days"))
  }
}
