package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core (SURVEY.md §2b "rebuild adds"): joins, aggregations,
  * analytic windows, set ops, scalar functions over the TPC-H-ish star
  * schema.
  *
  * Determinism rules for the DuckDB oracle (SURVEY.md §7):
  *  - every query ends with a total-order `orderBy` (explicit tiebreaks);
  *  - money doubles are exact at 2 decimals (FIXTURES.md), so sums go
  *    through DECIMAL(18,2) (lossless) and cast back to double — identical
  *    bits regardless of accumulation order on either engine;
  *  - averages are computed as exact-decimal-sum / count, in doubles.
  *
  * Scale notes are per-query below; the shared principles: dimension joins
  * (region/nation/supplier/part at fixed or sub-linear cardinality) are
  * broadcast; fact-fact joins (lineitem ⋈ orders) shuffle on the join key
  * and benefit from AQE; aggregations rely on Catalyst's partial+final
  * HashAggregate so the shuffle carries combined partials, not raw rows.
  */
object Relational {

  /** Exact 2-decimal sum of a money double, returned as double. */
  private def msum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  /** Exact sum of a product of two money doubles (scale 4 intermediate). */
  private def msum4(c: Column): Column = sum(c.cast("decimal(24,4)")).cast("double")
  private def msum6(c: Column): Column = sum(c.cast("decimal(30,6)")).cast("double")

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-style pricing summary: the canonical multi-aggregate groupBy.
    * One shuffle; partial aggregation reduces 600 k rows to 8 groups before
    * the exchange. At 100 TB this stays a single map-side-combined pass. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val disc = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
    val charge = disc * (lit(1).cast("decimal(18,2)") + col("l_tax").cast("decimal(18,2)"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_qty"),
        (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q3
  /** TPC-H Q3-style: 3-way join (customer ⋈ orders ⋈ lineitem) + agg + top-k.
    * customer is the small side → broadcast; orders ⋈ lineitem shuffles on
    * orderkey. Top-10 via TakeOrderedAndProject (sort+limit fused). */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1995-03-15"))
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val li   = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(msum4(col("l_extendedprice").cast("decimal(18,2)") *
                 (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
             .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
              unix_timestamp(col("o_orderdate")).as("o_date"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_date, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate  > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q5
  /** TPC-H Q5-style: 5-way star join through region/nation (broadcast dims)
    * + lineitem ⋈ orders (shuffle) + supplier-nation co-membership filter. */
  def regionalRevenue(s: SparkSession, dir: String): DataFrame = {
    val li   = Tables.lineitem(s, dir)
    val ord  = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val supp = Tables.supplier(s, dir)
    val nat  = Tables.nation(s, dir)
    val reg  = Tables.region(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(msum4(col("l_extendedprice").cast("decimal(18,2)") *
                 (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val regionalRevenueSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey  = c_custkey
      |JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ------------------------------------------------------- semi/anti/outer
  /** Left-semi join: customers having at least one 'F' order (EXISTS).
    * Semi joins ship only the key column and short-circuit on first match. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    Tables.customer(s, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val semiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join: customers with no 'F'-status orders (NOT EXISTS).
    * (Every customer has *some* order in the driver data, so the filter
    * keeps the result non-trivial at every SF.) */
  def antiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  val antiJoinSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Left-outer join + null-aware agg: per-customer order stats including
    * order-less customers (count(order-col) skips nulls on both engines). */
  def outerJoinStats(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
           msum(col("o_totalprice")).as("total_spent"))
      .select(col("c_custkey"), col("n_orders"),
              coalesce(col("total_spent"), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")

  val outerJoinStatsSql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |       coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------ rollup/cube
  /** ROLLUP over (returnflag, linestatus): hierarchical subtotals.
    * Catalyst expands to a single Expand + HashAggregate — one shuffle. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), msum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
              coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
              col("cnt"), col("sum_qty"))
      .orderBy("rf", "ls")

  val rollupAggSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** CUBE over (orderstatus, orderpriority): all grouping combinations. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"), msum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("cnt"), col("sum_price"))
      .orderBy("status", "priority")

  val cubeAggSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** GROUPING SETS via SQL (exercises the SQL entry path + temp views). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       count(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  // ---------------------------------------------------------------- q6
  /** TPC-H Q6-style forecast revenue: tight filter + single global sum.
    * The whole query is scan-side — all three predicates push into the
    * parquet reader (PlanSpec-style `PushedFilters`), the aggregate is one
    * partial+final pass over survivors, and nothing shuffles but 1-row
    * partials. The canonical "is pushdown actually working" probe. */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
                col("l_discount").cast("decimal(18,2)")).cast("decimal(24,4)"))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))

  val forecastRevenueSql: String =
    """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                    CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(24,4))) AS DOUBLE)
      |         AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q4
  /** TPC-H Q4-style order-priority check: EXISTS-correlated semi join from
    * orders into lineitem (receipt-late items modeled as shipdate inside
    * the quarter), then a tiny priority rollup. The semi join never
    * materializes matches — one row per qualifying order regardless of
    * lineitem fan-out. */
  def orderPriorityCheck(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-07-01") && col("o_orderdate") < lit("1995-10-01"))
    val li = Tables.lineitem(s, dir).select("l_orderkey")
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val orderPriorityCheckSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= DATE '1995-07-01' AND o_orderdate < DATE '1995-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q14
  /** TPC-H Q14-style promo-revenue ratio: conditional aggregation over a
    * fact⋈dim join — the promo share of one month's revenue. Both the
    * conditional and total sums ride the same partial-aggregated pass;
    * decimal arithmetic keeps the ratio engine-exact at 6 dp. */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-09-01") && col("l_shipdate") < lit("1995-10-01"))
    val p = Tables.part(s, dir).select("p_partkey", "p_type")
    val rev = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("decimal(24,4)")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) * sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0).cast("decimal(24,4)")))
          .cast("double") / sum(rev).cast("double"), 6).as("promo_pct"),
        count(lit(1)).as("n_items"))
  }

  val promoRevenueSql: String =
    """SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))
      |    ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE) /
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))) AS DOUBLE), 6) AS promo_pct,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'""".stripMargin

  // ---------------------------------------------------------------- q10
  /** TPC-H Q10-style returned-item losses: customers ranked by revenue on
    * returned lineitems for one quarter. Fact⋈fact shuffle join
    * (orders⋈lineitem) with the dimension (customer) broadcast onto the
    * aggregated — already tiny — result, then a fused top-20. */
  def returnedItemLosses(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-10-01") && col("o_orderdate") < lit("1996-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val rev = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("decimal(24,4)")
    val c = Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
              col("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedItemLossesSql: String =
    """SELECT c_custkey, c_name, c_mktsegment,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= DATE '1995-10-01' AND o_orderdate < DATE '1996-01-01'
      |GROUP BY c_custkey, c_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q18
  /** TPC-H Q18-style large-volume orders: orders whose total quantity
    * clears a threshold, found with a pre-aggregated semi join (aggregate
    * once, join keys only) — the shape that avoids re-aggregating inside a
    * correlated subquery per probe. */
  def largeVolumeOrders(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val big = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .filter(col("total_qty") > 150)
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
              unix_timestamp(col("o_orderdate").cast("timestamp")).as("order_sec"),
              col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  val largeVolumeOrdersSql: String =
    """SELECT o_orderkey, o_custkey,
      |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_sec, total_qty
      |FROM (
      |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
      |) JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q13
  /** TPC-H Q13-style customer order-count distribution: LEFT OUTER join so
    * zero-order customers stay in the histogram (the classic
    * count-of-counts double aggregation). Two shuffles: per-customer
    * count, then per-count count. */
  def custOrderHistogram(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_custkey")
    val o = Tables.orders(s, dir).select("o_custkey", "o_orderkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
      .groupBy("c_count")
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("n_custs").desc, col("c_count").desc)
  }

  val custOrderHistogramSql: String =
    """SELECT c_count, count(*) AS n_custs FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |) GROUP BY c_count ORDER BY n_custs DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q19
  /** TPC-H Q19-style disjunctive predicate revenue: OR-of-ANDs across the
    * join — the shape that stresses predicate pushdown and join-condition
    * placement (common conjuncts push to the scan; the disjunction
    * evaluates post-join). */
  def disjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val rev = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("decimal(24,4)")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 15) && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 25) && col("p_size").between(1, 20)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 35) && col("p_size").between(1, 30)))
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
  }

  val disjunctiveRevenueSql: String =
    """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 10)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 1 AND 30)""".stripMargin

  // ---------------------------------------------------------------- q22
  /** TPC-H Q22-style dormant-customer analysis: above-average-balance
    * customers (uncorrelated scalar subquery) with no RECENT orders (anti
    * join against orders since 2000-01-01 — the harness generator gives
    * every customer at least one lifetime order, so Q22's literal
    * "no orders ever" predicate is vacuously empty; dormancy-by-recency is
    * the same anti-join shape over the distribution the data actually
    * has), rolled up by market segment. The average is decimal-exact so
    * the threshold predicate is engine-identical. */
  def dormantCustomers(s: SparkSession, dir: String): DataFrame =
    dormantCustomersOf(Tables.customer(s, dir), Tables.orders(s, dir),
      since = Some("2000-01-01"))

  /** The Q22 anti-join shape, parameterized by the dormancy predicate:
    * `since = None` is TPC-H Q22's LITERAL "no orders ever" (the build
    * side can be genuinely empty-per-customer — covered by spec on a
    * synthetic corpus with order-less customers, since the harness
    * generator gives everyone a lifetime order); `since = Some(date)` is
    * the recency variant the driver gate runs. Same plan either way. */
  private[graft] def dormantCustomersOf(c: DataFrame, orders: DataFrame,
                                        since: Option[String]): DataFrame = {
    // 1-row aggregate broadcast-crossed onto the probe side — the scalar
    // subquery stays in the plan (no driver-side collect feeding a filter)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")) / count(lit(1)))
        .cast("double").as("a"))
    // the recency filter (when present) rides the anti-join's build side:
    // pushed to the orders scan, it shrinks the side that gets hashed
    val o = since.fold(orders)(d =>
        orders.filter(col("o_orderdate") >= lit(d).cast("timestamp")))
      .select("o_custkey")
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
           sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val dormantCustomersSql: String =
    """SELECT c_mktsegment, count(*) AS n_custs,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q17
  /** TPC-H Q17-style small-quantity revenue: lineitems below 20% of their
    * part's average quantity. The correlated `avg` decorrelates into one
    * per-part aggregate joined back to the fact — aggregate once, probe
    * many, never re-average per row. Threshold arithmetic is decimal so
    * the comparison is engine-identical. */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // threshold = 0.2 * avg: cast the exact decimal sum to double BEFORE
    // dividing — decimal division result-scale rules differ between engines
    // (Spark scale 6 vs DuckDB scale 8), so a decimal ratio could flip a
    // borderline l_quantity comparison; the double ratio is the same
    // computation on both sides
    val avgQty = li.groupBy(col("l_partkey").as("ap_key"))
      .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") * lit(2) /
             (count(lit(1)) * lit(10))).as("qty_threshold"))
    li.join(avgQty, col("l_partkey") === col("ap_key"))
      .filter(col("l_quantity") < col("qty_threshold"))
      // divide in DOUBLE after the exact decimal sum: decimal division
      // result-scale rules differ between engines (Spark rounded at scale
      // 6, DuckDB at 8 — hash mismatch); the double op is identical
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / lit(7.0))
             .as("avg_yearly"),
           count(lit(1)).as("n_items"))
  }

  val smallQtyRevenueSql: String =
    """WITH a AS (
      |  SELECT l_partkey AS ap_key,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 2 / (count(*) * 10)
      |           AS qty_threshold
      |  FROM lineitem GROUP BY l_partkey
      |)
      |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7 AS avg_yearly,
      |       count(*) AS n_items
      |FROM lineitem JOIN a ON l_partkey = ap_key
      |WHERE l_quantity < qty_threshold""".stripMargin

  // ---------------------------------------------------------------- q15
  /** TPC-H Q15-style top supplier: a revenue view reused twice — once
    * aggregated to its max (1-row broadcast), once probed for the
    * suppliers achieving it. Revenue sums are decimal-exact, so the
    * equality join on the max is safe across engines. */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
    val rev = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("decimal(24,4)")
    val revenue = li.groupBy(col("l_suppkey"))
      .agg(sum(rev).cast("double").as("total_rev"))
    val maxRev = revenue.agg(max(col("total_rev")).as("m"))
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
    revenue.crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("m"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  val topSupplierSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))) AS DOUBLE) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_rev
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** TPC-H Q11-style important stock: per-supplier lineitem value kept
    * only where it exceeds a fraction of the GLOBAL total — group rollup
    * judged against a corpus-wide scalar, both decimal-exact and both
    * computed from the same single-pass aggregate (the global is a 1-row
    * re-aggregation of the per-group result, not a second scan). */
  def importantStock(s: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("value_d"))
    val total = perSupp.agg(sum(col("value_d")).as("t"))
    perSupp.crossJoin(broadcast(total))
      // both sides explicitly double: decimal×double promotion rules differ
      // between engines, and the boundary compare must be the same compute
      .filter(col("value_d").cast("double") > col("t").cast("double") * lit(0.011))
      .select(col("l_suppkey"), col("value_d").cast("double").as("stock_value"))
      .orderBy(col("stock_value").desc, col("l_suppkey"))
  }

  val importantStockSql: String =
    """WITH per_supp AS (
      |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_d
      |  FROM lineitem GROUP BY l_suppkey
      |)
      |SELECT l_suppkey, CAST(value_d AS DOUBLE) AS stock_value
      |FROM per_supp
      |WHERE CAST(value_d AS DOUBLE) >
      |      (SELECT CAST(sum(value_d) AS DOUBLE) FROM per_supp) * 0.011
      |ORDER BY stock_value DESC, l_suppkey""".stripMargin

  // -------------------------------------------------------- distinct aggs
  /** Multiple distinct aggregates in one pass (Catalyst expands to
    * Expand + two-phase agg; stays a single logical query). */
  def distinctAggs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val distinctAggsSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** approx_count_distinct (HLL++). Sketch internals differ from DuckDB's,
    * so there is no SQL oracle (rows-only gate); the unit test bounds the
    * relative error vs the exact count. At 100 TB this is the only sane
    * distinct-count: fixed-size sketch, map-side mergeable, no expand. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy("l_returnflag")

  /** HyperLogLog parameters for the cross-engine twin: 2^12 registers. */
  private val HllP = 12
  private val HllM = 1 << HllP

  /** The md5-twin of [[approxDistinct]] — the sketch-family extension of
    * the program that gated MinHash/winnowing/SimHash/SRP: the ENTIRE
    * HyperLogLog pipeline (Flajolet et al. 2007) built from md5-derived
    * 60-bit hashes so BOTH engines compute identical registers — bucket =
    * low [[HllP]] bits, rank = leading-zero count of the remaining 48-bit
    * word + 1 (taken EXACTLY via the binary-string length, never
    * floor(log2) — a float log at a power-of-two boundary is an
    * off-by-one on one engine), per-bucket max, then the harmonic-mean
    * estimate with the small-range linear-counting correction. The
    * indicator sum Σ2^−M is scaled by 2^49 into an exact INTEGER sum
    * (order-insensitive — a double Σ would depend on shuffle order);
    * alpha·m²·2^49/S and m·ln(m/V) are then single float expressions both
    * engines evaluate identically, rounded at 6. The two gate scales
    * exercise BOTH branches: sf0.01 (2 k distinct ≪ 2.5 m) takes linear
    * counting, sf0.1 (20 k distinct) the harmonic path. Scale shape:
    * per-value hashing is map-side; the register table is m rows — the
    * same fixed-size-sketch, map-side-mergeable story as the builtin,
    * with the builtin staying the hot path (one xxhash vs an md5 per
    * value) exactly like the other md5 twins. */
  def approxDistinctMd5(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val h = li.select(col("l_partkey")).distinct()
      .select(conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val regs = h
      .select(pmod(col("h"), lit(HllM.toLong)).as("b"),
        // integer shift, not double division: h < 2^60 and HllM = 2^12, so
        // shiftright(h, 12) IS floor(h / m) — the double-rounded quotient
        // could diverge near rank-word boundaries at scale
        shiftright(col("h"), 12).as("w"))
      .select(col("b"),
        when(col("w") > 0, lit(49) - length(bin(col("w")))).otherwise(lit(49))
          .cast("int").as("rank"))
      .groupBy("b").agg(max(col("rank")).as("m"))
    val allB = s.range(HllM).select(col("id").as("b"))
      .join(regs, Seq("b"), "left")
      .select(coalesce(col("m"), lit(0)).as("m"))
    val agg = allB.agg(
      sum(expr("CAST(1 AS BIGINT) << (49 - m)")).as("s"),
      sum(when(col("m") === 0, 1L).otherwise(0L)).as("v"))
    val alpha = 0.7213 / (1 + 1.079 / HllM)
    val exact = li.agg(countDistinct(col("l_partkey")).as("n_exact"))
    agg.crossJoin(exact)
      .withColumn("e_raw",
        lit(alpha) * HllM * HllM * lit((1L << 49).toDouble) / col("s"))
      .select(col("n_exact"),
        round(when(col("e_raw") <= lit(2.5 * HllM) && col("v") > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v")))
          .otherwise(col("e_raw")), 6).as("hll_estimate"),
        col("v").as("n_empty_buckets"))
  }

  val approxDistinctMd5Sql: String =
    s"""WITH h AS (
       |  SELECT CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM (SELECT DISTINCT l_partkey FROM lineitem)
       |),
       |r AS (
       |  SELECT h % $HllM AS b,
       |         CASE WHEN h // $HllM > 0 THEN 49 - length(bin(h // $HllM)) ELSE 49 END AS rank
       |  FROM h
       |),
       |regs AS (SELECT b, max(rank) AS m FROM r GROUP BY b),
       |allb AS (
       |  SELECT g.b, coalesce(regs.m, 0) AS m
       |  FROM (SELECT unnest(generate_series(0, ${HllM - 1})) AS b) g
       |  LEFT JOIN regs USING (b)
       |),
       |agg AS (
       |  SELECT CAST(sum(CAST(1 AS BIGINT) << (49 - m)) AS BIGINT) AS s,
       |         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
       |  FROM allb
       |),
       |est AS (
       |  SELECT (0.7213 / (1 + 1.079 / $HllM)) * $HllM * $HllM
       |           * CAST(CAST(1 AS BIGINT) << 49 AS DOUBLE) / s AS e_raw, v
       |  FROM agg
       |)
       |SELECT (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS n_exact,
       |       round(CASE WHEN e_raw <= 2.5 * $HllM AND v > 0
       |                  THEN $HllM * ln($HllM * 1.0 / v) ELSE e_raw END, 6) AS hll_estimate,
       |       v AS n_empty_buckets
       |FROM est""".stripMargin

  // ------------------------------------------------------ analytic windows
  /** row_number/rank/dense_rank: top-3 orders per customer by price. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk")
      .orderBy("o_custkey", "rn")
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |         rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** lag/lead: per-customer order-to-order gap in days. */
  def windowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
              ((unix_timestamp(col("o_orderdate")) - unix_timestamp(col("prev_date"))) / 86400L)
                .cast("long").as("gap_days"),
              col("next_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val windowLagSql: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST((floor(epoch(o_orderdate)) - floor(epoch(lag(o_orderdate) OVER w))) / 86400 AS BIGINT) AS gap_days,
      |       lead(o_orderkey) OVER w AS next_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Moving frame aggregate: trailing-7-day quantity sum per supplier.
    * Uses a RANGE frame (not ROWS): lineitem has no unique key (duplicate
    * (l_orderkey, l_linenumber) pairs exist in the data), so a ROWS frame
    * would be nondeterministic at ordering ties — a RANGE frame includes
    * every tied row regardless of tie order, which both engines agree on.
    * The final ORDER BY lists every output column, making the row sequence
    * total even in the presence of fully duplicate rows. */
  def windowMovingSum(s: SparkSession, dir: String): DataFrame = {
    val wk = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("ship_sec"))
      .rangeBetween(-7L * 86400L, 0)
    Tables.lineitem(s, dir)
      .withColumn("ship_sec", unix_timestamp(col("l_shipdate")))
      .withColumn("moving_qty",
        sum(col("l_quantity").cast("decimal(18,2)")).over(wk).cast("double"))
      .select("l_suppkey", "ship_sec", "l_orderkey", "l_linenumber", "l_quantity", "moving_qty")
      .orderBy("l_suppkey", "ship_sec", "l_orderkey", "l_linenumber", "l_quantity", "moving_qty")
  }

  val windowMovingSumSql: String =
    """WITH t AS (
      |  SELECT l_suppkey, CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ship_sec,
      |         l_orderkey, l_linenumber, l_quantity
      |  FROM lineitem
      |)
      |SELECT l_suppkey, ship_sec, l_orderkey, l_linenumber, l_quantity,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
      |         OVER (PARTITION BY l_suppkey ORDER BY ship_sec
      |               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_qty
      |FROM t
      |ORDER BY l_suppkey, ship_sec, l_orderkey, l_linenumber, l_quantity, moving_qty""".stripMargin

  // --------------------------------------------------------------- set ops
  /** UNION / INTERSECT / EXCEPT over nation keys of customers vs suppliers,
    * tagged so all three set ops land in one checkable result. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk")).distinct()
    val p = Tables.supplier(s, dir).select(col("s_nationkey").as("nk")).distinct()
    val u = c.union(p).distinct().withColumn("op", lit("union"))
    val i = c.intersect(p).withColumn("op", lit("intersect"))
    val e = c.except(p).withColumn("op", lit("except"))
    u.union(i).union(e).select("op", "nk").orderBy("op", "nk")
  }

  val setOpsSql: String =
    """WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
      |     s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
      |SELECT 'union' AS op, nk FROM (SELECT nk FROM c UNION SELECT nk FROM s)
      |UNION ALL
      |SELECT 'intersect', nk FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
      |UNION ALL
      |SELECT 'except', nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
      |ORDER BY op, nk""".stripMargin

  /** Multiset (ALL) twins of [[setOps]]: `exceptAll`/`intersectAll`
    * preserve multiplicity — the bag semantics reconciliation/auditing
    * needs (how many customer rows per nation are NOT matched 1:1 by a
    * supplier row), where the DISTINCT forms silently collapse counts.
    * Output is compacted to (op, nk, n) so the result is small and
    * totally ordered regardless of how the multiset rows distribute. */
  def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
    val p = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
    val u = c.union(p).withColumn("op", lit("union_all"))
    val e = c.exceptAll(p).withColumn("op", lit("except_all"))
    val i = c.intersectAll(p).withColumn("op", lit("intersect_all"))
    u.union(e).union(i)
      .groupBy("op", "nk").agg(count(lit(1)).as("n"))
      .orderBy("op", "nk")
  }

  val setOpsAllSql: String =
    """WITH c AS (SELECT c_nationkey AS nk FROM customer),
      |     s AS (SELECT s_nationkey AS nk FROM supplier),
      |a AS (
      |  SELECT 'union_all' AS op, nk FROM (SELECT nk FROM c UNION ALL SELECT nk FROM s)
      |  UNION ALL
      |  SELECT 'except_all', nk FROM (SELECT nk FROM c EXCEPT ALL SELECT nk FROM s)
      |  UNION ALL
      |  SELECT 'intersect_all', nk FROM (SELECT nk FROM c INTERSECT ALL SELECT nk FROM s)
      |)
      |SELECT op, nk, count(*) AS n FROM a GROUP BY op, nk ORDER BY op, nk""".stripMargin

  // ------------------------------------------------------- scalar functions
  /** String functions: lower/upper/substring/concat/length/replace. */
  def scalarString(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
              lower(col("p_name")).as("lname"),
              upper(col("p_brand")).as("ubrand"),
              substring(col("p_type"), 1, 5).as("type5"),
              concat_ws("|", col("p_brand"), col("p_type")).as("btype"),
              length(col("p_name")).cast("long").as("name_len"),
              regexp_replace(col("p_name"), " ", "_").as("name_u"))
      .orderBy("p_partkey")

  val scalarStringSql: String =
    """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
      |       substring(p_type, 1, 5) AS type5,
      |       concat_ws('|', p_brand, p_type) AS btype,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       replace(p_name, ' ', '_') AS name_u
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date functions: truncation/extraction on o_orderdate (monthly counts). */
  def scalarDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("yr"),
              month(col("o_orderdate")).as("mo"),
              dayofmonth(col("o_orderdate")).as("dom"),
              col("o_totalprice"))
      .groupBy("yr", "mo")
      .agg(count(lit(1)).as("n_orders"),
           msum(col("o_totalprice")).as("monthly_total"),
           min(col("dom")).as("first_dom"),
           max(col("dom")).as("last_dom"))
      .orderBy("yr", "mo")

  val scalarDateSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total,
      |       CAST(min(day(o_orderdate)) AS INT) AS first_dom,
      |       CAST(max(day(o_orderdate)) AS INT) AS last_dom
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** JSON extraction: events.props is a JSON string ('{"k": 87}');
    * parse, extract, aggregate. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """SELECT event_type, count(*) AS cnt,
      |       CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
      |       CAST(min(CAST(props->>'$.k' AS INT)) AS INT) AS min_k,
      |       CAST(max(CAST(props->>'$.k' AS INT)) AS INT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Array functions: per-nation sorted list of customer market segments. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy("c_nationkey")
      .agg(sort_array(collect_set(col("c_mktsegment"))).as("segs"),
           count(lit(1)).as("n_cust"))
      .select(col("c_nationkey"), array_join(col("segs"), ",").as("segments"),
              size(col("segs")).cast("long").as("n_segs"), col("n_cust"))
      .orderBy("c_nationkey")

  val arrayFuncsSql: String =
    """SELECT c_nationkey,
      |       array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
      |       CAST(len(list_distinct(list(c_mktsegment))) AS BIGINT) AS n_segs,
      |       count(*) AS n_cust
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Conditional aggregation (CASE WHEN pivot): order counts by status
    * spread into columns, per priority. */
  def conditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
           sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
           sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  val conditionalAggSql: String =
    """SELECT o_orderpriority,
      |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Correlated scalar subquery: customers whose account balance exceeds
    * their nation's average (rewritten by Catalyst into a join). */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val natAvg = cust.groupBy("c_nationkey")
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
             .as("nat_avg"))
      .withColumnRenamed("c_nationkey", "nk")
    cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nat_avg"))
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  val scalarSubquerySql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal FROM customer c1
      |WHERE c_acctbal > (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (pricingSummary _),
    "q3_shipping_priority" -> (shippingPriority _),
    "q5_regional_revenue" -> (regionalRevenue _),
    "q6_forecast_revenue" -> (forecastRevenue _),
    "q4_order_priority"   -> (orderPriorityCheck _),
    "q10_returned_losses" -> (returnedItemLosses _),
    "q11_important_stock" -> (importantStock _),
    "q13_order_histogram" -> (custOrderHistogram _),
    "q14_promo_revenue"   -> (promoRevenue _),
    "q15_top_supplier"    -> (topSupplier _),
    "q17_small_qty_rev"   -> (smallQtyRevenue _),
    "q18_large_orders"    -> (largeVolumeOrders _),
    "q19_disjunctive_rev" -> (disjunctiveRevenue _),
    "q22_dormant_custs"   -> (dormantCustomers _),
    "join_semi"           -> (semiJoin _),
    "join_anti"           -> (antiJoin _),
    "join_outer_stats"    -> (outerJoinStats _),
    "rollup_agg"          -> (rollupAgg _),
    "cube_agg"            -> (cubeAgg _),
    "grouping_sets"       -> (groupingSets _),
    "distinct_aggs"       -> (distinctAggs _),
    "approx_distinct"     -> (approxDistinct _),
    "approx_distinct_md5" -> (approxDistinctMd5 _),
    "window_rank"         -> (windowRank _),
    "window_lag"          -> (windowLag _),
    "window_moving_sum"   -> (windowMovingSum _),
    "set_ops"             -> (setOps _),
    "set_ops_all"         -> (setOpsAll _),
    "scalar_string"       -> (scalarString _),
    "scalar_date"         -> (scalarDate _),
    "json_extract"        -> (jsonExtract _),
    "array_funcs"         -> (arrayFuncs _),
    "conditional_agg"     -> (conditionalAgg _),
    "scalar_subquery"     -> (scalarSubquery _)
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> pricingSummarySql,
    "q3_shipping_priority" -> shippingPrioritySql,
    "q5_regional_revenue" -> regionalRevenueSql,
    "q6_forecast_revenue" -> forecastRevenueSql,
    "q4_order_priority"   -> orderPriorityCheckSql,
    "q10_returned_losses" -> returnedItemLossesSql,
    "q11_important_stock" -> importantStockSql,
    "q13_order_histogram" -> custOrderHistogramSql,
    "q14_promo_revenue"   -> promoRevenueSql,
    "q15_top_supplier"    -> topSupplierSql,
    "q17_small_qty_rev"   -> smallQtyRevenueSql,
    "q18_large_orders"    -> largeVolumeOrdersSql,
    "q19_disjunctive_rev" -> disjunctiveRevenueSql,
    "q22_dormant_custs"   -> dormantCustomersSql,
    "join_semi"           -> semiJoinSql,
    "join_anti"           -> antiJoinSql,
    "join_outer_stats"    -> outerJoinStatsSql,
    "rollup_agg"          -> rollupAggSql,
    "cube_agg"            -> cubeAggSql,
    "grouping_sets"       -> groupingSetsSql,
    "distinct_aggs"       -> distinctAggsSql,
    // approx_distinct: intentionally no oracle (sketch-dependent); the
    // md5 twin puts the full HLL pipeline under the gate instead
    "approx_distinct_md5" -> approxDistinctMd5Sql,
    "window_rank"         -> windowRankSql,
    "window_lag"          -> windowLagSql,
    "window_moving_sum"   -> windowMovingSumSql,
    "set_ops"             -> setOpsSql,
    "set_ops_all"         -> setOpsAllSql,
    "scalar_string"       -> scalarStringSql,
    "scalar_date"         -> scalarDateSql,
    "json_extract"        -> jsonExtractSql,
    "array_funcs"         -> arrayFuncsSql,
    "conditional_agg"     -> conditionalAggSql,
    "scalar_subquery"     -> scalarSubquerySql
  )
}
