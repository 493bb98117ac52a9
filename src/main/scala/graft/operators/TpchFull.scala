package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The eight TPC-H query shapes (Q2, Q7, Q8, Q9, Q12, Q16, Q20, Q21) that
  * complete the full 22-query suite over the harness schema. Reference
  * analogue: ABSENT (the reference is a streaming word-count demo —
  * SURVEY.md §2b); these are the standard relational benchmark shapes a
  * user of a query engine expects to run.
  *
  * The harness schema has no `partsupp` table and drops several TPC-H
  * columns (l_shipmode, l_commitdate, l_receiptdate, p_mfgr, ps_*), so
  * each query keeps its canonical SHAPE (the join/agg/window structure
  * that makes it a meaningful benchmark) with adapted semantics:
  *   - supply cost (Q2, Q9, Q20): derived from lineitem/part prices
  *     instead of ps_supplycost/ps_availqty;
  *   - lateness (Q12, Q21): l_shipdate > o_orderdate + 365 days instead
  *     of receipt-vs-commit dates (harness ship dates are independent of
  *     order dates, so 365 splits the data, not 90);
  *   - Q12 classes: l_returnflag instead of l_shipmode.
  *
  * Determinism rules (oracle is hash-compared): money sums are exact
  * decimal then a single cast to double; ratios divide double-by-double so
  * both engines run the identical float op; Q9's 10% cost factor MULTIPLIES
  * by DECIMAL(2,1) 0.1 (exact scale growth — never a decimal division,
  * whose result scale differs between Spark and DuckDB); every ORDER BY
  * carries a unique key suffix.
  */
object TpchFull {

  /** Exact money sum: decimal(18,2) accumulate, one cast to double. */
  private def msum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** revenue volume l_extendedprice * (1 - l_discount) as exact decimal(24,4). */
  private def rev24: Column =
    (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("decimal(24,4)")

  // ------------------------------------------------------------------- q2
  /** TPC-H Q2-style minimum-cost supplier: for each small EUROPE-sourced
    * part, the supplier(s) achieving the minimum observed unit price
    * (min over lineitem of l_extendedprice / l_quantity — the partsupp
    * supply-cost stand-in). Shape: selective dim filters pushed to the
    * scans, fact join with BROADCAST dims, per-(part, supplier) aggregate,
    * then a per-part window min instead of TPC-H's correlated subquery —
    * one extra shuffle on p_partkey versus a rescan, which is the plan you
    * want when the aggregate output is tiny relative to the fact table.
    * Unit price is a double÷double — bit-identical across engines, so the
    * min and the equality against it are safe under the hash compare. */
  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val partF = Tables.part(s, dir)
      .filter(col("p_type") === "SMALL" && col("p_size") <= 10)
      .select("p_partkey")
    val suppEu = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val costs = Tables.lineitem(s, dir)
      .join(broadcast(partF), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppEu), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("supply_cost"))
    costs
      .withColumn("best", min(col("supply_cost")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("supply_cost") === col("best"))
      .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  val minCostSupplierSql: String =
    """WITH costs AS (
      |  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
      |         min(l_extendedprice / l_quantity) AS supply_cost
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_type = 'SMALL' AND p_size <= 10 AND r_name = 'EUROPE'
      |  GROUP BY 1, 2, 3, 4, 5
      |)
      |SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
      |FROM costs
      |QUALIFY supply_cost = min(supply_cost) OVER (PARTITION BY p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  // ------------------------------------------------------------------- q7
  /** TPC-H Q7-style volume shipping: bilateral trade between two nations
    * by ship year. The nation dimension joins twice under different roles
    * (supplier side, customer side) — both broadcast; the disjunctive
    * nation-pair predicate runs AFTER both joins, exactly as TPC-H
    * specifies. */
  def nationVolume(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(s, dir)
    val sn = nat.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = nat.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(rev24).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val nationVolumeSql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS INT) AS l_year,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      |  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------------- q8
  /** TPC-H Q8-style national market share: one nation's fraction of ASIA's
    * ECONOMY-part revenue per order year. The share divides two exact
    * decimal sums double-by-double in the FINAL projection — one
    * aggregation pass computes both numerator (conditional) and
    * denominator; no second scan, no decimal division. */
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    val cnAsia = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val sn = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(cnAsia), col("c_nationkey") === col("cn_key"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", rev24)
          .otherwise(lit(0).cast("decimal(24,4)"))).cast("double") /
          sum(rev24).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy("o_year")
  }

  val marketShareSql: String =
    """WITH vol AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4)) AS volume,
      |         sn.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |)
      |SELECT o_year,
      |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
      |         / CAST(sum(volume) AS DOUBLE) AS mkt_share,
      |       count(*) AS n_items
      |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin

  // ------------------------------------------------------------------- q9
  /** TPC-H Q9-style product-type profit: per (supplier nation, order year)
    * profit on '%gear%' parts, where cost stands in as 10% of
    * p_retailprice × quantity (no partsupp in the harness schema). The 10%
    * factor is a DECIMAL(2,1) MULTIPLICATION — exact scale growth on both
    * engines — never a decimal division, whose result scale is
    * engine-specific (Spark 6 vs DuckDB 8). One cast to double after the
    * whole sum. */
  def productProfit(s: SparkSession, dir: String): DataFrame = {
    val cost24 = (col("p_retailprice").cast("decimal(18,2)") *
      col("l_quantity").cast("decimal(9,0)")).cast("decimal(24,4)")
    val amount = rev24 - cost24 * lit(BigDecimal("0.1")).cast("decimal(2,1)")
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("profit"))
      .orderBy("nation", "o_year")
  }

  val productProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |       CAST(sum(
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))
      |         - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(9,0)) AS DECIMAL(24,4)) * CAST(0.1 AS DECIMAL(2,1))
      |       ) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ q12
  /** TPC-H Q12-style late-shipment priority split: lines shipped in 1997
    * more than a year after their order date, classed by return flag
    * (shipmode is absent from the harness schema), counting high- vs
    * low-priority orders. `count(CASE WHEN .. THEN 1 END)` on both sides
    * keeps the counts BIGINT (a sum-of-ints would be HUGEINT in DuckDB and
    * fail the typed hash). */
  def latePriority(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(year(col("l_shipdate")) === 1997)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS"))
      .groupBy("l_returnflag")
      .agg(count(when(high, 1)).as("high_line_count"),
           count(when(!high, 1)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val latePrioritySql: String =
    """SELECT l_returnflag,
      |       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
      |  AND year(l_shipdate) = 1997
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------------ q16
  /** TPC-H Q16-style supplier count: distinct suppliers observed shipping
    * each (brand, type, size) combination, over the lineitem-derived
    * part↔supplier relation (the harness has no partsupp). The distinct
    * count expands via Catalyst's standard two-phase distinct-aggregate;
    * the brand/type exclusions and the size IN-list prune at the part
    * scan before the broadcast. */
  def supplierCnt(s: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
    val partF = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(s, dir)
      .join(broadcast(partF), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val supplierCntSql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ------------------------------------------------------------------ q20
  /** TPC-H Q20-style part promotion: suppliers whose 1998 shipments of
    * '%red%' parts exceed 20% of their all-time shipments of those parts
    * (availqty is absent; the year-share formulation keeps Q20's
    * "concentrated recent volume" semantics). Quantity sums are exact
    * decimal; the 20% comparison is double-vs-double. */
  def partPromotion(s: SparkSession, dir: String): DataFrame = {
    val shipped = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_name").like("%red%"))
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(
        sum(when(year(col("l_shipdate")) === 1998, col("l_quantity").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("q98"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("q_total"))
    shipped
      .filter(col("q98").cast("double") > lit(0.2) * col("q_total").cast("double"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("q98").cast("double").as("qty_1998"),
        col("q_total").cast("double").as("qty_total"))
      .orderBy("s_suppkey")
  }

  val partPromotionSql: String =
    """WITH shipped AS (
      |  SELECT l_suppkey,
      |         sum(CASE WHEN year(l_shipdate) = 1998 THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS q98,
      |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS q_total
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%red%'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, CAST(q98 AS DOUBLE) AS qty_1998, CAST(q_total AS DOUBLE) AS qty_total
      |FROM shipped JOIN supplier ON l_suppkey = s_suppkey
      |WHERE CAST(q98 AS DOUBLE) > 0.2 * CAST(q_total AS DOUBLE)
      |ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------------------------------ q21
  /** TPC-H Q21-style waiting suppliers: for finished ('F') orders with at
    * least two suppliers where EXACTLY ONE supplier shipped late, count
    * such orders per guilty supplier. TPC-H's exists/not-exists pair
    * becomes one per-order aggregate (distinct suppliers, distinct late
    * suppliers) joined back to the late lines — two shuffles on
    * l_orderkey which AQE plans as one exchange reuse, versus four
    * correlated rescans in the literal formulation. */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS")
    val fl = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("late"))
    val stats = fl.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
           countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
    fl.filter(col("late"))
      .select("l_orderkey", "l_suppkey").distinct()
      .join(stats, "l_orderkey")
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_suppkey"))
  }

  val waitingSuppliersSql: String =
    """WITH fl AS (
      |  SELECT l_orderkey, l_suppkey,
      |         l_shipdate > o_orderdate + INTERVAL 365 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |),
      |stats AS (
      |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
      |         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      |  FROM fl GROUP BY l_orderkey
      |),
      |waiting AS (
      |  SELECT DISTINCT fl.l_orderkey, fl.l_suppkey
      |  FROM fl JOIN stats USING (l_orderkey)
      |  WHERE fl.late AND stats.n_supp >= 2 AND stats.n_late = 1
      |)
      |SELECT s_suppkey, s_name, count(*) AS numwait
      |FROM waiting JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supp"  -> (minCostSupplier _),
    "q7_nation_volume"  -> (nationVolume _),
    "q8_market_share"   -> (marketShare _),
    "q9_product_profit" -> (productProfit _),
    "q12_late_priority" -> (latePriority _),
    "q16_supplier_cnt"  -> (supplierCnt _),
    "q20_part_promo"    -> (partPromotion _),
    "q21_waiting_supp"  -> (waitingSuppliers _)
  )

  def oracles: Map[String, String] = Map(
    "q2_min_cost_supp"  -> minCostSupplierSql,
    "q7_nation_volume"  -> nationVolumeSql,
    "q8_market_share"   -> marketShareSql,
    "q9_product_profit" -> productProfitSql,
    "q12_late_priority" -> latePrioritySql,
    "q16_supplier_cnt"  -> supplierCntSql,
    "q20_part_promo"    -> partPromotionSql,
    "q21_waiting_supp"  -> waitingSuppliersSql
  )
}
