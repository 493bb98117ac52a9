package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Relational coverage, second batch (SURVEY.md §2b "rebuild adds"):
  * pivot, exact-decimal variance, interpolated percentiles, full-outer
  * join, SQL-path IN/EXISTS subqueries, JSON-as-map functions, arg-max by
  * struct ordering, union-by-name.
  *
  * Same determinism discipline as `Relational`: total output order, integer
  * or exact-decimal intermediates wherever accumulation order could differ,
  * rounding only where both engines compute the same IEEE expression.
  */
object RelationalExt {

  // ------------------------------------------------------------------ pivot
  /** The DataFrame `pivot` API (Catalyst rewrites to a single-pass
    * conditional aggregate — one shuffle, no joins). Pivot values are
    * pinned so the plan never needs the extra distinct-values job. */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
              coalesce(col("F"), lit(0L)).as("n_f"),
              coalesce(col("O"), lit(0L)).as("n_o"),
              coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  val pivotStatusSql: String =
    """SELECT o_orderpriority,
      |       count(*) FILTER (o_orderstatus = 'F') AS n_f,
      |       count(*) FILTER (o_orderstatus = 'O') AS n_o,
      |       count(*) FILTER (o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------- exact variance via decimals
  /** Sample variance/stddev computed from EXACT decimal power sums:
    * var = (Σx² − (Σx)²/n)/(n−1), with Σx and Σx² as lossless decimals and
    * only the final arithmetic in double — identical bits on both engines
    * regardless of accumulation order (the one-pass streaming `stddev`
    * would differ in the last ulp between engines). */
  def stddevDecimal(s: SparkSession, dir: String): DataFrame = {
    val x  = col("l_quantity").cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(sum(x).cast("double").as("s1"),
           sum((x * x).cast("decimal(30,4)")).cast("double").as("s2"),
           count(lit(1)).as("n"))
      .select(col("l_returnflag"),
              round((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), 6)
                .as("var_qty"),
              round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 6)
                .as("std_qty"),
              col("n"))
      .orderBy("l_returnflag")
  }

  val stddevDecimalSql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS s2,
      |    count(*) AS n
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag,
      |  round((s2 - s1 * s1 / n) / (n - 1), 6) AS var_qty,
      |  round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS std_qty,
      |  n
      |FROM m ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------ percentiles
  /** Exact interpolated percentiles (median, p90). Both engines use the
    * (n−1)·p index with linear interpolation; results are rounded to 6 dp
    * to absorb any last-ulp interpolation difference. At 100 TB the exact
    * percentile needs a per-group sort — `approx_percentile` (t-digest
    * style sketch) is the scale path and is covered rows-only. */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
           round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"),
           count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val percentilesSql: String =
    """SELECT o_orderpriority,
      |       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
      |       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
      |       count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** approx_percentile sketch (no SQL oracle — implementation-defined). */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p50_approx"))
      .orderBy("o_orderpriority")

  // -------------------------------------------------------- full-outer join
  /** Full-outer join of per-nation customer vs supplier counts — nations
    * can miss either side; coalesce restores totals. Both sides pre-agg to
    * dimension cardinality before the join (aggregate-below-join: the join
    * input is 25 rows, not 150 k). */
  def fullOuterNation(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, dir).groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
    c.join(p, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
              coalesce(col("n_cust"), lit(0L)).as("n_cust"),
              coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  val fullOuterNationSql: String =
    """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
      |     s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
      |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
      |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  // ------------------------------------------------- SQL-path subqueries
  /** Correlated EXISTS with an extra predicate, through the SQL entry path
    * (Catalyst de-correlates to a left-semi join). */
  def existsHeavyItems(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val existsHeavyItemsSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |ORDER BY o_orderkey""".stripMargin

  /** Uncorrelated IN subquery (rewritten to a semi join over a one-row
    * aggregate broadcast). */
  def inRichSegment(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer
        |  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.5)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val inRichSegmentSql: String =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer
      |  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.5)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------- map functions
  /** JSON parsed into a typed map column, then map functions (keys, values,
    * element_at) — the `events.props` column as MapType instead of
    * get_json_object string-poking. */
  def mapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, IntegerType)))
      .select(col("event_type"),
              size(map_keys(col("m"))).cast("long").as("n_keys"),
              element_at(col("m"), "k").as("k_val"))
      .groupBy("event_type")
      .agg(sum("n_keys").as("total_keys"), sum("k_val").as("sum_k"),
           count(lit(1)).as("cnt"))
      .orderBy("event_type")

  val mapFuncsSql: String =
    """WITH j AS (
      |  SELECT event_type,
      |         CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
      |         CAST(props->>'$.k' AS INT) AS k_val
      |  FROM events
      |)
      |SELECT event_type, CAST(sum(n_keys) AS BIGINT) AS total_keys,
      |       CAST(sum(k_val) AS BIGINT) AS sum_k,
      |       count(*) AS cnt
      |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------- arg-max via struct
  /** Deterministic arg-max: the biggest (totalprice, orderkey) order per
    * customer via max over a struct (lexicographic — ties broken by the
    * orderkey inside the struct, unlike bare `max_by`, which is
    * tie-nondeterministic on both engines). */
  def argMaxOrder(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"))
      .select(col("o_custkey"), col("m.o_orderkey").as("best_order"),
              col("m.o_totalprice").as("best_price"))
      .orderBy("o_custkey")

  // struct-max is lexicographic: ties on price resolve to the LARGER
  // orderkey, hence DESC on both sort keys here
  val argMaxOrderSql: String =
    """SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      |  FROM orders
      |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  // ----------------------------------------------- SQL-path generator (UDTF)
  /** LATERAL VIEW posexplode through the SQL entry path — the SQL face of
    * the generator the flagship pipeline uses via the DataFrame API. */
  def sqlLateralView(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT doc_id, pos, tok
        |FROM documents
        |LATERAL VIEW posexplode(filter(split(text, ' '), x -> x <> '')) t AS pos, tok
        |WHERE pos < 3
        |ORDER BY doc_id, pos""".stripMargin)
  }

  val sqlLateralViewSql: String =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |           FROM documents)
      |SELECT doc_id, i - 1 AS pos, tk[i] AS tok
      |FROM t, LATERAL (SELECT unnest(generate_series(1, least(len(tk), 3))) AS i) g
      |ORDER BY doc_id, pos""".stripMargin

  // ----------------------------------------------------------- salted join
  private val Salts = 8

  /** Skew-mitigated join: the fact side salts its key into `Salts` subkeys,
    * the dimension side replicates ×`Salts` — a hot key's rows spread over
    * `Salts` reducers instead of one. The oracle is the PLAIN join's
    * aggregate, so the rewrite is verified result-identical. (AQE skew
    * splitting handles sort-merge skew automatically at runtime; manual
    * salting remains the tool for skewed *aggregations* and for engines/
    * paths AQE doesn't cover — this demonstrates the mechanics under
    * oracle protection.) */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber"), col("l_quantity")), lit(Salts)))
    val ord = Tables.orders(s, dir)
      .withColumn("salt", explode(sequence(lit(0), lit(Salts - 1))))
    li.join(ord,
        li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  val saltedJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Mergeable HLL sketches (Spark 3.5+ datasketches functions): per-nation
    * sketches of customer keys, unioned to a region-level estimate — the
    * re-aggregatable distinct-count pattern (store sketches, merge any
    * rollup later without rescanning). Sketch bytes are implementation-
    * defined → rows-only gate. */
  def hllSketchMerge(s: SparkSession, dir: String): DataFrame = {
    val perNation = Tables.customer(s, dir)
      .groupBy("c_nationkey")
      .agg(expr("hll_sketch_agg(c_custkey)").as("sk"))
    perNation
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_customers"))
      .orderBy("n_regionkey")
  }

  /** [[hllSketchMerge]]'s md5 twin — the GROUPED md5-HLL: per-nation
    * register tables (b → max rank) are built first, then max-MERGED per
    * region — literally the sketch-union algebra (union = element-wise
    * register max) the datasketches query demonstrates, but over the
    * cross-engine md5 recipe so DuckDB can recompute it bit-for-bit. The
    * oracle computes per-region registers DIRECTLY from the unioned
    * customer sets; equality of the two (max is associative) is exactly
    * the mergeability property under test, now hash-gated rather than
    * rows-only. Scale: register state is 4096 ints per group regardless
    * of cardinality, merged map-side — the same fixed-state contract as
    * the sketch version. */
  def hllSketchMergeMd5(s: SparkSession, dir: String): DataFrame = {
    val m = 4096L
    // per-nation register tables over distinct customer keys
    val perNation = Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey").cast("string").as("x"))
      .distinct()
      .select(col("c_nationkey"),
        conv(substring(md5(col("x")), 1, 15), 16, 10).cast("long").as("h"))
      // shiftright(h, 12) == floor(h / m) exactly (h < 2^60, m = 2^12)
      .select(col("c_nationkey"), pmod(col("h"), lit(m)).as("b"),
        shiftright(col("h"), 12).as("w"))
      .select(col("c_nationkey"), col("b"),
        when(col("w") > 0, lit(49) - length(bin(col("w")))).otherwise(lit(49))
          .cast("int").as("rank"))
      .groupBy("c_nationkey", "b").agg(max(col("rank")).as("m"))
    // sketch UNION per region = element-wise register max across nations
    val merged = perNation
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey", "b").agg(max(col("m")).as("m"))
    // estimate per region over the full 4096-bucket grid (empty buckets
    // count as rank 0 for both the indicator sum and linear counting)
    val grid = Tables.nation(s, dir).select(col("n_regionkey")).distinct()
      .crossJoin(s.range(m).select(col("id").as("b")))
    val agg = grid.join(merged, Seq("n_regionkey", "b"), "left")
      .select(col("n_regionkey"), coalesce(col("m"), lit(0)).as("m"))
      .groupBy("n_regionkey")
      .agg(sum(expr("CAST(1 AS BIGINT) << (49 - m)")).as("s"),
           sum(when(col("m") === 0, 1L).otherwise(0L)).as("v"))
    val alpha = 0.7213 / (1 + 1.079 / m)
    agg.withColumn("e_raw", lit(alpha) * m * m * lit((1L << 49).toDouble) / col("s"))
      .select(col("n_regionkey"),
        round(when(col("e_raw") <= lit(2.5 * m) && col("v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("e_raw")), 6).as("approx_customers"))
      .orderBy("n_regionkey")
  }

  val hllSketchMergeMd5Sql: String =
    """WITH x AS (
      |  SELECT n_regionkey,
      |         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM (SELECT DISTINCT n_regionkey, c_custkey
      |        FROM customer JOIN nation ON c_nationkey = n_nationkey)
      |),
      |r AS (
      |  SELECT n_regionkey, h % 4096 AS b,
      |         CASE WHEN h // 4096 > 0 THEN 49 - length(bin(h // 4096)) ELSE 49 END AS rank
      |  FROM x
      |),
      |regs AS (SELECT n_regionkey, b, max(rank) AS m FROM r GROUP BY 1, 2),
      |grid AS (
      |  SELECT n_regionkey, b
      |  FROM (SELECT DISTINCT n_regionkey FROM nation) g1,
      |       (SELECT unnest(generate_series(0, 4095)) AS b) g2
      |),
      |agg AS (
      |  SELECT grid.n_regionkey,
      |         CAST(sum(CAST(1 AS BIGINT) << (49 - coalesce(m, 0))) AS BIGINT) AS s,
      |         CAST(sum(CASE WHEN coalesce(m, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
      |  FROM grid LEFT JOIN regs
      |    ON grid.n_regionkey = regs.n_regionkey AND grid.b = regs.b
      |  GROUP BY 1
      |)
      |SELECT n_regionkey,
      |       round(CASE WHEN e_raw <= 2.5 * 4096 AND v > 0
      |                  THEN 4096 * ln(4096.0 / v) ELSE e_raw END, 6) AS approx_customers
      |FROM (SELECT n_regionkey,
      |             (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096
      |             * CAST(CAST(1 AS BIGINT) << 49 AS DOUBLE) / s AS e_raw, v
      |      FROM agg)
      |ORDER BY n_regionkey""".stripMargin

  /** md5-HLL estimate (one double row, aliased `as`) over a single
    * string-column frame — the same recipe as
    * [[Relational.approxDistinctMd5]] (exact bit-length ranks,
    * integer-scaled indicator sum, linear-counting correction); kept
    * small here so [[hllIntersectMd5]] can run it over three sets. */
  private def hllMd5Est(s: SparkSession, values: DataFrame, as: String): DataFrame = {
    val m = 4096L
    val regs = values.toDF("x").distinct()
      .select(conv(substring(md5(col("x")), 1, 15), 16, 10).cast("long").as("h"))
      // shiftright(h, 12) == floor(h / m) exactly (h < 2^60, m = 2^12) —
      // matches the oracle's integer `h // 4096` with no double rounding
      .select(pmod(col("h"), lit(m)).as("b"), shiftright(col("h"), 12).as("w"))
      .select(col("b"),
        when(col("w") > 0, lit(49) - length(bin(col("w")))).otherwise(lit(49))
          .cast("int").as("rank"))
      .groupBy("b").agg(max(col("rank")).as("m"))
    val agg = s.range(m).select(col("id").as("b"))
      .join(regs, Seq("b"), "left")
      .select(coalesce(col("m"), lit(0)).as("m"))
      .agg(sum(expr("CAST(1 AS BIGINT) << (49 - m)")).as("s"),
           sum(when(col("m") === 0, 1L).otherwise(0L)).as("v"))
    val alpha = 0.7213 / (1 + 1.079 / m)
    agg.withColumn("e_raw", lit(alpha) * m * m * lit((1L << 49).toDouble) / col("s"))
      .select(when(col("e_raw") <= lit(2.5 * m) && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
        .otherwise(col("e_raw")).as(as))
  }

  /** The ANSI-SQL body of [[hllMd5Est]] over `src` (one column `x`),
    * CTE names prefixed to stay collision-free when chained 3×. */
  private def hllMd5EstSql(src: String, pfx: String, as: String): String =
    s"""${pfx}h AS (
       |  SELECT CAST('0x' || substring(md5(x), 1, 15) AS BIGINT) AS h
       |  FROM (SELECT DISTINCT x FROM $src)
       |),
       |${pfx}r AS (
       |  SELECT h % 4096 AS b,
       |         CASE WHEN h // 4096 > 0 THEN 49 - length(bin(h // 4096)) ELSE 49 END AS rank
       |  FROM ${pfx}h
       |),
       |${pfx}regs AS (SELECT b, max(rank) AS m FROM ${pfx}r GROUP BY b),
       |${pfx}agg AS (
       |  SELECT CAST(sum(CAST(1 AS BIGINT) << (49 - coalesce(${pfx}regs.m, 0))) AS BIGINT) AS s,
       |         CAST(sum(CASE WHEN coalesce(${pfx}regs.m, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
       |  FROM (SELECT unnest(generate_series(0, 4095)) AS b) g
       |  LEFT JOIN ${pfx}regs USING (b)
       |),
       |${pfx}est AS (
       |  SELECT CASE WHEN e_raw <= 2.5 * 4096 AND v > 0
       |              THEN 4096 * ln(4096.0 / v) ELSE e_raw END AS $as
       |  FROM (SELECT (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096
       |               * CAST(CAST(1 AS BIGINT) << 49 AS DOUBLE) / s AS e_raw, v
       |        FROM ${pfx}agg)
       |)""".stripMargin

  /** [[hllIntersect]]'s md5 twin: the inclusion–exclusion overlap
    * estimate |A∩B| ≈ |A| + |B| − |A∪B| with all three cardinalities
    * from the cross-engine md5-HLL — the union estimate comes from
    * hashing the unioned value set, which yields exactly the
    * element-wise register max a sketch union computes. The exact
    * intersection rides along; everything is hash-gated at round 6. */
  def hllIntersectMd5(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id").cast("string"), col("event_type"))
      .toDF("uid", "event_type")
    val clicks = ev.filter(col("event_type") === "click").select("uid")
    val purch = ev.filter(col("event_type") === "purchase").select("uid")
    val estA = hllMd5Est(s, clicks, "approx_click")
    val estB = hllMd5Est(s, purch, "approx_purchase")
    val estU = hllMd5Est(s, clicks.union(purch), "approx_union")
    val exactBoth = clicks.distinct().intersect(purch.distinct())
      .agg(count(lit(1)).as("exact_both"))
    estA.crossJoin(estB).crossJoin(estU).crossJoin(exactBoth)
      .select(
        round(col("approx_click") + col("approx_purchase") - col("approx_union"), 6)
          .as("approx_both"),
        col("exact_both"),
        round(col("approx_click"), 6).as("approx_click"),
        round(col("approx_purchase"), 6).as("approx_purchase"))
  }

  val hllIntersectMd5Sql: String =
    s"""WITH clicks AS (SELECT CAST(user_id AS VARCHAR) AS x FROM events WHERE event_type = 'click'),
       |purch AS (SELECT CAST(user_id AS VARCHAR) AS x FROM events WHERE event_type = 'purchase'),
       |uni AS (SELECT x FROM clicks UNION ALL SELECT x FROM purch),
       |${hllMd5EstSql("clicks", "a", "approx_click")},
       |${hllMd5EstSql("purch", "b", "approx_purchase")},
       |${hllMd5EstSql("uni", "u", "approx_union")},
       |eb AS (
       |  SELECT CAST(count(*) AS BIGINT) AS exact_both FROM (
       |    SELECT DISTINCT x FROM clicks INTERSECT SELECT DISTINCT x FROM purch)
       |)
       |SELECT round(approx_click + approx_purchase - approx_union, 6) AS approx_both,
       |       exact_both,
       |       round(approx_click, 6) AS approx_click,
       |       round(approx_purchase, 6) AS approx_purchase
       |FROM aest CROSS JOIN best CROSS JOIN uest CROSS JOIN eb""".stripMargin

  /** HLL set ALGEBRA — sketch-based overlap estimation: distinct users
    * who both clicked AND purchased, from two sketches and their union
    * via inclusion–exclusion (|A∩B| ≈ |A| + |B| − |A∪B|). This is how
    * cross-source audience/corpus overlap is estimated at 100 TB: each
    * source keeps one fixed-size sketch; any pairwise overlap is sketch
    * merges, never a re-scan or a distinct-join. The exact intersection
    * rides along in the same output for the spec's relative-error bound.
    * Sketch internals are implementation-defined → rows-only gate. */
  def hllIntersect(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"))
    val sk = ev.filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"),
           countDistinct(col("user_id")).as("exact_n"))
    val both = sk.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_union"),
      sum(when(col("event_type") === "click", col("exact_n"))).as("exact_click"),
      sum(when(col("event_type") === "purchase", col("exact_n"))).as("exact_purchase"))
    val approxSides = sk.select(col("event_type"),
      expr("hll_sketch_estimate(sk)").as("approx_n"))
    val a = approxSides.filter(col("event_type") === "click")
      .select(col("approx_n").as("approx_click"))
    val b = approxSides.filter(col("event_type") === "purchase")
      .select(col("approx_n").as("approx_purchase"))
    val exactBoth = ev.filter(col("event_type") === "click").select("user_id").distinct()
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id").distinct())
      .agg(count(lit(1)).as("exact_both"))
    both.crossJoin(a).crossJoin(b).crossJoin(exactBoth)
      .select(
        (col("approx_click") + col("approx_purchase") - col("approx_union"))
          .cast("long").as("approx_both"),
        col("exact_both"), col("exact_click"), col("exact_purchase"))
  }

  // ------------------------------------------------------- union by name
  /** `unionByName` with reordered projections (schema aligned by column
    * name, not position), tagged per branch. */
  def unionByNameTagged(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"),
              lit("building").as("src"))
    val b = Tables.customer(s, dir).filter(col("c_acctbal") < 0)
      .select(lit("negative").as("src"), col("c_acctbal").as("bal"),
              col("c_custkey").as("key"))
    a.unionByName(b)
      .groupBy("src")
      .agg(count(lit(1)).as("n"),
           sum(col("bal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("src")
  }

  val unionByNameTaggedSql: String =
    """WITH u AS (
      |  SELECT c_custkey AS key, c_acctbal AS bal, 'building' AS src
      |  FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal, 'negative' FROM customer WHERE c_acctbal < 0
      |)
      |SELECT src, count(*) AS n,
      |       CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM u GROUP BY src ORDER BY src""".stripMargin

  // --------------------------------------------------------- scalar misc
  /** Grab-bag of scalar functions not covered elsewhere: trim/pad/translate/
    * reverse, LIKE/RLIKE predicates, null handling (nullif/coalesce),
    * least/greatest. All per-row, codegen'd, zero extra shuffles. */
  def scalarMisc(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        reverse(lower(col("p_brand"))).as("brand_rev"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        translate(col("p_type"), "AEIOU", "aeiou").as("type_tr"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
        col("p_name").like("%green%").as("is_green"),
        col("p_type").rlike("^[A-Z]{5}").as("type5caps"),
        nullif(col("p_size"), lit(1)).as("size_nz"),
        coalesce(nullif(col("p_size"), lit(1)), lit(-1)).as("size_nvl"),
        least(col("p_size"), lit(25)).as("size_cap"),
        greatest(col("p_retailprice"), lit(1000.0)).as("price_floor"))
      .orderBy("p_partkey")

  val scalarMiscSql: String =
    """SELECT p_partkey,
      |  reverse(lower(p_brand)) AS brand_rev,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
      |  translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
      |  trim('  ' || p_brand || '  ') AS brand_trim,
      |  p_name LIKE '%green%' AS is_green,
      |  regexp_matches(p_type, '^[A-Z]{5}') AS type5caps,
      |  nullif(p_size, 1) AS size_nz,
      |  coalesce(nullif(p_size, 1), -1) AS size_nvl,
      |  least(p_size, 25) AS size_cap,
      |  greatest(p_retailprice, 1000.0) AS price_floor
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date arithmetic on orders: add/diff/trunc — epoch-second output keeps
    * the compare rendering-free. */
  def dateArithmetic(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        unix_timestamp(date_add(col("o_orderdate"), 30)).as("due_sec"),
        unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_sec"))
      .orderBy("o_orderkey")

  val dateArithmeticSql: String =
    """SELECT o_orderkey,
      |  CAST(floor(epoch(o_orderdate + INTERVAL 30 DAY)) AS BIGINT) AS due_sec,
      |  CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_sec
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_misc"      -> (scalarMisc _),
    "date_arithmetic"  -> (dateArithmetic _),
    "pivot_status"     -> (pivotStatus _),
    "stddev_decimal"   -> (stddevDecimal _),
    "percentiles"      -> (percentiles _),
    "approx_percentiles" -> (approxPercentiles _),
    "join_full_outer"  -> (fullOuterNation _),
    "subquery_exists"  -> (existsHeavyItems _),
    "subquery_in"      -> (inRichSegment _),
    "map_funcs"        -> (mapFuncs _),
    "argmax_order"     -> (argMaxOrder _),
    "union_by_name"    -> (unionByNameTagged _),
    "join_salted"      -> (saltedJoin _),
    "hll_sketch_merge" -> (hllSketchMerge _),
    "hll_sketch_merge_md5" -> (hllSketchMergeMd5 _),
    "hll_intersect"    -> (hllIntersect _),
    "hll_intersect_md5" -> (hllIntersectMd5 _),
    "sql_lateral_view" -> (sqlLateralView _)
  )

  def oracles: Map[String, String] = Map(
    "hll_intersect_md5" -> hllIntersectMd5Sql,
    "hll_sketch_merge_md5" -> hllSketchMergeMd5Sql,
    "scalar_misc"     -> scalarMiscSql,
    "date_arithmetic" -> dateArithmeticSql,
    "pivot_status"    -> pivotStatusSql,
    "stddev_decimal"  -> stddevDecimalSql,
    "percentiles"     -> percentilesSql,
    // approx_percentiles: sketch-dependent → rows-only
    "join_full_outer" -> fullOuterNationSql,
    "subquery_exists" -> existsHeavyItemsSql,
    "subquery_in"     -> inRichSegmentSql,
    "map_funcs"       -> mapFuncsSql,
    "argmax_order"    -> argMaxOrderSql,
    "union_by_name"   -> unionByNameTaggedSql,
    "join_salted"     -> saltedJoinSql,
    "sql_lateral_view" -> sqlLateralViewSql
    // hll_sketch_merge: sketch-dependent → rows-only gate
  )
}
