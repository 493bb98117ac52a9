package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 relational coverage additions: distribution analytic functions
  * (ntile / percent_rank / cume_dist), unpivot via `stack`, outer
  * generators, and string→map parsing. Reference analogue: ABSENT (the
  * reference has no analytic windows or generators beyond flatMap —
  * SURVEY.md §2b) — these close the remaining gaps a relational user of
  * the engine would expect.
  *
  * Determinism: every window ORDER BY carries a unique tie-break key
  * (`ntile` is position-based, so ties would otherwise land in
  * engine-dependent buckets); ratio outputs are ratios of integers.
  */
object RelationalMore {

  // --------------------------------------------- distribution window funcs
  /** Quartile bucket, percent rank, and cumulative distribution of
    * customers by account balance within market segment. One shuffle
    * (hash by segment), per-partition sort — the windowed-ranking shape
    * that scales by segment cardinality. */
  def windowDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  val windowDistributionSql: String =
    """SELECT c_mktsegment, c_custkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  // ------------------------------------------------------- unpivot (stack)
  /** Wide→long unpivot with `stack`: per-part metrics melted to
    * (metric, value) rows — the columnar-to-EAV reshape. `stack` is a
    * generator (one input row → n output rows) evaluated map-side; the
    * DuckDB twin is the standard UNION ALL expansion. */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .selectExpr("p_partkey",
        """stack(2,
          |  'size',  CAST(p_size AS DOUBLE),
          |  'price', CAST(p_retailprice AS DOUBLE)
          |) AS (metric, value)""".stripMargin)
      .orderBy("p_partkey", "metric")

  val unpivotMetricsSql: String =
    """SELECT p_partkey, metric, value FROM (
      |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'price', CAST(p_retailprice AS DOUBLE) FROM part
      |) ORDER BY p_partkey, metric""".stripMargin

  // ------------------------------------------------------ outer generators
  /** `posexplode_outer` over a sometimes-empty array: tokens longer than 7
    * chars per document. Outer semantics keep documents with NO long
    * tokens as a (null, null) row — the left-join-shaped generate that
    * plain explode silently drops; the count distinguishes covered vs
    * uncovered docs downstream. */
  def generatorOuter(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> length(x) > 7)").as("longs"))
      .select(col("doc_id"), posexplode_outer(col("longs")).as(Seq("pos", "tok")))
      .groupBy("doc_id")
      .agg(count(col("tok")).as("n_long"),
           max(col("pos")).as("max_pos"),
           min(col("tok")).as("first_tok"))
      .orderBy("doc_id")

  val generatorOuterSql: String =
    """WITH l AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 7) AS longs
      |  FROM documents
      |), x AS (
      |  SELECT doc_id,
      |         CASE WHEN len(longs) = 0 THEN NULL ELSE unnest(longs) END AS tok,
      |         CASE WHEN len(longs) = 0 THEN NULL
      |              ELSE unnest(generate_series(0, greatest(len(longs) - 1, 0))) END AS pos
      |  FROM l
      |)
      |SELECT doc_id, count(tok) AS n_long,
      |       max(pos) AS max_pos, min(tok) AS first_tok
      |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- str_to_map
  /** Parse a k=v,k=v string into a map and extract typed fields — the
    * config/tag-string decode ubiquitous in event pipelines. The map is
    * built and consumed per-row (no shuffle); the oracle reproduces the
    * round-trip results directly from the source columns, which pins the
    * extraction semantics without needing a DuckDB map literal. */
  def strToMap(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .withColumn("tags",
        concat(lit("brand="), col("p_brand"), lit(",size="), col("p_size")))
      .withColumn("m", expr("str_to_map(tags, ',', '=')"))
      .select(col("p_partkey"),
        col("m")("brand").as("brand_tag"),
        col("m")("size").cast("int").as("size_tag"),
        size(map_keys(col("m"))).as("n_tags"))
      .orderBy("p_partkey")

  val strToMapSql: String =
    """SELECT p_partkey, p_brand AS brand_tag,
      |       CAST(p_size AS INTEGER) AS size_tag, 2 AS n_tags
      |FROM part ORDER BY p_partkey""".stripMargin

  // ----------------------------------------------- grouping_id / grouping()
  /** GROUPING SETS with `grouping()` / `grouping_id()` — the functions
    * that disambiguate "NULL because rolled up" from "NULL in the data",
    * which a consumer of multi-level aggregates needs (the coalesce trick
    * in `grouping_sets` only works when the data itself is NULL-free).
    * Spark returns grouping() as TINYINT and grouping_id() as BIGINT;
    * both hash as integer-kind alongside DuckDB's INT64. */
  def groupingIdSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag AS rf, l_linestatus AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rf NULLS FIRST, ls NULLS FIRST""".stripMargin)
  }

  val groupingIdSetsSql: String =
    """SELECT l_returnflag AS rf, l_linestatus AS ls,
      |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
      |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
      |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, rf NULLS FIRST, ls NULLS FIRST""".stripMargin

  // ------------------------------------------------------- map-key explode
  /** Explode the keys of a JSON-object column into rows and profile key
    * usage — the schema-discovery scan every semi-structured pipeline runs
    * before promoting JSON fields to real columns. Map parse + explode are
    * per-row (no shuffle before the final count). */
  def jsonKeyProfile(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(explode(map_keys(from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("k")

  val jsonKeyProfileSql: String =
    """SELECT k, count(*) AS n_events
      |FROM events, LATERAL (SELECT unnest(json_keys(props)) AS k) u
      |GROUP BY k ORDER BY k""".stripMargin

  // ------------------------------------------------ frame-edge window funcs
  /** first/last/nth_value with explicit full-partition frames: the
    * "compare each order to the customer's first / latest / second order"
    * enrichment. Default frames truncate at CURRENT ROW (last_value would
    * be the row itself) — the explicit ROWS UNBOUNDED..UNBOUNDED frame is
    * the correctness-critical detail this query pins. */
  def windowEdges(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey)  OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  val windowEdgesSql: String =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_ok,
      |  last_value(o_orderkey)  OVER w AS last_ok,
      |  nth_value(o_orderkey, 2) OVER w AS second_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ------------------------------------------------- CDC latest-state view
  /** Changelog compaction: collapse an event stream to the latest state
    * per key — the batch form of a CDC upsert/MERGE (no table format
    * needed: the "merge" is a rank-1 window over the change log). One
    * shuffle on the key; at scale this is the nightly compaction of an
    * append-only log into a snapshot. Order key floors ts to seconds with
    * an event_id tie-break so both engines (nanosecond vs microsecond
    * timestamp precision) rank identically. */
  def cdcLatestState(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_timestamp(col("ts")).desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        unix_timestamp(col("ts")).as("last_ts_sec"),
        col("event_type").as("last_type"))
      .orderBy("user_id")
  }

  val cdcLatestStateSql: String =
    """SELECT user_id, event_id AS last_event_id,
      |       CAST(floor(epoch(ts)) AS BIGINT) AS last_ts_sec,
      |       event_type AS last_type
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_distribution" -> (windowDistribution _),
    "unpivot_stack"       -> (unpivotMetrics _),
    "generator_outer"     -> (generatorOuter _),
    "scalar_str_to_map"   -> (strToMap _),
    "cdc_latest_state"    -> (cdcLatestState _),
    "grouping_id_sets"    -> (groupingIdSets _),
    "json_key_profile"    -> (jsonKeyProfile _),
    "window_edges"        -> (windowEdges _)
  )

  def oracles: Map[String, String] = Map(
    "window_distribution" -> windowDistributionSql,
    "unpivot_stack"       -> unpivotMetricsSql,
    "generator_outer"     -> generatorOuterSql,
    "scalar_str_to_map"   -> strToMapSql,
    "cdc_latest_state"    -> cdcLatestStateSql,
    "grouping_id_sets"    -> groupingIdSetsSql,
    "json_key_profile"    -> jsonKeyProfileSql,
    "window_edges"        -> windowEdgesSql
  )
}
