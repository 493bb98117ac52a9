package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see /root/repo/FIXTURES.md).
  *
  * Parquet footers are the source of truth for schemas; Catalyst gets full
  * pushdown/pruning on these scans. At 100 TB these would be partitioned
  * tables (e.g. orders/lineitem by date) — the loaders centralize that
  * concern so query code never hardcodes paths.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read as a
    * timestamp; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see Verify/Bench/specs) so it arrives as nanos-since-epoch LongType,
    * and this loader converts to TimestampType at microsecond precision
    * (all queries use ≥second granularity, so truncation is immaterial;
    * the DuckDB oracle floors to seconds the same way). */
  private def eventsWithTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsWithTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Expected column names per table (SURVEY.md §1: fixed schemas declared
    * in code; the parquet footer is the source of truth, this asserts we
    * agree with it). Used by TablesSpec as a drift tripwire. */
  val expectedColumns: Map[String, Seq[String]] = Map(
    "region"   -> Seq("r_regionkey", "r_name"),
    "nation"   -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"     -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"   -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                      "l_linestatus", "l_shipdate"),
    "events"   -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Register all tables as temp views so queries can use spark.sql(...)
    * (grouping sets, lateral, etc.) with the same names the DuckDB oracle
    * uses. */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(n => table(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }
}
