package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage beyond the driver's parquet tables: CSV, JSON and
  * ORC round-trips with explicit schemas, plus a partitioned-layout write —
  * the reference has no file I/O at all (SURVEY.md §2b "scans/sources/
  * sinks: ABSENT"), so this is rebuild-added surface.
  *
  * Round-trip queries are self-contained: write to a deterministic temp
  * dir (overwrite mode keeps reruns idempotent), read back with a declared
  * schema (never schema inference in production paths — inference is a
  * full extra scan at 100 TB), and aggregate. The oracle checks the
  * aggregate against the ORIGINAL parquet — so the round trip must be
  * lossless to pass.
  *
  * The CSV write is `partitionBy(lang)` — the same directory-partitioning
  * a 100 TB corpus uses for partition pruning (a `lang = 'en'` filter then
  * reads 1/5 of the files; PlanSpec-style pruning applies to the read
  * path). */
object SourcesSinks {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_io/$name"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** CSV round-trip, partitioned by lang: parquet → csv(partitionBy lang,
    * header) → read with explicit schema → per-lang aggregate. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("docs_csv")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
      .write.mode("overwrite").partitionBy("lang").option("header", "true").csv(out)
    s.read.schema(docSchema.add(StructField("lang", StringType)))
      .option("header", "true").csv(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
           countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  val csvRoundtripSql: String =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** JSON-lines round-trip: events (with a nested struct) → json → read
    * with explicit schema → aggregate. Exercises struct serialization and
    * the json reader's timestamp handling. */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("events_json")
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
              struct(col("user_id"), unix_timestamp(col("ts")).as("sec")).as("who"))
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("who", StructType(Seq(
        StructField("user_id", LongType), StructField("sec", LongType))))))
    s.read.schema(schema).json(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
           countDistinct(col("who.user_id")).as("n_users"),
           min(col("who.sec")).as("first_sec"))
      .orderBy("event_type")
  }

  val jsonRoundtripSql: String =
    """SELECT event_type, count(*) AS cnt,
      |       count(DISTINCT user_id) AS n_users,
      |       min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_sec
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hive-partitioned parquet round-trip read with a PARTITION filter:
    * the write lays out `lang=<v>/` directories, the read's `lang = 'en'`
    * predicate prunes at the DIRECTORY level (PartitionFilters in the
    * scan, asserted by PlanSpec) — at 100 TB the difference between
    * listing one partition and scanning the corpus. Non-partition
    * predicates on the same read still push down as data filters. */
  def partitionedParquetRead(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("docs_parquet_part")
    Tables.documents(s, dir)
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    s.read.parquet(out)
      .filter(col("lang") === "en" && col("n_chars") > 100)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("source")
  }

  val partitionedParquetReadSql: String =
    """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE lang = 'en' AND n_chars > 100
      |GROUP BY source ORDER BY source""".stripMargin

  /** ORC round-trip: orders → orc → read with explicit schema, a pushed
    * predicate, and a money aggregate. ORC is the second columnar format
    * Spark ships natively (row-group statistics + predicate pushdown like
    * parquet, different ecosystem); the filter lands in the ORC reader's
    * PushedFilters exactly as with parquet, so the round trip demonstrates
    * the format swap is one `.format` change, not a topology change. */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("orders_orc")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").orc(out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType), StructField("o_orderpriority", StringType)))
    s.read.schema(schema).orc(out)
      .filter(col("o_totalprice") > 1000.0)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  val orcRoundtripSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_totalprice > 1000.0
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** XML round-trip over the Spark 4 BUILT-IN xml data source (the
    * spark-xml package folded into core): write suppliers as
    * <supplier> row elements, read back with an explicit schema (never
    * inference — a schema scan is a full extra pass at scale), and
    * aggregate. Like every io_* query the oracle recomputes from the
    * source table, so the round-trip itself is what is being checked;
    * money stays decimal until one terminal double cast. */
  def xmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("supplier_xml")
    Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      .write.mode("overwrite").option("rowTag", "supplier").xml(out)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_nationkey", LongType),
      StructField("s_acctbal", DoubleType)))
    s.read.schema(schema).option("rowTag", "supplier").xml(out)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("s_nationkey")
  }

  val xmlRoundtripSql: String =
    """SELECT s_nationkey, count(*) AS n_supp,
      |       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io_csv_roundtrip"  -> (csvRoundtrip _),
    "io_json_roundtrip" -> (jsonRoundtrip _),
    "io_orc_roundtrip"  -> (orcRoundtrip _),
    "io_xml_roundtrip"  -> (xmlRoundtrip _),
    "io_partition_pruned" -> (partitionedParquetRead _)
  )

  def oracles: Map[String, String] = Map(
    "io_csv_roundtrip"  -> csvRoundtripSql,
    "io_json_roundtrip" -> jsonRoundtripSql,
    "io_orc_roundtrip"  -> orcRoundtripSql,
    "io_xml_roundtrip"  -> xmlRoundtripSql,
    "io_partition_pruned" -> partitionedParquetReadSql
  )
}
