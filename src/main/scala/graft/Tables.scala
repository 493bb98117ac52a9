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
  /** Loader memo, keyed by (session, logical key). Every
    * `spark.read.parquet` fires a small driver job for footer/schema
    * inference and every `fanOut` pays a physical planning pass for its
    * partition probe — per CALL. A 169-query bench touches loaders
    * thousands of times, so the repeated per-call cost is real money for
    * zero information: the harness tables are immutable for the life of a
    * session. DataFrames are immutable plans, safe to share. Keyed by
    * session so tests/Verify/Bench (separate sessions with different
    * confs) never cross-contaminate. */
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def memo(s: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
    // NOT computeIfAbsent: loader memos NEST (documents → table), and a
    // nested computeIfAbsent on the same map throws "Recursive update"
    // when both keys land in one bin. get/putIfAbsent tolerates nesting;
    // a racing duplicate build is harmless (immutable plans, one wins).
    val k = (s, key)
    val existing = frames.get(k)
    if (existing != null) existing
    else {
      val v = mk
      val prev = frames.putIfAbsent(k, v)
      if (prev != null) prev else v
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    memo(spark, s"raw:$dir/$name")(spark.read.parquet(s"$dir/$name.parquet"))

  /** Exact row count from parquet FOOTER metadata, read driver-side via
    * parquet-hadoop — schedules NO Spark job at all (vs `df.count()`,
    * whose metadata-only plan still runs a job per call). Query builders
    * use this for size guards (broadcast hints, exact-baseline tripwires)
    * so that BUILDING a query never fires an action — the engine-idiomatic
    * contract is one action per query. Cached per path: the harness tables
    * are immutable, so the footer sum never changes for a given path. */
  private val footerCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
  def footerRowCount(spark: SparkSession, dir: String, name: String): Long =
    footerCounts.computeIfAbsent(s"$dir/$name.parquet",
      path => footerSum(spark, path)).longValue()

  /** [[footerRowCount]] for an arbitrary parquet path — used by the
    * standing-index guards, whose tables MUTATE under appends/compaction,
    * so this form is deliberately UNCACHED (still zero Spark jobs; a
    * driver-side footer walk over tens of files is milliseconds). */
  def footerRowCountAt(spark: SparkSession, path: String): Long =
    footerSum(spark, path)

  private def footerSum(spark: SparkSession, path: String): Long = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(st => st.isFile &&
          st.getPath.getName.endsWith(".parquet"))
      else Array(fs.getFileStatus(p))
    files.map { st =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(st.getPath, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Parquet splits at row-group granularity, and each harness file is a
    * SINGLE row group — so every scan starts as one task and all narrow
    * compute above it (tokenizing, hashing, JSON parsing of up to 600 k
    * rows) runs on one core until the first shuffle; under host contention
    * that lone task stalls the whole query. No scan config can split below
    * a row group, so fact tables fan out through one cheap repartition —
    * but only when the scan actually under-parallelizes: at corpus scale
    * the file count far exceeds the core count, the guard never fires, and
    * no full-data shuffle is introduced (and a well-split scan is never
    * accidentally coalesced). Dimension tables stay on their natural
    * partitioning so broadcast-join paths remain shuffle-free. Safe under
    * the oracle: hash-checked queries already prove order-insensitivity
    * (DuckDB computes in a completely different order). */
  private def fanOut(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Normalize `events.ts` to TimestampType regardless of how the driver
    * encoded it — the testdata has been regenerated with different physical
    * types across rounds, so the loader pins all three encodings:
    *
    *   - parquet TIMESTAMP(NANOS): Spark cannot read nanos as a timestamp;
    *     sessions set `spark.sql.legacy.parquet.nanosAsLong=true` (see
    *     Verify/Bench/specs) so it arrives as nanos-since-epoch LongType,
    *     converted here at microsecond precision (all queries use ≥second
    *     granularity, so truncation is immaterial; the DuckDB oracle floors
    *     to seconds the same way);
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType:
    *     cast to TimestampType — lossless because every session here runs
    *     with `spark.sql.session.timeZone=UTC`, so the wall-clock reading of
    *     the NTZ value IS its UTC instant (and watermarks/windows require
    *     TimestampType, they reject NTZ);
    *   - already TimestampType: pass through.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros((col(colName) / 1000L).cast("long")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }

  private def eventsWithTs(df: DataFrame): DataFrame = normalizeTs(df)

  /** Normalize `embeddings.embedding` to `array<float>` — the declared
    * vector type every similarity operator computes in. Parquet writers
    * routinely flip between `list<float>` and `list<double>` (and the
    * driver has already regenerated tables with changed physical types
    * once — see [[normalizeTs]]); a silent `array<double>` would fail
    * every ANN query at analysis. The float→double precision question is
    * moot here: vectors are MODEL OUTPUT, fp32 at the source; a double
    * encoding carries no extra information, so the down-cast is the
    * identity on real data. Unknown element types fail loudly at the
    * loader with the actual schema, not deep inside a query. */
  def normalizeEmbedding(df: DataFrame, colName: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(DoubleType, n) =>
        df.withColumn(colName, col(colName).cast(ArrayType(FloatType, n)))
      case other => throw new IllegalArgumentException(
        s"embeddings.$colName must be array<float> or array<double>, got " +
          s"${other.sql} — the table schema drifted; extend Tables.normalizeEmbedding")
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    =
    memo(s, s"fan:$d/orders")(fanOut(s, table(s, d, "orders")))
  def lineitem(s: SparkSession, d: String): DataFrame  =
    memo(s, s"fan:$d/lineitem")(fanOut(s, table(s, d, "lineitem")))
  def events(s: SparkSession, d: String): DataFrame    =
    memo(s, s"fan:$d/events")(eventsWithTs(fanOut(s, table(s, d, "events"))))
  def documents(s: SparkSession, d: String): DataFrame =
    memo(s, s"fan:$d/documents")(fanOut(s, table(s, d, "documents")))
  def embeddings(s: SparkSession, d: String): DataFrame =
    memo(s, s"fan:$d/embeddings")(normalizeEmbedding(fanOut(s, table(s, d, "embeddings"))))

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
    val loaders: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "region" -> (region _), "nation" -> (nation _), "customer" -> (customer _),
      "supplier" -> (supplier _), "part" -> (part _), "orders" -> (orders _),
      "lineitem" -> (lineitem _), "documents" -> (documents _),
      "embeddings" -> (embeddings _), "events" -> (events _))
    loaders.foreach { case (n, f) => f(s, d).createOrReplaceTempView(n) }
  }
}
