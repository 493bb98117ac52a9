package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout maintenance — the table-upkeep jobs a 100 TB lake
  * schedules nightly (reference analogue: ABSENT; extension scope like
  * SURVEY.md §2c). Spec-gated (LayoutSpec): these produce directories,
  * not result tables, so the DuckDB oracle does not apply; the specs
  * assert the invariants that matter — content equality, file counts,
  * per-file key-range disjointness.
  */
object Layout {

  /** Small-file compaction: rewrite a directory into ≈`targetFileMB`
    * files. Small files are the classic lake pathology — every file costs
    * a scheduler task, an open, and a footer parse, so 10⁶ × 1 MB files
    * make scans scheduler-bound long before they are IO-bound. The
    * partition count derives from the optimizer's size estimate (at real
    * scale: sum of file sizes from the catalog/listing), never a fixed
    * number that silently stops fitting as the table grows. Returns the
    * chosen file count. */
  def compact(s: SparkSession, inDir: String, outDir: String,
              targetFileMB: Int = 128): Int = {
    val df = s.read.parquet(inDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // clamp the BigInt before converting: a missing-stats estimate
    // (sizeInBytes = Long.MaxValue) must hit the Int ceiling, not wrap
    // through the low 32 bits to 0 and compact everything into one file
    val n = (bytes / (targetFileMB.toLong * 1024 * 1024))
      .min(BigInt(Int.MaxValue)).toInt.max(1)
    df.repartition(n).write.mode("overwrite").parquet(outDir)
    n
  }

  /** Range-partitioned, sorted-within-file layout: `repartitionByRange`
    * on the key then `sortWithinPartitions` — every output file covers a
    * DISJOINT key range, so parquet min/max footer stats prune whole
    * files for key predicates and range scans touch exactly the files
    * they must. This is the poor-engine's clustering index (single-key
    * Z-order degenerates to exactly this); the sampled range boundaries
    * come from Spark's RangePartitioner, so skewed keys still yield
    * balanced files. */
  def rangeLayout(df: DataFrame, outDir: String, keyCol: String,
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(outDir)

  /** Morton (Z-order) interleave of two `bits`-bit non-negative keys —
    * bit i of x lands at position 2i, bit i of y at 2i+1. Pure integer
    * Catalyst arithmetic (shift/and/multiply), so it stays inside
    * whole-stage codegen; 2·bits ≤ 62 keeps the result in a BIGINT. */
  def morton(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same interleave as ANSI SQL (for the DuckDB oracle). */
  def mortonSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Multi-dimensional clustering: sort by the Morton code of two keys so
    * each output file covers a SMALL RECTANGLE of (k1, k2) space instead
    * of a thin full-width stripe — parquet min/max footer stats then
    * prune files for predicates on EITHER dimension, where a single-key
    * sort only ever prunes its own key (second-key spread per file stays
    * full-range). This is the Z-order clustering every lakehouse ships;
    * space-filling-curve locality is the entire mechanism. Keys must be
    * bounded non-negative ints (callers bucket/bias first — here modulo,
    * at scale typically a rank or epoch-day transform). */
  def zOrderLayout(df: DataFrame, outDir: String, k1: String, k2: String,
                   bits: Int, numFiles: Int): Unit =
    df.withColumn("_z", morton(col(k1), col(k2), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)

  /** Oracle-checked probe of the Morton math itself: z-codes of
    * (l_partkey mod 256, l_suppkey mod 256) summarized per 256-wide
    * z-bucket. A wrong shift, bit order, or sign anywhere moves rows
    * across buckets and breaks the hash compare. */
  def zorderCells(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(pmod(col("l_partkey"), lit(256)).cast("long").as("x"),
              pmod(col("l_suppkey"), lit(256)).cast("long").as("y"))
    li.withColumn("z", morton(col("x"), col("y")))
      .groupBy((col("z") / 256).cast("long").as("z_bucket"))
      .agg(count(lit(1)).as("n"), min(col("z")).as("z_min"),
           max(col("z")).as("z_max"))
      .orderBy("z_bucket")
  }

  val zorderCellsSql: String = {
    val z = mortonSql("(l_partkey % 256)", "(l_suppkey % 256)")
    s"""WITH coded AS (
       |  SELECT ($z) AS z FROM lineitem
       |)
       |SELECT CAST(floor(z / 256) AS BIGINT) AS z_bucket,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max
       |FROM coded GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Hilbert-curve index of a `bits`-bit (x, y) cell — the locality
    * upgrade over [[morton]]: consecutive Hilbert indices are ALWAYS
    * Manhattan-adjacent cells (spec-pinned), where the Z-curve jumps
    * across the plane at every power-of-two boundary, so Hilbert-sorted
    * files have strictly tighter per-file bounding boxes (the reason
    * lakehouses that offer both default to Hilbert for multi-dim
    * clustering). Classic xy2d (the quadrant rotate/reflect recurrence):
    * each level contributes s² times the quadrant ordinal (3·rx XOR ry),
    * then rotates the frame. The recurrence is expressed as an
    * `aggregate` higher-order fold over `sequence(bits−1, 0)` with a
    * struct(x, y, d) accumulator — NOT unrolled into nested column
    * expressions: each level's x/y reference the previous level's twice,
    * so unrolling grows the expression tree ~4× per level (measured: a
    * 104 MiB task binary at bits = 8). The fold keeps the plan constant-
    * size and the iteration runs inside codegen per row. */
  def hilbert(xc: Column, yc: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val n1 = lit((1L << bits) - 1) // n−1, all-ones: reflection = bit-flip, no borrows
    aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      struct(xc.cast("long").as("x"), yc.cast("long").as("y"), lit(0L).as("d")),
      (acc, i) => {
        val x = acc.getField("x"); val y = acc.getField("y")
        val rx = call_function("shiftright", x, i).bitwiseAND(lit(1L))
        val ry = call_function("shiftright", y, i).bitwiseAND(lit(1L))
        val s2 = call_function("shiftleft", lit(1L), i * lit(2)) // s² = 1 << 2i
        val nd = acc.getField("d") + s2 * (lit(3L) * rx).bitwiseXOR(ry)
        val nx = when(ry === 0, when(rx === 1, n1 - y).otherwise(y)).otherwise(x)
        val ny = when(ry === 0, when(rx === 1, n1 - x).otherwise(x)).otherwise(y)
        struct(nx.as("x"), ny.as("y"), nd.as("d"))
      },
      acc => acc.getField("d"))
  }

  /** The same recurrence as ANSI SQL: one chained CTE per level carrying
    * (x, y, d) — generated from the SAME loop bounds as [[hilbert]], so
    * the two engines cannot drift. `from` must provide columns x, y. */
  def hilbertCtes(from: String, bits: Int = 8): String = {
    val n1 = (1L << bits) - 1
    val steps = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, step) =>
      val s = 1L << i
      val prev = if (step == 0) from else s"h$step"
      s"""h${step + 1} AS (
         |  SELECT
         |    CASE WHEN ((y >> $i) & 1) = 0
         |         THEN CASE WHEN ((x >> $i) & 1) = 1 THEN $n1 - y ELSE y END
         |         ELSE x END AS x,
         |    CASE WHEN ((y >> $i) & 1) = 0
         |         THEN CASE WHEN ((x >> $i) & 1) = 1 THEN $n1 - x ELSE x END
         |         ELSE y END AS y,
         |    d + ${s * s} * xor(3 * ((x >> $i) & 1), (y >> $i) & 1) AS d
         |  FROM $prev
         |)""".stripMargin
    }
    steps.mkString(",\n")
  }

  /** Oracle-checked probe of the Hilbert math — [[zorderCells]]'s twin
    * over the same (l_partkey, l_suppkey) cells: per-256-wide curve
    * bucket occupancy and index range. One mis-rotated quadrant at any
    * of the 8 levels moves rows across buckets and breaks the hash. */
  def hilbertCells(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(pmod(col("l_partkey"), lit(256)).cast("long").as("x"),
              pmod(col("l_suppkey"), lit(256)).cast("long").as("y"))
    li.withColumn("h", hilbert(col("x"), col("y")))
      .groupBy((col("h") / 256).cast("long").as("h_bucket"))
      .agg(count(lit(1)).as("n"), min(col("h")).as("h_min"),
           max(col("h")).as("h_max"))
      .orderBy("h_bucket")
  }

  val hilbertCellsSql: String =
    s"""WITH h0 AS (
       |  SELECT CAST(l_partkey % 256 AS BIGINT) AS x,
       |         CAST(l_suppkey % 256 AS BIGINT) AS y,
       |         CAST(0 AS BIGINT) AS d
       |  FROM lineitem
       |),
       |${hilbertCtes("h0")}
       |SELECT CAST(floor(d / 256) AS BIGINT) AS h_bucket,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(min(d) AS BIGINT) AS h_min, CAST(max(d) AS BIGINT) AS h_max
       |FROM h8 GROUP BY 1 ORDER BY 1""".stripMargin

  /** Hilbert-clustered layout — [[zOrderLayout]] with the better curve. */
  def hilbertLayout(df: DataFrame, outDir: String, k1: String, k2: String,
                    bits: Int, numFiles: Int): Unit =
    df.withColumn("_h", hilbert(col(k1), col(k2), bits))
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
      .write.mode("overwrite").parquet(outDir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_cells" -> (zorderCells _),
    "hilbert_cells" -> (hilbertCells _))

  val oracles: Map[String, String] = Map(
    "zorder_cells" -> zorderCellsSql,
    "hilbert_cells" -> hilbertCellsSql)
}
