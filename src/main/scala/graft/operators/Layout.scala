package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
