package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global row-numbering.
  *
  * `row_number().over(Window.orderBy(...))` with no `partitionBy` is a
  * correctness-preserving scale-killer: WindowExec moves EVERY row into a
  * single partition (Spark itself warns "No Partition Defined for Window
  * operation"), so a corpus-sized global rank runs on one task no matter
  * how many executors exist. The classic distributed shape is a
  * range-partitioned `orderBy` (Spark's sort is already global and
  * parallel) followed by `zipWithIndex`, which assigns contiguous indexes
  * from per-partition offsets — one extra tiny job to count partition
  * sizes, and every partition numbers its rows independently.
  *
  * Result is IDENTICAL to the window formulation whenever the sort order
  * is total (callers pass a deterministic tiebreak column), so
  * oracle-hashed queries can swap freely.
  */
object Ranks {

  /** `df` with an `out` column = 1-based global row number under
    * `sortCols` (which must define a total order for determinism). */
  def globalRowNumber(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
