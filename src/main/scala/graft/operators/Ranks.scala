package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed global row-numbering.
  *
  * `row_number().over(Window.orderBy(...))` with no `partitionBy` is a
  * correctness-preserving scale-killer: WindowExec moves EVERY row into a
  * single partition (Spark itself warns "No Partition Defined for Window
  * operation"), so a corpus-sized global rank runs on one task no matter
  * how many executors exist. The classic distributed shape is a
  * range-partitioned `orderBy` (Spark's sort is already global and
  * parallel) followed by `zipWithIndex`, which assigns contiguous indexes
  * from per-partition offsets.
  *
  * Result is IDENTICAL to the window formulation whenever the sort order
  * is total (callers pass a deterministic tiebreak column), so
  * oracle-hashed queries can swap freely.
  */
object Ranks {

  // every persisted sort, so long-lived sessions can reclaim the blocks
  // deterministically via [[releaseAll]] instead of waiting for driver GC
  // + ContextCleaner (repeat callers — vocabEncode, qualitySignalAgreement
  // — would otherwise accumulate corpus-sized storage within a session)
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[Row]]

  /** `df` with an `out` column = 1-based global row number under
    * `sortCols` (which must define a total order for determinism). */
  def globalRowNumber(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    // fail at the mistake site: schema.add would happily produce a
    // duplicate-name schema that only errors much later as an ambiguous
    // reference downstream
    require(!df.columns.contains(out),
      s"output column '$out' already exists in (${df.columns.mkString(", ")})")
    // zipWithIndex's partition-size job fully CONSUMES each sorted
    // partition — i.e. it runs the complete post-shuffle sort. Persist the
    // sorted rows so that first pass materializes the sort once and both
    // the size job and every downstream action reuse it; without this,
    // each action on the result re-sorts the corpus.
    val sorted = df.orderBy(sortCols: _*).rdd.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(sorted)
    val schema = df.schema.add(out, LongType, nullable = false)
    val rdd = sorted.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Unpersist every sort this object has persisted. Call between
    * queries (the harness loops do) or after the consumers of a returned
    * frame have run — a released frame still WORKS if re-executed, it
    * just re-sorts. Non-blocking: block removal proceeds async. */
  def releaseAll(): Unit = {
    var r = live.poll()
    while (r != null) { r.unpersist(blocking = false); r = live.poll() }
  }
}
