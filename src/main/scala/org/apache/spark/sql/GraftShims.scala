package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression converters — the supported
  * way to hand a custom Catalyst `Expression` to the public DataFrame API
  * without registering a FunctionBuilder. Lives in the spark.sql package
  * solely for access; no Spark internals are modified. */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom logical plan (e.g. `graft.plans.AsOfJoin`) as a
    * DataFrame — the same `Dataset.ofRows` every DataFrame method uses,
    * reachable only from the spark.sql package. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Unpersist the RDD backing a `localCheckpoint()`ed Dataset. Iterative
    * algorithms (e.g. connected components) checkpoint each round to
    * truncate lineage; `Dataset.unpersist` only consults the SQL cache
    * manager and silently misses RDD-level checkpoint blocks, which would
    * otherwise accumulate one snapshot per round until a GC lets the
    * ContextCleaner reclaim them. Matching on the analyzed `LogicalRDD` is
    * `private[sql]` access — hence this shim's package. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    // collectFirst, not a top-level match: narrow transforms over the
    // checkpoint (a .drop() adds a Project above the LogicalRDD) must
    // still find the backing RDD, else the call silently no-ops and the
    // snapshots accumulate after all
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
    }.getOrElse(())

  /** Replace a `localCheckpoint()`ed Dataset's CARRIED statistics with
    * measured ones. `Dataset.localCheckpoint` copies the pre-checkpoint
    * plan's size ESTIMATE into the `LogicalRDD` as `originStats` — and the
    * size-only estimator scores a join as the PRODUCT of its children's
    * sizes. In a fixpoint loop whose round plan references the previous
    * snapshot k ≥ 2 times through joins, the carried estimate's BIT LENGTH
    * therefore multiplies by ~k every round: the driver spends
    * exponentially growing wall-clock in BigInteger arithmetic during
    * planning (measured in the round-13 sf1 scale rehearsal: connected
    * components rounds 0.5 s → 33 s, doubling per round with `changed` in
    * single digits) and finally dies with "BigInteger would overflow
    * supported range" inside `SizeInBytesOnlyStatsPlanVisitor`. Lineage
    * truncation alone does NOT truncate statistics lineage — this does:
    * the snapshot is re-wrapped with `Statistics(rowCount × rowBytes)`
    * from a real count, which also hands the planner an honest broadcast
    * decision instead of an astronomically inflated one. */
  def repinStats(df: Dataset[_], rowCount: Long, rowBytes: Long): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = BigInt(rowCount.max(1L)) * BigInt(rowBytes.max(1L)),
          rowCount = Some(BigInt(rowCount.max(0L))))
        classic.Dataset.ofRows(spark,
          new org.apache.spark.sql.execution.LogicalRDD(
            r.output, r.rdd, r.outputPartitioning, r.outputOrdering,
            r.isStreaming, r.stream)(spark, Some(stats), None))
      case _ => df.toDF()
    }
  }
}
