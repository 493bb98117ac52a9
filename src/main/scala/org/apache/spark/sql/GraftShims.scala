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
}
