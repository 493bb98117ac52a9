package graft

import graft.operators.{Dedup, StandingIndex}
import org.apache.spark.sql.functions._

/** The materialized standing dedup index must be a pure execution-strategy
  * change: identical output to the per-run batch operator, with the
  * corpus-side work moved into bucketed tables built once per session. */
class StandingIndexSpec extends GraftSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("batch_id"), col("corpus_id"), col("kind"),
        round(col("jac"), 9).as("jac"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("indexed probe output equals the batch operator at sf0.001") {
    val expected = rows(Dedup.incrementalDedup(spark, sf0001))
    val actual = rows(StandingIndex.incrementalDedupIndexed(spark, sf0001))
    assert(actual == expected,
      s"indexed=${actual.take(5)} vs batch=${expected.take(5)}")
    assert(expected.nonEmpty, "harness corpus should contain duplicates")
  }

  test("indexed probe output equals the batch operator at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val expected = rows(Dedup.incrementalDedup(spark, dir))
    val actual = rows(StandingIndex.incrementalDedupIndexed(spark, dir))
    assert(actual == expected)
  }

  test("probe plan reads the index bucketed — corpus side never reshuffled") {
    StandingIndex.ensureBuilt(spark, sf0001)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force shuffle joins so a missing bucketed scan would HAVE to show
      // up as an Exchange over the index table's output columns
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = StandingIndex.incrementalDedupIndexed(spark, sf0001)
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      // every index scan must be bucketed (FileSourceScanExec advertises
      // "Bucketed: true"; a false would carry a non-bucketed-reason note)
      assert(plan.contains("Bucketed: true"), plan.take(1200))
      assert(!plan.contains("Bucketed: false"),
        plan.linesIterator.filter(_.contains("Bucketed: false")).mkString("\n"))
      // and the prefix index (the big corpus-side relation at scale) must
      // not be re-partitioned: no exchange keyed on its own columns
      assert(!plan.contains("Exchange hashpartitioning(cn"), plan.take(1200))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    }
  }
}
