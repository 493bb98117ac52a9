package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled table layout so co-keyed joins need no exchange
  * at read time — the canonical 100 TB fact⋈fact strategy (SCALE.md §joins).
  * Verified on the actual physical plan: the bucketed join must contain NO
  * shuffle exchange on the bucketed keys. */
class BucketingSpec extends GraftSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val dir = sf0001 // warehouse dir is set (static conf) in SparkFixture

    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity").write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")

    // disable broadcast so the join would otherwise be a shuffle join
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      // the only exchange allowed is the final groupBy's; the join inputs
      // must read pre-bucketed (no Exchange below the join)
      val joinIdx = plan.indexOf("SortMergeJoin")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
             !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not re-shuffle its inputs:\n${belowJoin.take(800)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
