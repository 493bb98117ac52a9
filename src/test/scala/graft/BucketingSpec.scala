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

  test("as-of join over co-bucketed pre-sorted tables plans zero exchanges and zero sorts") {
    val dir = sf0001
    val (purchases, clicks) = graft.operators.TimeWindows.purchasesAndClicks(spark, dir)

    // one file per bucket (repartition by the bucket column with numBuckets
    // tasks — repartition and bucketBy share the Murmur3 hash, so each task
    // holds exactly one bucket) or the scan cannot declare sorted output
    purchases.repartition(4, col("user_id")).write.mode("overwrite")
      .bucketBy(4, "user_id").sortBy("user_id", "sec")
      .saveAsTable("purchases_bkt")
    clicks.repartition(4, col("click_user")).write.mode("overwrite")
      .bucketBy(4, "click_user").sortBy("click_user", "click_sec", "click_id")
      .saveAsTable("clicks_bkt")

    // since 3.0 Spark only propagates bucket sort order under this conf
    // (SPARK-28595: with >1 file per bucket the old behavior silently
    // produced wrong plans, so it now defaults off; we wrote exactly one
    // file per bucket, where it is sound)
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prevOrdering = spark.conf.get(orderingConf)
    try {
      spark.conf.set(orderingConf, "true")
      val joined = graft.plans.AsOf.joinBackward(
        spark.table("purchases_bkt"), spark.table("clicks_bkt"),
        leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), plan.take(600))
      // the entire point of the custom operator's declared distribution/
      // ordering requirements: a layout that already satisfies them joins
      // with NO exchange and NO sort — the 100 TB co-location path
      assert(!plan.contains("Exchange"),
        s"bucketed as-of must not shuffle either side:\n${plan.take(1000)}")
      assert(!"(?m)^\\s*(?:[+:|\\- ]*)\\*?\\(?\\d*\\)? ?Sort ".r.findFirstIn(plan).isDefined,
        s"pre-sorted buckets must not re-sort:\n${plan.take(1000)}")
      // and it computes the same rows as the shuffle-planned form
      val direct = graft.plans.AsOf.joinBackward(
        purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"))
      assert(joined.count() === direct.count())
      assert(joined.exceptAll(direct).isEmpty && direct.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set(orderingConf, prevOrdering)
      spark.sql("DROP TABLE IF EXISTS purchases_bkt")
      spark.sql("DROP TABLE IF EXISTS clicks_bkt")
    }
  }
}
