package graft

import graft.operators.{Reference, Relational, Similarity, SourcesSinks}

/** Plan-shape regression tests: the scale properties SURVEY.md §4 commits
  * to (filter pushdown, column pruning, broadcast dimension joins, fused
  * top-k) asserted on the actual physical plans, so a refactor that
  * silently loses one fails CI, not the 100 TB run. */
class PlanSpec extends GraftSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("language filter is pushed down to the parquet scan") {
    val plan = planOf(Reference.filterEnglishDocs(spark, sf0001))
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("EqualTo(lang,en)"), "filter must reach the scan")
  }

  test("column pruning: the projection-only query reads just its columns") {
    val plan = planOf(Reference.filterEnglishDocs(spark, sf0001))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"text column must be pruned from the scan: $readSchema")
  }

  test("star join broadcasts every dimension side") {
    val plan = planOf(Relational.regionalRevenue(spark, sf0001))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
  }

  test("top-k compiles to TakeOrderedAndProject (no full global sort)") {
    val plan = planOf(Reference.topTokens(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("heap top-k plan carries partial aggregation (map-side combine)") {
    val plan = planOf(Similarity.heapTopK(spark, sf0001))
    assert(plan.contains("top_k_by_score"), plan.take(800))
    // ObjectHashAggregate partial + final split around the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan.take(800))
  }

  test("orc read pushes the price predicate to the reader") {
    val plan = planOf(SourcesSinks.orcRoundtrip(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,1000.0)]"),
      plan.take(1200))
  }

  test("hive-partitioned read prunes partitions at the directory level") {
    val plan = planOf(
      SourcesSinks.partitionedParquetRead(spark, sf0001))
    // the lang predicate must land in PartitionFilters (directory pruning),
    // the n_chars predicate in PushedFilters (row-group/data pruning)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(1200))
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      plan.take(1200))
  }

  test("LATERAL join decorrelates to a window + join, never a per-row loop") {
    val plan = planOf(graft.operators.Modern.lateralTopSpender(spark, sf0001))
    // Catalyst must rewrite the correlated LIMIT-1 subquery into a ranked
    // window joined back — the O(n) plan; a nested/cartesian loop would be
    // the O(nations × customers) reading that dies at scale
    assert(plan.contains("Window"), plan.take(1200))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(1200))
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // the 100 TB join-pruning story: a selective dimension filter becomes a
    // bloom filter evaluated on the fact scan BEFORE the shuffle, so
    // non-matching fact rows never cross the network. Thresholds are sized
    // for multi-GB inputs in prod; lower them so the rule fires on harness
    // data, force a shuffle join (broadcast joins don't need the filter).
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.col
      // raw scans, not Tables.*: the harness fan-out Repartition sits
      // between scan and join and defeats the rule's scan-pattern match —
      // multi-file prod scans need no fan-out, so the raw shape is the
      // representative one
      val orders = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom runtime filter injected:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bloom prefilter probe side never sort-merge-joins: both index sides broadcast") {
    val plan = planOf(graft.operators.Dedup.bloomPrefilter(spark, sf0001))
    assert(!plan.contains("SortMergeJoin"),
      "probe must join only against broadcast sides\n" + plan.take(800))
    // the 1-row bit array rides a broadcast nested loop; the digest set a
    // broadcast hash join — the probe side itself is never shuffled for a join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("SQL join hints are honored: BROADCAST and SHUFFLE_MERGE pick their operators") {
    Tables.registerAll(spark, sf0001)
    val b = spark.sql(
      """SELECT /*+ BROADCAST(nation) */ count(*)
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin)
    assert(planOf(b).contains("BroadcastHashJoin"), planOf(b).take(800))
    val m = spark.sql(
      """SELECT /*+ SHUFFLE_MERGE(nation) */ count(*)
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin)
    assert(planOf(m).contains("SortMergeJoin"), planOf(m).take(800))
  }

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    // the runtime re-plan that replaces hand-tuned partition counts: 64
    // shuffle partitions on tiny data must collapse to a handful after
    // the map stage reports sizes
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val df = Tables.orders(spark, sf0001)
        .groupBy("o_orderpriority").count()
      df.collect() // AQE finalizes on execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead coalesced"), plan.take(1200))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("startswith-after-explode injects a contains prefilter that reaches the scan") {
    import org.apache.spark.sql.functions._
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").startsWith("th"))
    // the injected necessary condition lands in the parquet scan
    val physical = planOf(df)
    assert(physical.contains("StringContains(text,th)"),
      s"implied contains must be pushed to the scan: ${physical.take(900)}")
    // and the rewrite changes no results: same rows with the rule excluded
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    val withRule = df.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    try {
      spark.conf.set(key, "graft.plans.PushStartsWithThroughExplode")
      val without = Tables.documents(spark, sf0001)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").startsWith("th"))
      assert(!planOf(without).contains("StringContains(text,th)"),
        "excludedRules must actually disable the injected rule")
      val baseline = without.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(withRule.sameElements(baseline), "rewrite must be result-invariant")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("ANALYZE TABLE feeds CBO: exact rowCount reaches the optimized plan") {
    val cbo = "spark.sql.cbo.enabled"
    val prevCbo = spark.conf.getOption(cbo)
    spark.conf.set(cbo, "true")
    try {
      spark.sql("DROP TABLE IF EXISTS nation_stats")
      Tables.nation(spark, sf0001).write.saveAsTable("nation_stats")
      // before ANALYZE: size-based estimate only, no exact row count
      val before = spark.table("nation_stats")
        .queryExecution.optimizedPlan.stats.rowCount
      spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS")
      val after = spark.table("nation_stats")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(after.contains(BigInt(25)),
        s"CBO must see the analyzed row count (before=$before, after=$after)")
      // column-level stats drive selectivity estimates
      spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS FOR COLUMNS n_regionkey")
      val filtered = spark.table("nation_stats")
        .filter(org.apache.spark.sql.functions.col("n_regionkey") === 0)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(filtered.exists(rc => rc >= 1 && rc < 25),
        s"column stats must shrink the filtered estimate below the table size: $filtered")
    } finally {
      spark.sql("DROP TABLE IF EXISTS nation_stats")
      prevCbo match {
        case Some(v) => spark.conf.set(cbo, v)
        case None    => spark.conf.unset(cbo)
      }
    }
  }

  test("shuffle budget: headline plans stay within their measured exchange counts") {
    // every groupBy/join/orderBy shuffle is network traffic at 100 TB; a
    // refactor that silently adds one should fail here, not in prod. The
    // budgets are measured EXECUTED shuffle-exchange counts at round 7
    // (pre-AQE, sf0.001, local[4] test session — deterministic for fixed
    // confs); broadcasts are deliberately NOT counted (a broadcast
    // replacing a shuffle is an improvement this spec permits). "Executed"
    // means each CACHED subtree's exchanges count ONCE no matter how many
    // times the plan references it — a diamond over a cached frame runs
    // its exchanges a single time, which a flat count of the plan STRING
    // double-bills (dedup_incremental's string count is 45 where only 17
    // distinct exchanges execute).
    val budgets = Map(
      "dedup_exact"         -> 4,  // fan-out + window hash + dedup agg + final sort
      "ref_top_tokens"      -> 2,  // partial/final agg exchange + fan-out
      "text_token_counts"   -> 2,
      "q1_pricing_summary"  -> 3,
      "q5_regional_revenue" -> 4,  // star join: dims broadcast, facts shuffle
      "ann_ivf_topk"        -> 10,
      "neardup_minhash_lsh" -> 7,  // measured 6: banding pipeline; AQE broadcasts most at runtime
      "neardup_simhash"     -> 6,  // measured 5: agg + block window + (self-join rides the cache) + distinct + sort; 13 before the round-7 window fusion
      "neardup_jaccard_prefix" -> 7, // measured 6: df agg + join-back + re-sort + verify diamond (windowed-df A/B measured slower: no downstream reuse of the s-partitioning)
      "dedup_incremental"   -> 13, // measured 12: digest join + side-tagged prefix index + exact verify + best-match window
      "asof_join_physical"  -> 5,  // custom exec: fan-out x2 + cluster x2 + final order
      "asof_join_forward_physical" -> 5, // same shape, forward merge
      "quality_gopher_rules" -> 2,  // narrow rules + presentation sort
      "mix_dsir_weights"     -> 8,  // measured 8: one conditional vocab agg + broadcast model + score agg (12 before the raw/tgt agg-join fusion)
      "neardup_threshold_sweep" -> 8, // pair join reuses the cached shingle arrays; sweep adds rollups only
      "prep_token_budget"    -> 4,  // score agg + budget broadcast + cumulative window + sort
      "pipeline_gated_set"   -> 11, // measured 11: five stages over the cached survivor set (27 uncached)
      "mm_image_neardup"     -> 5,  // cold-cache: 2 fan-out scans inside the cached hash frame + band-bucket stats + pair distinct + sort. Was 4 while entity_resolution (measured earlier alphabetically) shared the mirrored media frame and left its hash cache materialized; ER is corpus-faithful since r13, so the gate now pays its own honest cold count
      "dedup_minhash_recall" -> 7,  // two pair machineries + full-outer rollup
      "ts_anomaly_zscore"    -> 4,  // day pre-agg + window + sort
      "prep_epoch_shuffle"   -> 5,  // measured 5: one scan + generator (9 with a per-epoch union)
      // round-12 extension: the REST of the wrap-6 close (every member
      // with >= 2 executed exchanges), measured cold-cache at sf0.001
      // under the same session confs as the rows above
      "mix_dsir_resample"    -> 8,  // same model/score machinery as dsir_weights + permille decision
      "mix_waterfill_budget" -> 12, // iterative water-filling rounds over cached demand set
      "pii_k_anonymity"      -> 3,  // QI-cell agg + rollup + sort
      "corpus_diff"          -> 7,  // two version digests + full-outer + status rollup
      "text_distinct_n"      -> 6,  // three n-gram aggs over one cached token explode
      "curate_quality_dup_xtab" -> 4, // quality bins x dup flag cross-tab
      "emb_hard_negatives"   -> 7,  // scored pairs + two rank windows + join
      "mm_image_ahash"       -> 2,  // decode map + presentation sort
      "mm_content_dedup"     -> 5,  // decode map + digest agg + sort (sentinel union adds a scan, not a shuffle)
      "entity_resolution"    -> 2,  // CC fixpoint runs eagerly over localCheckpoints; final label agg + sort
      "pii_l_diversity"      -> 4,  // per-cell distinct-sensitive agg + rollup
      "quality_gopher_report" -> 2, // per-rule conditional agg + sort
      "neardup_canonical"    -> 3,  // cluster labels (cached CC) + best-ttr window + sort
      "dq_profile_lineitem"  -> 3,  // one-pass per-column profile + unpivot sort
      "text_heaps_curve"     -> 3,  // one agg, ten content-stable prefixes
      "split_leakage_audit"  -> 9)  // standing-index probe: prefix self-join + verify + two stage rollups
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def executedExchanges(root: SparkPlan): Int = {
      val seen = scala.collection.mutable.Set.empty[SparkPlan]
      // AdaptiveSparkPlanExec and InMemoryTableScanExec are LEAVES of the
      // TreeNode API — collect() stops at them, so the walk unwraps both
      // by hand (ReusedExchangeExec stays a leaf: a reused exchange runs
      // zero extra shuffles, which is the point of not counting it).
      def walk(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: InMemoryTableScanExec =>
          if (seen.add(s.relation.cachedPlan)) walk(s.relation.cachedPlan) else 0
        case e: ShuffleExchangeLike => 1 + e.children.map(walk).sum
        case other => other.children.map(walk).sum
      }
      walk(root)
    }
    // Budgets were measured against a cold cache. A MATERIALIZED cache
    // entry (e.g. DedupSpec ran minhashLsh's cached shingle arrays
    // earlier in the suite) carries real byte-size stats that flip
    // broadcast decisions and break exchange reuse, inflating the count
    // for the same code — clear it so the measurement is deterministic.
    spark.catalog.clearCache()
    // measure everything first, then assert — a single regression must not
    // hide the other queries' measurements from the report
    val measured = budgets.toSeq.sortBy(_._1).map { case (name, budget) =>
      val shuf = executedExchanges(
        SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan)
      info(s"$name: $shuf executed exchanges (budget $budget)")
      (name, shuf, budget)
    }
    val over = measured.filter { case (_, shuf, budget) => shuf > budget }
    assert(over.isEmpty, s"plans grew past their shuffle budgets: $over")
  }

  test("whole-stage codegen covers the flagship pipeline") {
    val df = Reference.topTokens(spark, sf0001)
    df.collect() // AQE finalizes (and codegens) only on execution
    val plan = planOf(df)
    // codegen'd operators carry the "*(n)" stage prefix in toString
    assert(plan.contains("*(1)"), plan.take(800))
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the engine's skew posture (SCALE.md): manual salting where AQE can't
    // see (aggregations, the custom as-of exec) and AQE's skew-join split
    // for plain sort-merge joins — this pins the latter actually engaging.
    // One hot key (~90% of the left side) with thresholds scaled down to
    // harness size; the hot partition must split into multiple tasks and
    // the result must equal the non-adaptive join.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val left = spark.range(0, 20000)
      .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
              col("id").as("payload"))
    val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("rv"))
    def joined = left.join(right.hint("SHUFFLE_MERGE"), "k")
      .agg(count(lit(1)).as("n"), sum(col("payload") + col("rv")).as("s"))
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = joined
      val rows = df.collect()
      val plan = planOf(df)
      assert(plan.contains("skew=true"),
        s"AQE skew split did not engage:\n${plan.take(1500)}")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val baseline = joined.collect()
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      assert(rows.sameElements(baseline), "skew split changed the result")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
