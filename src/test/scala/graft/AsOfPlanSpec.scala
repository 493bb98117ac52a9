package graft

import graft.operators.TimeWindows
import graft.plans.AsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom sort-merge as-of operator (`graft.plans.AsOfJoin` →
  * `AsOfJoinExec`) — end-to-end equivalence against the window-trick twin,
  * the tie/null edge semantics, and the plan-shape properties that justify
  * its existence (SURVEY §4 ladder step c). */
class AsOfPlanSpec extends GraftSpec {

  import AsOfPlanSpec._

  private def leftDf: DataFrame = {
    import spark.implicits._
    spark.sparkContext.parallelize(Seq(
      L("a", Some(10L), 1), L("a", Some(7L), 2), L("a", Some(4L), 3),
      L("b", Some(100L), 4), L(null, Some(50L), 5), L("c", None, 6),
      L("d", Some(20L), 7)), 3).toDF()
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    spark.sparkContext.parallelize(Seq(
      R("a", Some(5L), 1, "p1"), R("a", Some(10L), 2, "p2"),
      R("a", Some(10L), 3, "p3"), R("b", None, 9, "p9"),
      R("b", Some(90L), 5, "p5"), R(null, Some(80L), 8, "p8"),
      R("e", Some(1L), 6, "p6")), 3).toDF()
  }

  private def joinToy: DataFrame =
    AsOf.joinBackward(leftDf, rightDf,
      leftKeys = Seq("k"), rightKeys = Seq("rk"),
      leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"))

  test("as-of edge semantics: non-strict ties, tiebreak, null keys/times, unmatched drop") {
    val got = joinToy.select("lid", "rid", "payload").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    // lid 1 @10: two same-second candidates (rid 2, 3) -> largest tiebreak
    // lid 2 @7: latest <= 7 is rid 1 @5
    // lid 3 @4: nothing at or before 4 -> dropped (inner)
    // lid 4 @100: null-time rid 9 never matches; rid 5 @90 wins
    // lid 5 (null key), lid 6 (null time), lid 7 (no right key) -> dropped
    assert(got === Set((1, 3, "p3"), (2, 1, "p1"), (4, 5, "p5")))
  }

  test("outer as-of: every left row kept, unmatched null-padded, matches unchanged") {
    val out = AsOf.joinBackward(leftDf, rightDf,
      leftKeys = Seq("k"), rightKeys = Seq("rk"),
      leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"),
      outer = true)
    // right-side columns must surface nullable once the operator can pad them
    assert(out.schema("rid").nullable && out.schema("payload").nullable)
    val got = out.select("lid", "rid", "payload").collect()
      .map(r => (r.getInt(0),
                 if (r.isNullAt(1)) None else Some(r.getInt(1)),
                 Option(r.getString(2)))).toSet
    // matched rows identical to the inner join; lid 3 (no candidate at/
    // before), lid 5 (null key), lid 6 (null time), lid 7 (absent key) are
    // KEPT with a null-padded right side instead of dropping
    assert(got === Set(
      (1, Some(3), Some("p3")), (2, Some(1), Some("p1")), (4, Some(5), Some("p5")),
      (3, None, None), (5, None, None), (6, None, None), (7, None, None)))
  }

  test("outer forward as-of: unmatched and null-key/time left rows kept null-padded") {
    val got = AsOf.joinForward(leftDf, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"),
        outer = true)
      .select("lid", "rid").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    // forward matches as in the inner test; lid 4 (nothing at/after 100),
    // lid 5/6/7 (null key, null time, absent key) kept null-padded
    assert(got === Set((3, Some(1)), (2, Some(2)), (1, Some(2)),
      (4, None), (5, None), (6, None), (7, None)))
  }

  test("outer as-of matches the unfiltered window twin row for row at sf0.001") {
    val win = TimeWindows.asofJoin(spark, sf0001)  // inner window twin
    val outer = TimeWindows.asofJoinOuter(spark, sf0001)
    // outer ⊇ inner: every inner row appears identically, and the extra
    // rows are exactly the purchases the inner form dropped, null-padded
    val innerRows = win.collect().map(_.toSeq).toSet
    val outerRows = outer.collect().map(_.toSeq).toSet
    val matched = outerRows.filter(r => r(2) != null)
    assert(matched === innerRows)
    assert(outerRows.size > innerRows.size, "outer must keep unmatched purchases")
    assert(outerRows.forall(r => (r(2) == null) == (r(3) == null)),
      "click_id and gap_sec must be null together on padded rows")
  }

  test("tolerance bounds the match gap; a staler row is no fallback; composes with outer") {
    // backward, tolerance 3: lid 1 @10 → rid 3 @10 (gap 0), lid 2 @7 →
    // rid 1 @5 (gap 2); lid 4 @100's only candidate is rid 5 @90 (gap 10)
    // — BEYOND the bound, and the even-older rows must not be consulted
    val strict = AsOf.joinBackward(leftDf, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"),
        tolerance = Some(3L))
      .select("lid", "rid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(strict === Set((1, 3), (2, 1)))
    // outer + tolerance: the beyond-bound row is kept, null-padded
    val outerTol = AsOf.joinBackward(leftDf, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"),
        outer = true, tolerance = Some(3L))
      .select("lid", "rid").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    assert(outerTol === Set((1, Some(3)), (2, Some(1)),
      (3, None), (4, None), (5, None), (6, None), (7, None)))
    // forward, tolerance 2: lid 2 @7's next candidate is @10 (gap 3) → out
    val fwdTol = AsOf.joinForward(leftDf, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"),
        tolerance = Some(2L))
      .select("lid", "rid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(fwdTol === Set((3, 1), (1, 2)))
    // a non-positive tolerance is a construction error, not silent inner
    val err = intercept[IllegalArgumentException] {
      AsOf.joinBackward(leftDf, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec", tolerance = Some(0L))
    }
    assert(err.getMessage.contains("positive"), err.getMessage)
  }

  test("custom as-of matches the window-trick twin row for row at sf0.001") {
    val win = TimeWindows.asofJoin(spark, sf0001).collect()
    val custom = TimeWindows.asofJoinPhysical(spark, sf0001).collect()
    assert(custom.length === win.length)
    assert(custom.sameElements(win),
      s"first divergence: ${custom.zip(win).find { case (c, w) => c != w }}")
  }

  test("as-of plan: AsOfJoin exec, one exchange per side, no Window, no extra Sort") {
    spark.catalog.clearCache()
    val plan = joinToy.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
    assert(!plan.contains("Window"), "custom operator must not fall back to a window plan")
    val shuffles = "(?m)^\\s*(?:[+:|\\- ]*)Exchange ".r.findAllIn(plan).length
    assert(shuffles === 2, s"expected exactly one shuffle per side:\n$plan")
    val sorts = "(?m)^\\s*(?:[+:|\\- ]*)\\*?\\(?\\d*\\)? ?Sort ".r.findAllIn(plan).length
    assert(sorts === 2, s"expected exactly one sort per side:\n$plan")
  }

  test("declared output ordering/partitioning: a downstream same-key window adds no shuffle or sort") {
    spark.catalog.clearCache()
    val w = Window.partitionBy(col("k")).orderBy(col("lsec"))
    val downstream = joinToy.withColumn("rn", row_number().over(w))
    val plan = downstream.queryExecution.executedPlan.toString
    val shuffles = "(?m)^\\s*(?:[+:|\\- ]*)Exchange ".r.findAllIn(plan).length
    val sorts = "(?m)^\\s*(?:[+:|\\- ]*)\\*?\\(?\\d*\\)? ?Sort ".r.findAllIn(plan).length
    // the join already clusters by k and orders by (k, lsec) within
    // partitions, so the window reuses both: still 2 exchanges, 2 sorts
    assert(shuffles === 2, s"window must reuse the join's partitioning:\n$plan")
    assert(sorts === 2, s"window must reuse the join's ordering:\n$plan")
    // and it computes the right thing on top of the preserved order
    val rn = downstream.select("lid", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(rn(2) < rn(1), "lsec=7 row must rank before lsec=10 within key a")
  }

  test("payload width carries through the operator without per-column aggregates") {
    import spark.implicits._
    // 6-column payload: the window trick would need 6 last(when(...)) OVER
    // aggregates; the operator's output is the raw right row regardless
    val wide = rightDf
      .withColumn("p2", col("rid") * 2).withColumn("p3", col("rid") * 3)
      .withColumn("p4", concat(col("payload"), lit("x")))
      .withColumn("p5", col("rsec") + 1).withColumn("p6", lit(true))
    val out = AsOf.joinBackward(leftDf, wide,
      leftKeys = Seq("k"), rightKeys = Seq("rk"),
      leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"))
    val row = out.filter(col("lid") === 1)
      .select("rid", "p2", "p3", "p4", "p5", "p6").collect().head
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getString(3),
      row.getLong(4), row.getBoolean(5)) === ((3, 6, 9, "p3x", 11L, true)))
  }

  test("as-of rejects a non-bigint time column with a clear analysis error") {
    val badLeft = leftDf.withColumn("lsec_d", col("lsec").cast("double"))
    val err = intercept[IllegalArgumentException] {
      AsOf.joinBackward(badLeft, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec_d", rightTime = "rsec").collect()
    }
    assert(err.getMessage.contains("BIGINT"), err.getMessage)
  }

  test("forward as-of: cursor match, same-second tie to smallest id, shared next row") {
    val got = AsOf.joinForward(leftDf, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    // lid 3 @4 and lid 2 @7: both share the next right @5?? no — @4's next
    // is rid 1 @5; @7's next is the earliest >= 7 → the @10 pair, smallest
    // rid wins (rid 2, not 3). lid 1 @10: same-second non-strict → rid 2.
    // lid 4 @100 (key b): no purchase at/after 100 (only @90) → dropped.
    // null key / null time / absent key: dropped as in backward.
    assert(got === Set((3, 1), (2, 2), (1, 2)))
  }

  test("nearest as-of: absolute-gap argmin, ties to backward, composes with outer+tolerance") {
    // lid 1 @10: backward rid 3 @10 (gap 0) beats forward (none) → rid 3
    // lid 2 @7: backward rid 1 @5 (gap 2) vs forward rid 2 @10 (gap 3) → rid 1
    // lid 3 @4: backward (none) vs forward rid 1 @5 (gap 1) → rid 1
    // lid 4 @100: backward rid 5 @90 (gap 10), forward none → rid 5
    // lid 5/6/7: null key / null time / absent key → dropped (inner)
    val got = AsOf.joinNearest(leftDf, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === Set((1, 3), (2, 1), (3, 1), (4, 5)))

    // equal gaps resolve to the BACKWARD row (pandas direction='nearest')
    import spark.implicits._
    val l = spark.sparkContext.parallelize(Seq(("a", 10L, 1))).toDF("k", "lsec", "lid")
    val r = spark.sparkContext.parallelize(Seq(
      ("a", 7L, 21), ("a", 13L, 22))).toDF("rk", "rsec", "rid")
    val tie = AsOf.joinNearest(l, r, Seq("k"), Seq("rk"), "lsec", "rsec")
      .select("rid").collect().map(_.getInt(0)).toSeq
    assert(tie === Seq(21), "equal-gap tie must pick the backward row")

    // tolerance bounds the WINNING gap; outer keeps the row null-padded
    val tol = AsOf.joinNearest(leftDf, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec", rightTiebreak = Seq("rid"),
        outer = true, tolerance = Some(3L))
      .select("lid", "rid").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    // lid 4's nearest (gap 10) is out of bound → padded, no fallback
    assert(tol === Set((1, Some(3)), (2, Some(1)), (3, Some(1)),
      (4, None), (5, None), (6, None), (7, None)))

    // forward+nearest is a construction error
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val err = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin(lPlan, rPlan,
        Seq(a(lPlan, "k")), Seq(a(rPlan, "rk")), a(lPlan, "lsec"), a(rPlan, "rsec"),
        Nil, forward = true, nearest = true)
    }
    assert(err.getMessage.contains("mutually exclusive"), err.getMessage)
  }

  test("nearest as-of via the SQL table function reaches the custom exec") {
    leftDf.createOrReplaceTempView("asof_near_l_v")
    rightDf.createOrReplaceTempView("asof_near_r_v")
    try {
      val out = spark.sql(
        """SELECT lid, rid FROM asof_join(TABLE(asof_near_l_v), TABLE(asof_near_r_v),
          |  'k', 'rk', 'lsec', 'rsec', 'rid', 'nearest')""".stripMargin)
      assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      val got = out.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(got === Set((1, 3), (2, 1), (3, 1), (4, 5)))
    } finally {
      spark.catalog.dropTempView("asof_near_l_v")
      spark.catalog.dropTempView("asof_near_r_v")
    }
  }

  test("forward custom as-of matches the forward window twin row for row at sf0.001") {
    val win = TimeWindows.asofJoinForward(spark, sf0001).collect()
    val custom = TimeWindows.asofJoinForwardPhysical(spark, sf0001).collect()
    assert(custom.length === win.length)
    assert(custom.sameElements(win),
      s"first divergence: ${custom.zip(win).find { case (c, w) => c != w }}")
  }

  test("salted as-of equals the unsalted join row for row, within the shuffle budget") {
    spark.catalog.clearCache()
    val salted = TimeWindows.asofJoinSalted(spark, sf0001)
    val plain = TimeWindows.asofJoinPhysical(spark, sf0001)
    // the rewrite is result-identical: every left row still sees its key's
    // full right history inside its salt bucket
    assert(salted.collect().sameElements(plain.collect()),
      "salting must not change the as-of result")
    // and it stays on the custom exec with the SAME exchange count as the
    // unsalted twin — salting adds compute (hash + explode), never a shuffle
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
    def shuffleCount(p: String) =
      "(?m)^\\s*(?:[+:|\\- ]*)Exchange ".r.findAllIn(p).length
    val plainShuffles = shuffleCount(plain.queryExecution.executedPlan.toString)
    assert(shuffleCount(plan) === plainShuffles,
      s"salting must add no shuffles beyond the unsalted form's $plainShuffles:\n$plan")
    // the clustering keys must actually include the salt, or the hot key
    // still lands on one reducer and the rewrite is decorative
    assert(plan.contains("salt"), s"salt column missing from the exchange keys:\n$plan")
  }

  test("multi-column keys resolve and match componentwise") {
    import spark.implicits._
    val l = spark.sparkContext.parallelize(Seq(
      ("a", 1L, 10L, 1), ("a", 2L, 10L, 2))).toDF("k", "k2", "lsec", "lid")
    val r = spark.sparkContext.parallelize(Seq(
      ("a", 1L, 5L, 11), ("a", 2L, 7L, 12))).toDF("rk", "rk2", "rsec", "rid")
    val got = AsOf.joinBackward(l, r,
        leftKeys = Seq("k", "k2"), rightKeys = Seq("rk", "rk2"),
        leftTime = "lsec", rightTime = "rsec")
      .select("lid", "rid").collect()
      .map(x => (x.getInt(0), x.getInt(1))).toSet
    // (a,1) must NOT see (a,2)'s rows and vice versa
    assert(got === Set((1, 11), (2, 12)))
  }

  test("AQE partition coalescing keeps both sides co-partitioned through the custom exec") {
    // AQE coalesces the two child shuffles as one group (the same contract
    // sort-merge join relies on); if it ever coalesced them independently
    // the zipPartitions merge would crash on mismatched partition counts.
    // Force aggressive coalescing and prove plan + result stay correct.
    val adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.get(adv)
    try {
      spark.conf.set(adv, "256m") // tiny inputs → everything coalesces
      val joined = TimeWindows.asofJoinPhysical(spark, sf0001)
      val rows = joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead") || finalPlan.contains("coalesced"),
        s"coalescing did not engage:\n${finalPlan.take(1000)}")
      spark.conf.set(adv, prev)
      val baseline = TimeWindows.asofJoinPhysical(spark, sf0001).collect()
      assert(rows.sameElements(baseline))
    } finally spark.conf.set(adv, prev)
  }

  test("as-of rejects pairwise-mismatched key types instead of silently mis-joining") {
    // no coercion happens on a custom node; INT-vs-BIGINT keys would hash
    // to different partitions and compare under the wrong width
    val intLeft = leftDf.withColumn("ki", col("lid"))         // int key
    val longRight = rightDf.withColumn("kl", col("rid").cast("long"))
    val err = intercept[IllegalArgumentException] {
      AsOf.joinBackward(intLeft, longRight,
        leftKeys = Seq("ki"), rightKeys = Seq("kl"),
        leftTime = "lsec", rightTime = "rsec")
    }
    assert(err.getMessage.contains("match pairwise"), err.getMessage)
  }

  test("as-of rejects non-orderable key types at construction") {
    val mapLeft = leftDf.withColumn("mk", map(col("k"), col("lid")))
    val mapRight = rightDf.withColumn("mk", map(col("rk"), col("rid")))
    val err = intercept[IllegalArgumentException] {
      AsOf.joinBackward(mapLeft, mapRight,
        leftKeys = Seq("mk"), rightKeys = Seq("mk"),
        leftTime = "lsec", rightTime = "rsec")
    }
    assert(err.getMessage.contains("orderable"), err.getMessage)
  }

  test("as-of rejects streaming inputs, naming the streaming twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val ms = MemoryStream[(String, Long, Int)](71, spark, None)
    val streamingLeft = ms.toDF().toDF("k", "lsec", "lid")
    val err = intercept[IllegalArgumentException] {
      AsOf.joinBackward(streamingLeft, rightDf,
        leftKeys = Seq("k"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec")
    }
    assert(err.getMessage.contains("asofTws"), err.getMessage)
  }

  test("as-of resolves missing columns with a clear error naming the side") {
    val err = intercept[IllegalArgumentException] {
      AsOf.joinBackward(leftDf, rightDf,
        leftKeys = Seq("nope"), rightKeys = Seq("rk"),
        leftTime = "lsec", rightTime = "rsec")
    }
    assert(err.getMessage.contains("left side has no column 'nope'"), err.getMessage)
  }

  test("epoch-split as-of == direct merge for random inputs and epoch widths") {
    // the right-hot mitigation (asof_join_epoch): random event times at
    // small epoch widths make every boundary case dense — the winning
    // click in a strictly earlier epoch, clicks at an epoch's first/last
    // second, empty epochs between activity, epoch-0 lefts with no seed
    import spark.implicits._
    import graft.operators.TimeWindows
    for (seed <- Seq(2, 9); w <- Seq(1L, 3L, 7L)) {
      val rnd = new scala.util.Random(seed * 31 + w.toInt)
      val pDf = (1 to 80).map(i =>
          (1000L + i, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(40).toLong))
        .toDF("event_id", "user_id", "sec")
      val cDf = (1 to 60).map(i =>
          (2000L + i, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(40).toLong))
        .toDF("click_id", "click_user", "click_sec")
      val direct = AsOf.joinBackward(pDf, cDf,
          leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
          leftTime = "sec", rightTime = "click_sec",
          rightTiebreak = Seq("click_id"))
        .select("event_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val split = TimeWindows.asofEpochSplit(pDf, cDf, w)
        .select("event_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(split == direct, s"seed=$seed w=$w: " +
        s"missing=${(direct -- split).take(3)} extra=${(split -- direct).take(3)}")
    }
  }

  test("salting splits a hot as-of key across reducers (the SCALE.md rule's mechanism)") {
    // deterministic STRUCTURAL pin for the measured decision rule in
    // SCALE.md (wall-clock lives in graft.AsOfWidthBench — a latency
    // assert would flake on this shared host): the exec's
    // ClusteredDistribution hash-partitions on the join keys, so model
    // its exchange with an explicit hash repartition and compare the
    // straggler share with and without the salt key.
    import org.apache.spark.sql.functions._
    val parts = 8
    val hotLeft = spark.range(8000).select(
      col("id").as("event_id"),
      when(col("id") % 2 === 0, lit(999999999L)).otherwise(col("id") % 50)
        .as("user_id"))
    def maxShare(df: org.apache.spark.sql.DataFrame, keys: Seq[String]): Double = {
      val counts = df.repartition(parts, keys.map(col): _*)
        .groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1))
      counts.max.toDouble / counts.sum
    }
    val unsalted = maxShare(hotLeft, Seq("user_id"))
    val salted = maxShare(
      hotLeft.withColumn("salt", pmod(hash(col("event_id")), lit(4))),
      Seq("user_id", "salt"))
    assert(unsalted >= 0.5,
      f"hot key must concentrate unsalted: straggler share $unsalted%.2f")
    assert(salted <= 0.3,
      f"4-way salt must split the hot key: straggler share $salted%.2f")
  }
}

object AsOfPlanSpec {
  case class L(k: String, lsec: Option[Long], lid: Int)
  case class R(rk: String, rsec: Option[Long], rid: Int, payload: String)
}
