package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Invariant specs for the corpus/behavior analytics module
  * (operators/Analytics.scala). All six queries are oracle-checked by the
  * driver; these pin the structural properties a hash compare cannot
  * express (monotonicity, interval chaining, weight normalization). */
class AnalyticsSpec extends GraftSpec {

  test("funnel stage counts are monotonically non-increasing") {
    val rows = Analytics.funnelStages(spark, sf0001)
      .orderBy("stage").collect().map(_.getLong(1))
    assert(rows.length == 3)
    assert(rows(0) >= rows(1) && rows(1) >= rows(2),
      s"funnel must narrow: ${rows.mkString(",")}")
    assert(rows(0) > 0, "harness data has clicks")
  }

  test("scd2 intervals chain: valid_to = next valid_from, one open row per user") {
    val df = Analytics.scd2History(spark, sf0001).cache()
    try {
      // exactly one current (NULL valid_to) row per user
      val open = df.filter(col("valid_to").isNull)
        .groupBy("user_id").count().filter(col("count") =!= 1).count()
      assert(open == 0, "each user has exactly one open interval")
      // intervals chain with no gaps or overlaps
      val broken = df.withColumn("next_from",
          lead(col("valid_from"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy("valid_from")))
        .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
        .count()
      assert(broken == 0, "valid_to must equal the successor's valid_from")
      // consecutive rows never repeat the same state (it's a CHANGE history)
      val repeats = df.withColumn("prev_type",
          lag(col("event_type"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy("valid_from")))
        .filter(col("prev_type") === col("event_type")).count()
      assert(repeats == 0, "adjacent rows must differ in event_type")
    } finally df.unpersist()
  }

  test("tfidf emits ranks 1..3 per doc with non-increasing scores") {
    val df = Analytics.tfidfTopTerms(spark, sf0001).cache()
    try {
      val badRank = df.groupBy("doc_id")
        .agg(collect_list(col("rk")).as("rks"))
        .filter(array_sort(col("rks")) =!= array(lit(1), lit(2), lit(3)))
        .count()
      assert(badRank == 0, "every doc gets exactly ranks 1,2,3")
      val inversions = df.withColumn("prev_score",
          lag(col("score"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy("rk")))
        .filter(col("prev_score") < col("score")).count()
      assert(inversions == 0, "scores non-increasing in rank")
    } finally df.unpersist()
  }

  test("mixing weights renormalize every source to the uniform token share") {
    val rows = Analytics.mixDomainWeights(spark, sf0001).collect()
    val totalTokens = rows.map(_.getLong(2)).sum
    val target = totalTokens.toDouble / rows.length
    rows.foreach { r =>
      val resampled = r.getDouble(3) * r.getLong(2)
      assert(math.abs(resampled - target) < target * 1e-4,
        s"source ${r.getString(0)}: weight*n_tokens=$resampled vs target=$target")
    }
  }

  test("KL divergence is non-negative and zero only for an exact-global slice") {
    val rows = Analytics.klLangDrift(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0, s"KL(${r.getString(0)}) must be >= 0")
    }
  }

  test("resampling keeps ~min(1,weight) of each source; overweight keeps all") {
    val rows = Analytics.mixResample(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, w) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      if (w >= 1.0) assert(kept == n, s"${r.getString(0)}: weight>=1 must keep all")
      else {
        // md5 acceptance is uniform: kept/n within 4 binomial sigmas of w
        val sigma = math.sqrt(w * (1 - w) / n)
        assert(math.abs(kept.toDouble / n - w) < 4 * sigma + 1.0 / n,
          s"${r.getString(0)}: kept=$kept/$n vs w=$w")
      }
    }
  }

  test("cohort retention starts at 1.0 and never exceeds it") {
    val rows = Analytics.cohortRetention(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getDouble(3) == 1.0, "week-0 retention is the cohort itself")
    }
    rows.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("skew bands partition the key space and conserve row mass") {
    val rows = Analytics.skewProfile(spark, sf0001).collect()
    val totalRows = rows.map(_.getLong(2)).sum
    val liCount = Tables.lineitem(spark, sf0001).count()
    assert(totalRows == liCount, s"band row mass $totalRows != lineitem $liCount")
    val totalKeys = rows.map(_.getLong(1)).sum
    val keyCount = Tables.lineitem(spark, sf0001).select("l_orderkey").distinct().count()
    assert(totalKeys == keyCount)
  }

  test("pagerank mass sums to 1 and every score is positive") {
    val rows = Analytics.graphPagerank(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"pagerank mass $mass (symmetric graph, no dangling loss)")
    rows.foreach(r => assert(r.getDouble(1) > 0.0))
  }

  test("session funnel narrows monotonically and never exceeds the session count") {
    val r = Analytics.sessionFunnel(spark, sf0001).head
    val (n, c, cv, full) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0)
    assert(n >= c && c >= cv && cv >= full,
      s"funnel must narrow: sessions=$n click=$c click_view=$cv full=$full")
  }

  test("session funnel matches an independent pure-Scala reference end-to-end") {
    // same contract, rebuilt locally: gap-split on (sec, event_id) order,
    // then an eventual click->view->purchase state machine per session
    val events = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    var nSessions = 0L; var nClick = 0L; var nClickView = 0L; var nFull = 0L
    events.groupBy(_._1).foreach { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      val sessions = sorted.foldLeft(List.empty[List[(String, Long)]]) {
        case (acc, e) =>
          val cur = (e._3, e._4)
          acc match {
            case (h @ ((_, lastSec) :: _)) :: t if e._4 - h.head._2 <= 1800 =>
              (cur :: h) :: t  // h is reversed; h.head is the LATEST event
            case _ => List(cur) :: acc
          }
      }.map(_.reverse)
      sessions.foreach { sess =>
        nSessions += 1
        val t1 = sess.collectFirst { case ("click", t) => t }
        val t2 = t1.flatMap(a => sess.collectFirst { case ("view", t) if t > a => t })
        val t3 = t2.flatMap(b => sess.collectFirst { case ("purchase", t) if t > b => t })
        if (t1.isDefined) nClick += 1
        if (t2.isDefined) nClickView += 1
        if (t3.isDefined) nFull += 1
      }
    }
    val r = Analytics.sessionFunnel(spark, sf0001).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nSessions, nClick, nClickView, nFull)),
      s"got ${r.mkString(",")} expected ($nSessions,$nClick,$nClickView,$nFull)")
  }

  test("expectation audit: 7 rules, clean harness data, nonzero coverage") {
    val rows = Analytics.dqExpectations(spark, sf0001).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: n_checked must be > 0")
      assert(r.getLong(2) == 0L,
        s"${r.getString(0)}: harness data is clean, got ${r.getLong(2)} violations")
    }
  }

  test("trend regression: r2 in [0,1] and slope/intercept reproduce OLS on a planted line") {
    val rows = Analytics.typeTrendRegr(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"r2 ${r.getDouble(4)}")
    }
    // planted exact line y = 3x + 7: slope/intercept recover it, r2 = 1
    import spark.implicits._
    val line = (0 until 20).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val fit = line.agg(expr("regr_slope(y, x)"), expr("regr_intercept(y, x)"),
      expr("regr_r2(y, x)")).head
    assert(math.abs(fit.getDouble(0) - 3.0) < 1e-9)
    assert(math.abs(fit.getDouble(1) - 7.0) < 1e-9)
    assert(math.abs(fit.getDouble(2) - 1.0) < 1e-9)
  }

  test("correlation matrix: unit diagonal, symmetric, |r| <= 1") {
    val rows = Analytics.typeCorrMatrix(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((ta, tb), (p, cov)) =>
      assert(math.abs(p) <= 1.000001, s"corr($ta,$tb)=$p")
      if (ta == tb) assert(p == 1.0, s"diagonal corr($ta,$ta)=$p")
      assert(rows((tb, ta)) == ((p, cov)), s"symmetry at ($ta,$tb)")
    }
  }

  test("winsorized stats: clipped moments sit inside the raw bounds") {
    val raw = Tables.orders(spark, sf0001)
      .groupBy("o_orderpriority")
      .agg(avg(col("o_totalprice")).as("mean"),
        stddev_samp(col("o_totalprice")).as("std"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Analytics.winsorizedStats(spark, sf0001).collect().foreach { r =>
      val (lo, hi) = (r.getDouble(4), r.getDouble(5))
      assert(lo <= hi)
      assert(r.getDouble(2) >= lo && r.getDouble(2) <= hi, "winsorized mean within clip bounds")
      val (_, rawStd) = raw(r.getString(0))
      assert(r.getDouble(3) <= rawStd + 1e-9,
        s"clipping can only shrink dispersion: wstd=${r.getDouble(3)} raw=$rawStd")
    }
  }

  test("MAD outlier rule flags a planted extreme value and robustness holds") {
    import spark.implicits._
    // med/mad of 1..100 are unchanged by one 10^6 outlier; stddev is not
    val base = (1 to 100).map(i => ("g", i.toDouble)) :+ (("g", 1e6))
    val df = base.toDF("k", "x")
    df.createOrReplaceTempView("mad_probe")
    val med = spark.sql(
      "SELECT percentile(x, 0.5) AS med FROM mad_probe").head.getDouble(0)
    assert(med == 51.0, "median shrugs off the outlier")
    val rows = Analytics.madOutliers(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), "outliers <= population")
      assert(r.getDouble(3) >= 0.0, "MAD non-negative")
    }
  }

  test("temperature mix: shares normalize, damping direction correct, alpha=0.5 replayed") {
    val rows = graft.operators.Analytics.mixTemperature(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "natural shares sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "temperature shares sum to 1")
    // α = 0.5 damps: the biggest source is down-sampled, the smallest boosted
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    assert(big._5 < 1.0, s"largest source must be damped, boost=${big._5}")
    assert(small._5 > 1.0, s"smallest source must be boosted, boost=${small._5}")
    // replay the formula independently
    val wsum = rows.map(r => math.sqrt(r._2.toDouble)).sum
    rows.foreach { case (_, n, _, temp, _) =>
      val want = BigDecimal(math.sqrt(n.toDouble) / wsum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(temp - want) <= 1e-6, s"temp share $temp != $want")
    }
  }

  test("triangle count matches a brute-force recount of the same pair graph") {
    val edges = graft.operators.Dedup.jaccardNearDup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val bruteTriangles = edges.toSeq.map { case (a, b) =>
      adj(a).intersect(adj(b)).count(c => c > b) // a < b < c, each once
    }.sum
    val degrees = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size.toLong)
    val bruteWedges = degrees.map(d => d * (d - 1) / 2).sum
    val r = graft.operators.Analytics.graphTriangles(spark, sf0001).head()
    assert(r.getLong(0) == edges.size.toLong)
    assert(r.getLong(1) == bruteWedges, "wedge count diverges")
    assert(r.getLong(2) == bruteTriangles.toLong, "triangle count diverges")
    assert(bruteTriangles > 0, "fixture must contain triangles")
  }

  test("rolling z-score replays from the daily counts; flags match the threshold") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.tsAnomalyZscore(spark, sf0001).collect()
    assert(rows.nonEmpty, "fixture must span more than 8 days per type")
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val (et, day, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      val prev = daily.keys.filter(k => k._1 == et && k._2 < day).toSeq
        .sortBy(_._2).takeRight(7).map(daily)
      assert(prev.length == 7, s"$et/$day emitted without 7 prior days")
      val mean = prev.sum.toDouble / 7
      val sd = math.sqrt(prev.map(v => (v - mean) * (v - mean)).sum / 6)
      val z = (n - mean) / sd
      assert(math.abs(r.getDouble(5) - z) < 1e-4, s"$et/$day z mismatch")
      assert(r.getInt(6) == (if (math.abs(z) >= 2.0) 1 else 0))
    }
  }
}
