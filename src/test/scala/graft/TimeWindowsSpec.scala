package graft

import graft.operators.TimeWindows
import org.apache.spark.sql.functions._

class TimeWindowsSpec extends GraftSpec {

  test("interval overlap matches a brute-force pure-Scala reference") {
    val spans = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy { case (u, sec) => (u, sec / 86400) }
      .map { case ((u, day), evs) =>
        (u % 50, day, u, evs.map(_._2).min, evs.map(_._2).max) }
      .toSeq
    var expected = Map.empty[Long, (Long, Long, Long)] // team -> (n, total, max)
    for {
      Seq(x, y) <- spans.combinations(2)
      (ta, da, ua, sa, ea) = x; (tb, db, ub, sb, eb) = y
      if ta == tb && da == db && ua != ub && sa <= eb && sb <= ea
    } {
      val ovl = math.min(ea, eb) - math.max(sa, sb)
      val (n, tot, mx) = expected.getOrElse(ta, (0L, 0L, Long.MinValue))
      expected = expected.updated(ta, (n + 1, tot + ovl, math.max(mx, ovl)))
    }
    val got = TimeWindows.intervalOverlap(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, s"diff: got=${got.toSeq.sorted.take(5)}... exp=${expected.toSeq.sorted.take(5)}...")
  }

  test("sliding windows: every event lands in exactly window/slide = 2 windows") {
    val total = Tables.events(spark, sf0001).count()
    val winSum = TimeWindows.slidingCounts(spark, sf0001)
      .agg(sum("cnt")).head().getLong(0)
    assert(winSum == 2 * total, s"$winSum != 2 * $total")
  }

  test("window starts are epoch-aligned to the slide") {
    val bad = TimeWindows.slidingCounts(spark, sf0001)
      .filter(col("win_start") % 1800 =!= 0).count()
    assert(bad == 0)
  }

  test("tumbling counts sum to total event count") {
    val total = Tables.events(spark, sf0001).count()
    val s = TimeWindows.tumblingCounts(spark, sf0001).agg(sum("cnt")).head().getLong(0)
    assert(s == total)
  }

  test("sessionize: session event counts sum to per-user event totals") {
    val perUser = Tables.events(spark, sf0001).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val sess = TimeWindows.sessionize(spark, sf0001)
      .groupBy("user_id").agg(sum("n_events").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sess == perUser)
  }

  test("forward as-of: gaps non-negative and purchases never precede their click") {
    val rows = TimeWindows.asofJoinForward(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 0, s"gap ${r.getLong(3)} for click ${r.getLong(0)}"))
    // duality with the backward join: if purchase P matched click C
    // backward with gap g, then C's forward match is some purchase at
    // distance <= g (P itself qualifies)
    val fwd = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    TimeWindows.asofJoin(spark, sf0001).collect().foreach { b =>
      val (clickId, gap) = (b.getLong(2), b.getLong(3))
      fwd.get(clickId).foreach(fg => assert(fg <= gap,
        s"forward gap $fg must be <= backward gap $gap for click $clickId"))
    }
  }

  test("as-of join gaps are strictly positive (click strictly precedes purchase)") {
    val bad = TimeWindows.asofJoin(spark, sf0001).filter("gap_sec < 0").count()
    assert(bad == 0)
  }
}
