package graft

import graft.operators.TimeWindows
import org.apache.spark.sql.functions._

class TimeWindowsSpec extends GraftSpec {

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

  test("as-of join gaps are strictly positive (click strictly precedes purchase)") {
    val bad = TimeWindows.asofJoin(spark, sf0001).filter("gap_sec < 0").count()
    assert(bad == 0)
  }
}
