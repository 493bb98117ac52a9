package graft

import graft.operators.TimeWindows
import org.apache.spark.sql.functions._

/** SQL table-function surface of the custom as-of operator:
  * `SELECT * FROM asof_join(TABLE(l), TABLE(r), 'lkey', 'rkey', 'ltime',
  * 'rtime'[, 'rtiebreak'][, direction][, 'inner'|'outer'])` — registered
  * through `injectTableFunction` in `GraftExtensions`. */
class AsOfTvfSpec extends GraftSpec {

  private def makeViews(): Unit = {
    val (purchases, clicks) = TimeWindows.purchasesAndClicks(spark, sf0001)
    purchases.createOrReplaceTempView("purch_v")
    clicks.createOrReplaceTempView("click_v")
  }

  test("SQL asof_join TVF over TABLE arguments equals the DataFrame form") {
    makeViews()
    val viaSql = spark.sql(
      """SELECT event_id AS purchase_id, user_id, click_id,
        |       sec - click_sec AS gap_sec
        |FROM asof_join(TABLE(purch_v), TABLE(click_v),
        |               'user_id', 'click_user', 'sec', 'click_sec',
        |               'click_id')
        |ORDER BY purchase_id""".stripMargin).collect()
    val viaApi = TimeWindows.asofJoinPhysical(spark, sf0001).collect()
    assert(viaSql.length === viaApi.length && viaSql.sameElements(viaApi))
  }

  test("SQL asof_join TVF forward direction equals the forward DataFrame form") {
    makeViews()
    val viaSql = spark.sql(
      """SELECT click_id, click_user AS user_id, event_id AS purchase_id,
        |       sec - click_sec AS gap_sec
        |FROM asof_join(TABLE(click_v), TABLE(purch_v),
        |               'click_user', 'user_id', 'click_sec', 'sec',
        |               'event_id', 'forward')
        |ORDER BY click_id""".stripMargin).collect()
    val viaApi = TimeWindows.asofJoinForwardPhysical(spark, sf0001).collect()
    assert(viaSql.length === viaApi.length && viaSql.sameElements(viaApi))
  }

  test("a lone 7th argument naming a direction is a direction, not a tiebreak column") {
    makeViews()
    // forward-without-tiebreak is the natural short call; it must not
    // resolve 'forward' as a column name
    val shortCall = spark.sql(
      "SELECT * FROM asof_join(TABLE(click_v), TABLE(purch_v), " +
        "'click_user', 'user_id', 'click_sec', 'sec', 'forward')").count()
    val longCall = spark.sql(
      "SELECT * FROM asof_join(TABLE(click_v), TABLE(purch_v), " +
        "'click_user', 'user_id', 'click_sec', 'sec', 'event_id', 'forward')").count()
    val backward = spark.sql(
      "SELECT * FROM asof_join(TABLE(click_v), TABLE(purch_v), " +
        "'click_user', 'user_id', 'click_sec', 'sec')").count()
    // match EXISTENCE is tiebreak-independent, so the two forward forms
    // agree; the backward count differs on this data, proving the
    // direction actually took effect
    assert(shortCall === longCall)
    assert(shortCall !== backward)
  }

  test("SQL asof_join TVF 'outer' keyword equals the outer DataFrame form") {
    makeViews()
    val viaSql = spark.sql(
      """SELECT event_id AS purchase_id, user_id, click_id,
        |       sec - click_sec AS gap_sec
        |FROM asof_join(TABLE(purch_v), TABLE(click_v),
        |               'user_id', 'click_user', 'sec', 'click_sec',
        |               'click_id', 'outer')
        |ORDER BY purchase_id""".stripMargin).collect()
    val viaApi = TimeWindows.asofJoinOuter(spark, sf0001).collect()
    assert(viaSql.length === viaApi.length && viaSql.sameElements(viaApi))
    // and the keyword composes with a direction in either optional slot
    val n = spark.sql(
      "SELECT * FROM asof_join(TABLE(click_v), TABLE(purch_v), " +
        "'click_user', 'user_id', 'click_sec', 'sec', 'forward', 'outer')").count()
    val nLeft = spark.sql("SELECT count(*) FROM click_v").collect().head.getLong(0)
    assert(n === nLeft, "outer forward must keep every left row")
  }

  test("SQL asof_join TVF 'tolerance=N' equals the tolerance DataFrame form") {
    makeViews()
    val viaSql = spark.sql(
      """SELECT event_id AS purchase_id, user_id, click_id,
        |       sec - click_sec AS gap_sec
        |FROM asof_join(TABLE(purch_v), TABLE(click_v),
        |               'user_id', 'click_user', 'sec', 'click_sec',
        |               'click_id', 'tolerance=600')
        |ORDER BY purchase_id""".stripMargin).collect()
    val viaApi = TimeWindows.asofJoinTolerance(spark, sf0001).collect()
    assert(viaSql.length === viaApi.length && viaSql.sameElements(viaApi))
    // composes with a direction keyword; parse order is free
    val near = spark.sql(
      """SELECT count(*) FROM asof_join(TABLE(purch_v), TABLE(click_v),
        |  'user_id', 'click_user', 'sec', 'click_sec',
        |  'click_id', 'nearest', 'tolerance=600')""".stripMargin)
      .collect().head.getLong(0)
    assert(near > 0)
    // malformed and non-positive tolerances fail with the reason
    val bad = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join(TABLE(purch_v), TABLE(click_v), " +
        "'user_id', 'click_user', 'sec', 'click_sec', 'tolerance=soon')").collect()
    }
    assert(bad.getMessage.contains("positive integer"), bad.getMessage)
    val zero = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join(TABLE(purch_v), TABLE(click_v), " +
        "'user_id', 'click_user', 'sec', 'click_sec', 'tolerance=0')").collect()
    }
    assert(zero.getMessage.contains("positive"), zero.getMessage)
  }

  test("TVF argument errors are caught with clear messages") {
    makeViews()
    val noTable = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('purch_v', TABLE(click_v), " +
        "'user_id', 'click_user', 'sec', 'click_sec')").collect()
    }
    assert(noTable.getMessage.contains("TABLE("), noTable.getMessage)
    val badDir = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join(TABLE(purch_v), TABLE(click_v), " +
        "'user_id', 'click_user', 'sec', 'click_sec', 'click_id', 'sideways')")
        .collect()
    }
    assert(badDir.getMessage.contains("'forward'/'backward'"), badDir.getMessage)
    val badCol = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join(TABLE(purch_v), TABLE(click_v), " +
        "'no_such_col', 'click_user', 'sec', 'click_sec')").collect()
    }
    assert(badCol.getMessage.toLowerCase.contains("no_such_col"), badCol.getMessage)
    // PARTITION BY table-argument clauses would fight the operator's own
    // declared distribution — rejected with the reason
    val partBy = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join(TABLE(purch_v) PARTITION BY (user_id), " +
        "TABLE(click_v), 'user_id', 'click_user', 'sec', 'click_sec')").collect()
    }
    assert(partBy.getMessage.contains("declares its own distribution"), partBy.getMessage)
    // a key name present on BOTH sides is ambiguous, same as DataFrame joins
    spark.sql("SELECT click_id AS event_id, click_user AS user_id, click_sec AS sec " +
      "FROM click_v").createOrReplaceTempView("click_same_v")
    try {
      val ambiguous = intercept[Exception] {
        spark.sql("SELECT * FROM asof_join(TABLE(purch_v), TABLE(click_same_v), " +
          "'user_id', 'user_id', 'sec', 'sec')").collect()
      }
      assert(ambiguous.getMessage.contains("AMBIGUOUS") ||
        ambiguous.getMessage.toLowerCase.contains("ambiguous"), ambiguous.getMessage)
    } finally spark.catalog.dropTempView("click_same_v")
  }
}
