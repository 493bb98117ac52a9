package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window operators — the batch, oracle-checkable twins of the
  * reference's windowed count (SURVEY.md §2 W1,
  * `tweet-streamer/src/main/scala/main.scala:47`:
  * `reduceByKeyAndWindow(_ + _, Seconds(10))` with a 5 s slide).
  *
  * The reference windows are processing-time and batch-aligned; here they
  * are event-time over `events.ts`, epoch-aligned (Spark's `window()`
  * aligns to 1970-01-01 UTC) so a DuckDB oracle reproduces the buckets with
  * integer arithmetic. Window starts are emitted as epoch seconds (BIGINT)
  * rather than timestamps to keep the hash-compare free of
  * timestamp-rendering differences.
  *
  * The event data spans ~30 days, so windows are scaled up (1 h / 30 min)
  * from the reference's 10 s / 5 s — same shape: window = 2 × slide, each
  * event lands in exactly two sliding windows.
  *
  * Scale: each query is one shuffle (hash agg on (window, key)); the slide
  * expansion is map-side (`explode` of 2 window starts). The streaming twin
  * (graft.streaming.StreamingTopTokens) does the same agg incrementally with
  * a state store + watermark.
  */
object TimeWindows {

  private val SlideSec = 1800L  // 30 min
  private val WinSec   = 3600L  // 1 h = 2 slides

  /** W1 sliding: per-event_type counts over 1 h windows sliding by 30 min. */
  def slidingCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), s"$WinSec seconds", s"$SlideSec seconds").as("w"),
               col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"), col("cnt"))
      .orderBy("win_start", "event_type")

  val slidingCountsSql: String =
    s"""WITH b AS (
       |  SELECT event_type, CAST(floor(epoch(ts) / $SlideSec) AS BIGINT) * $SlideSec AS b0
       |  FROM events
       |), e AS (
       |  SELECT event_type, b0 AS win_start FROM b
       |  UNION ALL
       |  SELECT event_type, b0 - $SlideSec FROM b
       |)
       |SELECT win_start, event_type, count(*) AS cnt
       |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** W1 tumbling (slide = window): per-event_type hourly counts + value sums.
    * Money-ish doubles are summed as DECIMAL(18,2) (the data is exact at two
    * decimals) then cast to double, so Spark and DuckDB agree bit-for-bit
    * regardless of accumulation order. */
  def tumblingCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), s"$WinSec seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"),
              col("cnt"), col("sum_value"))
      .orderBy("win_start", "event_type")

  val tumblingCountsSql: String =
    s"""SELECT CAST(floor(epoch(ts) / $WinSec) AS BIGINT) * $WinSec AS win_start,
       |       event_type, count(*) AS cnt,
       |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Top-k per sliding window: the reference's per-batch "top 10 hashtags"
    * (`main.scala:49-52`) as an analytic-window rank over the sliding agg —
    * the idiomatic distributed top-k (no global sort, no driver collect). */
  def topPerWindow(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(window(col("ts"), s"$WinSec seconds", s"$SlideSec seconds").as("w"),
               col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"), col("cnt"))
    val rankW = Window.partitionBy(col("win_start"))
      .orderBy(col("cnt").desc, col("event_type"))
    counts
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= 3)
      .orderBy("win_start", "rnk")
  }

  val topPerWindowSql: String =
    s"""WITH b AS (
       |  SELECT event_type, CAST(floor(epoch(ts) / $SlideSec) AS BIGINT) * $SlideSec AS b0
       |  FROM events
       |), e AS (
       |  SELECT event_type, b0 AS win_start FROM b
       |  UNION ALL
       |  SELECT event_type, b0 - $SlideSec FROM b
       |), c AS (
       |  SELECT win_start, event_type, count(*) AS cnt FROM e GROUP BY 1, 2
       |)
       |SELECT win_start, event_type, cnt,
       |       row_number() OVER (PARTITION BY win_start ORDER BY cnt DESC, event_type) AS rnk
       |FROM c
       |QUALIFY rnk <= 3
       |ORDER BY win_start, rnk""".stripMargin

  /** Sessionization: per-user sessions split at >30 min inactivity gaps —
    * lag + conditional cumulative sum, the classic two-window composition.
    * Deterministic: (user_id, ts, event_id) is a total order. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(byUser))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min(unix_timestamp(col("ts"))).as("sess_start"),
           max(unix_timestamp(col("ts"))).as("sess_end"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), m AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN prev_ts IS NULL
      |                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM g
      |), sess AS (
      |  SELECT user_id, ts,
      |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM m
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(CAST(floor(epoch(ts)) AS BIGINT)) AS sess_start,
      |       max(CAST(floor(epoch(ts)) AS BIGINT)) AS sess_end
      |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Built-in `session_window` (gap-merged event-time sessions) — must
    * agree with the manual lag+cumsum `sessionize` above: window start =
    * first event, window end = last event + gap, so last-event time is
    * recovered as end − gap. Same oracle shape as sessionize. */
  def sessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      // truncate to whole seconds: session_window merges on full-precision
      // timestamps, the oracle on floored epochs — a 1800.5 s gap would
      // split here but merge there otherwise
      .withColumn("ts", timestamp_seconds(unix_timestamp(col("ts"))))
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              unix_timestamp(col("w.start")).as("sess_start"),
              (unix_timestamp(col("w.end")) - 1800L).as("sess_last"),
              col("n_events"))
      .orderBy("user_id", "sess_start")

  val sessionWindowSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), m AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN prev_ts IS NULL
      |                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM g
      |), sess AS (
      |  SELECT user_id, ts,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM m
      |)
      |SELECT user_id,
      |       min(CAST(floor(epoch(ts)) AS BIGINT)) AS sess_start,
      |       max(CAST(floor(epoch(ts)) AS BIGINT)) AS sess_last,
      |       count(*) AS n_events
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, sess_start""".stripMargin

  /** Bounded range self-join: pairs of events by the same user within 5 min
    * of each other (strictly later, different event). The time-bucket
    * pre-join keeps it a bounded equi-join (scales: join key is
    * (user_id, bucket), never a cross product) — the standard interval-join
    * decomposition used by stream processors.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_timestamp(col("ts")).as("sec"),
              (unix_timestamp(col("ts")) / 300L).cast("long").as("bucket"))
    val l = e.select(col("event_id").as("l_id"), col("user_id"),
                     col("sec").as("l_sec"), col("bucket"))
    // each left row probes its own bucket and the next (window ≤ bucket width)
    val lExp = l.withColumn("probe", explode(array(col("bucket"), col("bucket") + 1L)))
    val r = e.select(col("event_id").as("r_id"), col("user_id").as("r_user"),
                     col("sec").as("r_sec"), col("bucket").as("probe"))
    lExp.join(r, lExp("user_id") === r("r_user") && lExp("probe") === r("probe"))
      .filter(col("r_sec") > col("l_sec") && col("r_sec") - col("l_sec") <= 300L)
      .select(col("l_id"), col("r_id"), (col("r_sec") - col("l_sec")).as("gap_sec"))
      .orderBy("l_id", "r_id")
  }

  val rangeJoinSql: String =
    """SELECT a.event_id AS l_id, b.event_id AS r_id,
      |       CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS gap_sec
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND floor(epoch(b.ts)) > floor(epoch(a.ts))
      | AND floor(epoch(b.ts)) - floor(epoch(a.ts)) <= 300
      |ORDER BY l_id, r_id""".stripMargin

  /** As-of join: for each purchase, the most recent strictly-earlier click
    * by the same user. Implemented with the union-tag + window trick (one
    * shuffle on user_id, no range explosion); DuckDB oracle uses its native
    * ASOF JOIN semantics via window functions for portability. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_timestamp(col("ts")).as("sec"))
    val tagged = ev
      .withColumn("is_click", when(col("event_type") === "click", 1).otherwise(0))
      .filter(col("event_type").isin("click", "purchase"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("is_click").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("last_click_id",
        last(when(col("is_click") === 1, col("event_id")), ignoreNulls = true).over(byUser))
      .withColumn("last_click_sec",
        last(when(col("is_click") === 1, col("sec")), ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase" && col("last_click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("last_click_id").as("click_id"),
              (col("sec") - col("last_click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  val asofJoinSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), w AS (
      |  SELECT event_id, user_id, event_type, sec,
      |         last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
      |         last_value(CASE WHEN is_click = 1 THEN sec END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_sec
      |  FROM ev
      |)
      |SELECT event_id AS purchase_id, user_id, click_id, sec - click_sec AS gap_sec
      |FROM w WHERE event_type = 'purchase' AND click_id IS NOT NULL
      |ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------- forward as-of join
  /** Forward as-of: each click matched to its NEXT purchase — the mirror
    * of [[asofJoin]] (latest-preceding), same single-window mechanism
    * with the frame flipped to (1 FOLLOWING, UNBOUNDED FOLLOWING) and
    * `first(ignoreNulls)` instead of `last`. Tie policy mirrors too: at
    * the same second the click sorts BEFORE the purchase, so same-second
    * conversions match (gap 0). Still one shuffle by user, no join. */
  def asofJoinForward(s: SparkSession, dir: String): DataFrame = {
    val tagged = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_timestamp(col("ts")).as("sec"))
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("is_p", when(col("event_type") === "purchase", 1).otherwise(0))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("is_p"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    tagged
      .withColumn("next_p_id",
        first(when(col("is_p") === 1, col("event_id")), ignoreNulls = true).over(byUser))
      .withColumn("next_p_sec",
        first(when(col("is_p") === 1, col("sec")), ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "click" && col("next_p_id").isNotNull)
      .select(col("event_id").as("click_id"), col("user_id"),
              col("next_p_id").as("purchase_id"),
              (col("next_p_sec") - col("sec")).as("gap_sec"))
      .orderBy("click_id")
  }

  val asofJoinForwardSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), w AS (
      |  SELECT event_id, user_id, event_type, sec,
      |         first_value(CASE WHEN is_p = 1 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY sec, is_p, event_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS p_id,
      |         first_value(CASE WHEN is_p = 1 THEN sec END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY sec, is_p, event_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS p_sec
      |  FROM ev
      |)
      |SELECT event_id AS click_id, user_id, p_id AS purchase_id, p_sec - sec AS gap_sec
      |FROM w WHERE event_type = 'click' AND p_id IS NOT NULL
      |ORDER BY click_id""".stripMargin

  // ------------------------------------------- custom physical as-of join
  /** The same latest-preceding-click-per-purchase join as [[asofJoin]], but
    * through the engine's custom Catalyst operator
    * (`graft.plans.AsOfJoin` → `AsOfJoinExec`, SURVEY §4 ladder step c)
    * instead of the union-tag + window trick. Both forms answer the same
    * oracle SQL, so the hash gate proves the custom operator end-to-end
    * equivalent to the window formulation at every scale.
    *
    * Shape difference: the window form carries each right-hand column as
    * its own `last(when(...)) OVER` aggregate (cost grows with payload
    * width) and unions both sides into one padded schema; the custom
    * operator streams the two sorted sides once per partition with O(1)
    * state and any payload width. Tie policy matches the window twin:
    * same-second clicks DO match (non-strict `<=`), and among equal
    * timestamps the largest `event_id` wins (tiebreak ordering).
    */
  /** Shared projections for the as-of family (also used by the bucketing
    * and TVF specs): purchases keep plain names, clicks are pre-renamed so
    * the joined schema has no collisions. */
  private[graft] def purchasesAndClicks(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_timestamp(col("ts")).as("sec"))
    (ev.filter(col("event_type") === "purchase")
       .select(col("event_id"), col("user_id"), col("sec")),
     ev.filter(col("event_type") === "click")
       .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
               col("sec").as("click_sec")))
  }

  def asofJoinPhysical(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    graft.plans.AsOf.joinBackward(
        purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("click_id"), (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** Forward twin of [[asofJoinPhysical]]: each click to its NEXT purchase
    * through the custom operator's `forward = true` merge (cursor match,
    * no candidate buffer). Shares [[asofJoinForwardSql]]'s oracle — the
    * same end-to-end equivalence gate as the backward pair. Tie policy
    * matches the window twin: same-second purchases match (non-strict
    * `>=`), smallest `event_id` wins among equal timestamps. */
  def asofJoinForwardPhysical(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    graft.plans.AsOf.joinForward(
        clicks, purchases,
        leftKeys = Seq("click_user"), rightKeys = Seq("user_id"),
        leftTime = "click_sec", rightTime = "sec",
        rightTiebreak = Seq("event_id"))
      .select(col("click_id"), col("click_user").as("user_id"),
              col("event_id").as("purchase_id"),
              (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("click_id")
  }

  /** Left-outer backward as-of through the custom operator
    * (`outer = true`): every purchase is kept, null-padded when no click
    * precedes it — the pandas `merge_asof` / DuckDB `ASOF LEFT JOIN`
    * default shape, and the common production form (a fact row must not
    * vanish because its dimension history starts late). Oracle is the
    * window formulation WITHOUT the `IS NOT NULL` filter, so the hash gate
    * proves the null-padding semantics end-to-end, including the tie
    * policy on matched rows. */
  def asofJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    graft.plans.AsOf.joinBackward(
        purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"), outer = true)
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("click_id"), (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  val asofJoinOuterSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), w AS (
      |  SELECT event_id, user_id, event_type, sec,
      |         last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
      |         last_value(CASE WHEN is_click = 1 THEN sec END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_sec
      |  FROM ev
      |)
      |SELECT event_id AS purchase_id, user_id, click_id, sec - click_sec AS gap_sec
      |FROM w WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  /** Tolerance-bounded backward as-of through the custom operator: the
    * latest preceding click matches only within 600 s (`merge_asof
    * tolerance` semantics — a staler click is NO match, not a fallback).
    * The oracle is the window twin with the gap filter applied after the
    * window, which is exactly the operator's contract: closest-first,
    * THEN the bound. */
  def asofJoinTolerance(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    graft.plans.AsOf.joinBackward(
        purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"), tolerance = Some(600L))
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("click_id"), (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  val asofJoinToleranceSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), w AS (
      |  SELECT event_id, user_id, event_type, sec,
      |         last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
      |         last_value(CASE WHEN is_click = 1 THEN sec END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_sec
      |  FROM ev
      |)
      |SELECT event_id AS purchase_id, user_id, click_id, sec - click_sec AS gap_sec
      |FROM w WHERE event_type = 'purchase' AND click_id IS NOT NULL
      |  AND sec - click_sec <= 600
      |ORDER BY purchase_id""".stripMargin

  /** Nearest-direction as-of through the custom operator
    * (`nearest = true`): each purchase matched to its closest click in
    * EITHER direction — the smaller of the backward gap (click at-or-before,
    * gap ≥ 0) and the forward gap (click strictly after, reported as a
    * NEGATIVE `gap_sec` so direction survives the projection). Equal gaps
    * resolve backward, same-time clicks are backward matches with gap 0 —
    * pandas `merge_asof(direction='nearest')`. The oracle computes both
    * directional candidates with the window formulations of [[asofJoin]] /
    * [[asofJoinForward]] and takes the argmin, so the hash gate pins the
    * pick rule (including both tie policies) end-to-end. */
  def asofJoinNearest(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    graft.plans.AsOf.joinNearest(
        purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("click_id"), (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  val asofJoinNearestSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), w AS (
      |  SELECT event_id, user_id, event_type, sec,
      |         last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
      |           OVER back AS b_id,
      |         last_value(CASE WHEN is_click = 1 THEN sec END IGNORE NULLS)
      |           OVER back AS b_sec,
      |         first_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
      |           OVER fwd AS f_id,
      |         first_value(CASE WHEN is_click = 1 THEN sec END IGNORE NULLS)
      |           OVER fwd AS f_sec
      |  FROM ev
      |  WINDOW back AS (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |         fwd AS (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT event_id AS purchase_id, user_id,
      |       CASE WHEN f_id IS NULL OR (b_id IS NOT NULL AND sec - b_sec <= f_sec - sec)
      |            THEN b_id ELSE f_id END AS click_id,
      |       CASE WHEN f_id IS NULL OR (b_id IS NOT NULL AND sec - b_sec <= f_sec - sec)
      |            THEN sec - b_sec ELSE sec - f_sec END AS gap_sec
      |FROM w
      |WHERE event_type = 'purchase' AND (b_id IS NOT NULL OR f_id IS NOT NULL)
      |ORDER BY purchase_id""".stripMargin

  /** Nearest + tolerance composed: the closest click in either direction,
    * but only within 600 s — the last matrix cell (direction × bound)
    * exercised under the oracle. Pick-then-bound semantics: the nearest
    * candidate is chosen first and the bound applies to the WINNER (if
    * the nearer side is out of bound, the farther side is too — never a
    * fallback), which the oracle mirrors by filtering the argmin's gap. */
  def asofJoinNearestTol(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    graft.plans.AsOf.joinNearest(
        purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"), tolerance = Some(600L))
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("click_id"), (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  val asofJoinNearestTolSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), w AS (
      |  SELECT event_id, user_id, event_type, sec,
      |         last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
      |           OVER back AS b_id,
      |         last_value(CASE WHEN is_click = 1 THEN sec END IGNORE NULLS)
      |           OVER back AS b_sec,
      |         first_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
      |           OVER fwd AS f_id,
      |         first_value(CASE WHEN is_click = 1 THEN sec END IGNORE NULLS)
      |           OVER fwd AS f_sec
      |  FROM ev
      |  WINDOW back AS (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |         fwd AS (PARTITION BY user_id ORDER BY sec, is_click DESC, event_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |), picked AS (
      |  SELECT event_id AS purchase_id, user_id,
      |         CASE WHEN f_id IS NULL OR (b_id IS NOT NULL AND sec - b_sec <= f_sec - sec)
      |              THEN b_id ELSE f_id END AS click_id,
      |         CASE WHEN f_id IS NULL OR (b_id IS NOT NULL AND sec - b_sec <= f_sec - sec)
      |              THEN sec - b_sec ELSE sec - f_sec END AS gap_sec
      |  FROM w
      |  WHERE event_type = 'purchase' AND (b_id IS NOT NULL OR f_id IS NOT NULL)
      |)
      |SELECT purchase_id, user_id, click_id, gap_sec FROM picked
      |WHERE abs(gap_sec) <= 600
      |ORDER BY purchase_id""".stripMargin

  /** Skew-hardened as-of: the salted form the operator's Scaladoc names as
    * the hot-key mitigation (`AsOfJoinPlan`: single hot key = clustered-join
    * exposure), shipped as a query so the mechanics are oracle-protected.
    *
    * An as-of can't salt like an equi-join (hash both sides): every left
    * row needs the FULL right history of its key, so the left side salts
    * (deterministic hash of its row identity → one of `AsofSalts` subkeys)
    * and the right side REPLICATES ×`AsofSalts` (explode), joining on
    * (key, salt). A key that previously landed on one reducer now spreads
    * over `AsofSalts` of them; each still sees the key's whole right
    * history, so the result is provably identical — the oracle is the
    * UNSALTED window formulation ([[asofJoinSql]]), making the equivalence
    * a hash-gate fact, not a claim. Cost: the right side shuffles ×salts —
    * the standard trade (pay replication of the small/history side to
    * split the hot fact key); keep `AsofSalts` modest and target it at
    * skewed keys only in production (here every key salts, worst case for
    * the rewrite, and it must still match). */
  private val AsofSalts = 8

  def asofJoinSalted(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    val l = purchases.withColumn("salt",
      pmod(hash(col("event_id")), lit(AsofSalts)))
    val r = clicks.withColumn("click_salt",
      explode(sequence(lit(0), lit(AsofSalts - 1))))
    graft.plans.AsOf.joinBackward(
        l, r,
        leftKeys = Seq("user_id", "salt"), rightKeys = Seq("click_user", "click_salt"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("click_id"), (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** Epoch-split as-of: the RIGHT-hot skew mitigation the salted form
    * cannot provide (SCALE.md decision rule, measured by
    * `graft.AsOfWidthBench`: replicating a hot right side ×salts re-sorts
    * it `salts` times — when the hot key's right history is itself large,
    * salting loses). Instead of replicating history, split TIME: bucket
    * both sides into fixed epochs and join on (key, epoch), so a hot
    * key's rows spread over its ACTIVE EPOCHS with zero right-side
    * replication. Backward matches can cross an epoch boundary (the
    * latest click may live in an earlier epoch), so each left epoch is
    * SEEDED with one extra right row: the key's latest click from all
    * earlier epochs — computed by running THE SAME as-of operator at
    * epoch granularity (per-(key, epoch) latest-click table, ~one row per
    * key-epoch, probed by each left epoch at `e − 1`). Seeds are bounded
    * by |left epochs|, not by right-side size — the asymmetry that makes
    * this the right-hot remedy. Works when the hot key's activity SPANS
    * epochs (time-distributed skew, the common case); a key hot inside a
    * single epoch composes with the salted form instead. Oracle-gated on
    * the UNSALTED [[asofJoinSql]], so the rewrite's equivalence is a
    * hash-gate fact at both scales; epoch-boundary edges (click in a
    * prior epoch, click at the epoch's first/last second, empty epochs
    * between activity) are randomized-verified in `AsOfPlanSpec`. */
  private[graft] def asofEpochSplit(purchases: DataFrame, clicks: DataFrame,
                                    epochSec: Long): DataFrame = {
    val l = purchases.withColumn("e", floor(col("sec") / epochSec).cast("long"))
    val r = clicks.withColumn("e", floor(col("click_sec") / epochSec).cast("long"))
    // one row per (user, epoch): the epoch's latest click — max by
    // (click_sec, click_id), the operator's backward tie rule
    val perEpoch = r.groupBy(col("click_user"), col("e").as("ce"))
      .agg(max(struct(col("click_sec"), col("click_id"))).as("m"))
      .select(col("click_user"), col("ce"),
        col("m.click_sec").as("click_sec"), col("m.click_id").as("click_id"))
    // seed per LEFT epoch = the key's latest click in any epoch ≤ e−1:
    // the as-of operator itself, at epoch granularity (tiny input)
    val lEpochs = l.select(col("user_id"), col("e")).distinct()
      .withColumn("probe_e", col("e") - 1)
    val seeds = graft.plans.AsOf.joinBackward(
        lEpochs, perEpoch,
        leftKeys = Seq("user_id"), rightKeys = Seq("click_user"),
        leftTime = "probe_e", rightTime = "ce",
        rightTiebreak = Seq("click_id"))
      .select(col("click_id"), col("user_id").as("click_user"),
        col("click_sec"), col("e"))
    // augmented right: in-epoch clicks + one seed row per left epoch —
    // the (key, epoch) merge then finds the global backward winner
    val augRight = r.select("click_id", "click_user", "click_sec", "e")
      .unionByName(seeds)
    graft.plans.AsOf.joinBackward(
        l, augRight,
        leftKeys = Seq("user_id", "e"), rightKeys = Seq("click_user", "e"),
        leftTime = "sec", rightTime = "click_sec",
        rightTiebreak = Seq("click_id"))
  }

  def asofJoinEpoch(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    asofEpochSplit(purchases, clicks, epochSec = 6 * 3600)
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("click_id"), (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** The SQL-surface twin of [[asofJoinPhysical]]: the identical join
    * through the `asof_join(TABLE(...), TABLE(...), ...)` table function
    * registered in `GraftExtensions` — proving a pure-SQL user reaches the
    * custom operator with no Scala. Shares [[asofJoinSql]]'s oracle. */
  def asofJoinTvf(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    purchases.createOrReplaceTempView("asof_purchases_v")
    clicks.createOrReplaceTempView("asof_clicks_v")
    // sql() analyzes eagerly, so the returned frame's plan holds the
    // resolved relations — drop the views to leave no catalog residue
    // (they exist only to give TABLE(...) something to name)
    try s.sql(
      """SELECT event_id AS purchase_id, user_id, click_id,
        |       sec - click_sec AS gap_sec
        |FROM asof_join(TABLE(asof_purchases_v), TABLE(asof_clicks_v),
        |               'user_id', 'click_user', 'sec', 'click_sec',
        |               'click_id')
        |ORDER BY purchase_id""".stripMargin)
    finally {
      s.catalog.dropTempView("asof_purchases_v")
      s.catalog.dropTempView("asof_clicks_v")
    }
  }

  // ------------------------------------------------ interval-overlap join
  /** Interval-overlap self-join — the third time-join algorithm beside
    * [[rangeJoin]] (point proximity) and [[asofJoin]] (latest-preceding):
    * per-(user, day) activity SPANS, paired within a (day, cohort) key
    * when they overlap, reporting per-cohort concurrency. The generic
    * interval join risks O(n²); the bound here is a compound equi-key
    * (day × cohort) so the theta condition only runs inside small
    * buckets — the same time-bucketing a Flink/KDB interval join uses,
    * tightened by the cohort dimension. Spans are DERIVED per day
    * (groupBy user, day), so no interval ever crosses a bucket and no
    * clip/dedup pass is needed; overlap length is pure integer
    * arithmetic: min(ends) − max(starts) ≥ 0. */
  def intervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
      .withColumn("day", (col("sec") / 86400L).cast("long"))
      .groupBy("user_id", "day")
      .agg(min(col("sec")).as("s"), max(col("sec")).as("e"))
      .withColumn("team", pmod(col("user_id"), lit(50)).cast("long"))
    val a = spans.select(col("team"), col("day"), col("user_id").as("a_id"),
      col("s").as("a_s"), col("e").as("a_e"))
    val b = spans.select(col("team"), col("day"), col("user_id").as("b_id"),
      col("s").as("b_s"), col("e").as("b_e"))
    a.join(b, Seq("team", "day"))
      .filter(col("a_id") < col("b_id") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .withColumn("ovl", least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
      .groupBy("team")
      .agg(count(lit(1)).as("n_overlaps"),
           sum(col("ovl")).as("total_overlap_sec"),
           max(col("ovl")).as("max_overlap_sec"))
      .orderBy("team")
  }

  val intervalOverlapSql: String =
    """WITH spans AS (
      |  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |         CAST(min(floor(epoch(ts))) AS BIGINT) AS s,
      |         CAST(max(floor(epoch(ts))) AS BIGINT) AS e,
      |         user_id % 50 AS team
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT a.team, CAST(count(*) AS BIGINT) AS n_overlaps,
      |       CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS total_overlap_sec,
      |       CAST(max(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS max_overlap_sec
      |FROM spans a JOIN spans b
      |  ON a.team = b.team AND a.day = b.day AND a.user_id < b.user_id
      | AND a.s <= b.e AND b.s <= a.e
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "interval_overlap"   -> (intervalOverlap _),
    "w1_sliding_counts"  -> (slidingCounts _),
    "w1_tumbling_counts" -> (tumblingCounts _),
    "w1_top_per_window"  -> (topPerWindow _),
    "sessionize"         -> (sessionize _),
    "session_window"     -> (sessionWindow _),
    "range_join"         -> (rangeJoin _),
    "asof_join"          -> (asofJoin _),
    "asof_join_forward"  -> (asofJoinForward _),
    "asof_join_physical" -> (asofJoinPhysical _),
    "asof_join_forward_physical" -> (asofJoinForwardPhysical _),
    "asof_join_outer"    -> (asofJoinOuter _),
    "asof_join_tolerance" -> (asofJoinTolerance _),
    "asof_join_nearest"  -> (asofJoinNearest _),
    "asof_join_nearest_tol" -> (asofJoinNearestTol _),
    "asof_join_salted"   -> (asofJoinSalted _),
    "asof_join_epoch"    -> (asofJoinEpoch _),
    "asof_join_tvf"      -> (asofJoinTvf _)
  )

  def oracles: Map[String, String] = Map(
    "interval_overlap"   -> intervalOverlapSql,
    "w1_sliding_counts"  -> slidingCountsSql,
    "w1_tumbling_counts" -> tumblingCountsSql,
    "w1_top_per_window"  -> topPerWindowSql,
    "sessionize"         -> sessionizeSql,
    "session_window"     -> sessionWindowSql,
    "range_join"         -> rangeJoinSql,
    "asof_join"          -> asofJoinSql,
    "asof_join_forward"  -> asofJoinForwardSql,
    // the custom-operator twins answer the identical oracles — the hash
    // gate is the end-to-end equivalence proof for AsOfJoinExec in each
    // direction
    "asof_join_physical" -> asofJoinSql,
    "asof_join_forward_physical" -> asofJoinForwardSql,
    "asof_join_outer"    -> asofJoinOuterSql,
    "asof_join_tolerance" -> asofJoinToleranceSql,
    "asof_join_nearest"  -> asofJoinNearestSql,
    "asof_join_nearest_tol" -> asofJoinNearestTolSql,
    "asof_join_salted"   -> asofJoinSql,  // salted rewrite must equal the plain as-of
    "asof_join_epoch"    -> asofJoinSql,  // epoch-split rewrite likewise
    "asof_join_tvf"      -> asofJoinSql
  )
}
