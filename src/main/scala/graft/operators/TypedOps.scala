package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset API coverage: case-class Encoders, groupByKey, and a
  * custom typed `Aggregator` — the type-safe face of the same Catalyst
  * machinery (SURVEY.md §1 "Dataset[T] where typed ops help").
  *
  * The Aggregator compiles to an untyped partial+final agg like any SQL
  * aggregate (no row-at-a-time penalty for the sum; the lambda surface is
  * the groupByKey key extractor, which does force object deserialization —
  * which is exactly why only the key path is typed here and the numeric
  * reduction is an Aggregator, not mapGroups: mapGroups would buffer whole
  * groups, the Aggregator streams with map-side combine at any scale). */
object TypedOps {

  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  case class CharStats(n: Long, total: Long)

  /** Typed average: mergeable (n, total) state — associative, map-side
    * combined, overflow-safe for any corpus that fits in Long chars. */
  val avgChars: Aggregator[Doc, CharStats, Double] = new Aggregator[Doc, CharStats, Double] {
    override def zero: CharStats = CharStats(0L, 0L)
    override def reduce(b: CharStats, d: Doc): CharStats =
      CharStats(b.n + 1, b.total + d.n_chars)
    override def merge(a: CharStats, b: CharStats): CharStats =
      CharStats(a.n + b.n, a.total + b.total)
    override def finish(r: CharStats): Double = r.total.toDouble / r.n
    override def bufferEncoder: Encoder[CharStats] = Encoders.product[CharStats]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed count (trivial Aggregator — the old scalalang.typed helpers were
    * removed in Spark 3). */
  val docCount: Aggregator[Doc, Long, Long] = new Aggregator[Doc, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, d: Doc): Long = b + 1
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Per-language doc count + average chars through the typed path.
    * finish() is a single integer division in double → deterministic. */
  def typedLangStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .as[Doc]
      .groupByKey(_.lang)
      .agg(avgChars.toColumn.name("avg_chars"), docCount.toColumn.name("n_docs"))
      .toDF("lang", "avg_chars", "n_docs")
      .select(col("lang"), round(col("avg_chars"), 6).as("avg_chars"), col("n_docs"))
      .orderBy("lang")
  }

  val typedLangStatsSql: String =
    """SELECT lang,
      |       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
      |       count(*) AS n_docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  case class OrderKey(o_orderkey: Long, o_orderstatus: String)
  case class LineQty(l_orderkey: Long, l_quantity: Double)

  /** Typed `cogroup`: per-order reconciliation of the order header against
    * its lineitems without a join — both sides shuffle once on the key and
    * the lambda sees the two iterators together. This is the Dataset API's
    * escape hatch for per-key merge logic no join expresses (here the
    * logic IS join-expressible, which is what makes it oracle-checkable;
    * the op exists to cover the API surface). Memory posture: the lambda
    * streams both iterators exactly once and keeps two counters — it never
    * buffers a group, so a skewed key (one order with 10^6 lines) costs
    * memory O(1), unlike a mapGroups that materializes the group.
    * Quantities are integral doubles summed as Long — exact. */
  def typedCogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus")).as[OrderKey]
      .groupByKey(_.o_orderkey)
    val lines = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity")).as[LineQty]
      .groupByKey(_.l_orderkey)
    orders.cogroup(lines) { (key, os, ls) =>
      // single pass over each iterator, constant state
      val order = if (os.hasNext) os.next() else null
      if (order == null) Iterator.empty // FK orphans (none in TPC-H data)
      else {
        var n = 0L; var qty = 0L
        ls.foreach { l => n += 1; qty += l.l_quantity.toLong }
        Iterator((key, order.o_orderstatus, n, qty))
      }
    }.toDF("o_orderkey", "o_orderstatus", "n_lines", "qty_total")
      .orderBy("o_orderkey")
  }

  val typedCogroupSql: String =
    """SELECT o_orderkey, o_orderstatus, count(l_orderkey) AS n_lines,
      |       CAST(coalesce(sum(CAST(l_quantity AS BIGINT)), 0) AS BIGINT) AS qty_total
      |FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin

  case class UserEvent(user_id: Long, event_id: Long, sec: Long)

  /** Typed secondary sort — `flatMapSortedGroups` (Spark 3.4+): the
    * engine sorts each group DURING the shuffle (sort-based aggregation
    * machinery), so the lambda receives events already in (sec,
    * event_id) order and streams them with O(1) state. The alternative
    * shapes both cost more: a window function materializes a lag column
    * corpus-wide; a `mapGroups` + in-lambda `sortBy` buffers the whole
    * group in memory — the thing that OOMs on a skewed key. Here: the
    * max inter-event gap per user, a pure single-pass fold. */
  def typedSortedGroups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"sec", $"event_id") { (uid, evs) =>
        var n = 0L; var prev = Long.MinValue; var maxGap = 0L
        evs.foreach { e =>
          if (prev != Long.MinValue && e.sec - prev > maxGap) maxGap = e.sec - prev
          prev = e.sec; n += 1
        }
        Iterator((uid, n, maxGap))
      }.toDF("user_id", "n_events", "max_gap_sec")
      .orderBy("user_id")
  }

  val typedSortedGroupsSql: String =
    """WITH gaps AS (
      |  SELECT user_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) -
      |           lag(CAST(floor(epoch(ts)) AS BIGINT))
      |             OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS gap
      |  FROM events
      |)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_sec
      |FROM gaps GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_lang_stats"    -> (typedLangStats _),
    "typed_cogroup"       -> (typedCogroup _),
    "typed_sorted_groups" -> (typedSortedGroups _)
  )

  def oracles: Map[String, String] = Map(
    "typed_lang_stats"    -> typedLangStatsSql,
    "typed_cogroup"       -> typedCogroupSql,
    "typed_sorted_groups" -> typedSortedGroupsSql
  )
}
