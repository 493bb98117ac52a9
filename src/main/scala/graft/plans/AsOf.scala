package graft.plans

import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DataFrame-level entry point for the custom [[AsOfJoin]] operator.
  *
  * Column references are resolved by name against each side's analyzed
  * output (exprId-exact, so the node is born resolved and flows straight
  * through the analyzer). Callers should rename right-side columns that
  * collide with left-side names BEFORE joining — the operator concatenates
  * both schemas and duplicate names make downstream by-name selection
  * ambiguous, exactly as with `DataFrame.join`.
  */
object AsOf {

  /** Latest right row per left row with `rightTime <= leftTime`, equi-keyed;
    * inner semantics by default (left rows with no match drop) —
    * `outer = true` keeps every left row, null-padded on the right (the
    * pandas `merge_asof` default shape). `tolerance` bounds the match gap
    * (`merge_asof(tolerance=...)` semantics, same units as the time
    * columns): a latest-preceding row further back than the bound is NO
    * match — not a fallback to an even older one. `rightTiebreak` makes
    * same-timestamp winners deterministic: the LAST row in ascending
    * tiebreak order wins.
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      outer: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTime, rightTime,
      rightTiebreak, forward = false, outer = outer, tolerance = tolerance)

  /** Earliest right row per left row with `rightTime >= leftTime` — the
    * mirror direction; the FIRST row in ascending tiebreak order wins
    * same-timestamp ties. `outer = true` null-pads unmatched left rows;
    * `tolerance` bounds the forward gap the same way. */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      outer: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTime, rightTime,
      rightTiebreak, forward = true, outer = outer, tolerance = tolerance)

  /** Closest right row per left row in EITHER direction — the smaller of
    * the backward gap (`leftTime - rightTime`, rows at-or-before) and the
    * forward gap (rows strictly after; at-equal-time rows always count as
    * backward with gap 0). Equal gaps resolve to the BACKWARD row —
    * pandas `merge_asof(direction='nearest')` semantics. Tiebreak order
    * applies per direction: last among same-time backward rows, first
    * among same-time forward rows. `tolerance` bounds the winning gap
    * (if the nearer side is out of bound, so is the farther — no
    * fallback). `outer = true` null-pads unmatched left rows. */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      outer: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTime, rightTime,
      rightTiebreak, forward = false, outer = outer, tolerance = tolerance,
      nearest = true)

  private def join(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTiebreak: Seq[String],
      forward: Boolean,
      outer: Boolean,
      tolerance: Option[Long],
      nearest: Boolean = false): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val node = AsOfJoin(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan, _, "left")),
      rightKeys.map(attr(rPlan, _, "right")),
      attr(lPlan, leftTime, "left"),
      attr(rPlan, rightTime, "right"),
      rightTiebreak.map(attr(rPlan, _, "right")),
      forward, outer, tolerance, nearest)
    GraftShims.ofRows(left.sparkSession, node)
  }

  private def attr(plan: LogicalPlan, name: String, side: String): Attribute =
    plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"as-of $side side has no column '$name'; available: " +
        plan.output.map(_.name).mkString(", ")))
}
