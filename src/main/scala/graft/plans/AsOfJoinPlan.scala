package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** As-of join as a first-class Catalyst operator: for every left row, the
  * single closest right row of the same key — backward (most recent with
  * `rightTime <= leftTime`, the default), forward (`forward = true`:
  * earliest with `rightTime >= leftTime`), or nearest (`nearest = true`:
  * whichever of those two is closer in absolute gap, ties to the backward
  * row — pandas `merge_asof(direction='nearest')`). Inner semantics by default —
  * unmatched left rows drop out; `outer = true` keeps EVERY left row
  * (including null-key/null-time rows, which never match) null-padded on
  * the right — the default shape of pandas `merge_asof` and kdb `aj`.
  * `tolerance` bounds the match gap (`merge_asof(tolerance=...)`): the
  * closest right row still wins, but only within `tolerance` time units —
  * a stale quote/state row beyond the bound is NO match (not a fallback
  * to an even older one), which is the sensor/trade-quote semantics.
  *
  * Why a custom operator instead of composition (SURVEY §4 ladder, step c):
  * Spark's relational surface can express as-of only indirectly — a
  * union-tag + window trick (`TimeWindows.asofJoin`) or an exploded range
  * join. The window form pays ONE window aggregate per carried right-hand
  * column (`last(when(...)) OVER ...` each), so its cost grows with payload
  * width, and the union forces both sides into one padded schema. A
  * sort-merge as-of is a single forward pass per partition — one buffered
  * right row, any payload width, no padding — the shape every native engine
  * uses (reference semantics: latest-preceding event per key,
  * `tweet-streamer/src/main/scala/main.scala:49-55` pairs each window's
  * counts with the latest state by key). Measured at sf0.1 against the
  * window twin on the identical oracle-checked query (2 carried columns):
  * warm 0.56 s vs 0.76 s; at 6M rows the merge wins 1.49× with 2 carried
  * columns and 1.58× with 10 (9 of them 64-byte strings) — the window
  * form's width tax is the padded-union SHUFFLE (every carried column
  * rides both sides' shuffle rows), milder than one-aggregate-per-column
  * since Spark shares a single frame pass across the `last(when(...))`
  * functions; see SCALE.md's measured width + skew decision rules
  * (`graft.AsOfWidthBench`).
  *
  * Scale shape: both children hash-cluster on the join key (one shuffle
  * each, inserted by `EnsureRequirements` only when the child isn't already
  * co-partitioned) and sort within partitions; the merge itself is
  * streaming O(|L| + |R|) per partition with O(1) state — no window buffer,
  * no per-key materialization, skew-safe up to a single hot key (same
  * exposure as any clustered join; pre-salt upstream if one key dominates).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
    forward: Boolean = false,
    outer: Boolean = false,
    tolerance: Option[Long] = None,
    nearest: Boolean = false) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi-key on each side, same count")
  require(!(forward && nearest),
    "as-of direction is one of backward (default), forward, or nearest — " +
      "forward and nearest are mutually exclusive")
  require(tolerance.forall(_ > 0L),
    s"as-of tolerance must be positive (same units as the time columns), " +
      s"got ${tolerance.get}")
  // fail at construction, not mid-task: the merge compares keys with a
  // natural row ordering, which maps/UDTs don't define. Guarded on
  // resolvedness because the SQL TVF path builds this node with
  // UnresolvedAttribute keys (dataType would throw); the analyzer re-copies
  // the node after resolution, re-running this require with real types.
  require(!(leftKeys ++ rightKeys).forall(_.resolved) ||
      (RowOrdering.isOrderable(leftKeys) && RowOrdering.isOrderable(rightKeys)),
    s"as-of join keys must be orderable types, got " +
      s"${(leftKeys ++ rightKeys).filter(_.resolved).map(_.dataType.sql).distinct.mkString(", ")}")
  // no implicit coercion happens on a custom node (a normal equi-join gets
  // casts from EqualTo's analysis rules) — a type-mismatched key pair would
  // hash-partition and compare each side under its own type and silently
  // return wrong matches, so demand exact pairwise equality instead
  require(!(leftKeys ++ rightKeys).forall(_.resolved) ||
      leftKeys.map(_.dataType).zip(rightKeys.map(_.dataType)).forall(p => p._1 == p._2),
    s"as-of join key types must match pairwise (no implicit casts on this " +
      s"operator — cast explicitly), got " +
      s"${leftKeys.filter(_.resolved).map(_.dataType.sql).mkString("(", ",", ")")} vs " +
      s"${rightKeys.filter(_.resolved).map(_.dataType.sql).mkString("(", ",", ")")}")
  // the batch merge sorts complete partitions — impossible over an unbounded
  // side; fail at analysis with the streaming alternative named
  require(!childrenResolved || (!left.isStreaming && !right.isStreaming),
    "as-of join does not support streaming inputs; use the streaming twin " +
      "graft.streaming.StreamingWindows.asofTws (buffer-until-watermark)")

  // outer null-pads the right side, so its attributes must surface as
  // nullable regardless of the child's schema (same rule as LeftOuter Join)
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: the logical [[AsOfJoin]] has exactly one physical
  * realization ([[AsOfJoinExec]]); registered via
  * `SparkSessionExtensions.injectPlannerStrategy` in `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, fwd, out, tol, near) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, fwd, out, tol, planLater(l), planLater(r), near) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join.
  *
  * Planner contract: children cluster by their join keys and sort by
  * (keys, time[, tiebreak]) ascending — `EnsureRequirements` inserts the
  * exchanges/sorts only where the child's existing partitioning/ordering
  * doesn't already satisfy them (so an upstream bucketed or pre-sorted
  * source joins with zero extra shuffles). Backward merge keeps one
  * candidate row — the latest right row `<=` the current left time; ties
  * on time resolve to the LAST right row in tiebreak order. Forward merge
  * needs no buffer at all: the match is the right cursor itself, the
  * first same-key row `>=` the left time (not consumed — several left
  * rows may share one next right row); ties resolve to the FIRST right
  * row in tiebreak order. Both tie policies are what the ascending sort
  * yields naturally, and both are deterministic — required for the
  * hash-compared oracle. Null keys and null times never match, mirroring
  * SQL equi-join semantics. With `outer = true` every left row is emitted:
  * unmatched rows (including null-key/null-time ones) carry a null-padded
  * right side — the pandas `merge_asof` / DuckDB `ASOF LEFT JOIN` shape.
  *
  * Not whole-stage-codegen'd: the operator sits between two sorted streams
  * and does O(1) work per row; codegen would buy nothing measurable (the
  * sorts dominate) at the cost of a hand-rolled `CodegenSupport` produce/
  * consume pair. Declares `outputOrdering` = left child ordering so a
  * downstream `orderBy(key, time)` plans zero extra sorts.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
    forward: Boolean,
    outer: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan,
    nearest: Boolean = false) extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    s"as-of time columns must be BIGINT (epoch-like), got " +
      s"${leftTime.dataType.sql} / ${rightTime.dataType.sql}")

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTiebreak)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // capture only serializable pieces; codegen'd orderings/projections are
    // built per-partition inside the closure
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val isForward = forward
    val isNearest = nearest
    val isOuter = outer
    val tol = tolerance
    // the projection's output attrs must be nullable on the right when
    // outer-padding, or codegen'd null checks get elided and the pad row
    // writes garbage
    val outAttrs = output

    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions requires equal partition counts; EnsureRequirements
    // guarantees it today by reconciling the two ClusteredDistributions —
    // fail with an actionable message rather than zipPartitions' raw
    // "can only zip RDDs with same number of elements" if a future
    // AQE/partitioning change ever breaks that invariant
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children must be co-partitioned: left has " +
        s"${lRdd.getNumPartitions} partitions, right ${rRdd.getNumPartitions} — " +
        "EnsureRequirements should have reconciled both ClusteredDistributions")

    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rightNullRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      if (isForward) new Iterator[InternalRow] {
        // forward needs no candidate buffer: the right cursor itself is
        // the match (first same-key row at-or-after the left time) and is
        // NOT consumed on match — later left rows may share it. Holding
        // the cursor without calling rIter.next() is safe (iterator
        // buffers are only overwritten by the next next() call).
        private var rightRow: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        private var staged: InternalRow = null

        /** Advance the right side to the first row NOT before
          * `(lKey, lTime)`; rows with null keys or times never match and
          * are skipped outright. Returns true iff the cursor landed on a
          * same-key row at-or-after `lTime` — i.e. this left row's match
          * (saves re-projecting/re-comparing the key in the hot loop). */
        private def advance(lKey: UnsafeRow, lTime: Long): Boolean = {
          var matched = false
          var continue = rightRow != null
          while (continue) {
            val rKey = rKeyProj(rightRow)
            val skip =
              if (rKey.anyNull) true
              else {
                val cmp = keyOrd.compare(rKey, lKey)
                if (cmp < 0) true
                else if (cmp == 0) {
                  val t = rTimeProj(rightRow)
                  if (t.isNullAt(0) || t.getLong(0) < lTime) true
                  else { matched = true; continue = false; false }
                } else { continue = false; false } // later key: stop
              }
            if (skip) {
              rightRow = if (rIter.hasNext) rIter.next() else null
              continue = rightRow != null
            }
          }
          matched
        }

        override def hasNext: Boolean = {
          while (staged == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            var matched = false
            if (!lKey.anyNull) {
              val t = lTimeProj(lRow)
              if (!t.isNullAt(0) && advance(lKey, t.getLong(0))) {
                // tolerance: the closest at-or-after row either matches
                // within the bound or the left row has no match at all
                val gap = rTimeProj(rightRow).getLong(0) - t.getLong(0)
                if (tol.forall(gap <= _)) {
                  staged = resultProj(joined(lRow, rightRow))
                  matched = true
                }
              }
            }
            if (!matched && isOuter) staged = resultProj(joined(lRow, rightNullRow))
            if (staged != null) numOutputRows += 1
          }
          staged != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty as-of iterator")
          val out = staged
          staged = null
          out
        }
      }
      else new Iterator[InternalRow] {
        // single lookahead right row (iterator-owned buffer, no copy needed
        // until it becomes the candidate)
        private var rightRow: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        // latest right row with time <= current left time, for candidateKey;
        // both are defensive copies because projections reuse their buffers
        private var candidate: UnsafeRow = null
        private var candidateKey: UnsafeRow = null
        private var candidateTime: Long = 0L // valid only while candidate != null
        private var staged: InternalRow = null

        /** Advance the right side to the last row `<= (lKey, lTime)`,
          * buffering the most recent same-key row as the candidate. */
        private def advance(lKey: UnsafeRow, lTime: Long): Unit = {
          if (candidateKey != null && keyOrd.compare(candidateKey, lKey) != 0) {
            candidate = null
            candidateKey = null
          }
          var continue = rightRow != null
          while (continue) {
            val rKey = rKeyProj(rightRow)
            if (rKey.anyNull) { // null keys never join; skip the row
              rightRow = if (rIter.hasNext) rIter.next() else null
              continue = rightRow != null
            } else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) { // earlier key: discard, no left row wants it now
                rightRow = if (rIter.hasNext) rIter.next() else null
                continue = rightRow != null
              } else if (cmp == 0) {
                val t = rTimeProj(rightRow)
                if (t.isNullAt(0)) { // null time never matches
                  rightRow = if (rIter.hasNext) rIter.next() else null
                  continue = rightRow != null
                } else if (t.getLong(0) <= lTime) {
                  candidate = rightRow.asInstanceOf[UnsafeRow].copy()
                  candidateKey = rKey.copy()
                  candidateTime = t.getLong(0)
                  rightRow = if (rIter.hasNext) rIter.next() else null
                  continue = rightRow != null
                } else continue = false // future row: keep for later left rows
              } else continue = false   // later key: keep for later left rows
            }
          }
        }

        /** Nearest direction: after the backward advance, `candidate` is the
          * latest same-key row `<= lTime` and `rightRow` — when it still has
          * the same key — is exactly the FIRST same-key row `> lTime` (the
          * forward match; same-time rows were consumed into the backward
          * candidate, so a forward gap is always > 0). Pick the smaller
          * absolute gap, ties to the backward row, then apply the tolerance
          * to the winner (if the nearer side is out of bound, the farther
          * side is too, so no second chance is needed). Gaps use saturating
          * subtraction so pathological epoch extremes compare sanely instead
          * of overflowing. */
        private def satGap(a: Long, b: Long): Long = {
          val g = a - b
          if (a >= b && g < 0) Long.MaxValue else g // overflow → saturate
        }

        private def nearestMatch(lRow: InternalRow, lKey: UnsafeRow, lTime: Long): InternalRow = {
          val backGap = if (candidate != null) satGap(lTime, candidateTime) else -1L
          var fwdGap = -1L
          if (rightRow != null) {
            val rKey = rKeyProj(rightRow)
            if (!rKey.anyNull && keyOrd.compare(rKey, lKey) == 0) {
              val rt = rTimeProj(rightRow)
              if (!rt.isNullAt(0)) fwdGap = satGap(rt.getLong(0), lTime)
            }
          }
          val pickBack = candidate != null && (fwdGap < 0 || backGap <= fwdGap)
          if (pickBack) {
            if (tol.forall(backGap <= _)) resultProj(joined(lRow, candidate)) else null
          } else if (fwdGap >= 0) {
            if (tol.forall(fwdGap <= _)) resultProj(joined(lRow, rightRow)) else null
          } else null
        }

        override def hasNext: Boolean = {
          while (staged == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            if (!lKey.anyNull) {
              val t = lTimeProj(lRow)
              if (!t.isNullAt(0)) {
                advance(lKey, t.getLong(0))
                if (isNearest) {
                  staged = nearestMatch(lRow, lKey, t.getLong(0))
                } else if (candidate != null &&
                    // tolerance: the latest preceding row either matches
                    // within the bound or the left row has no match at all
                    // (an even older row is never a fallback)
                    tol.forall(t.getLong(0) - candidateTime <= _))
                  staged = resultProj(joined(lRow, candidate))
              }
            }
            if (staged == null && isOuter) staged = resultProj(joined(lRow, rightNullRow))
            if (staged != null) numOutputRows += 1
          }
          staged != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty as-of iterator")
          val out = staged
          staged = null
          out
        }
      }
    }
  }
}
