package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Banded DTW (dynamic time warping) distance between two array<double>
  * series, as a native codegen'd Catalyst expression.
  *
  * Why a custom Expression (SURVEY.md §4 escape hatch): DTW is a 2-D
  * dynamic program — `min` over three predecessors per cell — which no
  * composition of built-in array/HOF functions expresses without
  * materializing the O(n·m) cell matrix as exploded rows (a corpus-sized
  * blow-up per PAIR). Here the DP runs inside whole-stage codegen in two
  * O(band) rolling rows, so a scoring join streams pairs through a tight
  * primitive-double loop exactly like [[DotProduct]].
  *
  * Semantics: squared-point-cost DTW with a Sakoe-Chiba band of width
  * `band` (|i−j| ≤ band); returns the square root of the accumulated
  * cost. Out-of-band cells are +∞. `band ≥ max(n,m)` degenerates to
  * unconstrained DTW; `band = 0` on equal-length series degenerates to
  * the L2 distance (the diagonal path) — both pinned in specs. Unlike
  * cosine/dot this is a true elastic measure: it matches series that are
  * locally shifted or stretched in time, which is the entire reason the
  * time-series-similarity literature uses it over lockstep metrics.
  */
case class DtwDistance(left: Expression, right: Expression, band: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(band >= 0, s"band must be >= 0, got $band")

  // array<int>/array<float> are widened to array<double> at analysis time
  // (ArrayData.getDouble would silently misread their packed layout);
  // non-array inputs fail analysis instead of cast-crashing in codegen.
  // (no Seq[AbstractDataType] annotation — that type is private[sql])
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "dtw_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0) return Double.PositiveInfinity
    val w = math.max(band, math.abs(n - m)) // band must admit the corner
    val inf = Double.PositiveInfinity
    var prev = Array.fill(m + 1)(inf)
    var cur = Array.fill(m + 1)(inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      var j = math.max(1, i - w)
      val jHi = math.min(m, i + w)
      while (j <= jHi) {
        val d = x.getDouble(i - 1) - y.getDouble(j - 1)
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = d * d + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.sqrt(prev(m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val w = ctx.freshName("w"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val jHi = ctx.freshName("jHi")
      val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val prev = ctx.freshName("prev"); val cur = ctx.freshName("cur")
      val tmp = ctx.freshName("tmp")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |if ($n == 0 || $m == 0) {
         |  ${ev.value} = Double.POSITIVE_INFINITY;
         |} else {
         |  int $w = java.lang.Math.max($band, java.lang.Math.abs($n - $m));
         |  double[] $prev = new double[$m + 1];
         |  double[] $cur = new double[$m + 1];
         |  java.util.Arrays.fill($prev, Double.POSITIVE_INFINITY);
         |  $prev[0] = 0.0;
         |  for (int $i = 1; $i <= $n; $i++) {
         |    java.util.Arrays.fill($cur, Double.POSITIVE_INFINITY);
         |    int $jHi = java.lang.Math.min($m, $i + $w);
         |    for (int $j = java.lang.Math.max(1, $i - $w); $j <= $jHi; $j++) {
         |      double $d = $a.getDouble($i - 1) - $b.getDouble($j - 1);
         |      double $best = java.lang.Math.min($prev[$j],
         |          java.lang.Math.min($cur[$j - 1], $prev[$j - 1]));
         |      $cur[$j] = $d * $d + $best;
         |    }
         |    double[] $tmp = $prev; $prev = $cur; $cur = $tmp;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($prev[$m]);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwDistance =
    copy(left = newLeft, right = newRight)
}

object DtwDistance {
  /** Banded DTW distance column over two array<double> series. */
  def dtw(a: Column, b: Column, band: Int = 3): Column =
    GraftShims.column(
      DtwDistance(GraftShims.expression(a), GraftShims.expression(b), band))
}
