package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two array<double> columns as a native codegen'd Catalyst
  * expression.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`: Spark's higher-order
  * functions evaluate their lambdas interpreted, one invocation per element
  * (~166 µs per 64-dim pair measured at bench sf0.1 — 20 s for a 20×2000
  * top-k). This expression compiles to a tight `double` loop inside
  * whole-stage codegen (~ns per element) — the "custom Expression only
  * where built-ins are measurably too slow" escape hatch (SURVEY.md §4).
  *
  * Semantics match the HOF fold exactly: strict left-to-right summation in
  * double, so results stay bit-identical to the DuckDB oracle's sequential
  * `list_dot_product`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee array<double> inputs (Similarity casts at the scan)
  override def dataType: DataType = DoubleType
  // deterministic pure function of its children → literal inputs fold at
  // optimization time (BinaryExpression does not set this by default)
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd Σ aᵢ·bᵢ over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftShims.column(
      DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  /** ‖v‖₂ via the codegen'd dot. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity via the codegen'd dot: dot/(‖a‖·‖b‖). Callers that
    * score one side against many (top-k search) should pre-normalize and
    * use `dot` alone — one loop per pair instead of three. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** v / ‖v‖₂ (zero vectors pass through unchanged to avoid NaN). */
  def normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }
}
