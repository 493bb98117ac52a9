package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, DtwDistance, TopKByScore}

/** SparkSessionExtensions hook: registers the engine's custom expressions
  * (`vector_dot`, `dtw_distance`, `top_k_by_score`) as SQL functions and
  * injects the generator predicate-pushthrough optimizer rule
  * (`graft.plans.PushStartsWithThroughExplode`), so any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` gets the
  * full engine surface.
  *
  * This is the standard Spark extension surface (same mechanism Delta/
  * Iceberg use) — no Spark internals patched, works on a plain Spark 4
  * distribution. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: prune non-matching rows BEFORE the generator
    // explodes them (see the rule's Scaladoc for the soundness argument)
    ext.injectOptimizerRule(_ => graft.plans.PushStartsWithThroughExplode)

    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_dot(arrayExpr, arrayExpr)")
        DotProduct(children.head, children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("dtw_distance"),
      new ExpressionInfo(classOf[DtwDistance].getName, "dtw_distance"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "dtw_distance(seriesExpr, seriesExpr, band) — band must be a literal int")
        val band = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval(null).asInstanceOf[Int]
        }
        DtwDistance(children.head, children(1), band)
      }))

    ext.injectFunction((
      new FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "top_k_by_score(scoreExpr, idExpr, k) — k must be a literal int")
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval(null).asInstanceOf[Int]
        }
        TopKByScore(children.head, children(1), k).toAggregateExpression()
      }))
  }
}
