package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Contains,
  Explode, Expression, Literal, StartsWith, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Generator predicate pushthrough — the reference pipeline's shape,
  * `explode(split(text, sep))` then `filter(startswith(tok, p))`
  * (`tweet-streamer/src/main/scala/main.scala:45`), evaluates the filter
  * AFTER row explosion, and Catalyst does not push predicates through
  * `Generate` (the filter references the generator's output). But the
  * implication is sound and cheap: a split token is always a substring
  * of the source text, so `startswith(tok, p)` for ANY emitted token
  * implies `contains(text, p)` — rows whose text lacks the prefix can be
  * dropped BEFORE they are exploded, and the injected `contains` filter
  * then rides Spark's own predicate pushdown all the way into the
  * parquet scan (`PushedFilters: StringContains`). On a hashtag-style
  * corpus (most rows have no '#') this prunes at the SCAN what the
  * original plan prunes only after generating every token — at 100 TB
  * the difference between reading the corpus and skipping most of it.
  *
  * Soundness guards: non-outer Generate only (outer emits a null row per
  * empty generator, which the upper filter drops under 3VL — still safe,
  * but kept conservative), deterministic split input, non-empty literal
  * prefix, and a fixpoint guard so the rule does not re-inject on its
  * own output. The ORIGINAL filter stays — the rewrite adds a necessary
  * condition, it does not replace the exact one. */
object PushStartsWithThroughExplode extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        g @ Generate(Explode(StringSplit(text, Literal(_, _), _)), _, false, _, genOut, child))
        if genOut.size == 1 && text.deterministic =>
      val tok = genOut.head
      val prefixes = conjuncts(cond).collect {
        case StartsWith(a: AttributeReference, l @ Literal(s: UTF8String, _))
            if a.exprId == tok.exprId && s.numChars() > 0 => l
      }
      if (prefixes.isEmpty) f
      else {
        val impliedSeq = prefixes.map(p => Contains(text, p): Expression)
        // Fixpoint guard per implied conjunct: with >=2 prefixes the
        // combined And never semanticEquals any single existing conjunct,
        // so the guard must check (and inject) each conjunct individually
        // or the batch re-injects forever and never converges.
        child match {
          case cf @ Filter(c2, grandchild) =>
            val present = conjuncts(c2)
            val missing = impliedSeq.filterNot(ic => present.exists(_.semanticEquals(ic)))
            if (missing.isEmpty) f
            else f.copy(child = g.copy(child =
              cf.copy(condition = (present ++ missing).reduce(And), child = grandchild)))
          case _ =>
            f.copy(child = g.copy(child = Filter(impliedSeq.reduce(And), child)))
        }
      }
  }
}
