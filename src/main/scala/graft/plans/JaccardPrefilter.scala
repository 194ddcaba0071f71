package graft.plans

import graft.expressions.ArraySetJaccard
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: under `Filter(graft_jaccard(a, b) >= t)` with t > 0,
  * conjoin the cheap size-ratio bound that the Jaccard threshold implies —
  * `jac(A,B) ≤ min(|A|,|B|) / max(|A|,|B|)`, so a pair whose array lengths
  * are lopsided beyond 100·min ≥ t·max can be rejected from the array HEADERS
  * (two int reads) without ever running the hash-set kernel.
  *
  * This is the reference's length-ratio pruning idea (`Utils.scala:79,96`,
  * optimizationLevel 2) promoted from a hand-written join predicate to a
  * Catalyst rewrite: any query that filters on the Jaccard kernel gets the
  * prune automatically, and Catalyst additionally pushes the injected
  * size predicates through joins/projections on their own columns.
  * Sound for set-valued arrays (every dedup pipeline here array_distincts
  * its shingle sets: |A| = size(a)); duplicate-bearing inputs could only make
  * size(a) OVERSTATE |A| on both sides of the inequality, which can reject a
  * pair the exact kernel would keep — hence the rule keys on the
  * set-semantics kernel whose callers' contract is distinct arrays.
  *
  * Null semantics: null arrays make both the guard and the original
  * predicate null — the filter drops the row either way.
  */
object JaccardPrefilter extends Rule[LogicalPlan] {

  private def guards(j: ArraySetJaccard, t: Double): Seq[Expression] = {
    def sz(e: Expression) = Cast(Size(e), DoubleType)
    Seq(
      GreaterThanOrEqual(Multiply(sz(j.left), Literal(100.0)),
        Multiply(Literal(t), sz(j.right))),
      GreaterThanOrEqual(Multiply(sz(j.right), Literal(100.0)),
        Multiply(Literal(t), sz(j.left))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val newGuards = conjuncts.flatMap {
        case GreaterThanOrEqual(j: ArraySetJaccard, Literal(t: Double, DoubleType))
            if t > 0 => guards(j, t)
        case GreaterThan(j: ArraySetJaccard, Literal(t: Double, DoubleType))
            if t > 0 => guards(j, t)
        case LessThanOrEqual(Literal(t: Double, DoubleType), j: ArraySetJaccard)
            if t > 0 => guards(j, t)
        case _ => Nil
      }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (newGuards.isEmpty) f
      // guards FIRST: evaluate the two-int-read bound before the kernel
      else Filter((newGuards :+ cond).reduce(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
