package graft.plans

import graft.expressions.ArraySetJaccard
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: under `Filter(graft_jaccard_sets(a, b) >= t)` with t > 0,
  * conjoin the cheap size-ratio bound that the Jaccard threshold implies —
  * `jac(A,B) ≤ min(|A|,|B|) / max(|A|,|B|)`, so a pair whose array lengths
  * are lopsided beyond 100·min ≥ t·max can be rejected from the array HEADERS
  * (two int reads) without ever running the hash-set kernel.
  *
  * This is the reference's length-ratio pruning idea (`Utils.scala:79,96`,
  * optimizationLevel 2) promoted from a hand-written join predicate to a
  * Catalyst rewrite: any query that filters on the marked Jaccard kernel gets
  * the prune automatically, and Catalyst additionally pushes the injected
  * size predicates through joins/projections on their own columns.
  *
  * Soundness gate: `size(a) = |A|` only holds for duplicate-free arrays — on
  * duplicate-bearing input the raw size OVERSTATES the cardinality and the
  * guard could reject a qualifying pair (e.g. a=[1,1,1,1], b=[1] has jac
  * 100 but raw sizes 4 vs 1). The rule therefore fires ONLY on kernels whose
  * `assumeDistinct` marker records the caller's duplicate-free promise
  * (`graft_jaccard_sets` in SQL; the dedup pipelines, whose shingle arrays
  * are array_distinct-ed at construction). The unmarked `graft_jaccard`
  * keeps its documented any-input semantics untouched — a sound guard there
  * would need size(array_distinct(·)) on both sides, an O(n) hash-set pass
  * in the same cost class as the kernel it tries to avoid.
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
            if t > 0 && j.assumeDistinct => guards(j, t)
        case GreaterThan(j: ArraySetJaccard, Literal(t: Double, DoubleType))
            if t > 0 && j.assumeDistinct => guards(j, t)
        case LessThanOrEqual(Literal(t: Double, DoubleType), j: ArraySetJaccard)
            if t > 0 && j.assumeDistinct => guards(j, t)
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
