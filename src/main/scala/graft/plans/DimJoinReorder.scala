package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (C41): cost-based reorder of left-deep dimension
  * joins — the decision half of C40's join-order probe. C40 reports
  * the uniform-containment ranking as a pre-flight diagnostic; this
  * rule USES the same model inside Catalyst, completing
  * probe → decision.
  *
  * Model (textbook uniform containment, the one C40 audits against
  * true intermediate sizes): joining the fact with a filtered
  * dimension of selectivity σ shrinks the fact by σ, so the cost of a
  * left-deep order is Σ_k n_fact·Π_{i≤k} σ_i — minimized by joining
  * dimensions in ASCENDING σ. σ per branch comes from Catalyst's own
  * statistics: σ = estimated rows of the (filtered) branch / rows of
  * its base relation, i.e. exactly what `FilterEstimation` computes
  * from ANALYZE-collected column stats (range fraction for
  * inequalities, 1/ndv for equality).
  *
  * Fires ONLY when the chain is safely permutable and the estimate is
  * grounded:
  *  - every join in the chain is INNER, condition present, no join
  *    hints (a user hint pins the user's order);
  *  - each dimension's condition references only the FACT side and
  *    that dimension (cross-dimension predicates make the permutation
  *    semantics-sensitive — bail);
  *  - every branch AND its base relation have a catalog `rowCount`
  *    (CBO stats). A raw file scan has `sizeInBytes` only, so
  *    un-ANALYZEd queries are never touched — that IS the negative
  *    guard, pinned by DimJoinReorderSpec: no stats, no rewrite.
  *
  * The rebuilt chain keeps the fact leftmost and restores the
  * original output order with one Project (same exprIds — downstream
  * operators are untouched; CollapseProject folds it away when
  * another projection sits above). Sorting is stable and idempotent,
  * so the fixed-point batch converges in one extra pass.
  *
  * At 100 TB the reorder is the difference between dragging an
  * un-shrunk fact through the expensive dimensions first and cutting
  * it down with the most selective probe before anything wide runs —
  * the exact gap C40's `est_cost`/`act_cost` columns quantify.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) or `spark.experimental.extraOptimizations`.
  */
object DimJoinReorder extends Rule[LogicalPlan] {

  private case class Branch(plan: LogicalPlan, cond: Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j: Join => tryReorder(j).getOrElse(j)
  }

  /** Unstack a left-deep chain of hint-free inner joins into
    * (fact, branches bottom-up). Column pruning interleaves
    * pass-through Projects between the joins of a star query (the
    * fact's carried columns shrink join by join); those are pruning
    * only — attribute references, no computation — so the unstack
    * looks through them and the rebuild drops them (the rebuilt chain
    * carries a superset of columns per step; the final restoring
    * Project re-establishes the original output, and physical-side
    * column pruning re-applies at the scans where it matters).
    * Anything else — computing Projects, outer joins, hinted joins —
    * ends the chain rather than being reasoned through. */
  private def unstack(p: LogicalPlan, acc: List[Branch]): (LogicalPlan, List[Branch]) =
    p match {
      case Join(l, r, Inner, Some(c), JoinHint.NONE) =>
        unstack(l, Branch(r, c) :: acc)
      case pr: Project
          if pr.projectList.forall(_.isInstanceOf[AttributeReference]) &&
            pr.child.isInstanceOf[Join] =>
        unstack(pr.child, acc)
      case other => (other, acc)
    }

  private def baseRows(p: LogicalPlan): Option[BigInt] = p match {
    case f: Filter => baseRows(f.child)
    case pr: Project => baseRows(pr.child)
    case l: LeafNode => l.stats.rowCount
    case _ => None
  }

  /** σ = estimated surviving fraction of the branch's base relation;
    * None when either count is unavailable (→ rule does not fire). */
  private def sigma(p: LogicalPlan): Option[BigDecimal] =
    for {
      est <- p.stats.rowCount
      base <- baseRows(p) if base > 0
    } yield BigDecimal(est) / BigDecimal(base)

  private def tryReorder(j: Join): Option[LogicalPlan] = {
    val (fact, branches) = unstack(j, Nil)
    if (branches.length < 2) return None
    val factOut = fact.outputSet
    // permutable only if every condition is fact ⋈ own-dimension
    val independent = branches.forall { b =>
      b.cond.references.subsetOf(factOut ++ b.plan.outputSet)
    }
    if (!independent) return None
    val sigmas = branches.map(b => sigma(b.plan))
    if (sigmas.exists(_.isEmpty)) return None
    val sorted = branches.zip(sigmas.map(_.get))
      .sortBy(_._2) // stable: equal-σ branches keep the written order
      .map(_._1)
    if (sorted == branches) return None
    val rebuilt = sorted.foldLeft(fact) { (acc, b) =>
      Join(acc, b.plan, Inner, Some(b.cond), JoinHint.NONE)
    }
    // same attribute set, new order — restore the original projection
    Some(Project(j.output, rebuilt))
  }
}
