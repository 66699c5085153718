package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a provably-bounded interval join
  *
  * {{{ Join(Inner, p >= lo && p < lo + C) }}}
  *
  * (C a positive literal — the interval width is knowable at plan
  * time) into the binned equi-join
  *
  * {{{
  * Project(original output,
  *   Join(Inner, bin_i = bin_p && p >= lo && p < lo + C,
  *     Generate(explode(sequence(floor(lo/C), floor((lo+C)/C))), intervals),
  *     Project(+ bin_p = floor(p/C), points)))
  * }}}
  *
  * Why: without an equi-conjunct Spark's only non-broadcast plans for
  * this join are nested-loop/cartesian — a dead end when BOTH sides
  * are large. Quantizing to width-C bins gives the join an equality
  * key (each interval overlaps ≤ 2 bins, each point exactly 1, so a
  * matching pair meets exactly once), turning it into a partitionable
  * shuffled hash/sort-merge join that AQE can skew-split; the original
  * range predicate survives as the residual filter. Same rows, same
  * exprIds — downstream operators untouched.
  *
  * Scope guards: inner join, both bound expressions deterministic and
  * DoubleType, each referencing exactly one (opposite) side, width a
  * positive double literal, and the `lo` of both conjuncts the same
  * expression (`semanticEquals`). Joins that already carry an equality
  * conjunct never reach the pattern (two-conjunct And only).
  *
  * Registered via [[graft.functions.GraftExtensions]] or
  * `spark.experimental.extraOptimizations`.
  */
object RangeBinRewrite extends Rule[LogicalPlan] {

  /** (point, lo, width) when the condition is the bounded-range shape. */
  private def boundedRange(cond: Expression): Option[(Expression, Expression, Double)] = {
    def widthOf(hi: Expression, lo: Expression): Option[Double] = hi match {
      case Add(l2, Literal(c: Double, DoubleType), _) if l2.semanticEquals(lo) && c > 0 =>
        Some(c)
      case _ => None
    }
    cond match {
      case And(GreaterThanOrEqual(p1, lo), LessThan(p2, hi)) if p1.semanticEquals(p2) =>
        widthOf(hi, lo).map((p1, lo, _))
      case And(LessThan(p2, hi), GreaterThanOrEqual(p1, lo)) if p1.semanticEquals(p2) =>
        widthOf(hi, lo).map((p1, lo, _))
      case _ => None
    }
  }

  private def binOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(e, Literal(w))), LongType)

  private def rewrite(j: Join, p: Expression, lo: Expression, w: Double,
                      intervals: LogicalPlan, points: LogicalPlan,
                      intervalsLeft: Boolean): LogicalPlan = {
    // Sequence is TimeZoneAware: optimizer-inserted instances must
    // carry the zone themselves — ResolveTimeZone only runs in analysis
    val seqExpr = Sequence(
      binOf(lo, w), binOf(Add(lo, Literal(w)), w), Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val ivBin = AttributeReference("graft_bin_i", LongType, nullable = false)()
    val ivPlan = Generate(Explode(seqExpr),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ivBin), intervals)
    val ptBinAlias = Alias(binOf(p, w), "graft_bin_p")()
    val ptPlan = Project(points.output :+ ptBinAlias, points)
    val newCond = And(EqualTo(ivBin, ptBinAlias.toAttribute), j.condition.get)
    val joined =
      if (intervalsLeft) Join(ivPlan, ptPlan, Inner, Some(newCond), JoinHint.NONE)
      else Join(ptPlan, ivPlan, Inner, Some(newCond), JoinHint.NONE)
    Project(j.left.output ++ j.right.output, joined)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      (for {
        (p, lo, w) <- boundedRange(cond)
        if p.deterministic && lo.deterministic &&
          p.dataType == DoubleType && lo.dataType == DoubleType
        sides <- {
          val pRefs = p.references; val loRefs = lo.references
          if (pRefs.nonEmpty && loRefs.nonEmpty &&
            pRefs.subsetOf(right.outputSet) && loRefs.subsetOf(left.outputSet))
            Some((left, right, true)) // intervals on the left
          else if (pRefs.nonEmpty && loRefs.nonEmpty &&
            pRefs.subsetOf(left.outputSet) && loRefs.subsetOf(right.outputSet))
            Some((right, left, false)) // intervals on the right
          else None
        }
      } yield rewrite(j, p, lo, w, sides._1, sides._2, sides._3)).getOrElse(j)
  }
}
