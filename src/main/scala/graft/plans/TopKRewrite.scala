package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructType}
import graft.functions.BoundedTopK

/** Optimizer rule: rewrite the "top k rows per key" window idiom
  *
  * {{{ Filter(rn <= k, Window(row_number() OVER (PARTITION BY p ORDER BY o) AS rn, child)) }}}
  *
  * into a bounded aggregation
  *
  * {{{ Project(child cols + rn, Generate(posexplode(top), Aggregate(p, bounded_top_k(struct(o..., child...), k), child))) }}}
  *
  * Why: the window formulation shuffles and SORTS every row of every
  * group before the filter discards all but k per key. (Spark's own
  * WindowGroupLimit mitigation still shuffles every row and runs the
  * rank inside the window sort.) The rewritten plan prunes to ≤ k per
  * key per partition map-side, so the exchange carries O(keys·k) rows
  * and no sort of the full data runs — same rows out, same exprIds,
  * so downstream operators are untouched.
  *
  * Ties beyond the ORDER BY prefix keep the first-inserted row; the
  * original `row_number` is equally nondeterministic under ties, so
  * any consistent choice is a valid answer.
  *
  * Scope guards: a single row_number window expression with the
  * default running frame, a constant rank bound ≤ [[TopKRewrite.MaxK]]
  * (the bound is per-group buffer memory), orderable sort keys, and —
  * when a projection sits between filter and window — pass-through
  * attribute references only.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) or `spark.experimental.extraOptimizations`.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Upper bound on k: the buffer is k rows per group in memory. */
  val MaxK = 1024

  private def rankBound(cond: Expression): Option[(ExprId, Int)] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) =>
      Some((a.exprId, k))
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) =>
      Some((a.exprId, k - 1))
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) =>
      Some((a.exprId, 1))
    case _ => None
  }

  private def rowNumberAlias(w: Window, id: ExprId): Option[Alias] =
    w.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(RowNumber(), wsd: WindowSpecDefinition), _))
          if al.exprId == id && wsd.orderSpec.nonEmpty &&
            wsd.frameSpecification == SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) &&
            wsd.orderSpec.forall(o =>
              o.child.deterministic && RowOrdering.isOrderable(o.child.dataType)) =>
        Some(al)
      case _ => None
    }

  private def rewrite(w: Window, rnAlias: Alias, k: Int): LogicalPlan = {
    // Spark's InferWindowGroupLimit may already have slipped a
    // WindowGroupLimit (plus sorts) under the window; the bounded
    // aggregate subsumes it, so aggregate over its child instead
    val child = w.child match {
      case wgl: WindowGroupLimit
          if wgl.partitionSpec == w.partitionSpec && wgl.orderSpec == w.orderSpec &&
            wgl.rankLikeFunction.isInstanceOf[RowNumber] && wgl.limit >= k =>
        wgl.child
      case c => c
    }
    val order = w.orderSpec
    val n = order.length
    val payload = CreateNamedStruct(
      order.zipWithIndex.flatMap { case (o, i) =>
        Seq(Literal(s"o$i"), o.child)
      } ++ child.output.zipWithIndex.flatMap { case (a, i) =>
        Seq(Literal(s"c$i"), a)
      })
    val spec = BoundedTopK.SortSpec(
      order.map(_.direction == Ascending),
      order.map(_.nullOrdering == NullsFirst))
    val topAlias = Alias(
      BoundedTopK(payload, k, Some(spec)).toAggregateExpression(), "graft_top")()
    val aggregate = Aggregate(w.partitionSpec, Seq(topAlias), child)
    val structType = payload.dataType.asInstanceOf[StructType]
    val posAttr = AttributeReference("graft_pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("graft_row", structType, nullable = false)()
    val generate = Generate(PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), aggregate)
    val restored = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(rowAttr, n + i, Some(s"c$i")), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rn = Alias(Add(posAttr, Literal(1)), rnAlias.name)(exprId = rnAlias.exprId)
    Project(restored :+ rn, generate)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      (for {
        (id, k) <- rankBound(cond)
        if k > 0 && k <= MaxK
        al <- rowNumberAlias(w, id)
      } yield rewrite(w, al, k)).getOrElse(f)
    case f @ Filter(cond, Project(plist, w: Window))
        if plist.forall(_.isInstanceOf[AttributeReference]) =>
      (for {
        (id, k) <- rankBound(cond)
        if k > 0 && k <= MaxK
        al <- rowNumberAlias(w, id)
      } yield Project(plist, rewrite(w, al, k))).getOrElse(f)
  }
}
