package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, Literal, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SortExec, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftfn.PlanBridge
import org.apache.spark.sql.types.LongType

/** Native distributed global rank / prefix scan as ONE custom physical
  * operator — a [[LogicalPlan]] node, a [[SparkStrategy]], and a
  * [[SparkPlan]] that appends every row's 1-based global rank within
  * its group (`rnAttr`), its group's total size (`nAttr`), and —
  * when `sumExpr` is set — the INCLUSIVE running sum of that long
  * expression in rank order (`sumAttr`): a distributed prefix scan,
  * the primitive behind global cumulative sums that would otherwise
  * need a single-reducer unpartitioned window.
  *
  * Shape: `requiredChildDistribution = OrderedDistribution(group ++
  * order)` plants ONE range exchange (satisfied for free by an
  * existing `repartitionByRange`), so every partition holds a
  * contiguous slice of the key space. `doExecute` then consumes that
  * exchange twice within the SAME query execution — partition ids are
  * coherent by construction, the guarantee the earlier two-branch
  * plan needed ReuseExchange for:
  *
  *  1. a lightweight counting job hash-aggregates per-partition group
  *     counts straight off the (unsorted) shuffle output — no sort,
  *     no second exchange, no window, and the driver-side merge is
  *     O(#groups + #partitions) because range partitioning keeps each
  *     group in consecutive partitions;
  *  2. the rank pass sorts each partition with a planned [[SortExec]]
  *     (Tungsten radix sort, spill-aware) and emits `offset + local
  *     position` in one sequential InternalRow pass, looking up the
  *     broadcast (offset, total) maps only at group-run boundaries.
  *
  * This replaces the previous LocalRank operator + counts-aggregate +
  * offsets-window + broadcast-join tail: the sort still runs exactly
  * once over the data, and the per-row broadcast-join probe is gone.
  * Group cardinality bounds the broadcast exactly as it bounded the
  * old offsets broadcast. Ranks among `order` ties follow
  * partition-local order — pass a total order when exact positions
  * must be deterministic. */
case class GlobalRankPlan(groupExprs: Seq[Expression], orderExprs: Seq[Expression],
                          rnAttr: Attribute, nAttr: Attribute,
                          sumExpr: Option[Expression], sumAttr: Option[Attribute],
                          totAttr: Option[Attribute],
                          maxGroups: Int,
                          rankFilter: Option[Expression],
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] =
    child.output ++ (Seq(rnAttr, nAttr) ++ sumAttr ++ totAttr)
  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(rnAttr, nAttr) ++ sumAttr ++ totAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRankPlan =
    copy(child = newChild)
}

object GlobalRankPlan {
  def create(groupExprs: Seq[Expression], orderExprs: Seq[Expression],
             rankCol: String, countCol: String, maxGroups: Int,
             child: LogicalPlan,
             sumExpr: Option[Expression] = None,
             runCol: String = "run_sum",
             totCol: Option[String] = None): GlobalRankPlan =
    GlobalRankPlan(groupExprs, orderExprs,
      AttributeReference(rankCol, LongType, nullable = false)(),
      AttributeReference(countCol, LongType, nullable = false)(),
      sumExpr,
      sumExpr.map(_ => AttributeReference(runCol, LongType, nullable = false)()),
      totCol.map(n => AttributeReference(n, LongType, nullable = false)()),
      maxGroups, rankFilter = None, child)
}

case class GlobalRankExec(groupExprs: Seq[Expression], orderExprs: Seq[Expression],
                          rnAttr: Attribute, nAttr: Attribute,
                          sumExpr: Option[Expression], sumAttr: Option[Attribute],
                          totAttr: Option[Attribute],
                          maxGroups: Int,
                          rankFilter: Option[Expression],
                          child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    child.output ++ (Seq(rnAttr, nAttr) ++ sumAttr ++ totAttr)

  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(rnAttr, nAttr) ++ sumAttr ++ totAttr)

  private def sortOrders: Seq[SortOrder] =
    (groupExprs ++ orderExprs).map(SortOrder(_, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(sortOrders) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  // the internal SortExec pass emits each partition in (group ++
  // order) order — declared so downstream consumers never re-sort
  override def outputOrdering: Seq[SortOrder] = sortOrders

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    // a constant key expression keeps the no-group case on the same
    // code path: one global group
    val keyExprs = if (groupExprs.isEmpty) Seq(Literal(1)) else groupExprs
    val childRDD = child.execute()
    val sc = childRDD.sparkContext

    // Pass 1: per-partition group counts, hash-aggregated straight off
    // the exchange output (UnsafeRow keys — bytes-equality, so SQL
    // null-safe group semantics hold). An extra job over the same
    // shuffle files; the data is NOT sorted here, so the sort below
    // still runs exactly once. Each task fails fast the moment ITS
    // map exceeds `maxGroups` — a per-partition lower bound on the
    // global count — so a high-cardinality grouping dies in the
    // executor with a clear message before any O(#groups) map is ever
    // collected toward the driver.
    val cap = maxGroups
    // Per (partition, group): [0] = row count, [1] = exact long sum of
    // `sumExpr` (0 when no running sum was requested — one dead slot
    // keeps count-only and prefix-sum on the same code path). Sums are
    // LONGS by contract (enforced in withGlobalRank): integer addition
    // is associative, so the scan is partitioning-independent — the
    // property a double sum would not have.
    val sumExprLocal = sumExpr
    val perPart: Array[mutable.HashMap[UnsafeRow, Array[Long]]] =
      sc.runJob(childRDD, (it: Iterator[InternalRow]) => {
        val proj = UnsafeProjection.create(keyExprs, childOutput)
        val sumProj = sumExprLocal.map(e =>
          UnsafeProjection.create(Seq(e), childOutput))
        val m = new mutable.HashMap[UnsafeRow, Array[Long]]
        it.foreach { row =>
          val k = proj(row)
          val v = sumProj match {
            case Some(p) => val r = p(row); if (r.isNullAt(0)) 0L else r.getLong(0)
            case None => 0L
          }
          m.get(k) match {
            case Some(acc) => acc(0) += 1L; acc(1) += v // stored key kept
            case None =>
              if (m.size >= cap) throw new IllegalStateException(
                s"GlobalRank: more than $cap distinct group keys in one " +
                "partition; the driver-side offsets merge is bounded by " +
                "group cardinality — rank within fewer groups or raise " +
                "maxGroups if the driver can hold the offsets map")
              m.update(k.copy(), Array(1L, v)) // k is a reused buffer
          }
        }
        m
      })

    // Driver merge: running prefix sums give each (partition, group)
    // its (count, value) offsets; the final sums are the group totals.
    // Range partitioning keeps each group contiguous, so total entries
    // are O(#groups + #partitions). The same `maxGroups` cap guards the
    // MERGED map: per-partition maps can each be under the cap while
    // the union is not.
    val running = new mutable.HashMap[UnsafeRow, Array[Long]]
    val offsetsPerPid: Array[Map[UnsafeRow, Array[Long]]] = perPart.map { m =>
      val off = m.iterator.map { case (k, _) =>
        val r = running.getOrElse(k, Array(0L, 0L))
        k -> Array(r(0), r(1))
      }.toMap
      m.foreach { case (k, c) =>
        val r = running.getOrElseUpdate(k, Array(0L, 0L))
        r(0) += c(0); r(1) += c(1)
      }
      if (running.size > cap) throw new IllegalStateException(
        s"GlobalRank: more than $cap distinct group keys across the input; " +
        "the per-group offsets merge and totals broadcast are " +
        "O(#groups) driver memory — rank within fewer groups or raise " +
        "maxGroups if the driver can hold the offsets map")
      off
    }
    val bcOff = sc.broadcast(offsetsPerPid)
    // (row-count total, sum total) per group — the sum total feeds the
    // optional totAttr (e.g. a group's total weight for weighted
    // quantile selection riders)
    val bcTot = sc.broadcast(running.map { case (k, v) => k -> ((v(0), v(1))) }.toMap)

    // Pass 2: planned per-partition sort, then one sequential pass —
    // broadcast lookups happen only at group-run boundaries. Output
    // rides an UnsafeProjection: downstream consumers (collect,
    // exchanges) require UnsafeRow. The sort must consume the SAME
    // partition layout pass 1 counted. Two ways to pin that:
    //  - the common case: `child` is the range exchange EnsureRequirements
    //    planted (ShuffleExchangeExec caches its ShuffledRowRDD), so a
    //    second `child.execute()` returns the IDENTICAL RDD object —
    //    verified by reference equality below — and SortExec can consume
    //    the child directly, with no re-projection of any row;
    //  - otherwise (a subtree whose execute() builds a fresh RDD each
    //    call, e.g. a projection over a re-sampled repartitionByRange),
    //    wrap the materialized `childRDD` in a scan leaf so both passes
    //    share one RDD by construction. This path pays RDDScanExec's
    //    per-row UnsafeProjection copy, which is why it is the fallback
    //    and not the default.
    val outAttrs = output
    val sortChild =
      if (child.execute() eq childRDD) child
      else PlanBridge.rddScan(childOutput, childRDD,
        "GlobalRankChild", child.outputPartitioning)
    val withSum = sumExpr.isDefined
    val withTot = totAttr.isDefined
    val totIdx = 2 + (if (withSum) 1 else 0)
    val rankFilterLocal = rankFilter
    SortExec(sortOrders, global = false, child = sortChild).execute()
      .mapPartitionsWithIndex({ (pid, it) =>
        val proj = UnsafeProjection.create(keyExprs, childOutput)
        val sumProj = sumExprLocal.map(e =>
          UnsafeProjection.create(Seq(e), childOutput))
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        // the RIDER: an optional predicate over (input ++ rn/n/run)
        // evaluated BEFORE the per-row output projection — a rank
        // selection (quantile brackets) then skips the unsafe-row copy
        // for every non-selected row instead of materializing the whole
        // ranked table for a downstream Filter to discard
        val pred = rankFilterLocal.map { e =>
          val p = org.apache.spark.sql.catalyst.expressions.Predicate
            .create(e, outAttrs)
          p.initialize(pid)
          p
        }
        val myOff = bcOff.value(pid)
        val totals = bcTot.value
        val extra = new GenericInternalRow(
          2 + (if (withSum) 1 else 0) + (if (withTot) 1 else 0))
        val joined = new JoinedRow
        var curKey: UnsafeRow = null
        var off = 0L
        var sumOff = 0L
        var total = 0L
        var local = 0L
        var localSum = 0L
        it.flatMap { row =>
          val k = proj(row)
          if (curKey == null || k != curKey) {
            curKey = k.copy()
            val o = myOff.getOrElse(curKey, Array(0L, 0L))
            off = o(0); sumOff = o(1)
            val t = totals.getOrElse(curKey, (0L, 0L))
            total = t._1
            // the group's sum total is constant per group: set once per
            // group-run boundary, reused for every row in the run
            if (withTot) extra.update(totIdx, t._2)
            local = 0L; localSum = 0L
          }
          // rank/sum state advances for EVERY row, filtered or not
          local += 1L
          extra.update(0, off + local)
          extra.update(1, total)
          sumProj.foreach { p =>
            val r = p(row)
            localSum += (if (r.isNullAt(0)) 0L else r.getLong(0))
            extra.update(2, sumOff + localSum) // inclusive running sum
          }
          val j = joined(row, extra)
          if (pred.forall(_.eval(j))) Some(outProj(j)) else None
        }
      }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankPlan(g, o, rn, n, se, sa, ta, cap, rf, child) =>
      GlobalRankExec(g, o, rn, n, se, sa, ta, cap, rf, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GlobalRank {
  /** Default bound on distinct group keys: the counting pass merges a
    * per-group offsets map on the driver and broadcasts the totals,
    * both O(#groups) — the same class of bound as the capped driver
    * probes in [[graft.operators.Sketches]]. A million (key, long)
    * entries is tens of MB of driver heap; beyond that the caller is
    * almost certainly ranking within a high-cardinality key (a
    * user_id, a doc_id) and needs a window or a join-based plan, not
    * a broadcast-offsets one. */
  val DefaultMaxGroups: Int = 1 << 20

  /** DataFrame API: appends `rankCol` (1-based global rank within the
    * group under sortCols order) and `countCol` (group size), both
    * long. Registers the planner strategy on the session idempotently.
    * Fails fast (executor-side, before any driver collect) when
    * distinct group keys exceed `maxGroups` — see [[DefaultMaxGroups]]
    * for why the bound exists. */
  def withGlobalRank(df: DataFrame, groupCols: Seq[String], sortCols: Seq[String],
                     rankCol: String = "rn", countCol: String = "n",
                     maxGroups: Int = DefaultMaxGroups,
                     sumCol: Option[String] = None,
                     runCol: String = "run_sum",
                     rankFilter: Option[(Column, Column) => Column] = None,
                     totCol: Option[String] = None,
                     rankFilterOn: Option[DataFrame => Column] = None): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GlobalRankStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GlobalRankStrategy
    }
    val plan = PlanBridge.analyzed(df)
    val resolver = spark.sessionState.analyzer.resolver
    // the appended columns must not shadow an input column: the old
    // LocalRank tail dropped its helpers, but this operator's output
    // is child.output ++ (rn, n[, run_sum]), and a duplicate name only
    // explodes later as an ambiguous-reference error far from the cause
    if (totCol.isDefined && sumCol.isEmpty)
      throw new IllegalArgumentException(
        "totCol (the group's sum total) requires sumCol — there is no " +
        "sum to total without a running-sum column")
    if (rankFilter.isDefined && rankFilterOn.isDefined)
      throw new IllegalArgumentException(
        "pass either rankFilter (a (rank, count) predicate) or " +
        "rankFilterOn (a predicate over the full output), not both")
    (Seq(rankCol, countCol) ++ sumCol.map(_ => runCol) ++ totCol).foreach { n =>
      if (plan.output.exists(a => resolver(a.name, n)))
        throw new IllegalArgumentException(
          s"rank/count/run/tot column '$n' collides with an input column " +
          s"(${plan.output.map(_.name).mkString(", ")}); pass a " +
          "different rankCol/countCol/runCol/totCol")
    }
    def attr(n: String): Attribute = plan.output
      .find(a => resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not found among ${plan.output.map(_.name).mkString(", ")}"))
    val sumExpr = sumCol.map { n =>
      val a = attr(n)
      if (a.dataType != LongType) throw new IllegalArgumentException(
        s"running-sum column '$n' must be LONG (exact, associative — a " +
        s"double prefix sum would be partitioning-dependent); got ${a.dataType}")
      a: Expression
    }
    val plan0 = GlobalRankPlan.create(groupCols.map(attr), sortCols.map(attr),
      rankCol, countCol, maxGroups, plan, sumExpr, runCol, totCol)
    // rankFilterOn generalizes rankFilter: the predicate may reference
    // ANY output column (input columns, rn/n, run_sum, the sum total) —
    // the weighted-quantile selection needs (run_sum, tot, row weight)
    val mkPred: Option[DataFrame => Column] = rankFilterOn.orElse(
      rankFilter.map(f => (d: DataFrame) => f(d(rankCol), d(countCol))))
    mkPred match {
      case None => PlanBridge.ofRows(spark, plan0)
      case Some(f) =>
        // resolve the rider predicate THROUGH the analyzer (Column DSL
        // trees are unresolved ColumnNodes until a query analyzes them):
        // select it against the bare plan, extract the resolved
        // expression — which references plan0's own rn/n attribute ids —
        // and embed it in the node for the emit-loop Predicate
        val df0 = PlanBridge.ofRows(spark, plan0)
        val predDf = df0.select(f(df0).as("__rank_pred"))
        val predExpr = PlanBridge.analyzed(predDf) match {
          case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
            p.projectList.head match {
              case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
              case other => other
            }
          case other => throw new IllegalStateException(
            s"unexpected analyzed shape for rank filter: ${other.nodeName}")
        }
        if (predExpr.dataType != org.apache.spark.sql.types.BooleanType)
          throw new IllegalArgumentException(
            s"rankFilter must be boolean, got ${predExpr.dataType.simpleString}")
        PlanBridge.ofRows(spark, plan0.copy(rankFilter = Some(predExpr)))
    }
  }
}
