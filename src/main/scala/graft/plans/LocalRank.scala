package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, TypeUtils}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftfn.PlanBridge
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native partition-local rank (the rank half of
  * `Relational.globalRank`) as a custom physical operator — a
  * [[LogicalPlan]] node, a [[SparkStrategy]], and a [[SparkPlan]]
  * whose `doExecute` appends `(__pid, __local_rn)` to every row in one
  * sequential InternalRow pass per partition.
  *
  * Why an operator instead of the RDD bridge: the node declares
  * `requiredChildDistribution = OrderedDistribution(group ++ order)`
  * and `requiredChildOrdering`, so the range exchange and the sort are
  * PLANNED — visible in explain, satisfied for free by an existing
  * `repartitionByRange`, and, critically, the exchange is the same
  * canonical subplan the offsets branch consumes, so ReuseExchange /
  * AQE stage reuse guarantees BOTH branches read the identical
  * partitioning (the RDD-bridge form relied on shuffle-level reuse
  * across separate query executions; a re-sampled boundary there
  * silently corrupts offsets — see the r6 regression test). The
  * offsets branch aggregates the exchange output directly, with no
  * sort and no second rank pass.
  *
  * Rank semantics: 1-based position within the partition, restarting
  * whenever the group-key values change — which, over input sorted by
  * (group ++ order), is the partition-local row_number. */
case class LocalRankPlan(groupExprs: Seq[Expression], orderExprs: Seq[Expression],
                         pidAttr: Attribute, rnAttr: Attribute,
                         child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ pidAttr :+ rnAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(pidAttr, rnAttr))
  override protected def withNewChildInternal(newChild: LogicalPlan): LocalRankPlan =
    copy(child = newChild)
}

object LocalRankPlan {
  def create(groupExprs: Seq[Expression], orderExprs: Seq[Expression],
             child: LogicalPlan): LocalRankPlan =
    LocalRankPlan(groupExprs, orderExprs,
      AttributeReference("__pid", IntegerType, nullable = false)(),
      AttributeReference("__local_rn", LongType, nullable = false)(),
      child)
}

case class LocalRankExec(groupExprs: Seq[Expression], orderExprs: Seq[Expression],
                         pidAttr: Attribute, rnAttr: Attribute,
                         child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ pidAttr :+ rnAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(pidAttr, rnAttr))

  private def sortOrders: Seq[SortOrder] =
    (groupExprs ++ orderExprs).map(SortOrder(_, Ascending))

  // range partitioning on (group ++ order): every partition holds a
  // contiguous slice of the key space, so local rank + a per-(pid,
  // group) offset lift is a global rank. EnsureRequirements only
  // inserts the exchange/sort where the child doesn't already provide
  // them (globalRank shares one explicit repartitionByRange).
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(sortOrders) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(sortOrders)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val bound = groupExprs.map(BindReferences.bindReference(_, child.output))
    val ords = groupExprs.map(e => TypeUtils.getInterpretedOrdering(e.dataType))
    child.execute().mapPartitionsWithIndex({ (pid, it) =>
      val extra = new GenericInternalRow(2)
      extra.update(0, pid)
      val joined = new JoinedRow
      var key: Array[Any] = null
      var r = 0L
      // group values are held across next() while the underlying row
      // buffer is reused — copy the byte-backed ones
      def copyVal(v: Any): Any = v match {
        case u: UTF8String => u.copy()
        case a: ArrayData => a.copy()
        case m: MapData => m.copy()
        case ir: InternalRow => ir.copy()
        case other => other
      }
      def sameVal(i: Int, a: Any, b: Any): Boolean =
        if (a == null) b == null
        else if (b == null) false
        else ords(i).asInstanceOf[Ordering[Any]].compare(a, b) == 0
      it.map { row =>
        if (bound.nonEmpty) {
          val k = new Array[Any](bound.length)
          var i = 0
          var same = key != null
          while (i < bound.length) {
            k(i) = copyVal(bound(i).eval(row))
            if (same && !sameVal(i, k(i), key(i))) same = false
            i += 1
          }
          if (!same) { key = k; r = 0L }
        }
        r += 1
        extra.update(1, r)
        joined(row, extra)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): LocalRankExec =
    copy(child = newChild)
}

object LocalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalRankPlan(g, o, pid, rn, child) =>
      LocalRankExec(g, o, pid, rn, planLater(child)) :: Nil
    case _ => Nil
  }
}

object LocalRank {
  /** DataFrame API: appends `__pid` (int) and `__local_rn` (long).
    * Registers the planner strategy on the session idempotently. */
  def withLocalRank(df: DataFrame, groupCols: Seq[String],
                    sortCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(LocalRankStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ LocalRankStrategy
    }
    val plan = PlanBridge.analyzed(df)
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute = plan.output
      .find(a => resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not found among ${plan.output.map(_.name).mkString(", ")}"))
    PlanBridge.ofRows(spark,
      LocalRankPlan.create(groupCols.map(attr), sortCols.map(attr), plan))
  }
}
