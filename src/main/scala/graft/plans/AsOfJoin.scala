package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftfn.PlanBridge

/** Native as-of join (SURVEY.md §2 D18b) — the full custom-operator
  * stack: a [[LogicalPlan]] node, a [[SparkStrategy]], and a
  * [[SparkPlan]] with a streaming merge-scan `doExecute`.
  *
  * Semantics: for every left row, attach the right row with the same
  * key and the LARGEST right time ≤ the left time (backward as-of),
  * null-extended when no such row exists — pandas `merge_asof` /
  * DuckDB `ASOF LEFT JOIN`.
  *
  * Why a physical operator when D18 already composes the same result
  * from a union + window: the window form buffers each key's full
  * click history in the window state and carries every left row
  * through a combined sort. This exec instead declares
  * `requiredChildDistribution`/`Ordering` (hash co-partition on key +
  * (key, time) sort — satisfied for free by pre-bucketed/sorted
  * tables, injected by EnsureRequirements otherwise) and then streams
  * BOTH sorted sides through a single forward merge pass per
  * partition: O(1) state (one candidate row), no window buffers, no
  * combined re-sort of the union. That is the shape a 100 TB
  * time-series join needs.
  *
  * Right-side rows should be unique per (key, time) — among equal
  * right times the merge keeps the last in partition order, which is
  * only deterministic if (key, time) is a total order on the right.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // co-partition both sides on the key; EnsureRequirements inserts the
  // exchanges/sorts only where the children don't already satisfy them
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind against a null-extended right schema: a non-nullable right
      // column (e.g. a primitive) MUST become nullable here or the
      // generated projection skips the null check and reads garbage
      // zeros from the all-null row
      val proj = UnsafeProjection.create(allOut,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val rightNulls = new GenericInternalRow(rightOut.size)
      // one-row lookahead into the sorted right side; rows from sort
      // iterators are reused buffers, so anything retained is copied
      var rHead: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk == null || lt == null) {
          // null key/time never matches anything
          proj(joined(lRow, rightNulls))
        } else {
          if (lastMatch != null && keyOrd.compare(lastMatchKey, lk) != 0) {
            lastMatch = null
          }
          var advancing = true
          while (advancing) {
            if (rHead == null && rIter.hasNext) rHead = rIter.next()
            if (rHead == null) advancing = false
            else {
              val rk = rKeyB.eval(rHead)
              val rt = if (rk == null) null else rTimeB.eval(rHead)
              if (rk == null || rt == null) rHead = null // skip unmatched nulls
              else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) rHead = null // key already passed: never matches again
                else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                  lastMatch = rHead.copy() // candidate; a later one may supersede
                  lastMatchKey = rk
                  rHead = null
                } else advancing = false // right is ahead in key or time
              }
            }
          }
          proj(joined(lRow, if (lastMatch != null) lastMatch else rightNulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** DataFrame API over the native operator. Column names must be
    * disjoint between the two sides (rename the right side first —
    * this also guarantees fresh attribute ids for self-join shapes).
    * Registers the planner strategy on the session idempotently. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    require(left.columns.intersect(right.columns).isEmpty,
      s"as-of sides must have disjoint column names; shared: " +
        left.columns.intersect(right.columns).mkString(","))
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    PlanBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
