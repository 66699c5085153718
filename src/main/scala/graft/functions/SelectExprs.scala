package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen support for the binned-selection operators (SURVEY.md §2
  * D72/D83): the order-preserving IEEE-754 bit key that lets a
  * quantile selection bin doubles WITHOUT a min/max pass, a sampling
  * job, or any floating-point bucket arithmetic that could go
  * non-monotone at boundaries. */
object SelectExprs {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Monotone (order-preserving) long key of a double: the raw IEEE-754
    * bits with the sign-magnitude order repaired (negatives flip their
    * magnitude bits), the classic sortable-double transform. For any
    * doubles a ≤ b, key(a) ≤ key(b) — exactly, by bit layout, with no
    * rounding anywhere — so any suffix truncation of the key is a valid
    * monotone BINNING of the value axis (NaN keys sort greatest,
    * matching Spark's ordering). */
  def sortableDoubleBits(v: Column): Column = col(SortableDoubleBits(expr(v)))
}

case class SortableDoubleBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sortable_double_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sortable_double_bits needs a DOUBLE argument, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""long $b = Double.doubleToLongBits($c);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
