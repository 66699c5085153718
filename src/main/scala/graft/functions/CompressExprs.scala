package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string (SURVEY.md §2 E54):
  * compressed_bytes / raw_bytes under zlib level 6 — the
  * quality-filter signal published corpus pipelines use to catch
  * machine-generated / templated / repeated text, which compresses
  * far below natural prose. Low ratio ⇒ highly redundant document.
  *
  * Native Catalyst expression with `doGenCode` calling the static
  * helper directly from generated code — stays inside whole-stage
  * codegen (the deflate itself dominates; the point is avoiding UDF
  * serialization and keeping the surrounding projection fused).
  * Deterministic for a fixed JDK zlib, which is why the driver check
  * is a GATE (planted repetitive text must compress below the real
  * corpus) rather than a value oracle. Empty strings → ratio 1.0. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  /** compressed/raw byte ratio, zlib level 6; 1.0 for empty input. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }
}

object CompressExprs {
  def deflateRatio(c: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(c)))
}
