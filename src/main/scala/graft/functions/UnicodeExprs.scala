package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.regexp_replace
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (SURVEY.md §2 E33) — the first step of any
  * multilingual text-cleaning pipeline: web text mixes precomposed
  * (é) and decomposed (e + U+0301) forms, which hash, dedup, and
  * tokenize differently until canonicalized.
  *
  * Implemented as a native Catalyst expression with `doGenCode`
  * calling the JDK's `java.text.Normalizer` directly from generated
  * code — whole-stage codegen, no UDF serialization. The `form` is a
  * validated compile-time constant, so the generated call is static.
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  require(UnicodeNormalize.Forms(form),
    s"unicode_normalize form must be one of ${UnicodeNormalize.Forms.mkString(",")}, got $form")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeExprs {
  /** Canonical/compatibility normalization of a string column. */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  /** Accent stripping: NFD-decompose, then drop combining marks
    * (`\p{Mn}`) — 'café' → 'cafe'. Composes the codegen normalize with
    * the codegen regexp, so the whole thing stays in one
    * whole-stage-codegen projection. */
  def stripAccents(c: Column): Column =
    regexp_replace(normalizeUnicode(c, "NFD"), "\\p{Mn}", "")
}

private[functions] object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
