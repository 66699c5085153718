package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Whole-stage-codegen vector primitives for the similarity operators
  * (SURVEY.md §2 E5-E7).
  *
  * The declarative forms (`zip_with` + `aggregate`) are interpreted
  * per-element lambda calls — fine for one pass over a table, ruinous
  * inside an O(pairs) join where the round-1 bench spent ~170 s at
  * sf0.1. These expressions generate a tight scalar loop instead,
  * while keeping BIT-IDENTICAL arithmetic to the declarative form and
  * the DuckDB oracle: each float is promoted to double (exact), the
  * products are accumulated in array order, so `dot` is reproducible
  * across partitionings and engines.
  */
object VectorExprs {
  private[graft] def col(e: Expression): Column = ColumnBridge.column(e)
  private[graft] def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Σ aᵢ·bᵢ over two `array<float>` columns, double accumulation in
    * array order. Null if either array is null, any element is null,
    * or lengths differ (the `zip_with` null-padding semantics). */
  def floatDot(a: Column, b: Column): Column = col(FloatVecDot(expr(a), expr(b)))

  /** Random-hyperplane LSH bucket id: bit i = sign(emb · planes(i)).
    * Fails fast when the embedding length differs from the plane
    * dimension instead of silently degenerating to one bucket. */
  def hyperplaneBucket(emb: Column, planes: Array[Array[Double]]): Column =
    col(HyperplaneBucket(expr(emb), planes))
}

case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_vec_dot expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // every local via freshName: the same expression may be inlined
      // several times into ONE generated scope (filter + projection),
      // and fixed names make janino reject the whole stage → silent
      // interpreter fallback
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit (≤ nPlanes) sign-pattern bucket from fixed hyperplanes.
  * `planes` is a driver-side constant shipped as a codegen reference
  * object; each row costs nPlanes·dim fused multiply-adds. Throws on
  * embedding/plane dimension mismatch (null arrays stay null; a null
  * element zeroes that plane's bit, matching the declarative form's
  * `IF(NULL > 0, ...)` behavior). */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects ARRAY<FLOAT>, got ${other.simpleString}")
  }

  private val dim: Int = if (planes.nonEmpty) planes(0).length else 0
  // flat row-major [nPlanes * dim] for cache-friendly codegen access
  private lazy val flat: Array[Double] = planes.flatten

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == dim,
      s"hyperplane_bucket: embedding dim ${v.numElements()} != plane dim $dim")
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      var acc = 0.0
      var sawNull = false
      var i = 0
      while (i < dim && !sawNull) {
        if (v.isNullAt(i)) sawNull = true
        else acc += v.getFloat(i).toDouble * flat(p * dim + i)
        i += 1
      }
      if (!sawNull && acc > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planes", flat, "double[]")
    val nPlanes = planes.length
    nullSafeCodeGen(ctx, ev, v => {
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val sawNull = ctx.freshName("sawNull")
      val i = ctx.freshName("i")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_bucket: embedding dim " + $v.numElements() + " != plane dim " + $dim);
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $acc = 0.0;
         |  boolean $sawNull = false;
         |  for (int $i = 0; $i < $dim && !$sawNull; $i++) {
         |    if ($v.isNullAt($i)) { $sawNull = true; }
         |    else { $acc += ((double) $v.getFloat($i)) * $flatRef[$p * $dim + $i]; }
         |  }
         |  if (!$sawNull && $acc > 0) { $bucket |= 1L << $p; }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
