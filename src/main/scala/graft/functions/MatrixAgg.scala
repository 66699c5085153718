package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types._

/** Second-moment (Gram) accumulator for distributed PCA (SURVEY §2
  * E73): one pass over an `array<float>` embedding column accumulates
  * (n, Σx, ΣxxT) — everything covariance needs — into a buffer of
  * d + d(d+1)/2 doubles. The exchange carries ONE ~17 KB buffer per
  * partition (d=64), never a row of data; partials merge by elementwise
  * addition, so the reduction is associative and the plan is an
  * ordinary partial/final ObjectHashAggregate. The d×d eigenproblem
  * that follows is driver-side arithmetic on a 64×64 matrix — the
  * standard split for PCA at 100 TB: moments distributed, eigen local.
  */
final case class GramBuffer(var n: Long, var d: Int,
                            var sum: Array[Double], var gram: Array[Double]) {
  def ensure(dim: Int): Unit = if (d == 0) {
    d = dim
    sum = new Array[Double](dim)
    gram = new Array[Double](dim * (dim + 1) / 2)
  }
}

case class GramMatrixAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "gram_matrix_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix_agg expects ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  // lazy: the expression is constructed before the child resolves, so
  // dataType is only safe to inspect at evaluation time
  private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): GramBuffer =
    GramBuffer(0L, 0, Array.emptyDoubleArray, Array.emptyDoubleArray)

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    buf.ensure(dim)
    require(dim == buf.d, s"gram_matrix_agg: ragged embedding ($dim vs ${buf.d})")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      buf.sum(i) += x(i)
      i += 1
    }
    // upper triangle, row-major: (i,j) j>=i at i*d - i(i-1)/2 + (j-i)
    var k = 0
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        buf.gram(k) += x(i) * x(j)
        j += 1; k += 1
      }
      i += 1
    }
    buf.n += 1
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    if (other.n == 0L) return buf
    if (buf.n == 0L && buf.d == 0) {
      buf.d = other.d; buf.sum = other.sum.clone(); buf.gram = other.gram.clone()
      buf.n = other.n
      return buf
    }
    require(buf.d == other.d, s"gram_matrix_agg: dim mismatch ${buf.d}/${other.d}")
    var i = 0
    while (i < buf.sum.length) { buf.sum(i) += other.sum(i); i += 1 }
    i = 0
    while (i < buf.gram.length) { buf.gram(i) += other.gram(i); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: GramBuffer): Any = serialize(buf)

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      8 + 4 + 8 * (buf.sum.length + buf.gram.length))
    bb.putLong(buf.n).putInt(buf.d)
    buf.sum.foreach(bb.putDouble)
    buf.gram.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong; val d = bb.getInt
    val sum = Array.fill(d)(bb.getDouble)
    val gram = Array.fill(d * (d + 1) / 2)(bb.getDouble)
    GramBuffer(n, d, sum, gram)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)
}

object MatrixAgg {
  def gramMatrix(c: Column): Column =
    ColumnBridge.column(GramMatrixAgg(ColumnBridge.expression(c))
      .toAggregateExpression())

  /** Decode a [[GramMatrixAgg]] blob into (n, mean, covariance) — the
    * covariance is the full symmetric d×d matrix, population form
    * (divide by n), as C = G/n − μμᵀ computed in double. */
  def decode(bytes: Array[Byte]): (Long, Array[Double], Array[Array[Double]]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong; val d = bb.getInt
    val sum = Array.fill(d)(bb.getDouble)
    val mean = sum.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val g = bb.getDouble
        val c = g / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a small symmetric matrix:
    * returns (eigenvalues descending, eigenvectors as rows, matching
    * the value order). O(d³) per sweep, converges quadratically — for
    * the d≤256 driver-side matrices this serves, exhaustive sweeps are
    * microseconds; the DATA never participates. */
  def symmetricEigen(a0: Array[Array[Double]],
                     maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val q = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, frob(a))
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var r = p + 1
        while (r < d) {
          val apq = a(p)(r)
          if (math.abs(apq) > 0) {
            val theta = (a(r)(r) - a(p)(p)) / (2.0 * apq)
            // numerically stable tan of the annihilating rotation
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(r)
              a(k)(p) = c * akp - s * akq
              a(k)(r) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(r)(k)
              a(p)(k) = c * apk - s * aqk
              a(r)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val qkp = q(p)(k); val qkq = q(r)(k)
              q(p)(k) = c * qkp - s * qkq
              q(r)(k) = s * qkp + c * qkq
              k += 1
            }
          }
          r += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray, order.map(i => q(i)).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frob(a: Array[Array[Double]]): Double =
    math.sqrt(a.map(r => r.map(x => x * x).sum).sum)
}
