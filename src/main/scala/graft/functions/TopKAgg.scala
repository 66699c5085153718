package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k aggregate (SURVEY.md §2 D30).
  *
  * The window formulation of "top k rows per key" (`row_number` over a
  * key-partitioned sort + filter) must SORT EVERY ROW of every group
  * — at 100 TB that's a full shuffle + sort of the fact table to
  * discard all but k rows per key. This aggregate keeps a bounded
  * buffer of the k smallest values per group instead: map-side partial
  * aggregation prunes to ≤ k per key per partition BEFORE the
  * shuffle, so the exchange carries O(keys · k), not O(rows), and no
  * sort of the full data ever runs. Same result, bounded memory.
  *
  * Ordering is the natural ascending order of the child type (struct
  * orderings compare fields left to right), so "top 3 orders by price,
  * ties by key" is `bounded_top_k(struct(-price, key), 3)` — negate
  * to turn smallest-first into largest-first.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    sortSpec: Option[BoundedTopK.SortSpec] = None,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"bounded_top_k needs k > 0, got $k")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    sortSpec match {
      case None => TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
      case Some(s) => child.dataType match {
        case st: StructType if st.length >= s.numFields =>
          st.take(s.numFields).zipWithIndex.map { case (f, i) =>
            TypeUtils.checkForOrderingExpr(f.dataType, s"$prettyName sort field $i")
          }.find(_.isFailure).getOrElse(
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName with a sort spec needs a STRUCT child with >= ${s.numFields} fields, got ${other.simpleString}")
      }
    }

  @transient private lazy val ordering: Ordering[Any] = sortSpec match {
    case None => TypeUtils.getInterpretedOrdering(child.dataType)
    case Some(spec) =>
      val st = child.dataType.asInstanceOf[StructType]
      val fieldOrds = st.take(spec.numFields).map(f =>
        TypeUtils.getInterpretedOrdering(f.dataType))
      val types = st.take(spec.numFields).map(_.dataType)
      new Ordering[Any] {
        override def compare(xa: Any, ya: Any): Int = {
          val x = xa.asInstanceOf[InternalRow]
          val y = ya.asInstanceOf[InternalRow]
          var i = 0
          while (i < spec.numFields) {
            val xv = if (x.isNullAt(i)) null else x.get(i, types(i))
            val yv = if (y.isNullAt(i)) null else y.get(i, types(i))
            val c = (xv, yv) match {
              case (null, null) => 0
              // SortOrder semantics: asc defaults NULLS FIRST, desc NULLS LAST
              case (null, _) => if (spec.nullsFirst(i)) -1 else 1
              case (_, null) => if (spec.nullsFirst(i)) 1 else -1
              case (a, b) =>
                val base = fieldOrds(i).compare(a, b)
                if (spec.ascending(i)) base else -base
            }
            if (c != 0) return c
            i += 1
          }
          0 // ties beyond the sort prefix: keep first-inserted (stable)
        }
      }
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  /** Insert keeping the buffer sorted ascending and capped at k. The
    * common case at steady state — v ≥ current k-th — is a single
    * comparison, no allocation. */
  private def insert(buf: mutable.ArrayBuffer[Any], v: Any): Unit = {
    if (buf.size == k && ordering.compare(v, buf.last) >= 0) return
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(buf(mid), v) <= 0) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, InternalRow.copyValue(v))
    if (buf.size > k) buf.remove(buf.size - 1)
  }

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val writeBuffer = new Array[Byte](4096)
    out.writeInt(buf.size)
    buf.foreach { v =>
      val row = proj(InternalRow(v))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, writeBuffer)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, size)
      // each element owns its byte array, so no copy needed beyond this
      buf += row.get(0, child.dataType)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

object BoundedTopK {
  /** Ordering directives for the first `numFields` struct fields:
    * per-field ascending flag and null placement (mirrors
    * `SortOrder`). Fields past the prefix never affect comparisons —
    * ties keep the first-inserted row, which matches the (already
    * nondeterministic) tie behavior of `row_number`. */
  final case class SortSpec(ascending: Seq[Boolean], nullsFirst: Seq[Boolean]) {
    require(ascending.length == nullsFirst.length && ascending.nonEmpty)
    def numFields: Int = ascending.length
  }
}

object TopKAgg {
  /** Column API: array of the k smallest `c` values per group, sorted
    * ascending by `c`'s natural order. */
  def boundedTopK(c: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(c), k).toAggregateExpression())
}
