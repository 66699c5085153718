package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Datasketches aggregates (SURVEY §2 E46-E47).
  *
  * The summary-table pattern at 100 TB: build a tiny mergeable sketch
  * per shard ONCE (map-side partial aggregation — the exchange carries
  * kilobyte sketches, never rows), persist the sketch table, and
  * answer later questions by MERGING sketches instead of re-scanning
  * the base data. Spark 4 ships this for HLL
  * (`hll_sketch_agg`/`hll_union_agg`, used by E42); these aggregates
  * extend the same two-level contract to
  *
  *  - Theta sketches — distinct counting that additionally supports
  *    SET OPERATIONS (intersection / A-not-B) across sketches, which
  *    HLL cannot do: audience-overlap analytics between corpus shards
  *    without a pairwise self-join of the base data;
  *  - KLL quantile sketches — mergeable rank/quantile summaries, the
  *    rollup-able counterpart of the one-shot GK `approx_percentile`
  *    (D24).
  *
  * Both serialize to compact immutable byte images, so the output of
  * the value-level aggregate is a `BINARY` column that can be written
  * to parquet, read back in a later job, and unioned/merged by the
  * *_union/merge aggregate — exactly how the reference's daily-batch
  * world would maintain corpus statistics incrementally.
  */
private[functions] object SketchAggs {
  /** Internal-value updater per supported child type: sketches hash
    * raw bytes/longs/doubles; strings hash their UTF-8 bytes so the
    * digest is stable across engines and runs. */
  def thetaUpdater(dt: DataType): (Union, Any) => Unit = dt match {
    case LongType      => (u, v) => u.update(v.asInstanceOf[Long])
    case IntegerType   => (u, v) => u.update(v.asInstanceOf[Int].toLong)
    case ShortType     => (u, v) => u.update(v.asInstanceOf[Short].toLong)
    case ByteType      => (u, v) => u.update(v.asInstanceOf[Byte].toLong)
    case DateType      => (u, v) => u.update(v.asInstanceOf[Int].toLong)
    case TimestampType => (u, v) => u.update(v.asInstanceOf[Long])
    case DoubleType    => (u, v) => u.update(v.asInstanceOf[Double])
    case FloatType     => (u, v) => u.update(v.asInstanceOf[Float].toDouble)
    case StringType    => (u, v) => u.update(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType    => (u, v) => u.update(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(
      s"theta_sketch_agg: unsupported input type ${other.simpleString}")
  }

  val thetaTypes: Seq[DataType] = Seq(LongType, IntegerType, ShortType,
    ByteType, DateType, TimestampType, DoubleType, FloatType, StringType,
    BinaryType)
}

/** Value-level Theta sketch aggregate: distinct sketch of the child
  * values, `2^lgK` nominal entries (exact below that, ~1/sqrt(2^lgK)
  * relative error above). Output = compact sketch bytes. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch_agg lgK out of range: $lgK")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchAggs.thetaTypes.contains(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: unsupported input type ${child.dataType.simpleString}")

  @transient private lazy val updater = SketchAggs.thetaUpdater(child.dataType)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) updater(buf, v)
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Sketch-level Theta union: merges a column of serialized compact
  * sketches (the output of [[ThetaSketchAgg]]) WITHOUT touching the
  * data they summarize. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects serialized sketches (BINARY), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Value-level KLL doubles quantile sketch: mergeable rank summary
  * with normalized rank error ~1.65% at the default k=200. Output =
  * serialized sketch bytes. */
case class KllDoublesAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_agg k out of range: $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a numeric input, got ${other.simpleString}")
  }

  @transient private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType  => _.asInstanceOf[Double]
    case FloatType   => _.asInstanceOf[Float].toDouble
    case LongType    => _.asInstanceOf[Long].toDouble
    case IntegerType => _.asInstanceOf[Int].toDouble
    case ShortType   => _.asInstanceOf[Short].toDouble
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(toDouble(v))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
}

/** Sketch-level KLL merge: folds a column of serialized KLL sketches
  * (the output of [[KllDoublesAgg]]) into one — the quantile rollup
  * never re-reads the measurements. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects serialized sketches (BINARY), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllDoublesSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

object SketchFns {
  /** Distinct Theta sketch of `c` (compact bytes, 2^lgK entries). */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c), lgK).toAggregateExpression())

  /** Union of serialized Theta sketches. */
  def thetaUnion(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(c), lgK).toAggregateExpression())

  /** KLL quantile sketch of numeric `c` (serialized bytes). */
  def kllSketch(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllDoublesAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Merge of serialized KLL sketches. */
  def kllMerge(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
