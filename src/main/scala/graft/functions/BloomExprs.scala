package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter runtime filtering made explicit (SURVEY.md §2 D41).
  *
  * Spark's own `InjectRuntimeFilter` applies this trick only when its
  * cost thresholds line up; these helpers give the query author direct
  * control: build a bloom filter over the (already filtered) dim-side
  * join keys in one sketch-sized aggregate job, then prune the fact
  * side with `might_contain` BEFORE its shuffle. At 100 TB a selective
  * dim filter turns a full-fact shuffle into a ~selectivity-sized one;
  * false positives are removed by the real join that follows, so
  * results stay exact.
  *
  * The Catalyst expressions (`BloomFilterAggregate`,
  * `BloomFilterMightContain`) are not SQL-registered in Spark, so they
  * are bridged directly. `BloomFilterMightContain` requires a constant
  * bloom side — the sketch is collected to the driver (numBits/8
  * bytes, sketch-sized by construction) and embedded as a literal,
  * which is precisely what runtime filtering's broadcast does.
  */
object BloomExprs {

  /** Aggregate a bloom filter (binary) over xxhash64 of `key`. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Build the dim-side bloom as driver bytes: one aggregate job, the
    * result is numBits/8 bytes regardless of dim cardinality. */
  def buildBloom(dim: DataFrame, key: String, expectedItems: Long = 1000000L,
                 numBits: Long = 8L * 1024 * 1024): Array[Byte] =
    dim.agg(bloomAgg(col(key), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Probe predicate: true iff `key` might be in the sketch (no false
    * negatives). The bloom is a foldable literal, satisfying
    * `BloomFilterMightContain`'s constant requirement. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))
}
