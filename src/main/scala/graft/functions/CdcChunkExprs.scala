package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftfn.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (SURVEY §2 E74): split a document's UTF-8
  * bytes at positions the CONTENT chooses — a gear rolling hash hits a
  * mask — instead of at fixed offsets, so inserting a prefix shifts
  * every byte yet almost every chunk boundary re-synchronizes within
  * one chunk. Chunk-level dedup then survives the insert (the property
  * fixed-size chunking fundamentally lacks), which is what makes CDC
  * the storage/dedup primitive for append-heavy corpora and binary
  * blobs.
  *
  * Native Catalyst expression with `doGenCode` (the [[RollingHash]]
  * pattern): one static call per row inside whole-stage codegen,
  * returning `array<struct<chunk_len int, chunk_hash bigint>>` —
  * lengths make the coverage invariant checkable (Σlen = byte length),
  * hashes (FNV-1a 64 over the chunk's bytes) are the dedup keys.
  * Every step is integer arithmetic on bytes: bit-reproducible on any
  * engine, any partitioning.
  */
case class CdcChunks(child: Expression,
                     maskBits: Int = 6,
                     minLen: Int = 32,
                     maxLen: Int = 512) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_len", IntegerType, nullable = false),
    StructField("chunk_hash", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String], maskBits, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunks.chunks($c, $maskBits, $minLen, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  /** Gear table: one fixed 64-bit value per byte, derived from
    * splitmix64 so the table is deterministic and well mixed. */
  private val Gear: Array[Long] = Array.tabulate(256) { b =>
    var z = b.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private final val FnvOffset = 0xCBF29CE484222325L
  private final val FnvPrime = 0x100000001B3L

  /** Chunk `s`'s UTF-8 bytes: boundary where the gear hash has
    * `maskBits` trailing zero bits and the chunk has reached `minLen`;
    * a chunk is force-cut at `maxLen`. Returns (len, fnv1a64) structs
    * covering the string exactly. */
  def chunks(s: UTF8String, maskBits: Int, minLen: Int, maxLen: Int): ArrayData = {
    val bytes = s.getBytes
    val mask = (1L << maskBits) - 1L
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow]()
    var start = 0
    var h = 0L
    var fnv = FnvOffset
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      h = (h << 1) + Gear(b)
      fnv = (fnv ^ b) * FnvPrime
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len == maxLen) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](len, fnv))
        start = i + 1
        h = 0L
        fnv = FnvOffset
      }
      i += 1
    }
    if (start < bytes.length) {
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bytes.length - start, fnv))
    }
    new GenericArrayData(out.toArray[Any])
  }

  def cdcChunks(c: Column, maskBits: Int = 6, minLen: Int = 32,
                maxLen: Int = 512): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(c),
      maskBits, minLen, maxLen))
}
