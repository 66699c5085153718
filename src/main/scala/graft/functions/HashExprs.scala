package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass codegen hashing for the near-dup operators (SURVEY.md
  * §2 E2/E3).
  *
  * The declarative minhash (`transform(sequence(0,k-1), j ->
  * array_min(transform(sh, s -> xxhash64(s, j))))`) hashes every
  * shingle string k times — and after projection collapse the shingle
  * array itself may be re-evaluated per j, which is where the round-1
  * bench spent ~110 s at sf0.1. These expressions hash each shingle
  * ONCE (xxhash64, seed 42) and derive the k signature values with the
  * standard double-hashing scheme gⱼ(x) = h₁(x) + j·h₂(x)
  * (Kirsch–Mitzenmacher), then fold band keys in the same pass, so a
  * document costs O(|shingles| + bands·rows) instead of
  * O(k·|shingles|·cost(shingle)).
  */
object HashExprs {
  /** Per-band LSH bucket keys: array<long> of length `numBands`, where
    * entry b chains xxhash64 over that band's `rowsPerBand` minhash
    * minima. Two documents collide on band b iff all minima of band b
    * agree (up to hash collision ~2⁻⁶⁴). */
  def minhashBandKeys(shingles: Column, numBands: Int, rowsPerBand: Int): Column =
    VectorExprs.col(MinHashBandKeys(VectorExprs.expr(shingles), numBands, rowsPerBand))

  /** 64-bit SimHash over a token array: bit j = sign of the Σ±1 votes
    * from bit j of each token's xxhash64. */
  def simHash64(tokens: Column): Column =
    VectorExprs.col(SimHash64(VectorExprs.expr(tokens)))

  /** Distinct word n-gram hashes straight from the text's UTF-8 bytes
    * — the zero-allocation form of
    * `array_distinct(transform(...)) |> explode |> xxhash64`. */
  def wordShingleHashes(text: Column, n: Int): Column =
    VectorExprs.col(WordShingleHashes(VectorExprs.expr(text), n))

  /** Packed digit-multiset blocking key: equal iff the inputs contain
    * the same multiset of ASCII digits — the zero-allocation form of
    * `array_join(array_sort(split(digits, '')), '')`. */
  def digitMultisetKey(text: Column): Column =
    VectorExprs.col(DigitMultisetKey(VectorExprs.expr(text)))

  /** Distinct word n-gram 128-BIT hash pairs straight from the text's
    * UTF-8 bytes: array<struct<h1,h2>> where h1 == xxhash64(gram) and
    * h2 is an independent seed's xxhash64 over the same byte range —
    * the gram identity for operators that join on grams at corpus
    * scale, where a single 64-bit key would birthday-collide
    * (~10¹² distinct grams ⇒ ≈3·10⁴ expected 64-bit collisions). */
  def wordShingleHashPairs(text: Column, n: Int): Column =
    VectorExprs.col(WordShingleHashPairs(VectorExprs.expr(text), n))
}

/** Transposition-invariant blocking key (E76 record linkage): one long
  * packing the COUNT of each ASCII digit '0'-'9' in the input, 6 bits
  * per digit (non-digit bytes ignored — a digit byte never occurs
  * inside a UTF-8 multibyte sequence). Two strings get equal keys iff
  * their digit multisets match (exactly, up to 63 occurrences per
  * digit — beyond that the key degrades to a best-effort hash as the
  * count lane saturates), which is the same equivalence the
  * sort-the-digits string key defines, without the per-row split /
  * array-sort / join churn on BOTH join sides. */
case class DigitMultisetKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "digit_multiset_key"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"digit_multiset_key expects STRING, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    DigitMultisetKey.key(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DigitMultisetKey.key($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DigitMultisetKey {
  def key(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var k = 0L
    var i = 0
    while (i < len) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b >= '0' && b <= '9') {
        val lane = 6 * (b - '0')
        // saturate the 6-bit lane instead of overflowing into a neighbor
        if (((k >>> lane) & 0x3FL) != 0x3FL) k += 1L << lane
      }
      i += 1
    }
    k
  }
}

/** Hashes of the word n-gram shingles of `text` WITHOUT materializing
  * gram strings: a gram's joined-with-spaces form is byte-identical to
  * the original substring spanning its tokens (split/`concat_ws(' ')`
  * preserve empty tokens from repeated spaces), so each window hash is
  * xxhash64 (seed 42 — Spark's own) over a byte RANGE of the input —
  * the VALUES equal `xxhash64(gram_string)` exactly; only the string
  * slice/join/array_distinct allocations disappear. Fewer than n
  * tokens falls back to hashing the whole text, mirroring
  * [[graft.operators.Dedup.wordShingles]]'s `ELSE array(text)` arm.
  * Output is first-occurrence-distinct, like `array_distinct`. */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // n < 1 would make `windows = tokens - n + 1` exceed the token
    // count and hand hashUnsafeBytes a negative-length range over raw
    // off-heap memory — reject at analysis, not in the kernel
    case StringType if n < 1 => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects n >= 1, got $n")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects STRING, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.hashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes {
  private final val Seed = 42L // Spark's xxhash64 default seed
  /** Largest shingle-window count either kernel accepts: the dedup
    * table holds the next power of two ≥ 2·windows, and 2^30 is the
    * largest such size an Int slot mask can address — past 2^29
    * windows the `windows * 2` doubling overflows Int, the mask goes
    * negative, and the probe loop never terminates. Shared by
    * [[WordShingleHashPairs]]. */
  private[functions] final val MaxWindows = 1 << 29

  def hashes(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // token starts: 0 and every byte after a 0x20 (space never occurs
    // inside a UTF-8 multibyte sequence)
    var tokens = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) tokens += 1
      i += 1
    }
    if (tokens < n)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(base, off, len, Seed)))
    val starts = new Array[Int](tokens)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    val windows = tokens - n + 1
    // capacity math is Int: past 2^29 windows the doubled table size
    // overflows to a negative mask and the probe loop never terminates —
    // fail fast with a named bound instead (a single document with a
    // billion tokens is corpus damage, not a shingling input)
    if (windows > MaxWindows) throw new IllegalArgumentException(
      s"word_shingle_hashes: document has $windows shingle windows " +
        s"(max $MaxWindows); split pathological documents before shingling")
    val out = new Array[Long](windows)
    // open-address set for first-occurrence dedup (size ≥ 2·windows)
    var cap = java.lang.Integer.highestOneBit(math.max(4, windows * 2) - 1) << 1
    if (cap < 4) cap = 4
    val slots = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var outN = 0
    var w = 0
    while (w < windows) {
      val a = starts(w)
      // window ends at the byte before the (w+n)-th token's separator
      val b = if (w + n < tokens) starts(w + n) - 1 else len
      val h = XXH64.hashUnsafeBytes(base, off + a, b - a, Seed)
      var slot = (h ^ (h >>> 33)).toInt & (cap - 1)
      var dup = false
      while (used(slot) && !dup) {
        if (slots(slot) == h) dup = true
        else slot = (slot + 1) & (cap - 1)
      }
      if (!dup) {
        used(slot) = true; slots(slot) = h
        out(outN) = h; outN += 1
      }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (outN == windows) out else java.util.Arrays.copyOf(out, outN))
  }
}

/** The 128-bit sibling of [[WordShingleHashes]]: per window, TWO
  * xxhash64 values over the same byte range — h1 with Spark's seed 42
  * (== `xxhash64(gram_string)` exactly) and h2 with an independent
  * seed — emitted as array<struct<h1:long, h2:long>>, deduplicated by
  * PAIR in first-occurrence order. Joining grams on the pair keeps
  * gram identity collision-free at corpus scale where one 64-bit key
  * is not (see [[HashExprs.wordShingleHashPairs]]); the bytes are
  * scanned once and hashed twice, still with zero gram-string
  * allocation. Fewer than n tokens falls back to the whole text,
  * mirroring [[WordShingleHashes]]. */
case class WordShingleHashPairs(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = WordShingleHashPairs.OutType
  override def prettyName: String = "word_shingle_hash_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n < 1 => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hash_pairs expects n >= 1, got $n")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hash_pairs expects STRING, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingleHashPairs.hashPairs(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingleHashPairs.hashPairs($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashPairs {
  import org.apache.spark.sql.types.{StructField, StructType}

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)

  private final val Seed1 = 42L // Spark's xxhash64 default — h1 == xxhash64(gram)
  private final val Seed2 = 0x9E3779B97F4A7C15L // independent second seed

  def hashPairs(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var tokens = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) tokens += 1
      i += 1
    }
    if (tokens < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](org.apache.spark.sql.catalyst.InternalRow(
          XXH64.hashUnsafeBytes(base, off, len, Seed1),
          XXH64.hashUnsafeBytes(base, off, len, Seed2))))
    val starts = new Array[Int](tokens)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    val windows = tokens - n + 1
    // same Int-overflow guard as the hashes kernel: 2^29 windows is the
    // largest doubled power-of-two table an Int mask can address
    if (windows > WordShingleHashes.MaxWindows) throw new IllegalArgumentException(
      s"word_shingle_hash_pairs: document has $windows shingle windows " +
        s"(max ${WordShingleHashes.MaxWindows}); split pathological " +
        "documents before shingling")
    val out = new Array[Any](windows)
    // open-address set keyed on h1, verified on h2 — dedup by PAIR
    var cap = java.lang.Integer.highestOneBit(math.max(4, windows * 2) - 1) << 1
    if (cap < 4) cap = 4
    val slots1 = new Array[Long](cap)
    val slots2 = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var outN = 0
    var w = 0
    while (w < windows) {
      val a = starts(w)
      val b = if (w + n < tokens) starts(w + n) - 1 else len
      val h1 = XXH64.hashUnsafeBytes(base, off + a, b - a, Seed1)
      val h2 = XXH64.hashUnsafeBytes(base, off + a, b - a, Seed2)
      var slot = (h1 ^ (h1 >>> 33)).toInt & (cap - 1)
      var dup = false
      while (used(slot) && !dup) {
        if (slots1(slot) == h1 && slots2(slot) == h2) dup = true
        else slot = (slot + 1) & (cap - 1)
      }
      if (!dup) {
        used(slot) = true; slots1(slot) = h1; slots2(slot) = h2
        out(outN) = org.apache.spark.sql.catalyst.InternalRow(h1, h2)
        outN += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (outN == windows) out else out.take(outN))
  }
}

case class MinHashBandKeys(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(numBands > 0 && rowsPerBand > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys expects ARRAY<STRING>, got ${other.simpleString}")
  }

  private val k = numBands * rowsPerBand

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h1 = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        val h2 = XXH64.hashLong(h1, 42L) | 1L
        var j = 0
        var g = h1
        while (j < k) {
          if (g < mins(j)) mins(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var key = 42L
      var r = 0
      while (r < rowsPerBand) {
        key = XXH64.hashLong(mins(b * rowsPerBand + r), key)
        r += 1
      }
      keys(b) = key
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val uad = classOf[UnsafeArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      // freshName everything: fixed locals collide if the expression is
      // inlined twice into one generated scope
      val mins = ctx.freshName("mins"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2"); val g = ctx.freshName("g")
      val j = ctx.freshName("j"); val keys = ctx.freshName("keys")
      val b = ctx.freshName("b"); val key = ctx.freshName("key")
      val r = ctx.freshName("r")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  long $h1 = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  long $h2 = $xxh.hashLong($h1, 42L) | 1L;
         |  long $g = $h1;
         |  for (int $j = 0; $j < $k; $j++) {
         |    if ($g < $mins[$j]) $mins[$j] = $g;
         |    $g += $h2;
         |  }
         |}
         |long[] $keys = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $key = 42L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $key = $xxh.hashLong($mins[$b * $rowsPerBand + $r], $key);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = $uad.fromPrimitiveArray($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (cnt(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val j = ctx.freshName("j"); val j2 = ctx.freshName("j2")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $cnt = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $cnt[$j]++; else $cnt[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j2 = 0; $j2 < 64; $j2++) {
         |  if ($cnt[$j2] > 0) $sig |= 1L << $j2;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
