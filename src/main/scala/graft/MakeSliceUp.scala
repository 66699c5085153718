package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UP-scaling slice builder for the scaling ladder (SURVEY §6): writes
  * a K× replica of an SF directory whose per-replica statistics match
  * the source exactly while fabricating NO cross-replica structure —
  * the property that makes the fitted slopes measure the ENGINE and
  * not the synthesizer. Naive row replication would give every
  * document an exact twin and every embedding a perfect neighbor, so
  * each dedup/similarity family would see its pair count grow
  * QUADRATICALLY in K — a fake superlinearity. Instead:
  *
  *  - every key column shifts by replica·stride (stride = max key + 1
  *    of the referenced table, so FK joins stay consistent);
  *  - document TEXT gets a per-replica suffix on every non-empty
  *    token, so replicas are token-disjoint: vocabulary and distinct
  *    grams scale ×K (the Heaps-law direction a real K× crawl shows)
  *    and no text-dedup family ever sees a cross-replica pair —
  *    within-replica planted structure replicates, so dup counts grow
  *    LINEARLY; n_chars is recomputed to stay = length(text);
  *  - EMBEDDINGS get a per-replica SIGNED PERMUTATION of coordinates —
  *    an orthogonal transform, so every within-replica inner product
  *    (hence every cosine, every planted near-dup, every IVF/ANN
  *    neighborhood) is preserved EXACTLY, while cross-replica cosines
  *    drop to noise (E[|cos|] ≈ d^(-1/2) ≈ 0.125 at d=64), far below
  *    every near-dup threshold;
  *  - replica 0 is bit-identical to the source; dimension tables
  *    (region, nation) copy unchanged.
  *
  * Usage: MakeSliceUp <srcDir> <outDir> <K>
  */
object MakeSliceUp {
  def main(args: Array[String]): Unit = {
    val (src, out, k) = (args(0), args(1), args(2).toInt)
    require(k >= 1, s"K must be >= 1, got $k")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def strideOf(t: String, key: String): Long =
      raw(t).agg(max(col(key))).head().get(0).asInstanceOf[Number].longValue + 1L

    val stride = Map(
      "cust" -> strideOf("customer", "c_custkey"),
      "supp" -> strideOf("supplier", "s_suppkey"),
      "part" -> strideOf("part", "p_partkey"),
      "ord"  -> strideOf("orders", "o_orderkey"),
      "doc"  -> strideOf("documents", "doc_id"),
      "vec"  -> strideOf("embeddings", "vec_id"),
      "evt"  -> strideOf("events", "event_id"),
      "user" -> strideOf("events", "user_id"))

    val reps = spark.range(0, k).select(col("id").as("__r"))

    /** Replicate and shift the named key columns by __r·stride, keeping
      * each key's original data type. The cast back to the source type
      * would WRAP silently if replica·stride overflows a 32-bit key
      * (aliasing keys across replicas — corrupted FK joins and dup
      * counts with no error), so every shifted column first proves that
      * its worst case, (stride−1) + (K−1)·stride = K·stride − 1, fits
      * the original type. Key columns are ≤ stride−1 by construction
      * (stride = max key + 1 of the referenced table). */
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      shifts.foreach { case (c, s) =>
        val typeMax: Long = df.schema(c).dataType match {
          case org.apache.spark.sql.types.ByteType    => Byte.MaxValue.toLong
          case org.apache.spark.sql.types.ShortType   => Short.MaxValue.toLong
          case org.apache.spark.sql.types.IntegerType => Int.MaxValue.toLong
          case org.apache.spark.sql.types.LongType    => Long.MaxValue
          case other => sys.error(s"replicate: non-integral key column $c: $other")
        }
        val worst = try math.subtractExact(math.multiplyExact(k.toLong, s), 1L)
          catch { case _: ArithmeticException => Long.MaxValue }
        require(worst <= typeMax,
          s"replicate: shifted key $c would overflow ${df.schema(c).dataType} " +
            s"at K=$k (max shifted value $worst > $typeMax) — regenerate the " +
            "source with a wider key type or lower K")
      }
      val shifted = shifts.foldLeft(df.crossJoin(broadcast(reps))) {
        case (d, (c, s)) =>
          d.withColumn(c, (col(c).cast("long") + col("__r") * s)
            .cast(df.schema(c).dataType))
      }
      shifted.drop("__r")
    }

    // per-replica signed coordinate permutation (orthogonal; identity
    // at r = 0), deterministic from the replica index
    def permutedEmbedding(dim: Int): Column = {
      val arms = (1 until k).map { r =>
        val rnd = new scala.util.Random(0xE5C4L * (r + 1))
        val perm = rnd.shuffle((0 until dim).toVector)
        val sign = Vector.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
        (r, array((0 until dim).map(i =>
          (col("embedding")(perm(i)) * lit(sign(i))).cast("float")): _*))
      }
      arms.foldLeft(when(col("__r") === 0, col("embedding"))) {
        case (acc, (r, e)) => acc.when(col("__r") === r, e)
      }
    }

    // per-replica token suffix (non-empty tokens only; replica 0 keeps
    // the original text verbatim)
    val suffixed = concat_ws(" ", transform(split(col("text"), " "),
      t => when(length(t) === 0, t)
        .otherwise(concat(t, lit("·"), col("__r").cast("string")))))
    val textCol = when(col("__r") === 0, col("text")).otherwise(suffixed)

    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[sliceup] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    write("region", raw("region"))
    write("nation", raw("nation"))
    write("customer", replicate(raw("customer"), "c_custkey" -> stride("cust")))
    write("supplier", replicate(raw("supplier"), "s_suppkey" -> stride("supp")))
    write("part", replicate(raw("part"), "p_partkey" -> stride("part")))
    write("orders", replicate(raw("orders"),
      "o_orderkey" -> stride("ord"), "o_custkey" -> stride("cust")))
    write("lineitem", replicate(raw("lineitem"),
      "l_orderkey" -> stride("ord"), "l_partkey" -> stride("part"),
      "l_suppkey" -> stride("supp")))
    write("events", replicate(raw("events"),
      "event_id" -> stride("evt"), "user_id" -> stride("user")))

    // Token-disjointness of replicas assumes no SOURCE token already
    // contains the '·' separator: a source token 'foo·1' (verbatim in
    // replica 0) would equal replica 1's suffixed 'foo', creating the
    // exact cross-replica gram/dup pairs the design promises cannot
    // exist. One cheap pass proves the assumption on this corpus.
    if (k > 1) {
      val tainted = raw("documents")
        .filter(col("text").contains("·")).limit(1).count()
      require(tainted == 0L,
        "MakeSliceUp: source corpus contains the replica separator '·' — " +
          "token-disjointness would be violated; pick a separator absent " +
          "from the corpus alphabet")
    }
    val docs = raw("documents").crossJoin(broadcast(reps))
      .withColumn("doc_id", (col("doc_id").cast("long") + col("__r") * stride("doc"))
        .cast(raw("documents").schema("doc_id").dataType))
      .withColumn("text", textCol)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__r")
    write("documents", docs)

    val dim = raw("embeddings").select(size(col("embedding"))).head().getInt(0)
    val embs = raw("embeddings").crossJoin(broadcast(reps))
      .withColumn("embedding", permutedEmbedding(dim))
      .withColumn("vec_id", (col("vec_id").cast("long") + col("__r") * stride("vec"))
        .cast(raw("embeddings").schema("vec_id").dataType))
      .drop("__r")
    write("embeddings", embs)

    spark.stop()
  }
}
