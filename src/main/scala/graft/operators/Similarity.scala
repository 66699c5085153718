package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity operators (SURVEY.md §2 E5-E7): cosine
  * primitives over `array<float>` columns, brute-force top-k ANN, an
  * LSH (random hyperplane) bucketed scale path, and cosine near-dup
  * detection.
  *
  * Arithmetic discipline: every product is float×float promoted to
  * double (exact in IEEE754) and summed in array order, so scores are
  * bit-reproducible — the DuckDB oracle computes the identical
  * sequence. At 100 TB the brute-force path is per-query-partition
  * top-k (window after a broadcast of the bounded query set); the LSH
  * path turns the all-pairs problem into per-bucket pairs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ with double accumulation in array order. */
  def dot(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  def norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k (E6): broadcast the (bounded) query set
    * against the corpus; rank per query on the rounded score so the
    * ordering is reproducible. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", round(cosine("q_emb", "embedding"), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rn"))
  }

  /** Random hyperplanes for LSH: deterministic from `seed`. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-pattern bucket id from `nPlanes` hyperplanes — scale path
    * for near-dup/ANN (E7): cosine-close vectors collide with high
    * probability; exact verification then runs within buckets only. */
  def lshBucket(embCol: String, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeArr = s"array(${p.mkString(",")})"
      expr(s"IF(aggregate(zip_with($embCol, $planeArr, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0, shiftleft(1L, $i), 0L)")
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Cosine near-duplicate pairs (E5). `exact=true` compares all pairs
    * (oracle-checkable, for bounded corpora); otherwise pairs are
    * generated within LSH buckets only. */
  def cosineNearDuplicates(vecs: DataFrame, threshold: Double,
                           exact: Boolean = false,
                           nPlanes: Int = 16, seed: Long = 42L): DataFrame = {
    val base = vecs.select(col("vec_id"), col("embedding"))
    val pairs =
      if (exact) {
        val a = base.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
        val b = base.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
        a.join(b, col("id_a") < col("id_b"))
      } else {
        val dim = 64
        val bucketed = base.withColumn("bucket",
          lshBucket("embedding", hyperplanes(nPlanes, dim, seed)))
        val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
        val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
        a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
          .drop("bucket").distinct()
      }
    pairs
      .withColumn("cos", round(cosine("emb_a", "emb_b"), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
