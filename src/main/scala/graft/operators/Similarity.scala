package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Embedding similarity operators (SURVEY.md §2 E5-E7): cosine
  * primitives over `array<float>` columns, brute-force top-k ANN, an
  * LSH (random hyperplane) bucketed scale path, and cosine near-dup
  * detection.
  *
  * Arithmetic discipline: every product is float×float promoted to
  * double (exact in IEEE754) and summed in array order, so scores are
  * bit-reproducible — the DuckDB oracle computes the identical
  * sequence. The hot loops are codegen expressions
  * ([[graft.functions.FloatVecDot]], [[graft.functions.HyperplaneBucket]]),
  * not interpreted `zip_with`/`aggregate` lambdas, and pair-independent
  * work (norms, buckets) is computed once per VECTOR before the join,
  * never per pair. At 100 TB the brute-force path is per-query-
  * partition top-k (window after a broadcast of the bounded query
  * set); the LSH path turns the all-pairs problem into per-bucket
  * pairs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ with double accumulation in array order (codegen). */
  def dot(a: String, b: String): Column = VectorExprs.floatDot(col(a), col(b))

  def norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k (E6): broadcast the (bounded) query set
    * against the corpus; corpus/query norms are computed once per
    * vector, so each of the |Q|·|C| pairs costs one dot product. Rank
    * per query on the rounded score so the ordering is reproducible. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("q_nrm", norm("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("c_nrm", norm("embedding"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos",
        round(dot("q_emb", "embedding") / (col("q_nrm") * col("c_nrm")), 6))
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

  /** Embedding dimensionality probed from the data (one 1-row job) so
    * the LSH planes always match — a mismatch then fails fast inside
    * [[graft.functions.HyperplaneBucket]] instead of silently hashing
    * every vector to bucket 0. None on an empty/all-null corpus. */
  def embeddingDim(vecs: DataFrame, embCol: String = "embedding"): Option[Int] =
    vecs.select(size(col(embCol)).as("d")).filter(col("d") >= 0)
      .limit(1).collect().headOption.map(_.getInt(0))

  /** Cosine near-duplicate pairs (E5). `exact=true` compares all pairs
    * (oracle-checkable, for bounded corpora); otherwise pairs are
    * generated within LSH buckets only — the 100 TB path. */
  def cosineNearDuplicates(vecs: DataFrame, threshold: Double,
                           exact: Boolean = false, nPlanes: Int = 16,
                           seed: Long = 42L, dim: Option[Int] = None): DataFrame = {
    val base = vecs.select(col("vec_id"), col("embedding"))
    val a = base.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      .withColumn("nrm_a", norm("emb_a"))
    val b = base.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      .withColumn("nrm_b", norm("emb_b"))
    val pairs =
      if (exact) {
        a.join(b, col("id_a") < col("id_b"))
      } else {
        dim.orElse(embeddingDim(base)) match {
          case None => // empty corpus → empty pairs, like the exact path
            a.limit(0).join(b.limit(0), col("id_a") < col("id_b"))
          case Some(d) =>
            val ab = a.withColumn("bucket", VectorExprs.hyperplaneBucket(col("emb_a"),
              hyperplanes(nPlanes, d, seed)))
            val bb = b.withColumn("bucket", VectorExprs.hyperplaneBucket(col("emb_b"),
              hyperplanes(nPlanes, d, seed)))
            ab.join(bb, Seq("bucket")).filter(col("id_a") < col("id_b"))
              .drop("bucket")
        }
      }
    pairs
      .withColumn("cos", round(dot("emb_a", "emb_b") / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
