package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * never per pair. At 100 TB the brute-force path prunes to k per
  * query map-side (bounded aggregate after a broadcast of the bounded
  * query set — no window sort); the LSH path turns the all-pairs
  * problem into per-bucket pairs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ with double accumulation in array order (codegen). */
  def dot(a: String, b: String): Column = VectorExprs.floatDot(col(a), col(b))

  def norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k (E6): broadcast the (bounded) query set
    * against the corpus; corpus/query norms are computed once per
    * vector, so each of the |Q|·|C| pairs costs one dot product. The
    * per-query top-k is a bounded aggregate ([[graft.functions.BoundedTopK]]),
    * NOT a row_number window: the window form shuffles every scored
    * pair into |Q| reducer partitions and sorts the whole corpus per
    * query — at corpus scale that is a few-hot-partition sort of all
    * |Q|·|C| rows. The aggregate prunes to ≤ k per query map-side, so
    * the exchange carries O(|Q|·k). Ordering (cos desc, vec_id asc on
    * the rounded score) matches the previous window formulation
    * bit-for-bit. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("q_nrm", norm("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("c_nrm", norm("embedding"))
    c.crossJoin(broadcast(q))
      .withColumn("cos",
        round(dot("q_emb", "embedding") / (col("q_nrm") * col("c_nrm")), 6))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.boundedTopK(
        struct((-col("cos")).as("neg_cos"), col("vec_id")), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.vec_id").as("vec_id"),
        (-col("t.neg_cos")).as("cos"), (col("pos") + 1).cast("int").as("rn"))
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

  // ------------------------------------------------------------- IVF

  /** Deterministic k-means centroids (Lloyd, fixed iterations, seeded
    * by the k lowest-id vectors). The assignment step is a per-row
    * argmax over k broadcast centroids — `greatest` over
    * (score, cell) structs, each score one codegen dot product; the
    * update step averages per (cell, dimension) and collects k·dim
    * doubles to the driver, never vectors. */
  def kmeansCentroids(vecs: DataFrame, k: Int, iters: Int = 3,
                      embCol: String = "embedding"): Array[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var centroids: Array[Array[Float]] = vecs
      .select(col("vec_id"), col(embCol)).orderBy(col("vec_id")).limit(k)
      .select(col(embCol)).as[Array[Float]].collect()
    require(centroids.length == k, s"corpus smaller than k=$k")
    for (_ <- 1 to iters) {
      val assigned = vecs.select(col(embCol).as("emb"))
        .withColumn("cell", assignCell(col("emb"), centroids))
      val dims = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      dims.foreach(r => next(r.getAs[Long]("cell").toInt)(r.getAs[Int]("pos")) =
        r.getAs[Double]("m").toFloat)
      centroids = next // cells that lost every member keep their old centroid
    }
    centroids
  }

  /** Nearest-centroid id by max (v·c − |c|²/2), i.e. min L2 distance;
    * ties broken to the lower cell id. */
  def assignCell(emb: Column, centroids: Array[Array[Float]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val halfNorm = c.map(x => x.toDouble * x.toDouble).sum / 2.0
      struct(
        (VectorExprs.floatDot(emb, typedLit(c)) - lit(halfNorm)).as("s"),
        lit(-i).as("neg_cell"))
    }
    (-greatest(scored: _*).getField("neg_cell")).cast("long")
  }

  /** IVF ANN (E7 scale path): coarse-quantize the corpus into k-means
    * cells, then answer each query by brute-forcing only the `nProbe`
    * closest cells — the shuffle carries corpus rows once (cell
    * assignment is a projection) and the candidate join fans each
    * query out to nProbe cells instead of the whole corpus. Final
    * per-query top-k via the bounded aggregate (no window sort).
    * Approximate: recall depends on nProbe/nCells (spec-checked, so
    * rows-only at the driver). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(corpus, nCells, iters)
    val indexed = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("cell", assignCell(col("embedding"), centroids))
      .withColumn("c_nrm", norm("embedding"))
    // per-query probe list: nProbe best cells by the same score
    val probeScores = centroids.zipWithIndex.map { case (c, i) =>
      val halfNorm = c.map(x => x.toDouble * x.toDouble).sum / 2.0
      struct(
        (VectorExprs.floatDot(col("q_emb"), typedLit(c)) - lit(halfNorm)).as("s"),
        lit(i.toLong).as("cell"))
    }
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("q_nrm", norm("q_emb"))
      .withColumn("probe", slice(reverse(array_sort(array(probeScores: _*))), 1, nProbe))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        explode(col("probe").getField("cell")).as("cell"))
    indexed.join(broadcast(q), "cell")
      .withColumn("cos",
        round(dot("q_emb", "embedding") / (col("q_nrm") * col("c_nrm")), 6))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.boundedTopK(
        struct((-col("cos")).as("neg_cos"), col("vec_id")), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.vec_id").as("vec_id"),
        (-col("t.neg_cos")).as("cos"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** SemDeDup (E41): semantic dedup at corpus scale — coarse-quantize
    * into k-means cells, generate candidate pairs only WITHIN a cell
    * (the shuffle key is the cell id, so the all-pairs problem becomes
    * per-cell pairs, AQE-splittable on oversized cells), and greedily
    * drop the higher-id member of every pair with cosine ≥ threshold.
    * Identical vectors always land in the same cell, so exact
    * duplicates are removed with certainty; near-dups split across a
    * cell boundary can escape — the documented recall trade of the
    * cluster-then-prune family, pinned by the planted-copy gate. */
  def semDeDup(vecs: DataFrame, threshold: Double, nCells: Int = 16,
               iters: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(vecs, nCells, iters)
    val assigned = vecs.select(col("vec_id"), col("embedding"))
      .withColumn("cell", assignCell(col("embedding"), centroids))
      .withColumn("nrm", norm("embedding"))
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    val drops = a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(dot("emb_a", "emb_b") / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.join(drops, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }
}
