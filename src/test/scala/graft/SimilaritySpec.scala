package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))

  test("bruteForceTopK rank 1 is the query itself at cos 1.0") {
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") < 3), vecs, k = 5)
      .filter(col("rn") === 1)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, v, c) => assert(q == v && c == 1.0) }
  }

  test("exact cosineNearDuplicates finds every scaled copy") {
    val scaled = vecs.select((col("vec_id") + 10000).as("vec_id"),
      expr("transform(embedding, x -> CAST(1.5 * x AS FLOAT))").as("embedding"))
    val all = vecs.union(scaled)
    val found = Similarity.cosineNearDuplicates(all, threshold = 0.99, exact = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = vecs.select("vec_id").as[Long].collect().map(i => (i, i + 10000)).toSet
    assert(planted.subsetOf(found))
  }

  test("LSH cosineNearDuplicates finds every scaled copy (same bucket by construction)") {
    val scaled = vecs.select((col("vec_id") + 10000).as("vec_id"),
      expr("transform(embedding, x -> CAST(1.5 * x AS FLOAT))").as("embedding"))
    val all = vecs.union(scaled)
    val found = Similarity.cosineNearDuplicates(all, threshold = 0.99, exact = false)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // a positively-scaled vector has identical hyperplane signs → same
    // bucket with probability 1, so recall of planted pairs is exact
    val planted = vecs.select("vec_id").as[Long].collect().map(i => (i, i + 10000)).toSet
    assert(planted.subsetOf(found))
  }

  test("embeddingDim probes the data") {
    assert(Similarity.embeddingDim(vecs).contains(64))
    assert(Similarity.embeddingDim(vecs.limit(0)).isEmpty)
  }

  test("IVF ANN recalls planted near-identical vectors") {
    import spark.implicits._
    // corpus = base ∪ 1.5×-scaled copies (same direction, cos ≈ 1)
    val base = vecs.select(col("vec_id"), col("embedding"))
    val corpus = base.union(base.select(col("vec_id") + 10000,
      expr("transform(embedding, x -> CAST(1.5 * x AS FLOAT))")))
    val queries = base.filter(col("vec_id") < 20)
    val top = Similarity.ivfTopK(queries, corpus, k = 3)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // a scaled copy lands in the SAME cell as its original (same
    // direction, k-means cells are convex cones around centroids), so
    // IVF must find it; the query itself must also rank
    val n = 20
    val copyHits = (0L until n).count(q => top(q).contains(q + 10000))
    val selfHits = (0L until n).count(q => top(q).contains(q))
    assert(selfHits == n, s"every query must retrieve itself, got $selfHits/$n")
    assert(copyHits >= n * 9 / 10, s"copy recall too low: $copyHits/$n")
  }

  test("IVF matches brute force on the cells it probes (end-to-end sanity)") {
    val e = vecs
    val ivf = Similarity.ivfTopK(e.filter(col("vec_id") < 5), e, k = 10)
    // 5 queries × k rows, ranks 1..10, rank-1 is the query itself at cos 1
    assert(ivf.count() == 50)
    val r1 = ivf.filter(col("rn") === 1).select("q_id", "vec_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1.forall { case (q, v, c) => q == v && c == 1.0 })
  }
}
