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
}
