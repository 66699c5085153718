package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomExprs, GraftFunctions, RollingHash}

class FunctionsSpec extends SparkSpec {

  test("bloom filter: no false negatives, bounded false positives") {
    import spark.implicits._
    val dim = spark.range(0, 1000).toDF("k")
    val bloom = BloomExprs.buildBloom(dim, "k", expectedItems = 1000L, numBits = 1L << 16)
    val hits = spark.range(0, 10000).toDF("k")
      .filter(BloomExprs.mightContain(bloom, col("k")))
      .select("k").as[Long].collect().toSet
    // the sketch's contract: every inserted key answers true...
    assert((0L until 1000L).forall(hits.contains))
    // ...and at 64 Kbit / 1k items the false-positive rate stays tiny
    assert(hits.size < 1100, s"fp blow-up: ${hits.size}")
  }
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq(("hello world", Array("hello", "world"), Array(1.0f, 2.0f)))
      .toDF("t", "toks", "v").createOrReplaceTempView("fx")
    val r = spark.sql(
      """SELECT rolling_hash(t) AS rh, simhash64(toks) AS sh,
        |  float_vec_dot(v, v) AS d,
        |  size(minhash_band_keys(toks, 8, 4)) AS nb
        |FROM fx""".stripMargin).head()
    assert(r.getLong(0) == RollingHash.hash("hello world"))
    assert(r.getDouble(2) == 5.0)
    assert(r.getInt(3) == 8)
    // SQL result equals the Column-API result
    val viaColumn = Seq(Array("hello", "world")).toDF("toks")
      .select(graft.functions.HashExprs.simHash64(col("toks"))).head().getLong(0)
    assert(r.getLong(1) == viaColumn)
  }

  test("bloom agg + probe are callable from SQL end-to-end") {
    GraftFunctions.register(spark)
    spark.range(0, 100).createOrReplaceTempView("bk")
    // build the sketch in SQL, probe it through a scalar subquery (the
    // constant form BloomFilterMightContain requires)
    val hits = spark.sql(
      """SELECT id FROM range(0, 200)
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(xxhash64(id), 100L, 8192L) FROM bk),
        |  xxhash64(id))""".stripMargin)
      .as[Long].collect().toSet
    assert((0L until 100L).forall(hits.contains))
    assert(hits.size < 120)
  }
}
