package graft

import org.apache.spark.sql.functions._
import graft.functions.HashExprs
import graft.operators.Dedup

/** [[graft.functions.WordShingleHashes]] must be value-identical to
  * the string formulation `xxhash64(explode(wordShingles(text, n)))`
  * on every document — including repeated-space, short-text, and
  * unicode corners — or the byte-range shortcut is wrong. */
class WordShingleHashSpec extends SparkSpec {

  private def viaStrings(df: org.apache.spark.sql.DataFrame, n: Int) = df
    .select(col("doc_id"), explode(Dedup.wordShingles("text", n)).as("g"))
    .select(col("doc_id"), xxhash64(col("g")).as("h"))
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def viaBytes(df: org.apache.spark.sql.DataFrame, n: Int) = df
    .select(col("doc_id"),
      explode(HashExprs.wordShingleHashes(col("text"), n)).as("h"))
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("corners: repeated spaces, short text, unicode, leading/trailing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a  b   c"),          // empty tokens from repeated spaces
      (3L, "one two"),           // shorter than n=3 -> whole-text arm
      (4L, ""),                  // empty string
      (5L, " leading and trailing "),
      (6L, "héllo wörld ünïcode tokens"),
      (7L, "x x x x x x"),       // heavy duplicate grams
      (8L, "single")
    ).toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5)) {
      assert(viaBytes(docs, n) == viaStrings(docs, n), s"mismatch at n=$n")
    }
  }

  test("real documents table agrees end to end") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    assert(viaBytes(docs, 3) == viaStrings(docs, 3))
  }

  test("n < 1 is rejected at analysis, not in the hashing kernel") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    for (bad <- Seq(0, -3)) {
      val err = intercept[Exception] {
        df.select(HashExprs.wordShingleHashes(col("text"), bad)).collect()
      }
      assert(err.getMessage.contains("n >= 1"), err.getMessage)
      // the user-facing SQL registration must refuse it too
      graft.functions.GraftFunctions.register(spark)
      df.createOrReplaceTempView("wsh_guard")
      val sqlErr = intercept[Exception] {
        spark.sql(s"SELECT word_shingle_hashes(text, $bad) FROM wsh_guard").collect()
      }
      assert(sqlErr.getMessage.contains("n >= 1"), sqlErr.getMessage)
    }
  }

  test("digit_multiset_key defines the sorted-digit-string equivalence exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      val digits = Seq.fill(rnd.nextInt(12))(rnd.nextInt(10)).mkString
      val noise = Seq("x#", "", "Customer#", "a b").apply(rnd.nextInt(4))
      (i.toLong, noise + digits)
    } :+ ((501L, "no digits here")) :+ ((502L, ""))
    val df = rows.toDF("id", "s")
      .select(col("id"), col("s"),
        HashExprs.digitMultisetKey(col("s")).as("k"),
        array_join(array_sort(split(regexp_replace(col("s"), "[^0-9]", ""), "")), "")
          .as("sorted"))
    // same packed key <=> same sorted digit string, across all pairs
    val clash = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .filter((col("a.k") === col("b.k")) =!= (col("a.sorted") === col("b.sorted")))
      .count()
    assert(clash == 0)
  }

  test("distinctness: no duplicate hashes per document") {
    import spark.implicits._
    val dup = Seq((1L, "x y x y x y x y"))
      .toDF("doc_id", "text")
      .select(explode(HashExprs.wordShingleHashes(col("text"), 2)).as("h"))
      .groupBy(col("h")).count().filter(col("count") > 1).count()
    assert(dup == 0)
  }

  private def pairCorners = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e"),
      (2L, "a  b   c"),
      (3L, "one two"),
      (4L, ""),
      (5L, " leading and trailing "),
      (6L, "héllo wörld ünïcode tokens"),
      (7L, "x x x x x x"),
      (8L, "single")
    ).toDF("doc_id", "text")
  }

  test("pair form: h1 side equals the single-hash expression exactly") {
    for (n <- Seq(2, 3, 5)) {
      val viaPairs = pairCorners
        .select(col("doc_id"),
          explode(HashExprs.wordShingleHashPairs(col("text"), n)).as("g"))
        .select(col("doc_id"), col("g.h1").as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaPairs == viaBytes(pairCorners, n), s"h1 mismatch at n=$n")
    }
  }

  test("pair form: dedup is by PAIR, h2 is constant per gram and differs from h1") {
    import spark.implicits._
    // duplicate grams across the doc collapse to one pair each
    val pairs = Seq((1L, "x y x y x y x y")).toDF("doc_id", "text")
      .select(explode(HashExprs.wordShingleHashPairs(col("text"), 2)).as("g"))
      .select(col("g.h1"), col("g.h2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.toSet.size, "duplicate pairs emitted")
    // same-gram h2 must agree ACROSS documents (it is a pure gram hash)
    val cross = Seq((1L, "p q r"), (2L, "p q r s")).toDF("doc_id", "text")
      .select(explode(HashExprs.wordShingleHashPairs(col("text"), 3)).as("g"))
      .select(col("g.h1"), col("g.h2")).distinct()
      .groupBy(col("h1")).agg(countDistinct(col("h2")).as("nh2"))
      .filter(col("nh2") > 1).count()
    assert(cross == 0, "h2 not a function of the gram bytes")
    assert(pairs.forall { case (h1, h2) => h1 != h2 }, "h1 == h2: seeds not independent")
  }

  test("pair form: n < 1 rejected at analysis; SQL registration refuses too") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val err = intercept[Exception] {
      df.select(HashExprs.wordShingleHashPairs(col("text"), 0)).collect()
    }
    assert(err.getMessage.contains("n >= 1"), err.getMessage)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("wshp_guard")
    val sqlErr = intercept[Exception] {
      spark.sql("SELECT word_shingle_hash_pairs(text, -2) FROM wshp_guard").collect()
    }
    assert(sqlErr.getMessage.contains("n >= 1"), sqlErr.getMessage)
  }
}
