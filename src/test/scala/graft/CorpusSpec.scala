package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Corpus-preparation invariants (SURVEY.md §2 E16-E20). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("E16: split assignment is deterministic, total, and ~8/1/1") {
    val counts = docs.withColumn("split", Corpus.splitColumn(col("doc_id")))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = docs.count()
    assert(counts.values.sum == n) // total: every doc lands somewhere
    assert(counts.keySet.subsetOf(Set("train", "valid", "test")))
    assert(counts("train") > counts("valid") && counts("train") > counts("test"))
    // deterministic: same assignment on re-evaluation
    val again = docs.withColumn("split", Corpus.splitColumn(col("doc_id")))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("E17: stratified sample respects per-stratum fractions") {
    val base = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = Corpus.stratifiedSample(docs, "lang",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 1.0), seed = 42L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // fraction-1.0 strata come through whole
    for (l <- Seq("de", "fr", "es", "zh"))
      assert(sampled.getOrElse(l, 0L) == base(l), s"stratum $l must be complete")
    // the 0.5 stratum is a strict, non-empty subset
    assert(sampled("en") > 0 && sampled("en") < base("en"))
  }

  test("E18: packs partition the corpus and respect contiguity") {
    val packed = Corpus.packSequences(docs, budget = 256)
    val total = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val packedTotal = packed.select(sum("pack_tokens")).head().getLong(0)
    assert(packedTotal == total) // token-conserving
    // each pack's token count stays under budget + one max doc length
    val maxDoc = docs.select(max(size(split(col("text"), " ")))).head().getInt(0)
    val maxPack = packed.select(max("pack_tokens")).head().getLong(0)
    assert(maxPack <= 256L + maxDoc)
  }

  test("E19: chunks cover every token with the configured overlap") {
    val chunked = Corpus.chunkDocuments(docs, chunkTokens = 64, stride = 48)
    val one = chunked.filter(col("doc_id") === docs.select(min("doc_id")).head().getLong(0))
      .orderBy("chunk_idx").collect()
    val nTokens = docs.orderBy("doc_id").select(size(split(col("text"), " ")))
      .head().getInt(0)
    // coverage: last chunk reaches the end of the document
    val last = one.last
    assert(last.getAs[Int]("chunk_idx") * 48 + last.getAs[Int]("chunk_tokens") == nTokens)
    // every non-final chunk is full-size
    assert(one.init.forall(_.getAs[Int]("chunk_tokens") == 64))
    // overlap: consecutive chunks share chunkTokens - stride tokens
    if (one.length >= 2) {
      val a = one(0).getAs[String]("chunk_text").split(" ")
      val b = one(1).getAs[String]("chunk_text").split(" ")
      assert(a.drop(48).sameElements(b.take(16)))
    }
  }

  test("E28: boilerplate ratio is 1 for a templated doc, low for unique text") {
    val corpus = Seq(
      (1L, "all rights reserved contact us today"),   // template, in 3 docs
      (2L, "all rights reserved contact us today"),
      (3L, "all rights reserved contact us today"),
      (4L, "completely unique words nobody else wrote here"),
      (5L, "another fully original sentence with fresh tokens")
    ).toDF("doc_id", "text")
    val scored = Corpus.boilerplateScore(corpus, n = 5, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getBoolean(4))).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(scored(id)._1 == 1.0 && !scored(id)._2, s"doc $id should be dropped")
    }
    Seq(4L, 5L).foreach { id =>
      assert(scored(id)._1 == 0.0 && scored(id)._2, s"doc $id should be kept")
    }
  }

  test("E29: decontamination flags exactly the docs sharing an eval n-gram") {
    val eval_ = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "some text then the quick brown fox jumps over the lazy dog embedded"),
      (2L, "harmless text with no overlap whatsoever in any span of eight tokens"),
      (3L, "quick brown fox alone is fine four grams under n never trigger")
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, eval_, n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("E20: heavy hitters include every truly frequent term") {
    val terms = docs.select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val n = terms.count()
    val truly = terms.groupBy("term").count()
      .filter(col("count") > n * 0.01)
      .select("term").as[String].collect().toSet
    val hh = terms.stat.freqItems(Seq("term"), 0.01)
      .head().getSeq[String](0).toSet
    // freqItems guarantees no false negatives at the support level
    assert(truly.subsetOf(hh))
  }

  test("E57: entropy/TTR match hand-computed values on crafted docs") {
    // stage crafted docs as parquet so entropyScore's Tables.documents
    // read sees them (schema mirrors the real table)
    val dir = java.nio.file.Files.createTempDirectory("graft_entropy").toString
    Seq(
      (1L, "a a a a", "en", "s", 7L),            // 1 type: entropy 0, ttr 1/4
      (2L, "a b c d", "en", "s", 7L),            // uniform 4: entropy 2 bits
      (3L, "a a b b c c d d", "en", "s", 15L),   // uniform 4 types: 2 bits
      (4L, "a a a b", "en", "s", 7L),            // 3/4,1/4 -> 0.811278 bits
      (5L, "...", "en", "s", 3L))                // normalizes to empty
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.TrainingQueries.entropyScore(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          Option(r.getAs[java.lang.Double]("ttr")),
          Option(r.getAs[java.lang.Double]("entropy_bits")))).toMap
    assert(got(1L) == ((4L, 1L, Some(0.25), Some(0.0))))
    assert(got(2L) == ((4L, 4L, Some(1.0), Some(2.0))))
    assert(got(3L) == ((8L, 4L, Some(0.5), Some(2.0))))
    assert(got(4L)._4.contains(0.811278))
    assert(got(5L) == ((0L, 0L, None, None)))
  }

  test("E58: zipf fit recovers the slope of a constructed power-law corpus") {
    // counts c_i = round(1000 / i^1) for i=1..20 — a rank-1 Zipf head;
    // the expected OLS slope is computed here from the same counts
    val counts = (1 to 20).map(i => i -> math.round(1000.0 / i).toInt)
    val text = counts.flatMap { case (i, c) => Seq.fill(c)(f"w$i%02d") }
      .mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_zipf").toString
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = operators.CorpusAnalytics.zipfFit(spark, dir).head()
    assert(row.getLong(0) == 20L)
    // expected OLS of ln(c) on ln(rank) — ranks follow (count desc,
    // term asc); equal counts tie-break by term name, which matches
    // construction order here
    val sorted = counts.map(_._2).sortBy(-_)
    val xs = sorted.indices.map(i => math.log(i + 1.0))
    val ys = sorted.map(c => math.log(c.toDouble))
    val k = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sx2 = xs.map(a => a * a).sum
    val slope = (k * sxy - sx * sy) / (k * sx2 - sx * sx)
    assert(math.abs(row.getDouble(1) - slope) < 1e-4,
      s"got ${row.getDouble(1)}, want ~$slope")
    assert(math.abs(slope + 1.0) < 0.01) // the construction IS rank^-1
  }
}
