package graft

import org.apache.spark.sql.functions._

/** Null-injection robustness (the crash-safety companion of
  * EmptyInputSpec): real corpora carry nulls the synthetic testdata
  * does not — a crawl row with no text, an event with no type, an
  * unknown language. This sweep nulls out the nullable payload columns
  * on a deterministic fraction of rows (text 1/3, lang 1/5, source
  * 1/7, event_type 1/3, value 1/5) and requires every operator in the
  * cohort to EXECUTE without throwing. It pins crash-safety only —
  * null SEMANTICS stay the per-operator oracle's job; what this
  * catches is the driver-side `.getString` NPE and the codegen kernel
  * that assumed non-null input.
  */
class NullInputSpec extends SparkSpec {

  private lazy val nullDir: String = {
    val out = "/tmp/graft_sfnulls"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("text", when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("text")))
      .withColumn("lang", when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("lang")))
      .withColumn("source", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("source")))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    val events = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("event_type", when(col("event_id") % 3 === 0, lit(null)).otherwise(col("event_type")))
      .withColumn("value", when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")))
    events.write.mode("overwrite").parquet(s"$out/events.parquet")
    (Tables.all.toSet - "documents" - "events").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private val cohort = Seq(
    // documents-driven text analytics over nulled text/lang/source
    "lang_id", "quality_score", "token_count", "entropy_score",
    "gopher_rules", "boilerplate_score", "dedup_exact_text",
    "doc_fingerprint", "lm_score", "zipf_fit", "heaps_fit",
    "repetition_ratio", "clean_text", "top_terms", "bigram_counts",
    "oov_rate", "unicode_normalize", "logistic_quality", "source_kl",
    "doc_pagerank", "dup_ngram_ratio", "dedup_bow", "paragraph_dedup",
    "dedup_minhash", "dedup_simhash", "contamination_score",
    "source_novelty", "corpus_mix", "chunk_documents", "pii_scrub",
    // events-driven analytics over nulled event_type/value
    "q_sessionize", "q_funnel", "q_funnel_window", "q_retention",
    "q_transitions", "q_debounce", "q_interval_merge", "q_islands",
    "attribution", "decayed_counts", "q_resample", "q_locf",
    "q_interpolate", "q_event_window", "q_chi2")

  test("operators execute (no throw) when payload columns carry nulls") {
    val failures = cohort.flatMap { name =>
      try {
        SparkEntry.queries(name)(spark, nullDir).collect()
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} operators crash on null-injected input:\n" +
        failures.mkString("\n"))
  }
}
