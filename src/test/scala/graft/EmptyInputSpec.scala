package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Degenerate-input hardening: a date-partitioned pipeline routinely
  * meets EMPTY inputs (a drop day with no files, a partition with no
  * survivors after filtering). Every operator here must plan and
  * execute on zero-row tables without throwing — returning zero rows,
  * or for global-aggregate shapes, a well-formed all-null/NaN row.
  * This is the local[32] stand-in for "executor gets an empty split".
  */
class EmptyInputSpec extends SparkSpec {

  /** One empty-copy of every testdata table, schemas preserved. The
    * cache dir is keyed on a hash of the table set + their schemas,
    * so adding a table or evolving a schema invalidates it instead of
    * silently running the suite against stale empty copies. */
  private lazy val emptyDir: String = {
    val sig = {
      val schemas = Tables.all.sorted.map { t =>
        t + ":" + spark.read.parquet(s"$sf/$t.parquet").schema.json
      }.mkString("\n")
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(schemas))
    }
    val out = s"/tmp/graft_empty_sf_$sig"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_done"))) {
      Tables.all.foreach { t =>
        spark.read.parquet(s"$sf/$t.parquet").limit(0)
          .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      fs.create(new org.apache.hadoop.fs.Path(s"$out/_done")).close()
    }
    out
  }

  private def rowsOf(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Long = {
    val df = fn(spark, emptyDir)
    df.count() // must not throw
  }

  test("relational core returns zero rows on empty tables") {
    for ((n, fn) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "q1_agg" -> Relational.q1Agg _,
      "q_filter_project" -> Relational.filterProject _,
      "q_big_join" -> Relational.bigJoin _,
      "q_window" -> Relational.windowRank _,
      "q_semi_join" -> Relational.semiJoin _,
      "merge_into" -> Scd2.mergeInto _))
      assert(rowsOf(n, fn) == 0L, n)
    // count-shaped: one well-formed zero row
    val n = EtlQueries.dedupRows(spark, emptyDir).head()
    assert(n.getLong(0) == 0L)
  }

  test("corpus operators survive an empty documents table") {
    for ((n, fn) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "dup_ngram_ratio" -> ((s, d) => CorpusAnalytics.dupNgramRatio(s, d)),
      "dup_span" -> CorpusAnalytics.dupSpan _,
      "bpe_pair_counts" -> ((s, d) => CorpusAnalytics.bpePairCounts(s, d)),
      "kn_bigram_lm" -> ((s, d) => CorpusAnalytics.knBigramLm(s, d)),
      "similarity_prefix_join" -> ((s, d) => TrainingQueries.similarityPrefixJoin(s, d)),
      "record_linkage" -> TrainingQueries.recordLinkage _))
      assert(rowsOf(n, fn) == 0L, n)
  }

  test("round-13 operators return zero rows on empty tables") {
    for ((n, fn) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "attribution" -> Analytics.attribution _,
      "decayed_counts" -> ((s, d) => Analytics.decayedCounts(s, d)),
      "hard_negatives" -> TrainingQueries.hardNegatives _,
      "inverted_index" -> ((s, d) => CorpusAnalytics.invertedIndex(s, d)),
      "join_size_estimate" -> DataQuality.joinSizeEstimate _,
      "k_anonymity" -> TrainingQueries.kAnonymity _,
      "q_chi2" -> Analytics.chi2Independence _))
      assert(rowsOf(n, fn) == 0L, n)
  }

  test("round-13 global shapes emit well-formed rows on empty input") {
    // ks_drift: one all-null row (global struct-max/first over nothing),
    // never a throw — this is exactly the shape the suite exists to pin
    val ks = DataQuality.ksDrift(spark, emptyDir).collect()
    assert(ks.length == 1 && ks.head.isNullAt(0))
    // funnel: the 3 stage rows survive with users=0 and null delay
    val fw = Analytics.funnelWindowed(spark, emptyDir).collect()
    assert(fw.length == 3)
    assert(fw.forall(r => r.getLong(1) == 0L && r.isNullAt(2)))
    // join_order_probe: all 6 permutation rows survive with null costs
    // (0/0 selectivities), ranks still a permutation of 1..6
    val jp = DataQuality.joinOrderProbe(spark, emptyDir).collect()
    assert(jp.length == 6)
    assert(jp.map(_.getInt(1)).sorted.toSeq == (1 to 6))
  }

  test("global-aggregate shapes emit well-formed rows on empty input") {
    // corr_matrix: 6 pair rows whose corr is NaN/null — never a throw
    val corr = Analytics.corrMatrix(spark, emptyDir).collect()
    assert(corr.length == 6)
    assert(corr.forall(r => r.isNullAt(2) || r.getDouble(2).isNaN))
    // psi_drift: no buckets exist — zero rows, not an error
    assert(DataQuality.psiDrift(spark, emptyDir).count() == 0L)
  }

  test("catalog DSv2 survives an empty drop") {
    // empty staged drop = root dir with only _SUCCESS: zero partitions
    // planned, zero rows; the pushdown gate still emits its one row
    assert(EtlQueries.catalogV2(spark, emptyDir).count() == 0L)
    assert(EtlQueries.catalogV2PushdownGate(spark, emptyDir).count() == 1L)
  }

  test("stream lateness histogram drains an empty slice to zero rows") {
    // four empty chunk files still make four micro-batches; the
    // watermark never advances and the histogram is empty, not a throw
    assert(graft.streaming.StreamGates
      .streamLatenessHistogram(spark, emptyDir).count() == 0L)
  }

  /** Round-16 broadening: beyond the pinned shapes above, SWEEP the
    * whole pure-compute registry cohort — every operator here must
    * plan and execute on the empty tables without throwing. Operators
    * whose CONTRACT needs data (planted-duplicate recalls,
    * argmax-driven loops like BPE learning, sample-trained ANN/
    * k-means, gates that assert planted counts or write scratch) are
    * out of scope: their data-dependence is a documented
    * precondition, not an empty-slice hazard. */
  private val sweepCohort = Seq(
    "q1_agg", "q_filter_project", "q_window", "q_topk", "q_topk_per_key",
    "q_distinct", "q_outer_join", "q_semi_join", "q_anti_join",
    "q_cumsum", "q_moving_sum", "q_grouping_sets", "q_rollup", "q_cube",
    "q_having", "q_mode", "q_histogram", "q_stats_agg", "q_first_last",
    "q_lag_lead", "q_string_agg", "q_pivot", "q_unpivot", "q_cond_agg",
    "q_set_ops", "q_set_ops_all", "q_nullsafe_join", "q_salted_join",
    "q_big_join", "q_star_join", "q_lateral", "q_islands", "q_sessionize",
    "q_ratio_report", "q_cume_dist", "q_range_frame", "q_time_range_frame",
    "q_exclude_frame", "q_groups_frame", "q_interval_merge", "q_debounce",
    "q_locf", "q_resample", "q_funnel", "q_funnel_window", "q_retention",
    "q_transitions", "q_chi2", "q_regression", "q_skyline", "q_interpolate",
    "q_quantile", "q_quantile_interp", "q_mad", "q_weighted_median",
    "q_weighted_quantiles", "q_rolling_median",
    // custom-plan paths: the native as-of operator (merge-scan
    // SparkPlan), the binned range-join rewrite, recursive calendar
    "q_asof_join", "q_asof_native", "q_asof_nearest", "q_asof_tolerance",
    "q_range_join", "q_range_join_binned", "q_interval_overlap",
    "q_cross_dim", "q_recursive_cal", "q_above_cust_avg",
    "q_period_delta", "q_hopping_window", "q_session_window",
    "q_event_window", "q_window_distinct",
    "lang_id", "quality_score", "token_count", "entropy_score",
    "gopher_rules", "boilerplate_score", "dedup_exact_text",
    "doc_fingerprint", "lm_score", "zipf_fit", "heaps_fit", "corr_matrix",
    "attribution", "decayed_counts", "repetition_ratio", "clean_text",
    "top_terms", "bigram_counts", "oov_rate", "unicode_normalize",
    "logistic_quality", "source_kl", "doc_pagerank", "dup_ngram_ratio")

  test("registry sweep: pure compute operators survive EMPTY tables") {
    val failures = sweepCohort.flatMap { name =>
      try { SparkEntry.queries(name)(spark, emptyDir).collect(); None }
      catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} " +
          Option(e.getMessage).getOrElse("").take(120))
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} operators crash on empty input:\n" +
        failures.mkString("\n"))
  }

  test("rank/quantile machinery returns ZERO rows on empty input, not a null-median row") {
    Seq("q_weighted_median", "q_weighted_quantiles", "q_mad", "q_quantile")
      .foreach { n =>
        assert(SparkEntry.queries(n)(spark, emptyDir).collect().isEmpty,
          s"$n must return no rows on empty input")
      }
  }
}
