package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see SURVEY.md §2 for the operator inventory each
  * entry corresponds to. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D. relational core
    "q_filter_project" -> Relational.filterProject _,
    "q1_agg"           -> Relational.q1Agg _,
    "q_star_join"      -> Relational.starJoin _,
    "q_big_join"       -> Relational.bigJoin _,
    "q_semi_join"      -> Relational.semiJoin _,
    "q_anti_join"      -> Relational.antiJoin _,
    "q_window"         -> Relational.windowRank _,
    "q_topk"           -> Relational.topK _,
    "q_distinct"       -> Relational.distinctCounts _,
    "q_cond_agg"       -> Relational.condAgg _,
    "q_rollup"         -> Relational.rollupAgg _,
    "q_event_window"   -> Relational.eventWindow _,
    "q_approx_distinct" -> Relational.approxDistinct _,
    "q_sessionize"     -> Relational.sessionize _,
    "q_pivot"          -> Relational.pivotAgg _,
    "q_cube"           -> Relational.cubeAgg _,
    "q_set_ops"        -> Relational.setOps _,
    "q_asof_join"      -> Relational.asofJoin _,
    "q_quantile"       -> Relational.quantiles _,
    "q_salted_join"    -> ((s, d) => Relational.saltedJoin(s, d)),
    "q_cumsum"         -> Relational.cumulativeSum _,
    "q_above_cust_avg" -> Relational.aboveCustomerAvg _,
    "q_approx_quantile" -> Relational.approxQuantiles _,
    // A/B/C. ETL surface
    "date_extract"     -> EtlQueries.dateExtract _,
    "file_catalog"     -> EtlQueries.fileCatalog _,
    "bucket_date_histogram" -> EtlQueries.bucketDateHistogram _,
    "date_filter_read" -> EtlQueries.dateFilterRead _,
    "csv_roundtrip"    -> EtlQueries.csvRoundtrip _,
    "json_props_parse" -> EtlQueries.jsonPropsParse _,
    "source_file_counts" -> EtlQueries.sourceFileCounts _,
    "clean_columns"    -> EtlQueries.cleanColumns _,
    "union_merge"      -> EtlQueries.unionMerge _,
    "ts_coerce"        -> EtlQueries.tsCoerce _,
    "enrich_meta"      -> EtlQueries.enrichMeta _,
    "drop_empty_cols"  -> EtlQueries.dropEmptyCols _,
    "dedup_rows"       -> EtlQueries.dedupRows _,
    "etl_day_pipeline" -> EtlQueries.etlDayPipeline _,
    "processing_log"   -> EtlQueries.processingLog _,
    "partitioned_sink" -> EtlQueries.partitionedSink _,
    "orc_roundtrip"    -> EtlQueries.orcRoundtrip _,
    "jdbc_roundtrip"   -> EtlQueries.jdbcRoundtrip _,
    // E. training-data operators
    "clean_text"       -> TrainingQueries.cleanText _,
    "pii_scrub"        -> TrainingQueries.piiScrub _,
    "top_terms"        -> TrainingQueries.topTerms _,
    "dedup_exact_text" -> TrainingQueries.dedupExactText _,
    "dedup_minhash"    -> TrainingQueries.dedupMinhash _,
    "dedup_simhash"    -> TrainingQueries.dedupSimhash _,
    "ngram_jaccard"    -> TrainingQueries.ngramJaccard _,
    "doc_fingerprint"  -> TrainingQueries.docFingerprint _,
    "lang_id"          -> TrainingQueries.langId _,
    "quality_score"    -> TrainingQueries.qualityScore _,
    "token_count"      -> TrainingQueries.tokenCount _,
    "ann_bruteforce"   -> TrainingQueries.annBruteforce _,
    "ann_lsh"          -> TrainingQueries.annLsh _,
    "dedup_embedding"  -> TrainingQueries.dedupEmbedding _,
    "multimodal_meta"  -> TrainingQueries.multimodalMeta _,
  )

  /** DuckDB-equivalent SQL per query (same column names/aliases — the
    * driver's compare hashes values under name-sorted columns). Keys
    * omitted here get a weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,6)) * CAST(0.9 AS DECIMAL(18,6)), 2) AS DOUBLE) AS discounted
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 200000""".stripMargin,
    "q1_agg"          -> Relational.q1AggSql,
    "q_star_join"     -> Relational.starJoinSql,
    "q_big_join"      -> Relational.bigJoinSql,
    "q_semi_join"     -> Relational.semiJoinSql,
    "q_anti_join"     -> Relational.antiJoinSql,
    "q_window"        -> Relational.windowRankSql,
    "q_topk"          -> Relational.topKSql,
    "q_distinct"      -> Relational.distinctCountsSql,
    "q_cond_agg"      -> Relational.condAggSql,
    "q_rollup"        -> Relational.rollupAggSql,
    "q_event_window"  -> Relational.eventWindowSql,
    "q_sessionize"    -> Relational.sessionizeSql,
    "q_pivot"         -> Relational.pivotAggSql,
    "q_cube"          -> Relational.cubeAggSql,
    "q_set_ops"       -> Relational.setOpsSql,
    "q_asof_join"     -> Relational.asofJoinSql,
    "q_quantile"      -> Relational.quantilesSql,
    "q_salted_join"   -> Relational.saltedJoinSql,
    "q_cumsum"        -> Relational.cumulativeSumSql,
    "q_above_cust_avg" -> Relational.aboveCustomerAvgSql,
    "date_extract"     -> EtlQueries.dateExtractSql,
    "file_catalog"     -> EtlQueries.fileCatalogSql,
    "bucket_date_histogram" -> EtlQueries.bucketDateHistogramSql,
    "date_filter_read" -> EtlQueries.dateFilterReadSql,
    "csv_roundtrip"    -> EtlQueries.csvRoundtripSql,
    "json_props_parse" -> EtlQueries.jsonPropsParseSql,
    "source_file_counts" -> EtlQueries.sourceFileCountsSql,
    "clean_columns"    -> EtlQueries.cleanColumnsSql,
    "union_merge"      -> EtlQueries.unionMergeSql,
    "ts_coerce"        -> EtlQueries.tsCoerceSql,
    "enrich_meta"      -> EtlQueries.enrichMetaSql,
    "drop_empty_cols"  -> EtlQueries.dropEmptyColsSql,
    "dedup_rows"       -> EtlQueries.dedupRowsSql,
    "etl_day_pipeline" -> EtlQueries.etlDayPipelineSql,
    "processing_log"   -> EtlQueries.processingLogSql,
    "partitioned_sink" -> EtlQueries.partitionedSinkSql,
    "orc_roundtrip"    -> EtlQueries.orcRoundtripSql,
    "jdbc_roundtrip"   -> EtlQueries.jdbcRoundtripSql,
    "clean_text"       -> TrainingQueries.cleanTextSql,
    "pii_scrub"        -> TrainingQueries.piiScrubSql,
    "top_terms"        -> TrainingQueries.topTermsSql,
    "dedup_exact_text" -> TrainingQueries.dedupExactTextSql,
    "dedup_minhash"    -> TrainingQueries.dedupMinhashSql,
    "ngram_jaccard"    -> TrainingQueries.ngramJaccardSql,
    "doc_fingerprint"  -> TrainingQueries.docFingerprintSql,
    "lang_id"          -> TrainingQueries.langIdSql,
    "quality_score"    -> TrainingQueries.qualityScoreSql,
    "token_count"      -> TrainingQueries.tokenCountSql,
    "ann_bruteforce"   -> TrainingQueries.annBruteforceSql,
    "dedup_embedding"  -> TrainingQueries.dedupEmbeddingSql,
    "multimodal_meta"  -> TrainingQueries.multimodalMetaSql,
  )
}
