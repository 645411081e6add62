package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Quantiles, Queries}
import graft.etl.Transforms
import graft.llm.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import graft.operators.{AsofJoin, RangeJoin, SkewJoin}
import graft.sources.{Csv, Layout}
import graft.streaming.EventsStream
import graft.warehouse.{Dims, Facts, Lifecycle, Scd}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 registers here as a
  * (SparkSession, sfDir) => DataFrame plus a DuckDB-equivalent oracle SQL.
  * Column names/types are aligned on both sides (driver hash-compares). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1RatioRank(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_ratio_rank" -> ((s, d) => Queries.q1RatioRank(s, d)),
    "q1b_disputed_rank" -> ((s, d) => Queries.q1bDisputedRank(s, d)),
    "q1c_companies" -> ((s, d) => Queries.q1cCompanies(s, d)),
    "q2_state_ratios" -> ((s, d) => Queries.q2StateRatios(s, d)),
    "q3a_cf_view" -> ((s, d) => Queries.q3aCfView(s, d)),
    "q3b_worst_issues" -> ((s, d) => Queries.q3bWorstIssues(s, d)),
    "date_dim" -> ((s, d) => Dims.dateDim(s, d)),
    "location_dim" -> ((s, d) => Dims.locationDim(s, d)),
    "category_dim" -> ((s, d) => Dims.categoryDim(s, d)),
    "company_dim" -> ((s, d) => Dims.companyDim(s, d)),
    "fact_multijoin" -> ((s, d) => Facts.factMultijoin(s, d)),
    "expr_join_date_dim" -> ((s, d) => Facts.exprJoinDateDim(s, d)),
    "nullsafe_join" -> ((s, d) => Facts.nullsafeJoin(s, d)),
    "scd2_resolution" -> ((s, d) => Scd.scd2Resolution(s, d)),
    "scd2_active_view" -> ((s, d) => Scd.scd2ActiveView(s, d)),
    "scd3_issue" -> ((s, d) => Scd.scd3Issue(s, d)),
    "etl_melt_pivot" -> ((s, d) => Transforms.meltPivot(s, d)),
    "etl_group_impute" -> ((s, d) => Transforms.groupImpute(s, d)),
    "etl_clean_events" -> ((s, d) => Transforms.cleanEvents(s, d)),
    "etl_json_flatten" -> ((s, d) => Transforms.jsonFlatten(s, d)),
    "text_quality" -> ((s, d) => TextAnalysis.textQuality(s, d)),
    "lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.docFingerprint(s, d)),
    "exact_dedup" -> ((s, d) => TextAnalysis.exactDedup(s, d)),
    "ngram_jaccard_pairs" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "minhash_dedup" -> ((s, d) => Dedup.minhashDedup(s, d)),
    "simhash_dedup" -> ((s, d) => Dedup.simhashDedup(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "embedding_topk" -> ((s, d) => Similarity.embeddingTopk(s, d)),
    "embedding_knn_native" -> ((s, d) => Similarity.embeddingKnnNative(s, d)),
    "embedding_ann_lsh" -> ((s, d) => Similarity.embeddingAnnLsh(s, d)),
    "embedding_ann_ivf" -> ((s, d) => Similarity.embeddingAnnIvf(s, d)),
    "embedding_cosine_dedup" -> ((s, d) => Similarity.embeddingCosineDedup(s, d)),
    "embedding_lsh_dedup" -> ((s, d) => Similarity.embeddingLshDedup(s, d)),
    "table_lifecycle" -> ((s, d) => Lifecycle.tableLifecycle(s, d)),
    "fk_integrity" -> ((s, d) => Lifecycle.fkIntegrity(s, d)),
    "nested_projection" -> ((s, d) => Lifecycle.nestedProjection(s, d)),
    "schema_evolution" -> ((s, d) => Lifecycle.schemaEvolution(s, d)),
    "media_features" -> ((s, d) => Multimodal.mediaFeatures(s, d)),
    "window_agg" -> ((s, d) => EventsStream.windowAgg(s, d)),
    "year_dim" -> ((s, d) => Dims.yearDim(s, d)),
    "population_fact" -> ((s, d) => Facts.populationFact(s, d)),
    "skew_salted_agg" -> ((s, d) => SkewJoin.skewSaltedAgg(s, d)),
    "q4_bottom_states" -> ((s, d) => Queries.q4BottomStates(s, d)),
    "csv_roundtrip" -> ((s, d) => Csv.csvRoundtrip(s, d)),
    "bucketed_join" -> ((s, d) => Layout.bucketedJoin(s, d)),
    "partitioned_scan" -> ((s, d) => Layout.partitionedScan(s, d)),
    "compact_table" -> ((s, d) => Layout.compactTable(s, d)),
    "asof_join" -> ((s, d) => AsofJoin.asofJoin(s, d)),
    "range_join_bands" -> ((s, d) => RangeJoin.rangeJoinBands(s, d)),
    "ivf_index_search" -> ((s, d) => Similarity.ivfIndexSearch(s, d)),
    "lsh_index_search" -> ((s, d) => Similarity.lshIndexSearch(s, d)),
    "embedding_quantize" -> ((s, d) => Similarity.embeddingQuantize(s, d)),
    "ingest_dedup" -> ((s, d) => EventsStream.ingestDedup(s, d)),
    "click_attribution" -> ((s, d) => EventsStream.clickAttribution(s, d)),
    "moving_hourly_avg" -> ((s, d) => EventsStream.movingHourlyAvg(s, d)),
    "stratified_sample" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "token_budget_select" -> ((s, d) => Sampling.tokenBudgetSelect(s, d)),
    "hash_split" -> ((s, d) => Sampling.hashSplit(s, d)),
    "value_quantiles" -> ((s, d) => Quantiles.valueQuantiles(s, d)),
    "media_frame_sample" -> ((s, d) => Multimodal.mediaFrameSample(s, d)),
    "audio_features" -> ((s, d) => Multimodal.audioFeatures(s, d)),
    "distinct_users" -> ((s, d) => Quantiles.distinctUsers(s, d)),
    "rollup_revenue" -> ((s, d) => Quantiles.rollupRevenue(s, d)),
    "cube_revenue" -> ((s, d) => Quantiles.cubeRevenue(s, d)),
    "session_boundaries" -> ((s, d) => EventsStream.sessionBoundaries(s, d)),
    "jsonl_roundtrip" -> ((s, d) => Csv.jsonlRoundtrip(s, d)),
    "dense_hourly_agg" -> ((s, d) => EventsStream.denseHourlyAgg(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_ratio_rank" -> Queries.q1RatioRankSql,
    "q1b_disputed_rank" -> Queries.q1bDisputedRankSql,
    "q1c_companies" -> Queries.q1cCompaniesSql,
    "q2_state_ratios" -> Queries.q2StateRatiosSql,
    "q3a_cf_view" -> Queries.q3aCfViewSql,
    "q3b_worst_issues" -> Queries.q3bWorstIssuesSql,
    "date_dim" -> Dims.dateDimSql,
    "location_dim" -> Dims.locationDimSql,
    "category_dim" -> Dims.categoryDimSql,
    "company_dim" -> Dims.companyDimSql,
    "fact_multijoin" -> Facts.factMultijoinSql,
    "expr_join_date_dim" -> Facts.exprJoinDateDimSql,
    "nullsafe_join" -> Facts.nullsafeJoinSql,
    "scd2_resolution" -> Scd.scd2ResolutionSql,
    "scd2_active_view" -> Scd.scd2ActiveViewSql,
    "scd3_issue" -> Scd.scd3IssueSql,
    "etl_melt_pivot" -> Transforms.meltPivotSql,
    "etl_group_impute" -> Transforms.groupImputeSql,
    "etl_clean_events" -> Transforms.cleanEventsSql,
    "etl_json_flatten" -> Transforms.jsonFlattenSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "lang_id" -> TextAnalysis.langIdSql,
    "doc_fingerprint" -> TextAnalysis.docFingerprintSql,
    "exact_dedup" -> TextAnalysis.exactDedupSql,
    "ngram_jaccard_pairs" -> Dedup.ngramJaccardPairsSql,
    "minhash_dedup" -> Dedup.minhashDedupSql,
    "simhash_dedup" -> Dedup.simhashDedupSql,
    "dedup_clusters" -> Dedup.dedupClustersSql,
    "embedding_topk" -> Similarity.embeddingTopkSql,
    "embedding_knn_native" -> Similarity.embeddingKnnNativeSql,
    "embedding_ann_lsh" -> Similarity.embeddingAnnLshSql,
    "embedding_ann_ivf" -> Similarity.embeddingAnnIvfSql,
    "embedding_cosine_dedup" -> Similarity.embeddingCosineDedupSql,
    "embedding_lsh_dedup" -> Similarity.embeddingLshDedupSql,
    "table_lifecycle" -> Lifecycle.tableLifecycleSql,
    "fk_integrity" -> Lifecycle.fkIntegritySql,
    "nested_projection" -> Lifecycle.nestedProjectionSql,
    "schema_evolution" -> Lifecycle.schemaEvolutionSql,
    "media_features" -> Multimodal.mediaFeaturesSql,
    "window_agg" -> EventsStream.windowAggSql,
    "year_dim" -> Dims.yearDimSql,
    "population_fact" -> Facts.populationFactSql,
    "skew_salted_agg" -> SkewJoin.skewSaltedAggSql,
    "q4_bottom_states" -> Queries.q4BottomStatesSql,
    "csv_roundtrip" -> Csv.csvRoundtripSql,
    "bucketed_join" -> Layout.bucketedJoinSql,
    "partitioned_scan" -> Layout.partitionedScanSql,
    "compact_table" -> Layout.compactTableSql,
    "asof_join" -> AsofJoin.asofJoinSql,
    "range_join_bands" -> RangeJoin.rangeJoinBandsSql,
    "ivf_index_search" -> Similarity.ivfIndexSearchSql,
    "lsh_index_search" -> Similarity.lshIndexSearchSql,
    "embedding_quantize" -> Similarity.embeddingQuantizeSql,
    "ingest_dedup" -> EventsStream.ingestDedupSql,
    "click_attribution" -> EventsStream.clickAttributionSql,
    "moving_hourly_avg" -> EventsStream.movingHourlyAvgSql,
    "stratified_sample" -> Sampling.stratifiedSampleSql,
    "token_budget_select" -> Sampling.tokenBudgetSelectSql,
    "hash_split" -> Sampling.hashSplitSql,
    "value_quantiles" -> Quantiles.valueQuantilesSql,
    "media_frame_sample" -> Multimodal.mediaFrameSampleSql,
    "audio_features" -> Multimodal.audioFeaturesSql,
    "distinct_users" -> Quantiles.distinctUsersSql,
    "rollup_revenue" -> Quantiles.rollupRevenueSql,
    "cube_revenue" -> Quantiles.cubeRevenueSql,
    "session_boundaries" -> EventsStream.sessionBoundariesSql,
    "jsonl_roundtrip" -> Csv.jsonlRoundtripSql,
    "dense_hourly_agg" -> EventsStream.denseHourlyAggSql
  )
}
