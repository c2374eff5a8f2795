package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{CorrectionQueries, DslQueries, EtlQueries, ExportQueries, IngestQueries, LlmQueries, MediaQueries, Relational, StoreQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * DataFrame program over the harness tables; `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The SURVEY §7.2 minimum end-to-end slice: synthesized raw `dwc:*`
    * records → the full grabAll enrichment pipeline → a Query Format
    * DSL filter (the reference's own smoke query shape,
    * download.py:588-594) → the recordset citation aggregation. Every
    * layer of the engine in one plan: map-column ETL, typed index
    * fields, DSL compile to pushable predicates, groupBy count. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val o = Tables.orders(spark, dir)
    val raw = o.select(
      col("o_orderkey").as("id"),
      concat(lit("rs"), col("o_custkey") % 5).as("parent"),
      map(
        lit("dwc:genus"), concat(lit("Genus"), col("o_custkey") % 7),
        lit("dwc:specificEpithet"), concat(lit("sp"), col("o_orderkey") % 3),
        lit("dwc:stateProvince"), col("o_orderpriority"),
        lit("dwc:eventDate"), col("o_orderdate").cast("string"),
        lit("dwc:basisOfRecord"), lit("PreservedSpecimen"),
      ).as("data"))
    val enriched = graft.etl.Enrich.records(raw)
    val rq = graft.dsl.Compile.fromJson(
      """{"genus": "Genus1", "basisofrecord": "preservedspecimen"}""",
      graft.dsl.Compile.Options(dataNormalized = true))
    enriched.filter(rq)
      .groupBy(col("recordset"))
      .agg(count(lit(1)).as("itemCount"))
      .orderBy(col("itemCount").desc, col("recordset"))
  }

  type Q = (SparkSession, String) => DataFrame

  /** Whole-stage codegen stays ON for every query. The wide enrichment
    * pipelines used to need a codegen-off pin here (one fused
    * processNext() past the 8 KB JIT / 64 KB Janino ceilings = wasted
    * compile + per-operator fallback); graft.plans.CodegenBarrier now
    * splits those plans into per-stage-group spans that each compile,
    * so the pin — and the cross-query session-conf juggling it needed —
    * is gone. */
  def queries: Map[String, Q] = rawQueries

  private def rawQueries: Map[String, Q] = Map[String, Q](
    "q1_agg"            -> (Relational.q1Agg _),
    "q_terms_agg"       -> (Relational.qTermsAgg _),
    "q_terms_nested"    -> (Relational.qTermsNested _),
    "q_max_watermark"   -> (Relational.qMaxWatermark _),
    "q_count"           -> (Relational.qCount _),
    "q_children_counts" -> (Relational.qChildrenCounts _),
    "q_stats_rollup"    -> (Relational.qStatsRollup _),
    "q_dup_detect"      -> (Relational.qDupDetect _),
    "q_join_equi"       -> (Relational.qJoinEqui _),
    "q_asof_join"       -> (Relational.qAsofJoin _),
    "q_range_join"      -> (Relational.qRangeJoin _),
    "q_join_broadcast"  -> (Relational.qJoinBroadcast _),
    "q_join_salted"     -> (Relational.qJoinSalted _),
    "q_bloom_join"      -> (Relational.qBloomJoin _),
    "q_fuzzy_join"      -> (Relational.qFuzzyJoin _),
    "q_semi_join"       -> (Relational.qSemiJoin _),
    "q_anti_join"       -> (Relational.qAntiJoin _),
    "q_latest_version"  -> (Relational.qLatestVersion _),
    "q_identifiers_agg" -> (Relational.qIdentifiersAgg _),
    "q_sibling_closure" -> (Relational.qSiblingClosure _),
    "q_paging"          -> (Relational.qPaging _),
    "q_topk"            -> (Relational.qTopK _),
    "q_union"           -> (Relational.qUnion _),
    "q_except"          -> (Relational.qExcept _),
    // iDigBio Query Format DSL, end-to-end (SURVEY §2.2)
    "q_dsl_term"           -> (DslQueries.qDslTerm _),
    "q_dsl_terms"          -> (DslQueries.qDslTerms _),
    "q_dsl_range"          -> (DslQueries.qDslRange _),
    "q_dsl_prefix"         -> (DslQueries.qDslPrefix _),
    "q_dsl_exists_missing" -> (DslQueries.qDslExistsMissing _),
    "q_dsl_fulltext"       -> (DslQueries.qDslFulltext _),
    "q_dsl_compound"       -> (DslQueries.qDslCompound _),
    "q_dsl_geo_distance"   -> (DslQueries.qDslGeoDistance _),
    "q_dsl_geo_bbox"       -> (DslQueries.qDslGeoBbox _),
    "q_zorder"             -> (DslQueries.qZorder _),
    "q_geohash_prune"      -> (DslQueries.qGeohashPrune _),
    "q_dsl_geo_polygon"    -> (DslQueries.qDslGeoPolygon _),
    "q_dsl_geo_shape"      -> (DslQueries.qDslGeoShape _),
    "q_fulltext_rank"      -> (DslQueries.qFulltextRank _),
    "q_index_merge"        -> (DslQueries.qIndexMerge _),
    "q_bucketed_join"      -> (Relational.qBucketedJoin _),
    "q_sessionize"         -> (Relational.qSessionize _),
    "q_funnel"             -> (Relational.qFunnel _),
    "q_retention"          -> (Relational.qRetention _),
    "q_pagerank"           -> (Relational.qPagerank _),
    "q_transitions"        -> (Relational.qTransitions _),
    "q_moving_avg"         -> (Relational.qMovingAvg _),
    "q_pivot"              -> (Relational.qPivot _),
    "q_rollup"             -> (Relational.qRollup _),
    "q_compact"            -> (Relational.qCompact _),
    "q_inverted_index"     -> (DslQueries.qInvertedIndex _),
    "q_index_search"       -> (DslQueries.qIndexSearch _),
    // LLM-training-data pipeline operators (documents/embeddings)
    "q_dedup_exact"   -> (LlmQueries.qDedupExact _),
    "q_dedup_minhash" -> (LlmQueries.qDedupMinhash _),
    "q_dedup_incr"    -> (LlmQueries.qDedupIncr _),
    "q_dedup_incr_embed" -> (LlmQueries.qDedupIncrEmbed _),
    "q_dedup_jaccard" -> (LlmQueries.qDedupJaccard _),
    "q_dedup_contain" -> (LlmQueries.qDedupContain _),
    "q_dedup_passages" -> (LlmQueries.qDedupPassages _),
    "q_dedup_passages_apply" -> (LlmQueries.qDedupPassagesApply _),
    "q_dedup_clusters" -> (LlmQueries.qDedupClusters _),
    "q_dedup_apply"   -> (LlmQueries.qDedupApply _),
    "q_dedup_keep_best" -> (LlmQueries.qDedupKeepBest _),
    "q_ann_ivf" -> (LlmQueries.qAnnIvf _),
    "q_ann_ivf_probe" -> (LlmQueries.qAnnIvfProbe _),
    "q_ann_ivf_trained" -> (LlmQueries.qAnnIvfTrained _),
    "q_kmeans" -> (LlmQueries.qKmeans _),
    "q_dedup_embed" -> (LlmQueries.qDedupEmbed _),
    "q_semdedup" -> (LlmQueries.qSemdedup _),
    "q_dedup_simhash" -> (LlmQueries.qDedupSimhash _),
    "q_text_stats"    -> (LlmQueries.qTextStats _),
    "q_quality_rep"   -> (LlmQueries.qQualityRep _),
    "q_quality_filter" -> (LlmQueries.qQualityFilter _),
    "q_split_hash"    -> (LlmQueries.qSplitHash _),
    "q_pii_scrub"     -> (LlmQueries.qPiiScrub _),
    "q_sample_quota"  -> (LlmQueries.qSampleQuota _),
    "q_len_quantiles" -> (LlmQueries.qLenQuantiles _),
    "q_pack_chunks"   -> (LlmQueries.qPackChunks _),
    "q_pack_chunks_sharded" -> (LlmQueries.qPackChunksSharded _),
    "q_perplexity" -> (LlmQueries.qPerplexity _),
    "q_remix_weights" -> (LlmQueries.qRemixWeights _),
    "q_chunk_overlap" -> (LlmQueries.qChunkOverlap _),
    "q_shuffle_order" -> (LlmQueries.qShuffleOrder _),
    "q_distinct_kmv"  -> (LlmQueries.qDistinctKmv _),
    "q_quantile_sketch" -> (LlmQueries.qQuantileSketch _),
    "q_heavy_hitters" -> (LlmQueries.qHeavyHitters _),
    "q_feature_hash"  -> (LlmQueries.qFeatureHash _),
    "q_quality_trim"  -> (LlmQueries.qQualityTrim _),
    "q_token_budget"  -> (LlmQueries.qTokenBudget _),
    "q_decontaminate" -> (LlmQueries.qDecontaminate _),
    "q_decontaminate_apply" -> (LlmQueries.qDecontaminateApply _),
    "q_lang_id"       -> (LlmQueries.qLangId _),
    "q_ann_topk"      -> (LlmQueries.qAnnTopk _),
    "q_ann_lsh"       -> (LlmQueries.qAnnLsh _),
    "q_ann_quantized" -> (LlmQueries.qAnnQuantized _),
    "q_ann_pq_trained" -> (LlmQueries.qAnnPqTrained _),
    "q_ann_pq"        -> (LlmQueries.qAnnPq _),
    // grabAll enrichment pipeline (SURVEY §2.8)
    "q_enrich"        -> (EtlQueries.qEnrich _),
    "q_geo_correct"   -> (EtlQueries.qGeoCorrect _),
    "q_sci_authors"   -> (EtlQueries.qSciAuthors _),
    "q_enrich_media"  -> (EtlQueries.qEnrichMedia _),
    "q_datum"         -> (EtlQueries.qDatum _),
    "q_enrich_recordset" -> (EtlQueries.qEnrichRecordset _),
    "q_enrich_publisher" -> (EtlQueries.qEnrichPublisher _),
    // versioned record store (SURVEY §1.1, §2.3, §2.5)
    "q_store_view"     -> (StoreQueries.qStoreView _),
    "q_has_child"      -> (StoreQueries.qHasChild _),
    "q_version_assign" -> (StoreQueries.qVersionAssign _),
    "q_etag_dedup"     -> (StoreQueries.qEtagDedup _),
    // correction engine + export sinks (SURVEY §2.9, §2.1)
    "q_corrections" -> (CorrectionQueries.qCorrections _),
    "q_corrections_geo" -> (CorrectionQueries.qCorrectionsGeo _),
    "q_dq_stats" -> (CorrectionQueries.qDqStats _),
    "q_ingest_suspects" -> (IngestQueries.qIngestSuspects _),
    "q_uniquevals"  -> (ExportQueries.qUniquevals _),
    "q_export_csv"  -> (ExportQueries.qExportCsv _),
    "q_dwca_roundtrip" -> (ExportQueries.qDwcaRoundtrip _),
    "q_jsonl"       -> (IngestQueries.qJsonl _),
    "q_eml"         -> (IngestQueries.qEml _),
    "q_rss"         -> (IngestQueries.qRss _),
    "q_export_dwca" -> (ExportQueries.qExportDwca _),
    "q_citations"   -> (ExportQueries.qCitations _),
    // incremental / resume indexing (SURVEY §2.10)
    "q_incremental"    -> (StreamQueries.qIncremental _),
    "q_resume_actions" -> (StreamQueries.qResumeActions _),
    // media url/etag resolution (SURVEY §2.3) + derivative kernels
    "q_media_resolution" -> (MediaQueries.qMediaResolution _),
    "q_media_derivative" -> (MediaQueries.qMediaDerivative _),
    "q_media_phash"     -> (MediaQueries.qMediaPhash _),
    "q_media_audio"     -> (MediaQueries.qMediaAudio _),
    "q_media_video"     -> (MediaQueries.qMediaVideo _),
    // ingestion joins + reporting (SURVEY §2.3, §2.4)
    "q_ingest_identity" -> (IngestQueries.qIngestIdentity _),
    "q_suffix_match"    -> (IngestQueries.qSuffixMatch _),
    "q_dq_report"       -> (IngestQueries.qDqReport _),
    "q_ingest_summary"  -> (IngestQueries.qIngestSummary _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg"            -> Relational.q1AggSql,
    "q_terms_agg"       -> Relational.qTermsAggSql,
    "q_terms_nested"    -> Relational.qTermsNestedSql,
    "q_max_watermark"   -> Relational.qMaxWatermarkSql,
    "q_count"           -> Relational.qCountSql,
    "q_children_counts" -> Relational.qChildrenCountsSql,
    "q_stats_rollup"    -> Relational.qStatsRollupSql,
    "q_dup_detect"      -> Relational.qDupDetectSql,
    "q_join_equi"       -> Relational.qJoinEquiSql,
    "q_asof_join"       -> Relational.qAsofJoinSql,
    "q_range_join"      -> Relational.qRangeJoinSql,
    "q_join_broadcast"  -> Relational.qJoinBroadcastSql,
    "q_join_salted"     -> Relational.qJoinSaltedSql,
    "q_bloom_join"      -> Relational.qBloomJoinSql,
    "q_fuzzy_join"      -> Relational.qFuzzyJoinSql,
    "q_semi_join"       -> Relational.qSemiJoinSql,
    "q_anti_join"       -> Relational.qAntiJoinSql,
    "q_latest_version"  -> Relational.qLatestVersionSql,
    "q_identifiers_agg" -> Relational.qIdentifiersAggSql,
    "q_sibling_closure" -> Relational.qSiblingClosureSql,
    "q_paging"          -> Relational.qPagingSql,
    "q_topk"            -> Relational.qTopKSql,
    "q_union"           -> Relational.qUnionSql,
    "q_except"          -> Relational.qExceptSql,
    "q_dsl_term"           -> DslQueries.qDslTermSql,
    "q_dsl_terms"          -> DslQueries.qDslTermsSql,
    "q_dsl_range"          -> DslQueries.qDslRangeSql,
    "q_dsl_prefix"         -> DslQueries.qDslPrefixSql,
    "q_dsl_exists_missing" -> DslQueries.qDslExistsMissingSql,
    "q_dsl_fulltext"       -> DslQueries.qDslFulltextSql,
    "q_dsl_compound"       -> DslQueries.qDslCompoundSql,
    "q_dsl_geo_distance"   -> DslQueries.qDslGeoDistanceSql,
    "q_dsl_geo_bbox"       -> DslQueries.qDslGeoBboxSql,
    "q_zorder"             -> DslQueries.qZorderSql,
    "q_geohash_prune"      -> DslQueries.qGeohashPruneSql,
    "q_dsl_geo_polygon"    -> DslQueries.qDslGeoPolygonSql,
    "q_dsl_geo_shape"      -> DslQueries.qDslGeoShapeSql,
    "q_fulltext_rank"      -> DslQueries.qFulltextRankSql,
    "q_index_merge"        -> DslQueries.qIndexMergeSql,
    "q_bucketed_join"      -> Relational.qBucketedJoinSql,
    "q_sessionize"         -> Relational.qSessionizeSql,
    "q_funnel"             -> Relational.qFunnelSql,
    "q_retention"          -> Relational.qRetentionSql,
    "q_pagerank"           -> Relational.qPagerankSql,
    "q_transitions"        -> Relational.qTransitionsSql,
    "q_moving_avg"         -> Relational.qMovingAvgSql,
    "q_pivot"              -> Relational.qPivotSql,
    "q_rollup"             -> Relational.qRollupSql,
    "q_compact"            -> Relational.qCompactSql,
    "q_inverted_index"     -> DslQueries.qInvertedIndexSql,
    "q_index_search"       -> DslQueries.qFulltextRankSql,
    "q_dedup_exact"   -> LlmQueries.qDedupExactSql,
    "q_dedup_minhash" -> LlmQueries.qDedupMinhashSql,
    "q_dedup_incr"    -> LlmQueries.qDedupIncrSql,
    "q_dedup_incr_embed" -> LlmQueries.qDedupIncrEmbedSql,
    "q_dedup_jaccard" -> LlmQueries.qDedupJaccardSql,
    "q_dedup_contain" -> LlmQueries.qDedupContainSql,
    "q_dedup_passages" -> LlmQueries.qDedupPassagesSql,
    "q_dedup_passages_apply" -> LlmQueries.qDedupPassagesApplySql,
    "q_dedup_clusters" -> LlmQueries.qDedupClustersSql,
    "q_dedup_apply"   -> LlmQueries.qDedupApplySql,
    "q_dedup_keep_best" -> LlmQueries.qDedupKeepBestSql,
    "q_ann_ivf" -> LlmQueries.qAnnIvfSql,
    "q_ann_ivf_probe" -> LlmQueries.qAnnIvfProbeSql,
    "q_ann_ivf_trained" -> LlmQueries.qAnnIvfTrainedSql,
    "q_dedup_embed" -> LlmQueries.qDedupEmbedSql,
    "q_semdedup" -> LlmQueries.qSemdedupSql,
    "q_dedup_simhash" -> LlmQueries.qDedupSimhashSql,
    "q_text_stats"    -> LlmQueries.qTextStatsSql,
    "q_quality_rep"   -> LlmQueries.qQualityRepSql,
    "q_quality_filter" -> LlmQueries.qQualityFilterSql,
    "q_split_hash"    -> LlmQueries.qSplitHashSql,
    "q_pii_scrub"     -> LlmQueries.qPiiScrubSql,
    "q_sample_quota"  -> LlmQueries.qSampleQuotaSql,
    "q_len_quantiles" -> LlmQueries.qLenQuantilesSql,
    "q_pack_chunks"   -> LlmQueries.qPackChunksSql,
    "q_pack_chunks_sharded" -> LlmQueries.qPackChunksShardedSql,
    "q_perplexity"    -> LlmQueries.qPerplexitySql,
    "q_remix_weights" -> LlmQueries.qRemixWeightsSql,
    "q_chunk_overlap" -> LlmQueries.qChunkOverlapSql,
    "q_shuffle_order" -> LlmQueries.qShuffleOrderSql,
    "q_distinct_kmv"  -> LlmQueries.qDistinctKmvSql,
    "q_quantile_sketch" -> LlmQueries.qQuantileSketchSql,
    "q_heavy_hitters" -> LlmQueries.qHeavyHittersSql,
    "q_feature_hash"  -> LlmQueries.qFeatureHashSql,
    "q_quality_trim"  -> LlmQueries.qQualityTrimSql,
    "q_token_budget"  -> LlmQueries.qTokenBudgetSql,
    "q_kmeans"        -> LlmQueries.qKmeansSql,
    "q_decontaminate" -> LlmQueries.qDecontaminateSql,
    "q_decontaminate_apply" -> LlmQueries.qDecontaminateApplySql,
    "q_lang_id"       -> LlmQueries.qLangIdSql,
    "q_ann_topk"      -> LlmQueries.qAnnTopkSql,
    "q_ann_lsh"       -> LlmQueries.qAnnLshSql,
    "q_ann_quantized" -> LlmQueries.qAnnQuantizedSql,
    "q_ann_pq"        -> LlmQueries.qAnnPqSql,
    "q_ann_pq_trained" -> LlmQueries.qAnnPqTrainedSql,
    "q_enrich"        -> EtlQueries.qEnrichSql,
    "q_geo_correct"   -> EtlQueries.qGeoCorrectSql,
    "q_sci_authors"   -> EtlQueries.qSciAuthorsSql,
    "q_enrich_media"  -> EtlQueries.qEnrichMediaSql,
    "q_datum"         -> EtlQueries.qDatumSql,
    "q_enrich_recordset" -> EtlQueries.qEnrichRecordsetSql,
    "q_enrich_publisher" -> EtlQueries.qEnrichPublisherSql,
    "q_store_view"     -> StoreQueries.qStoreViewSql,
    "q_has_child"      -> StoreQueries.qHasChildSql,
    "q_version_assign" -> StoreQueries.qVersionAssignSql,
    "q_etag_dedup"     -> StoreQueries.qEtagDedupSql,
    "q_corrections" -> CorrectionQueries.qCorrectionsSql,
    "q_corrections_geo" -> CorrectionQueries.qCorrectionsGeoSql,
    "q_dq_stats" -> CorrectionQueries.qDqStatsSql,
    "q_ingest_suspects" -> IngestQueries.qIngestSuspectsSql,
    "q_uniquevals"  -> ExportQueries.qUniquevalsSql,
    "q_export_csv"  -> ExportQueries.qExportCsvSql,
    "q_dwca_roundtrip" -> ExportQueries.qDwcaRoundtripSql,
    "q_jsonl"       -> IngestQueries.qJsonlSql,
    "q_eml"         -> IngestQueries.qEmlSql,
    "q_rss"         -> IngestQueries.qRssSql,
    "q_export_dwca" -> ExportQueries.qExportDwcaSql,
    "q_citations"   -> ExportQueries.qCitationsSql,
    "q_incremental"    -> StreamQueries.qIncrementalSql,
    "q_resume_actions" -> StreamQueries.qResumeActionsSql,
    "q_media_resolution" -> MediaQueries.qMediaResolutionSql,
    "q_media_derivative" -> MediaQueries.qMediaDerivativeSql(mediaDerivativeNBytes),
    "q_media_phash"     -> MediaQueries.qMediaPhashSql,
    "q_media_audio"     -> MediaQueries.qMediaAudioSql,
    "q_media_video"     -> MediaQueries.qMediaVideoSql,
    "q_ingest_identity" -> IngestQueries.qIngestIdentitySql,
    "q_suffix_match"    -> IngestQueries.qSuffixMatchSql,
    "q_dq_report"       -> IngestQueries.qDqReportSql,
    "q_ingest_summary"  -> IngestQueries.qIngestSummarySql,
  )

  /** Pinned byte lengths of every q_media_derivative output blob —
    * (seed, kind, n_bytes), generated once by [[MediaOracleGen]] and
    * pasted here so the oracle is a durable constants gate rather than
    * a dump-time recomputation (MediaOracleSpec fails loudly if the
    * kernels drift from these, forcing a conscious regeneration).
    *
    * ENVIRONMENT-COUPLED: the JPEG byte lengths pin the exact encoder
    * output of the JDK these constants were generated under —
    * OpenJDK 17.0.20 (Debian, javax.imageio). A JDK/vendor upgrade may
    * legitimately change encoder output with the resize semantics
    * unchanged; when MediaOracleSpec fails after such an upgrade,
    * rerun [[MediaOracleGen]] and paste the fresh table — that IS the
    * conscious regeneration, not a bug. (The decoded derivative
    * DIMENSIONS in the same oracle are environment-independent.) */
  val mediaDerivativeNBytes: String =
    """(1, 'thumbnail', 19302), (1, 'webview', 22381), (2, 'thumbnail', 19947), (2, 'webview', 22538),
      |(3, 'thumbnail', 19588), (3, 'webview', 22163), (4, 'thumbnail', 19556), (4, 'webview', 22140),
      |(5, 'thumbnail', 19451), (5, 'webview', 22414), (6, 'thumbnail', 19537), (6, 'webview', 22237),
      |(7, 'thumbnail', 19805), (7, 'webview', 22584), (8, 'thumbnail', 19848), (8, 'webview', 22005),
      |(9, 'thumbnail', 19942), (9, 'webview', 21955), (10, 'thumbnail', 19730), (10, 'webview', 22565),
      |(11, 'thumbnail', 19990), (11, 'webview', 21899), (12, 'thumbnail', 20134), (12, 'webview', 22274),
      |(13, 'thumbnail', 19583), (13, 'webview', 22312), (14, 'thumbnail', 19430), (14, 'webview', 22533),
      |(15, 'thumbnail', 20030), (15, 'webview', 22727), (16, 'thumbnail', 20042), (16, 'webview', 21707),
      |(17, 'thumbnail', 19352), (17, 'webview', 21689), (18, 'thumbnail', 20028), (18, 'webview', 22472),
      |(19, 'thumbnail', 20201), (19, 'webview', 22199), (20, 'thumbnail', 20015), (20, 'webview', 22297),
      |(21, 'thumbnail', 19730), (21, 'webview', 22360), (22, 'thumbnail', 19880), (22, 'webview', 22187),
      |(23, 'thumbnail', 19990), (23, 'webview', 22644), (24, 'thumbnail', 20018), (24, 'webview', 22013),
      |(25, 'thumbnail', 19975), (25, 'webview', 21965), (26, 'thumbnail', 19495), (26, 'webview', 22710),
      |(27, 'thumbnail', 19288), (27, 'webview', 22712), (28, 'thumbnail', 19978), (28, 'webview', 22795),
      |(29, 'thumbnail', 20605), (29, 'webview', 23210), (30, 'thumbnail', 20274), (30, 'webview', 22944),
      |(31, 'thumbnail', 20004), (31, 'webview', 23550), (32, 'thumbnail', 20952), (32, 'webview', 22108),
      |(33, 'thumbnail', 20757), (33, 'webview', 22350), (34, 'thumbnail', 20033), (34, 'webview', 23079),
      |(35, 'thumbnail', 20166), (35, 'webview', 22668), (36, 'thumbnail', 20797), (36, 'webview', 22641),
      |(37, 'thumbnail', 20629), (37, 'webview', 22868), (38, 'thumbnail', 20466), (38, 'webview', 22627),
      |(39, 'thumbnail', 20274), (39, 'webview', 23351), (40, 'thumbnail', 20602), (40, 'webview', 22902),
      |(41, 'thumbnail', 20490), (41, 'webview', 22893), (42, 'thumbnail', 20605), (42, 'webview', 23471),
      |(43, 'thumbnail', 19987), (43, 'webview', 23068), (44, 'thumbnail', 20543), (44, 'webview', 23143),
      |(45, 'thumbnail', 20484), (45, 'webview', 23288), (46, 'thumbnail', 20468), (46, 'webview', 23035),
      |(47, 'thumbnail', 20313), (47, 'webview', 23705), (48, 'thumbnail', 20196), (48, 'webview', 22512),
      |(49, 'thumbnail', 20605), (49, 'webview', 22731), (50, 'thumbnail', 20960), (50, 'webview', 23446)"""
      .stripMargin.replace("\n", " ")
}
