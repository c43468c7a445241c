package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{LogPipeline => L, Relational => R, Scale, Serving}
import graft.pipeline.{Dedup, Retrieval, Similarity, TextPipeline => T}

/** Driver contract — query registry + DuckDB oracle SQL.
  *
  * Every oracle is written for hash-stability against Spark output:
  *  - money math in DECIMAL (exact, order-independent), cast to DOUBLE only
  *    in the final projection;
  *  - computed integers as BIGINT on both sides;
  *  - `window()` ↔ `time_bucket(..., TIMESTAMP '1970-01-01')` (explicit epoch
  *    origin — DuckDB's default origin is 2000-01-03);
  *  - `events.ts` is ns-precision parquet → CAST to µs TIMESTAMP in DuckDB
  *    to match Spark's read;
  *  - ratios/cosines rounded to 6dp with the identical fold order.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core
    "q1_pricing_summary"   -> ((s, d) => R.q1PricingSummary(s, d)),
    "q3_top_revenue"       -> ((s, d) => R.q3TopRevenue(s, d)),
    "q5_region_revenue"    -> ((s, d) => R.q5RegionRevenue(s, d)),
    // correlated-subquery family (decorrelated by hand — see Relational)
    "q4_order_priority"    -> ((s, d) => R.q4OrderPriority(s, d)),
    "q7_nation_trade"      -> ((s, d) => R.q7NationTrade(s, d)),
    "q10_returned_items"   -> ((s, d) => R.q10ReturnedItems(s, d)),
    "q17_small_qty"        -> ((s, d) => R.q17SmallQty(s, d)),
    "q18_large_orders"     -> ((s, d) => R.q18LargeOrders(s, d)),
    "q22_idle_balance"     -> ((s, d) => R.q22IdleBalance(s, d)),
    "q13_order_dist"       -> ((s, d) => R.q13OrderDist(s, d)),
    "q2_min_cost_supp"     -> ((s, d) => R.q2MinCostSupp(s, d)),
    "a22_mad_outliers"     -> ((s, d) => R.a22MadOutliers(s, d)),
    "a25_lateness_profile" -> ((s, d) => R.a25LatenessProfile(s, d)),
    "a26_value_decay"      -> ((s, d) => R.a26ValueDecay(s, d)),
    "a27_inter_event_gaps" -> ((s, d) => R.a27InterEventGaps(s, d)),
    "a28_hourly_acf"       -> ((s, d) => R.a28HourlyAcf(s, d)),
    "a29_winsorized_stats" -> ((s, d) => R.a29WinsorizedStats(s, d)),
    "a30_cusum_change"     -> ((s, d) => R.a30CusumChange(s, d)),
    "a31_dow_profile"      -> ((s, d) => R.a31DowProfile(s, d)),
    "a23_value_bins"       -> ((s, d) => R.a23ValueBins(s, d)),
    "multimodal_frames"    -> ((s, d) => graft.pipeline.Multimodal.documentFrames(s, d)),
    // cost-routed: byte-block vs probed-MIH, same radius-7/radius-2 answer
    // either way (BenchScaleFingerprint trips if the route mis-measures)
    "multimodal_phash_pairs" -> ((s, d) => graft.pipeline.Multimodal.phashPairsAdaptive(s, d)),
    "multimodal_afp_pairs" -> ((s, d) => graft.pipeline.Multimodal.afpPairsAdaptive(s, d)),
    "multimodal_phash_probed" -> ((s, d) => graft.pipeline.Multimodal.phashPairsProbed(s, d)),
    "multimodal_afp_probed" -> ((s, d) => graft.pipeline.Multimodal.afpPairsProbed(s, d)),
    "multimodal_phash_mih" -> ((s, d) => graft.pipeline.Multimodal.phashPairsMih(s, d)),
    "multimodal_afp_mih"   -> ((s, d) => graft.pipeline.Multimodal.afpPairsMih(s, d)),
    "multimodal_phash_clusters" -> ((s, d) => graft.pipeline.Multimodal.phashClusters(s, d)),
    "multimodal_afp_clusters" -> ((s, d) => graft.pipeline.Multimodal.afpClusters(s, d)),
    "mine_assoc_rules"     -> ((s, d) => graft.pipeline.Mining.assocRules(s, d)),
    "mine_seq_rules"       -> ((s, d) => graft.pipeline.Mining.seqRules(s, d)),
    "q11_top_value"        -> ((s, d) => R.q11TopValue(s, d)),
    "q15_top_supplier"     -> ((s, d) => R.q15TopSupplier(s, d)),
    "q14_promo_share"      -> ((s, d) => R.q14PromoShare(s, d)),
    "q6_forecast_revenue"  -> ((s, d) => R.q6ForecastRevenue(s, d)),
    "q8_market_share"      -> ((s, d) => R.q8MarketShare(s, d)),
    "q9_product_profit"    -> ((s, d) => R.q9ProductProfit(s, d)),
    "q12_ship_lag"         -> ((s, d) => R.q12ShipLag(s, d)),
    "q16_supplier_cnt"     -> ((s, d) => R.q16SupplierCnt(s, d)),
    "q19_disjunctive_rev"  -> ((s, d) => R.q19DisjunctiveRev(s, d)),
    "q20_excess_supp"      -> ((s, d) => R.q20ExcessSupp(s, d)),
    "q21_waiting_supp"     -> ((s, d) => R.q21WaitingSupp(s, d)),
    "j9_interval_left"     -> ((s, d) => R.j9IntervalLeftJoin(s, d)),
    "a19_user_zscore"      -> ((s, d) => R.a19UserZscore(s, d)),
    // joins (SURVEY §2.4)
    "j1_interval_join"     -> ((s, d) => R.j1IntervalJoin(s, d)),
    "j2_interval_join_asym"-> ((s, d) => R.j2IntervalJoinAsym(s, d)),
    "j3_dim_enrich"        -> ((s, d) => R.j3DimEnrich(s, d)),
    "j4_bounce_detect"     -> ((s, d) => L.j4BounceDetect(s, d)),
    "j4_bounce_times2"     -> ((s, d) => L.j4Times2Transform(graft.Tables.events(s, d))),
    "j6_asof_join"         -> ((s, d) => R.j6AsofJoin(s, d)),
    // projections / filters / transforms (§2.2)
    "p1_parse_clean"       -> ((s, d) => L.p1ParseClean(s, d)),
    "p2_delete_filter"     -> ((s, d) => L.p2DeleteFilter(s, d)),
    "p3_column_prune"      -> ((s, d) => L.p3ColumnPrune(s, d)),
    "p4_derived_cols"      -> ((s, d) => L.p4DerivedCols(s, d)),
    "p6_conditional_measure"-> ((s, d) => L.p6ConditionalMeasure(s, d)),
    "p8_explode_json"      -> ((s, d) => L.p8ExplodeJson(s, d)),
    // splitting / routing (§2.3)
    "sp1_log_split"        -> ((s, d) => L.sp1LogSplit(s, d)),
    "sp2_config_router"    -> ((s, d) => L.sp2ConfigRouter(s, d)),
    // stateful (batch oracles, §2.6)
    "st1_is_new_fix"       -> ((s, d) => L.st1IsNewFix(s, d)),
    "st2_daily_uv"         -> ((s, d) => L.st2DailyUv(s, d)),
    // aggregations (§2.5)
    "a1_visitor_stats"     -> ((s, d) => L.a1VisitorStats(s, d)),
    "a1_visitor_stats_4d"  -> ((s, d) => L.a1VisitorStats4d(s, d)),
    "a2_product_stats"     -> ((s, d) => L.a2ProductStats(s, d)),
    "a3_province_stats"    -> ((s, d) => R.a3ProvinceStats(s, d)),
    "a4_keyword_stats"     -> ((s, d) => T.a4KeywordStats(s, d)),
    "a5_gmv_by_day"        -> ((s, d) => R.a5GmvByDay(s, d)),
    "a5_top_brands"        -> ((s, d) => R.a5TopBrands(s, d)),
    "a6_session_window"    -> ((s, d) => L.a6SessionWindows(s, d)),
    "a8_percentiles"       -> ((s, d) => R.a8Percentiles(s, d)),
    "a9_rollup"            -> ((s, d) => R.a9Rollup(s, d)),
    "a10_pivot"            -> ((s, d) => R.a10Pivot(s, d)),
    "a11_window_funcs"     -> ((s, d) => R.a11WindowFuncs(s, d)),
    "a12_cube"             -> ((s, d) => R.a12Cube(s, d)),
    "a24_grouping_sets"    -> ((s, d) => R.a24GroupingSets(s, d)),
    "p9_set_ops"           -> ((s, d) => R.p9SetOps(s, d)),
    "j7_semi_anti"         -> ((s, d) => R.j7SemiAnti(s, d)),
    "a7_sliding_window"    -> ((s, d) => L.a7SlidingWindows(s, d)),
    "a13_event_funnel"     -> ((s, d) => L.a13EventFunnel(s, d)),
    "a14_cohort_retention" -> ((s, d) => L.a14CohortRetention(s, d)),
    "a15_rfm_segments"     -> ((s, d) => L.a15RfmSegments(s, d)),
    "a16_attribution"      -> ((s, d) => L.a16LastTouchAttribution(s, d)),
    "a17_funnel_latency"   -> ((s, d) => L.a17FunnelLatency(s, d)),
    "a18_active_users"     -> ((s, d) => L.a18ActiveUsers(s, d)),
    "a20_path_transitions" -> ((s, d) => L.a20PathTransitions(s, d)),
    "a21_path_topk"        -> ((s, d) => L.a21PathTopk(s, d)),
    "cdc_scd2_history"     -> ((s, d) => L.cdcScd2History(s, d)),
    "cdc_snapshot_at"      -> ((s, d) => L.cdcSnapshotAt(s, d)),
    // serving SQL surface (§3.3)
    "sql_gmv_serving"      -> ((s, d) => Serving.sqlGmvByBrand(s, d)),
    "sql_keyword_lateral"  -> ((s, d) => Serving.sqlKeywordLateralView(s, d)),
    "sql_keyword_native"   -> ((s, d) => Serving.sqlKeywordNative(s, d)),
    // UDTF / text functions (§2.7-2.8 + training-data ops)
    "u1_split_words"       -> ((s, d) => T.u1SplitWords(s, d)),
    "u1_split_words_cjk"   -> ((s, d) => T.u1SplitWordsCjk(s, d)),
    "text_lang_id"         -> ((s, d) => T.langIdQuery(s, d)),
    "text_langid_eval"     -> ((s, d) => T.langIdEval(s, d)),
    "text_ngram_freq"      -> ((s, d) => T.ngramFrequency(s, d)),
    "text_collocations"    -> ((s, d) => T.collocations(s, d)),
    "text_hashed_features" -> ((s, d) => T.hashedFeatures(s, d)),
    "quality_psi_drift"    -> ((s, d) => T.psiDrift(s, d)),
    "text_ngram_novelty"   -> ((s, d) => T.ngramNovelty(s, d)),
    "text_quality_score"   -> ((s, d) => T.qualityScore(s, d)),
    "text_token_counts"    -> ((s, d) => T.tokenCounts(s, d)),
    "text_fingerprints"    -> ((s, d) => T.fingerprints(s, d)),
    "text_repetition"      -> ((s, d) => T.repetitionScore(s, d)),
    "text_tfidf_topk"      -> ((s, d) => T.tfidfTopK(s, d)),
    "text_surprisal"       -> ((s, d) => T.surprisalScore(s, d)),
    "text_bigram_surprisal" -> ((s, d) => T.bigramSurprisal(s, d)),
    "sample_stratified"    -> ((s, d) => T.stratifiedSample(s, d)),
    "sample_token_budget"  -> ((s, d) => T.tokenBudgetSample(s, d)),
    "sample_lang_balance"  -> ((s, d) => T.langBalanceSample(s, d)),
    "sample_temperature"   -> ((s, d) => T.temperatureSample(s, d)),
    "sample_priority"      -> ((s, d) => T.prioritySample(s, d)),
    "text_normalize_stats" -> ((s, d) => T.normalizeStats(s, d)),
    "quality_compression"  -> ((s, d) => T.compressionRatio(s, d)),
    "quality_ks_lengths"   -> ((s, d) => T.ksLengths(s, d)),
    "quality_benford"      -> ((s, d) => graft.operators.Layout.benfordAudit(s, d)),
    "corpus_report"        -> ((s, d) => T.corpusReport(s, d)),
    "shard_assign"         -> ((s, d) => T.shardAssign(s, d)),
    "text_char_entropy"    -> ((s, d) => T.charEntropyScore(s, d)),
    "text_boilerplate"     -> ((s, d) => T.boilerplateNgrams(s, d)),
    "text_boilerplate_strip" -> ((s, d) => T.boilerplateStrip(s, d)),
    "text_vocab_coverage"  -> ((s, d) => T.vocabCoverage(s, d)),
    "text_oov_rate"        -> ((s, d) => T.oovRate(s, d)),
    "text_dsir_weight"     -> ((s, d) => T.dsirWeight(s, d)),
    "sample_dsir"          -> ((s, d) => T.dsirSample(s, d)),
    "text_quality_buckets" -> ((s, d) => T.qualityBuckets(s, d)),
    "text_chunks"          -> ((s, d) => T.chunkDocuments(s, d)),
    "text_span_corrupt"    -> ((s, d) => T.spanCorrupt(s, d)),
    "text_zipf_fit"        -> ((s, d) => T.zipfFit(s, d)),
    "text_heaps_fit"       -> ((s, d) => T.heapsFit(s, d)),
    "text_winnow_fps"      -> ((s, d) => T.winnowFingerprints(s, d)),
    "dedup_winnow_pairs"   -> ((s, d) => T.winnowPairs(s, d)),
    "text_bpe_pairs"       -> ((s, d) => T.bpePairFreq(s, d)),
    "sketch_cms_tokens"    -> ((s, d) => T.cmsHeavyHitters(s, d)),
    "sketch_kmv_distinct"  -> ((s, d) => graft.pipeline.Sketches.kmvDistinct(s, d)),
    "sketch_kmv_overlap"   -> ((s, d) => graft.pipeline.Sketches.kmvOverlap(s, d)),
    "sample_bottomk"       -> ((s, d) => T.bottomKSample(s, d)),
    "sample_epoch_shuffle" -> ((s, d) => T.epochShuffle(s, d)),
    "text_kl_per_source"   -> ((s, d) => T.klPerSource(s, d)),
    "multimodal_features"  -> ((s, d) => T.multimodalFeatures(s, d)),
    "text_pii_redact"      -> ((s, d) => T.piiRedact(s, d)),
    "text_length_hist"     -> ((s, d) => T.lengthHistogram(s, d)),
    "pack_sequences"       -> ((s, d) => T.packSequences(s, d)),
    "text_filter_reasons"  -> ((s, d) => T.filterReasons(s, d)),
    // dedup family
    "dedup_exact"          -> ((s, d) => Dedup.exact(s, d)),
    "dedup_dupfreq_hist"   -> ((s, d) => Dedup.dupSizeHistogram(s, d)),
    "dedup_minhash_sig"    -> ((s, d) => Dedup.minhashSigExploded(s, d)),
    "dedup_minhash_lsh"    -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_minhash_acc"    -> ((s, d) => Dedup.minhashAccuracy(s, d)),
    "dedup_simhash"        -> ((s, d) => Dedup.simhashTable(s, d)),
    "dedup_simhash_pairs"  -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_ngram_jaccard"  -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_ngram_prefix"   -> ((s, d) => Dedup.ngramJaccardPrefix(s, d)),
    "dedup_ngram_adaptive" -> ((s, d) => Dedup.ngramJaccardAdaptive(s, d)),
    "dedup_passage_strip"  -> ((s, d) => Dedup.passageDedupStrip(s, d)),
    "dedup_jaccard_knn"    -> ((s, d) => Dedup.jaccardKnn(s, d)),
    "dedup_threshold_hist" -> ((s, d) => Dedup.thresholdHist(s, d)),
    "dedup_embedding"      -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "dedup_corpus_clean"   -> ((s, d) => Dedup.corpusClean(s, d)),
    "dedup_clusters"       -> ((s, d) => Dedup.corpusClusters(s, d)),
    "dedup_keep_best"      -> ((s, d) => Dedup.keepBestOfCluster(s, d)),
    "dedup_contamination"  -> ((s, d) => Dedup.contamination(s, d)),
    "sketch_bloom_contam"  -> ((s, d) => Dedup.bloomContamination(s, d)),
    "dedup_decontaminate"  -> ((s, d) => Dedup.decontaminate(s, d)),
    "dedup_substr_spans"   -> ((s, d) => Dedup.duplicateSpans(s, d)),
    "dedup_substr_strip"   -> ((s, d) => Dedup.duplicateSpanStrip(s, d)),
    "dedup_source_overlap" -> ((s, d) => Dedup.sourceOverlapMatrix(s, d)),
    "pipeline_funnel"      -> ((s, d) => Dedup.curationFunnel(s, d)),
    "dedup_containment"    -> ((s, d) => Dedup.bagOverlap(s, d)),
    "dedup_containment_prefix" -> ((s, d) => Dedup.bagOverlapPrefix(s, d)),
    "dedup_incremental"    -> ((s, d) => Dedup.incrementalDedup(s, d)),
    // similarity search
    "ann_brute_topk"       -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "ann_lsh_topk"         -> ((s, d) => Similarity.lshTopK(s, d)),
    "ann_ivf_topk"         -> ((s, d) => Similarity.ivfTopK(s, d)),
    "ann_quant_topk"       -> ((s, d) => Similarity.quantTopK(s, d)),
    "ann_lsh_multiprobe"   -> ((s, d) => Similarity.lshMultiProbeTopK(s, d)),
    "ann_pq_topk"          -> ((s, d) => Similarity.pqTopK(s, d)),
    "ann_ivfpq_topk"       -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "ann_lsh_multitable"   -> ((s, d) => Similarity.lshMultiTableTopK(s, d)),
    "ann_pq_tuned"         -> ((s, d) => Similarity.pqTopK(s, d, m = 32, ks = 16, iters = 2)),
    "ann_ivfpq_tuned"      -> ((s, d) => Similarity.ivfPqTopK(s, d, m = 32, ks = 16, nProbe = 3, iters = 2, rerankDepth = 50)),
    "ann_pq_rerank"        -> ((s, d) => Similarity.pqTopK(s, d, m = 32, ks = 16, iters = 2, rerankDepth = 50)),
    "multimodal_wav_stats" -> ((s, d) => graft.pipeline.Multimodal.wavStats(s, d)),
    "multimodal_ppm_stats" -> ((s, d) => graft.pipeline.Multimodal.ppmStats(s, d)),
    "multimodal_ppm_resize" -> ((s, d) => graft.pipeline.Multimodal.ppmResizeStats(s, d)),
    "multimodal_wav_resample" -> ((s, d) => graft.pipeline.Multimodal.wavResampleStats(s, d)),
    "ann_filtered_topk"    -> ((s, d) => Similarity.filteredTopK(s, d)),
    // retrieval (sparse BM25 + hybrid fusion)
    "retrieval_bm25"       -> ((s, d) => Retrieval.bm25MoreLikeThis(s, d)),
    "index_postings"       -> ((s, d) => Retrieval.indexPostings(s, d)),
    "retrieval_hybrid_rrf" -> ((s, d) => Retrieval.hybridRrf(s, d)),
    "retrieval_rerank"     -> ((s, d) => Retrieval.rerankTopK(s, d)),
    "retrieval_eval"       -> ((s, d) => Retrieval.retrievalEval(s, d)),
    "index_phrase_match"   -> ((s, d) => Retrieval.phraseMatch(s, d)),
    "sample_mixture_plan"  -> ((s, d) => T.mixturePlan(s, d)),
    "shard_rebalance"      -> ((s, d) => T.shardRebalance(s, d)),
    "quantize_int8"        -> ((s, d) => Similarity.quantizeInt8(s, d)),
    "kmeans_assign"        -> ((s, d) => Similarity.kmeansAssign(s, d)),
    "embedding_silhouette" -> ((s, d) => Similarity.kmeansSilhouette(s, d)),
    "embedding_fisher"     -> ((s, d) => Similarity.embeddingFisher(s, d)),
    "sample_kcenter"       -> ((s, d) => Similarity.kcenterSample(s, d)),
    "sample_kcenter_weights" -> ((s, d) => Similarity.kcenterWeights(s, d)),
    "embedding_labelprop"  -> ((s, d) => Similarity.knnLabelProp(s, d)),
    "embedding_outliers"   -> ((s, d) => Similarity.embeddingOutliers(s, d)),
    "embedding_jl_project" -> ((s, d) => Similarity.jlProject(s, d)),
    "embedding_jl_audit"   -> ((s, d) => Similarity.jlAudit(s, d)),
    "ann_jl_topk"          -> ((s, d) => Similarity.jlTopK(s, d)),
    "ann_jl_rerank"        -> ((s, d) => Similarity.jlRerank(s, d)),
    "dedup_semantic"       -> ((s, d) => Similarity.semanticDedupPairs(s, d)),
    "sample_cluster_balance" -> ((s, d) => Similarity.clusterBalanceSample(s, d)),
    "sample_split"         -> ((s, d) => Dedup.leakageFreeSplit(s, d)),
    "split_leakage_audit"  -> ((s, d) => Dedup.splitLeakageAudit(s, d)),
    "curriculum_phase"     -> ((s, d) => T.curriculumPhase(s, d)),
    // multimodal decode plumbing (mapPartitions batch shape; decode stubbed)
    "multimodal_decode"    -> ((s, d) => graft.pipeline.Multimodal.documentFeatures(s, d)
                                 .select("id", "media_type", "n_bytes")),
    // layout / table management (operators.Layout)
    "profile_columns"      -> ((s, d) => graft.operators.Layout.profileColumns(s, d)),
    "layout_zorder"        -> ((s, d) => graft.operators.Layout.zorderKey(s, d)),
    "layout_bucketed_join" -> ((s, d) => graft.operators.Layout.bucketedJoin(s, d)),
    "layout_partitioned"   -> ((s, d) => graft.operators.Layout.partitionPrunedMonth(s, d)),
    "layout_dpp"           -> ((s, d) => graft.operators.Layout.dppQuarterJoin(s, d)),
    "layout_skew_profile"  -> ((s, d) => graft.operators.Layout.skewProfile(s, d)),
    "quality_expectations" -> ((s, d) => graft.operators.Layout.expectations(s, d)),
    "text_topngram_frac"   -> ((s, d) => T.topNgramCoverage(s, d)),
    "text_keyphrases"      -> ((s, d) => T.rakeKeyphrases(s, d)),
    "graph_pagerank"       -> ((s, d) => graft.pipeline.Graph.pageRank(s, d)),
    "graph_triangles"      -> ((s, d) => graft.pipeline.Graph.triangles(s, d)),
    // hot-key exact distinct (operators.Scale.saltedDistinctCount)
    "skew_salted_distinct" -> ((s, d) => Scale.saltedDistinctCount(
                                 graft.Tables.events(s, d), "event_type", "user_id",
                                 salt = 16, outCol = "uniq_users")),
    // corpus mining (pipeline.Mining)
    "mine_bitext"          -> ((s, d) => graft.pipeline.Mining.bitextMarginPairs(s, d)),
    "mine_bitext_lsh"      -> ((s, d) => graft.pipeline.Mining.bitextMarginPairsLsh(s, d)),
    "er_blocked_pairs"     -> ((s, d) => graft.pipeline.Mining.erBlockedPairs(s, d)),
    "er_entities"          -> ((s, d) => graft.pipeline.Mining.erEntities(s, d)),
    "er_golden_records"    -> ((s, d) => graft.pipeline.Mining.erGoldenRecords(s, d)),
    "mine_contrastive"     -> ((s, d) => graft.pipeline.Mining.contrastiveTriplets(s, d)),
    "er_sorted_neighborhood" -> ((s, d) => graft.pipeline.Mining.erSortedNeighborhood(s, d)),
    // bloom-pruned semi join (Relational.bloomPruneSemiJoin)
    "j8_bloom_semi"        -> ((s, d) => R.bloomPruneSemiJoin(s, d)),
    // iterative BPE merge training (TextPipeline.bpeTrain)
    "text_bpe_train"       -> ((s, d) => T.bpeTrain(s, d)),
    "text_bpe_encode"      -> ((s, d) => T.bpeEncode(s, d)),
  )

  // ---- shared oracle fragments ---------------------------------------------

  /** tokens(text) in DuckDB. */
  private val TOKS = raw"list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"
  /** md5Prefix64(expr) in DuckDB. */
  private def MD5P(e: String) = s"CAST(('0x' || substring(md5($e), 1, 8)) AS BIGINT)"

  /** md5Prefix60(expr) in DuckDB — the 60-bit gram fingerprint. */
  private def MD5P15(e: String) = s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT)"
  /** events.ts normalized to µs precision. */
  private val ETS = "CAST(ts AS TIMESTAMP)"
  /** decimal(18,2) money cast. */
  private def DEC(e: String) = s"CAST($e AS DECIMAL(18,2))"
  private val P = "2305843009213693951" // (1<<61)-1, minhash modulus

  /** doc_id → minhash-input hash list: md5 per token, positional-combined
    * 3-shingle hashes mod p, reduced to 32 bits (mirrors
    * `Dedup.shingleHashes`/`minhashSignature` exactly).
    */
  private def minhashHs(where: String): String =
    raw"""toks AS (SELECT doc_id, $TOKS AS t FROM documents $where),
th AS (SELECT doc_id, list_transform(t, w -> ${MD5P("w")}) AS h0, len(t) AS n FROM toks),
hs AS (SELECT doc_id, list_distinct(list_transform(
  CASE WHEN n < 3 THEN [list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(range(1, n + 1), i -> h0[i] * ([786433, 917505, 1048577])[i])),
         (a, b) -> (a + b) % $P)]
       ELSE list_transform(range(1, n - 1),
         i -> (h0[i]*786433 + h0[i+1]*917505 + h0[i+2]*1048577) % $P) END,
  x -> x % 4294967291)) AS h FROM th)"""

  /** Slot-i permutation over the 32-bit shingle domain, coefficient
    * arrays embedded as literals from the SINGLE source of truth
    * (`Kernels.CoeffA/B` — md5-derived 31-bit multipliers; see the
    * degenerate-family note there and in PLANS.md).
    */
  private lazy val minhashSlot = {
    val a = graft.plans.expr.Kernels.CoeffA.mkString("[", ", ", "]")
    val b = graft.plans.expr.Kernels.CoeffB.mkString("[", ", ", "]")
    s"list_min(list_transform(h, x -> (($a)[i+1] * x + ($b)[i+1]) % 4294967291))"
  }

  /** LSH candidate pairs with est AND exact shingle-set Jaccard, ending in
    * CTE `acc` — shared by `dedup_minhash_acc` (row-wise audit) and
    * `dedup_threshold_hist` (binned sensitivity view).
    */
  private lazy val OracleMinhashAcc =
    s"""WITH ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) AS est_jaccard
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
acc AS (SELECT p.doc_a, p.doc_b, p.est_jaccard,
round(CAST(len(list_intersect(a.h, b.h)) AS DOUBLE) /
  CAST(len(a.h) + len(b.h) - len(list_intersect(a.h, b.h)) AS DOUBLE), 6) AS exact_jaccard
FROM pairs p JOIN hs a ON p.doc_a = a.doc_id JOIN hs b ON p.doc_b = b.doc_id
WHERE p.est_jaccard >= 0.5)"""

  /** embeddings with double-cast vectors + norms (fold order = Spark's). */
  private val embNorms =
    """e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
n AS (SELECT vec_id, label, emb, sqrt(list_reduce(list_prepend(0.0, list_transform(emb, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e)"""

  private def dotSql(ea: String, eb: String) =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($ea, $eb), p -> p[1] * p[2])), (a, b) -> a + b)"

  private def cosSql(ea: String, eb: String, na: String, nb: String) =
    s"round(list_reduce(list_prepend(0.0, list_transform(list_zip($ea, $eb), p -> p[1] * p[2])), (a, b) -> a + b) / ($na * $nb), 6)"

  /** One-Lloyd-iteration k-means oracle — shared by `kmeans_assign` and
    * the cluster-balanced sample (the sample must draw from the identical
    * assignment): seed = first 8 vectors, assign, exact-decimal
    * element-wise means rounded to 6dp, re-assign.
    */
  private lazy val OracleKmeansCtes =
    s"""$embNorms,
c1 AS (SELECT vec_id AS cell, emb AS ce, nrm AS cn FROM n WHERE vec_id < 8),
s1 AS (SELECT a.vec_id, a.emb, cell, ${cosSql("a.emb", "ce", "a.nrm", "cn")} AS c_cos FROM n a CROSS JOIN c1),
a1 AS (SELECT vec_id, emb, cell AS cluster FROM
  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cell ASC) AS crk FROM s1) WHERE crk = 1),
d AS (SELECT cluster, i AS dim, CAST(emb[i] AS DECIMAL(28,12)) AS v FROM a1, unnest(range(1, len(emb) + 1)) t(i)),
m AS (SELECT cluster, dim, round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mv FROM d GROUP BY cluster, dim),
c2 AS (SELECT cluster, list(mv ORDER BY dim) AS ce FROM m GROUP BY cluster),
c2n AS (SELECT cluster, ce, sqrt(list_reduce(list_prepend(0.0, list_transform(ce, x -> x * x)), (a, b) -> a + b)) AS cn FROM c2),
s2 AS (SELECT a.vec_id, cluster, ${cosSql("a.emb", "ce", "a.nrm", "cn")} AS cos FROM n a CROSS JOIN c2n)"""

  private lazy val OracleKmeans =
    s"""WITH $OracleKmeansCtes
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, cos FROM
(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster ASC) AS rnk FROM s2) WHERE rnk = 1"""

  /** Simplified-silhouette oracle: the `kmeans_assign` CTE chain up to the
    * all-(vector,centroid) cosine table, then per-vector top-2 → a/b
    * distances → per-cluster decimal-mean silhouette.
    */
  private lazy val OracleSilhouette =
    s"""WITH $OracleKmeansCtes,
sr AS (SELECT vec_id, cluster, cos, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster ASC) AS rnk FROM s2),
sp AS (SELECT vec_id,
  MAX(CASE WHEN rnk = 1 THEN cluster END) AS cluster,
  MAX(CASE WHEN rnk = 1 THEN 1.0::DOUBLE - cos END) AS a,
  MAX(CASE WHEN rnk = 2 THEN 1.0::DOUBLE - cos END) AS b
  FROM sr WHERE rnk <= 2 GROUP BY vec_id),
sv AS (SELECT cluster, CASE WHEN greatest(a, b) = 0.0::DOUBLE THEN 0.0::DOUBLE
  ELSE round((b - a) / greatest(a, b), 6) END AS sil FROM sp)
SELECT CAST(cluster AS BIGINT) AS cluster, COUNT(*) AS n,
round(CAST(SUM(CAST(sil AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS mean_sil
FROM sv GROUP BY cluster"""

  /** Greedy k-center oracle: 7 unrolled farthest-point rounds, each a
    * min-distance pass against the accumulated pick set. Mirrors
    * `Similarity.kcenterSample` (seed vec 0, ties to low vec_id, round
    * only at output).
    */
  private lazy val OracleKcenterSteps = (2 to 8).map { i =>
    val prev = (2 until i).map(j => s"SELECT vec_id FROM p$j")
    val selSql = ("SELECT 0 AS vec_id" +: prev).mkString(" UNION ALL ")
    s"""d$i AS (SELECT a.vec_id, MIN(1.0::DOUBLE - ${cosSql("a.emb", "s.emb", "a.nrm", "s.nrm")}) AS md
  FROM n a CROSS JOIN n s
  WHERE s.vec_id IN ($selSql) AND a.vec_id NOT IN ($selSql)
  GROUP BY a.vec_id),
p$i AS (SELECT vec_id, md FROM d$i ORDER BY md DESC, vec_id ASC LIMIT 1)"""
  }.mkString(",\n")

  private lazy val OracleKcenter = {
    val picks = (2 to 8).map(i =>
      s"SELECT ${i}::BIGINT AS pick, vec_id, round(md, 6) AS min_dist FROM p$i")
      .mkString(" UNION ALL ")
    s"""WITH $embNorms,
$OracleKcenterSteps
SELECT 1::BIGINT AS pick, 0::BIGINT AS vec_id, 0.0::DOUBLE AS min_dist
UNION ALL $picks"""
  }

  /** kNN label propagation over the kmeans cells: same-cell top-3
    * neighbors, majority vote (ties to low label), per-class accuracy.
    */
  private lazy val OracleLabelProp =
    s"""WITH $OracleKmeansCtes,
lasg AS (SELECT vec_id, cluster FROM
  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster ASC) AS rnk FROM s2) WHERE rnk = 1),
le AS (SELECT n.vec_id, n.label, n.emb, n.nrm, cluster FROM n JOIN lasg USING (vec_id)),
lnb AS (SELECT a.vec_id, b.vec_id AS nb, b.label AS nb_label,
  ${cosSql("a.emb", "b.emb", "a.nrm", "b.nrm")} AS ncos
  FROM le a JOIN le b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
lt AS (SELECT vec_id, nb_label FROM
  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ncos DESC, nb ASC) AS rnk FROM lnb) WHERE rnk <= 3),
lv AS (SELECT vec_id, nb_label, COUNT(*) AS votes FROM lt GROUP BY vec_id, nb_label),
lp AS (SELECT vec_id, nb_label AS predicted FROM
  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY votes DESC, nb_label ASC) AS vrk FROM lv) WHERE vrk = 1)
SELECT CAST(e2.label AS BIGINT) AS label, COUNT(*) AS n,
CAST(SUM(CASE WHEN predicted = e2.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
round(CAST(SUM(CASE WHEN predicted = e2.label THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS acc
FROM le e2 JOIN lp USING (vec_id) GROUP BY e2.label"""

  /** Bit table of the image aHash replay (doc_id, p ∈ 0..63, bit), built
    * closed-form from the synthetic raster + nested floor index maps.
    */
  private val OraclePhashBits =
    """ppx AS (SELECT doc_id, p,
  8 + doc_id % 5 AS vw, 6 + doc_id % 4 AS vh, doc_id // 5 AS bid
  FROM documents, (SELECT unnest(range(0, 64)) AS p) t),
pm AS (SELECT doc_id, p, bid, vw, vh,
  ((p % 8) * vw) // 8 AS vx, ((p // 8) * vh) // 8 AS vy,
  8 + bid % 9 AS bw, 6 + bid % 7 AS bh FROM ppx),
pidx AS (SELECT doc_id, p, bid, bw,
  ((vy * bh) // vh) * bw + ((vx * bw) // vw) AS idx FROM pm),
plum AS (SELECT doc_id, p,
  299 * ((bid*31 + (3*idx)*17 + bid*(3*idx)*13) % 256)
+ 587 * ((bid*31 + (3*idx + 1)*17 + bid*(3*idx + 1)*13) % 256)
+ 114 * ((bid*31 + (3*idx + 2)*17 + bid*(3*idx + 2)*13) % 256) AS luma FROM pidx),
ptot AS (SELECT doc_id, SUM(luma) AS total FROM plum GROUP BY doc_id),
pbit AS (SELECT doc_id, p, CASE WHEN luma * 64 >= total THEN 1 ELSE 0 END AS bit
  FROM plum JOIN ptot USING (doc_id))"""

  /** Bit table of the audio energy-delta fingerprint replay
    * (doc_id, w ∈ 0..31, bit).
    */
  private val OracleAfpBits =
    """apx AS (SELECT doc_id, i,
  160 + doc_id % 97 AS nv, doc_id // 5 AS bid, 200 + (doc_id // 5) % 57 AS nb
  FROM documents, (SELECT unnest(range(0, 256)) AS i) t),
apm AS (SELECT doc_id, i, bid,
  ((((i * nv) // 256) * nb) // nv) // 16 AS p FROM apx),
apv AS (SELECT doc_id, i,
  abs(((bid*7919 + p*104729 + bid*p*p*13) % 65536) - 32768) AS a FROM apm),
ape AS (SELECT doc_id, i // 8 AS w, SUM(a) AS e FROM apv GROUP BY doc_id, i // 8),
apb AS (SELECT x.doc_id, x.w, CASE WHEN x.e > y.e THEN 1 ELSE 0 END AS bit
  FROM ape x JOIN ape y ON x.doc_id = y.doc_id AND y.w = (x.w + 31) % 32)"""

  /** Substring-LSH CTE chain over a (doc_id, pos, bit) table: blocks of
    * `blockBits`, shared-block candidates, Hamming table `fham`.
    */
  private def mihPairsCtes(bits: String, pos: String, blockBits: Int): String =
    s""",
fblk AS (SELECT doc_id, $pos // $blockBits AS bi, CAST(SUM(bit << ($pos % $blockBits)) AS INTEGER) AS bv
  FROM $bits GROUP BY doc_id, $pos // $blockBits),
fcand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM fblk x JOIN fblk y ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
fbl AS (SELECT doc_id, list(bv ORDER BY bi) AS bs FROM fblk GROUP BY doc_id),
fham AS (SELECT doc_a, doc_b,
  CAST(list_reduce(list_prepend(0, list_transform(list_zip(a.bs, b.bs),
    z -> bit_count(xor(z[1], z[2])))), (s, t) -> s + t) AS BIGINT) AS hamming
  FROM fcand JOIN fbl a ON doc_a = a.doc_id JOIN fbl b ON doc_b = b.doc_id)"""

  private def mihTailSql(bits: String, pos: String, blockBits: Int, maxHam: Int): String =
    mihPairsCtes(bits, pos, blockBits) +
      s"\nSELECT doc_a, doc_b, hamming FROM fham WHERE hamming <= $maxHam"

  /** Image cluster collapse: transitive closure over the radius-3
    * multi-index pairs, keep-best = max variant area, ties to low id.
    */
  private lazy val OraclePhashClusters =
    s"WITH RECURSIVE $OraclePhashBits" + mihPairsCtes("pbit", "p", 16) + s""",
cpr AS (SELECT doc_a, doc_b FROM fham WHERE hamming <= 3),
cedges AS (SELECT doc_a AS src, doc_b AS dst FROM cpr UNION ALL SELECT doc_b, doc_a FROM cpr),
creach(id, lab) AS (SELECT doc_id, doc_id FROM documents
UNION SELECT e.dst, r.lab FROM creach r JOIN cedges e ON e.src = r.id),
ccl AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM creach GROUP BY id),
carea AS (SELECT doc_id, cluster_id, (8 + doc_id % 5) * (6 + doc_id % 4) AS area FROM ccl),
cr AS (SELECT cluster_id, doc_id, area,
  row_number() OVER (PARTITION BY cluster_id ORDER BY area DESC, doc_id ASC) AS rk,
  COUNT(*) OVER (PARTITION BY cluster_id) AS n_members FROM carea)
SELECT cluster_id, doc_id AS keep_id, CAST(area AS BIGINT) AS area, n_members
FROM cr WHERE rk = 1"""

  /** Voronoi coreset weights over the k-center picks: every vector to its
    * nearest center (6dp distance, ties to low center id), per-center
    * mass + decimal-mean distance.
    */
  private lazy val OracleKcenterWeights =
    s"""WITH $embNorms,
$OracleKcenterSteps,
kc AS (SELECT 0 AS c_id ${(2 to 8).map(i => s"UNION ALL SELECT vec_id FROM p$i").mkString(" ")}),
kce AS (SELECT c_id, emb AS ce, nrm AS cn FROM n JOIN kc ON vec_id = c_id),
kd AS (SELECT a.vec_id, c_id, round(1.0::DOUBLE - ${cosSql("a.emb", "ce", "a.nrm", "cn")}, 6) AS dist
  FROM n a CROSS JOIN kce),
ka AS (SELECT vec_id, c_id, dist FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, c_id ASC) AS rnk FROM kd) WHERE rnk = 1)
SELECT CAST(c_id AS BIGINT) AS center_id, COUNT(*) AS n_assigned,
round(CAST(SUM(CAST(dist AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS mean_dist
FROM ka GROUP BY c_id"""

  /** BM25 more-like-this ranking, unlimited depth — shared by
    * `retrieval_bm25` (rnk <= 10) and `retrieval_hybrid_rrf` (sparse leg,
    * rnk <= 20). Mirrors `Retrieval.bm25MoreLikeThis` exactly: query terms
    * = top-3 TF-IDF tokens of docs 0..9, per-term partials rounded 6dp,
    * DECIMAL(28,10) sum, re-rounded. All numeric literals are ::DOUBLE so
    * DuckDB's decimal literal arithmetic can't diverge from Spark's
    * double plan at a 6dp rounding edge.
    */
  /** Hybrid dense+sparse fused candidate list (CTE chain ending at `hf`) —
    * shared by `retrieval_hybrid_rrf` and the rerank stage built on it.
    */
  private lazy val OracleHybridFused =
    s"""$embNorms,
hq AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn FROM n WHERE vec_id < 10),
hc AS (SELECT query_id, a.vec_id AS doc_id, ${cosSql("qe", "a.emb", "qn", "a.nrm")} AS cos
FROM n a CROSS JOIN hq WHERE a.vec_id <> query_id),
hd AS (SELECT query_id, doc_id, rd FROM (
  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id ASC) AS rd FROM hc) WHERE rd <= 20),
$OracleBm25Ranked,
hs AS (SELECT query_id, doc_id, rnk AS rs FROM bmr WHERE rnk <= 20),
hf AS (SELECT coalesce(hd.query_id, hs.query_id) AS query_id, coalesce(hd.doc_id, hs.doc_id) AS doc_id,
  round(coalesce(1.0::DOUBLE / (60 + rd), 0.0::DOUBLE) + coalesce(1.0::DOUBLE / (60 + rs), 0.0::DOUBLE), 6) AS rrf
  FROM hd FULL OUTER JOIN hs ON hd.query_id = hs.query_id AND hd.doc_id = hs.doc_id)"""

  private lazy val OracleBm25Ranked =
    s"""bt AS (SELECT doc_id, unnest($TOKS) AS tok FROM documents),
btf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM bt GROUP BY doc_id, tok),
bdf AS (SELECT tok, COUNT(*) AS df FROM btf GROUP BY tok),
bn AS (SELECT COUNT(*) AS n FROM documents),
bdl AS (SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS dl FROM documents),
bad AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM bdl),
bq0 AS (SELECT doc_id AS query_id, tok, round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS score
  FROM btf JOIN bdf USING (tok), bn WHERE doc_id < 10),
bqt AS (SELECT query_id, tok FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, tok ASC) AS qrk FROM bq0) WHERE qrk <= 3),
bp0 AS (SELECT bqt.query_id, btf.doc_id,
  round(ln(1.0::DOUBLE + (CAST(n AS DOUBLE) - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) *
        ((tf * 2.2::DOUBLE) / (tf + 1.2::DOUBLE * (0.25::DOUBLE + (0.75::DOUBLE * bdl.dl) / avgdl))), 6) AS part
  FROM btf JOIN bqt USING (tok) JOIN bdf USING (tok) JOIN bdl ON bdl.doc_id = btf.doc_id, bn, bad
  WHERE btf.doc_id <> bqt.query_id),
bsc AS (SELECT query_id, doc_id, round(CAST(SUM(CAST(part AS DECIMAL(28,10))) AS DOUBLE), 6) AS bm25
  FROM bp0 GROUP BY query_id, doc_id),
bmr AS (SELECT query_id, doc_id, bm25,
  row_number() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC) AS rnk FROM bsc)"""

  /** PQ codebook/encode/ADC CTE chain — shared by `ann_pq_topk` (full
    * corpus scoring) and `ann_ivfpq_topk` (cell-pruned scoring). 16
    * subspaces of 4 dims, 16-centroid codebook per subspace (seeds =
    * first 16 vectors + one decimal-exact Lloyd iteration); `codes` is
    * the encoded corpus, `lut` the per-query partial-dot table.
    */
  private def oraclePqCtes(m: Int, ks: Int, iters: Int): String = {
    val sd = 64 / m
    // assignment CTE body against codebook `cn$i`
    def assignFrom(c: String) =
      s"""SELECT a.vec_id, a.s, a.sub, c.cell,
    row_number() OVER (PARTITION BY a.vec_id, a.s ORDER BY ${cosSql("a.sub", "c.cs", "a.snrm", "c.csn")} DESC, c.cell ASC) AS crk
  FROM sn a JOIN $c c ON a.s = c.s"""
    // one unrolled Lloyd round: assign against cn(i-1), decimal-exact
    // element means rounded 6dp, re-normed codebook cn(i)
    def lloydSql(i: Int) =
      s"""a$i AS (SELECT vec_id, s, sub, cell FROM (
  ${assignFrom(s"cn${i - 1}")}) WHERE crk = 1),
d$i AS (SELECT s, cell, i AS dim, CAST(sub[i] AS DECIMAL(28,12)) AS v FROM a$i, unnest(range(1, len(sub) + 1)) t(i)),
mm$i AS (SELECT s, cell, dim, round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mv FROM d$i GROUP BY s, cell, dim),
cl$i AS (SELECT s, cell, list(mv ORDER BY dim) AS cs FROM mm$i GROUP BY s, cell),
cn$i AS (SELECT s, cell, cs, sqrt(list_reduce(list_prepend(0.0, list_transform(cs, x -> x * x)), (a, b) -> a + b)) AS csn FROM cl$i)"""
    s"""sub AS (SELECT vec_id, s, emb[(s*$sd+1):(s*$sd+$sd)] AS sub FROM n, unnest(range(0, $m)) t(s)),
sn AS (SELECT vec_id, s, sub, sqrt(list_reduce(list_prepend(0.0, list_transform(sub, x -> x * x)), (a, b) -> a + b)) AS snrm FROM sub),
cn0 AS (SELECT s, vec_id AS cell, sub AS cs, snrm AS csn FROM sn WHERE vec_id < $ks),
${(1 to iters).map(lloydSql).mkString(",\n")},
codes AS (SELECT vec_id, s, cell AS code FROM (
  ${assignFrom(s"cn$iters")}) WHERE crk = 1),
lut AS (SELECT q.vec_id AS query_id, q.s, c.cell,
  CAST(round(list_reduce(list_prepend(0.0, list_transform(list_zip(q.sub, c.cs), p -> p[1] * p[2])), (a, b) -> a + b), 6) AS DECIMAL(28,12)) AS pd
  FROM sn q JOIN cn$iters c ON q.s = c.s WHERE q.vec_id < 10)"""
  }

  private lazy val OraclePqCtes = oraclePqCtes(16, 16, 1)
  /** The tuned PQ operating point (sweep-gated recall): 32 subspaces of
    * 2 dims — same total codebook size, 4× less quantization distortion
    * per subspace — trained for 2 Lloyd rounds.
    */
  private lazy val OraclePqTunedCtes = oraclePqCtes(32, 16, 2)

  /** Norm-normalize summed ADC partials and rank — tail shared by the
    * two PQ oracles; expects a CTE `sc(query_id, neighbor_id, spd)`.
    */
  private val OraclePqFinish =
    """fin AS (SELECT query_id, neighbor_id, round(CAST(spd AS DOUBLE) / (qn.nrm * nn.nrm), 6) AS acos
  FROM sc JOIN n qn ON qn.vec_id = sc.query_id JOIN n nn ON nn.vec_id = sc.neighbor_id)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, acos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY acos DESC, neighbor_id ASC) AS rnk FROM fin)
WHERE rnk <= 5"""

  /** Winnowing fingerprint CTEs (char-5-gram md5 hashes → min per 4-hash
    * window → distinct per doc as `wf(doc_id, fph)`) — shared by
    * `text_winnow_fps` and the `dedup_winnow_pairs` consumer.
    */
  private lazy val OracleWinnowFps =
    s"""h AS (SELECT doc_id,
  list_transform(range(1, length(lower(text)) - 4 + 1),
    i -> ${MD5P("substring(lower(text), i, 5)")}) AS hs
  FROM documents WHERE length(lower(text)) >= 5),
g AS (SELECT doc_id,
  CASE WHEN len(hs) >= 4
       THEN list_transform(range(1, len(hs) - 4 + 2), j -> list_min(hs[j:j+3]))
       ELSE [list_min(hs)] END AS fps FROM h),
wf AS (SELECT DISTINCT doc_id, unnest(fps) AS fph FROM g)"""

  /** Unigram-surprisal oracle — shared by `text_surprisal` and the decile
    * bucketing built on top of it (identical scores by construction).
    */
  /** DSIR importance weight (`text_dsir_weight`) — shared by the Gumbel
    * top-k selection built on top of it (identical weights by construction).
    */
  private val OracleDsir =
    s"""WITH t AS (SELECT doc_id, lang, unnest($TOKS) AS tok FROM documents),
tf AS (SELECT doc_id, lang, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2, 3),
f AS (SELECT tok, SUM(tf) AS cf,
  COALESCE(SUM(tf) FILTER (lang = 'en'), 0) AS tq FROM tf GROUP BY tok),
c AS (SELECT CAST(SUM(cf) AS DOUBLE) AS nc, CAST(SUM(tq) AS DOUBLE) AS nt,
  CAST(COUNT(*) AS DOUBLE) AS v FROM f),
lr AS (SELECT tok, CAST(round(ln((tq + 1) / (nt + v)) - ln((cf + 1) / (nc + v)), 6)
  AS DECIMAL(18,6)) AS lr FROM f CROSS JOIN c),
term AS (SELECT doc_id, CAST(tf AS DECIMAL(10,0)) * lr AS term FROM tf JOIN lr USING (tok)),
tot AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tf GROUP BY doc_id)
SELECT doc_id, n_tokens, CAST(CAST(sign(s) AS BIGINT) *
  ((2 * abs(CAST(s * 1000000 AS BIGINT)) + n_tokens) // (2 * n_tokens))
  AS DOUBLE) / 1000000.0 AS dsir_weight
FROM (SELECT doc_id, SUM(term) AS s FROM term GROUP BY doc_id) JOIN tot USING (doc_id)"""

  private val OracleSurprisal =
    s"""WITH t AS (SELECT doc_id, unnest($TOKS) AS tok FROM documents),
tot AS (SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS total FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
cf AS (SELECT tok, SUM(tf) AS cf FROM tf GROUP BY tok),
n AS (SELECT CAST(SUM(cf) AS DOUBLE) AS n FROM cf),
terms AS (SELECT doc_id, CAST(round(tf * ln(n / CAST(cf AS DOUBLE)), 6) AS DECIMAL(28,10)) AS term
FROM tf JOIN cf USING (tok), n)
SELECT doc_id, round(CAST(SUM(term) AS DOUBLE) / total, 6) AS surprisal
FROM terms JOIN tot USING (doc_id) GROUP BY doc_id, total"""

  /** Sign-LSH bucket CTE (8 md5-parity hyperplanes over 64 dims) —
    * shared by the single-probe and multi-probe renderings (identical
    * bucket function is the point of the comparison).
    */
  private val LshBuckets =
    """nb AS (SELECT vec_id, emb, nrm, CAST(list_sum(list_transform(range(0, 8),
  h -> CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(0, 64),
    i -> emb[CAST(i AS INTEGER) + 1] * (CASE WHEN CAST(('0x' || substring(md5(h || '_' || i), 1, 4)) AS BIGINT) % 2 = 0
      THEN 1.0 ELSE -1.0 END))), (a, c) -> a + c) >= 0
  THEN CAST(1 AS BIGINT) << h ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket FROM n)"""

  /** Bag-Jaccard oracle — shared by the exhaustive and prefix-filtered
    * renderings (they must emit the identical pair set).
    */
  /** Shared lang-ID prediction CTE — `text_lang_id` reads it row-wise,
    * `text_langid_eval` aggregates it into the confusion matrix. Ends in
    * a CTE named `pred` with (doc_id, labeled_lang, pred_lang).
    */
  private lazy val OracleLangPred =
    s"""WITH t AS (SELECT doc_id, lang AS labeled_lang, $TOKS AS toks FROM documents),
s AS (SELECT doc_id, labeled_lang,
len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS s_en,
len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
len(list_filter(toks, x -> x IN ('le','la','de','et','un'))) AS s_fr,
len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
len(list_filter(toks, x -> x IN ('的','是','了','在','我'))) AS s_zh FROM t),
pred AS (SELECT doc_id, labeled_lang, CASE
WHEN s_en >= greatest(s_es, s_fr, s_de, s_zh) THEN 'en'
WHEN s_es >= greatest(s_fr, s_de, s_zh) THEN 'es'
WHEN s_fr >= greatest(s_de, s_zh) THEN 'fr'
WHEN s_de >= s_zh THEN 'de' ELSE 'zh' END AS pred_lang FROM s)"""

  /** Shared ER connected-components CTE: blocked fuzzy pairs →
    * symmetric edges → recursive min-label reachability. `er_entities`
    * reads the labels directly; `er_golden_records` aggregates
    * survivorship rules over them.
    */
  private val OracleErReach =
    """WITH RECURSIVE p AS (SELECT a.c_custkey AS a_key, b.c_custkey AS b_key
FROM customer a JOIN customer b
ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2),
edges AS (SELECT a_key AS src, b_key AS dst FROM p UNION ALL SELECT b_key, a_key FROM p),
reach(id, lab) AS (SELECT c_custkey, c_custkey FROM customer
UNION SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)"""

  private val OracleNgramJaccard =
    s"""WITH tf AS (SELECT doc_id, source, tok, COUNT(*) AS tf FROM
(SELECT doc_id, source, unnest($TOKS) AS tok FROM documents) GROUP BY doc_id, source, tok),
tot AS (SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS total FROM documents),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(SUM(LEAST(x.tf, y.tf)) AS BIGINT) AS inter
FROM tf x JOIN tf y ON x.source = y.source AND x.tok = y.tok AND x.doc_id < y.doc_id GROUP BY doc_a, doc_b)
SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / CAST(ta.total + tb.total - inter AS DOUBLE), 6) AS jaccard
FROM inter JOIN tot ta ON ta.doc_id = doc_a JOIN tot tb ON tb.doc_id = doc_b
WHERE round(CAST(inter AS DOUBLE) / CAST(ta.total + tb.total - inter AS DOUBLE), 6) >= 0.5"""

  /** Shared by the exhaustive and prefix-filtered containment renderings —
    * both must match it bit-for-bit.
    */
  private val OracleContainment =
    s"""WITH tf AS (SELECT doc_id, source, tok, COUNT(*) AS tf FROM
(SELECT doc_id, source, unnest($TOKS) AS tok FROM documents) GROUP BY doc_id, source, tok),
tot AS (SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS total FROM documents),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(SUM(LEAST(x.tf, y.tf)) AS BIGINT) AS inter
FROM tf x JOIN tf y ON x.source = y.source AND x.tok = y.tok AND x.doc_id < y.doc_id GROUP BY doc_a, doc_b)
SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / CAST(LEAST(ta.total, tb.total) AS DOUBLE), 6) AS overlap
FROM inter JOIN tot ta ON ta.doc_id = doc_a JOIN tot tb ON tb.doc_id = doc_b
WHERE round(CAST(inter AS DOUBLE) / CAST(LEAST(ta.total, tb.total) AS DOUBLE), 6) >= 0.8"""

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
CAST(SUM(${DEC("l_quantity")}) AS DOUBLE) AS sum_qty,
CAST(SUM(${DEC("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
CAST(SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS DOUBLE) AS sum_disc_price,
COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY l_returnflag, l_linestatus""",

    "q3_top_revenue" ->
      s"""SELECT o_orderkey, o_orderdate,
CAST(SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",

    "q5_region_revenue" ->
      s"""SELECT r_name, n_name,
CAST(SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS DOUBLE) AS revenue,
COUNT(*) AS line_ct
FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",

    "q4_order_priority" ->
      s"""SELECT o_orderpriority, COUNT(*) AS order_ct
FROM orders WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""",

    "q7_nation_trade" ->
      s"""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
CAST(SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS DOUBLE) AS volume,
COUNT(*) AS line_ct
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name""",

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
CAST(SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",

    "q17_small_qty" ->
      s"""WITH pa AS (
  SELECT l_partkey AS pa_partkey, SUM(${DEC("l_quantity")}) AS sum_qty, COUNT(*) AS qty_ct
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(${DEC("l_extendedprice")}) AS DOUBLE) / 7.0 AS avg_yearly, COUNT(*) AS line_ct
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pa ON l_partkey = pa_partkey
WHERE p_brand = 'Brand#13' AND ${DEC("l_quantity")} * 5 * qty_ct < sum_qty""",

    "q18_large_orders" ->
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
CAST(${DEC("o_totalprice")} AS DOUBLE) AS total_price,
CAST(qty_dec AS DOUBLE) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(${DEC("l_quantity")}) AS qty_dec
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(${DEC("l_quantity")}) > ${DEC("250")}) big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC LIMIT 20""",

    "q22_idle_balance" ->
      s"""WITH pos AS (
  SELECT SUM(${DEC("c_acctbal")}) AS bal_sum, COUNT(*) AS bal_ct
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, COUNT(*) AS cust_ct,
CAST(SUM(${DEC("c_acctbal")}) AS DOUBLE) AS total_bal
FROM customer, pos
WHERE ${DEC("c_acctbal")} * bal_ct > bal_sum
AND NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-06-01')
GROUP BY c_nationkey""",

    "q2_min_cost_supp" ->
      s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (SELECT l_partkey, s_suppkey, s_name, ${DEC("s_acctbal")} AS cost
  FROM ps JOIN supplier ON l_suppkey = s_suppkey),
r AS (SELECT *, row_number() OVER (PARTITION BY l_partkey ORDER BY cost, s_suppkey) AS rn FROM j)
SELECT l_partkey AS p_partkey, s_suppkey, s_name, CAST(cost AS DOUBLE) AS acctbal
FROM r WHERE rn = 1""",

    "a23_value_bins" ->
      s"""SELECT event_type, bin, COUNT(*) AS bin_ct, MIN(value) AS lo, MAX(value) AS hi
FROM (SELECT event_type, value,
  CAST(ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS bin
  FROM events)
GROUP BY event_type, bin""",

    "multimodal_frames" ->
      s"""WITH d AS (SELECT doc_id, lang AS media_type,
  greatest(1, len(text) // 8) AS n_frames, text FROM documents),
f AS (SELECT doc_id, media_type, n_frames, text, unnest(
  CASE WHEN n_frames <= 4 THEN range(0, n_frames)
       ELSE list_transform(range(0, 4), j -> j * (n_frames - 1) // 3) END) AS frame_idx
  FROM d),
u AS (SELECT DISTINCT doc_id, media_type, n_frames, text, frame_idx FROM f)
SELECT doc_id, media_type, n_frames, frame_idx, frame_idx * 40 AS t_offset_ms,
md5(substring(text, CAST(frame_idx * 8 AS INT) + 1, 8)) AS frame_hash
FROM u""",

    "a22_mad_outliers" ->
      s"""WITH b AS (SELECT event_type, value FROM events),
m AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med FROM b GROUP BY 1),
d AS (SELECT b.event_type, med, abs(value - med) AS dev FROM b JOIN m ON b.event_type = m.event_type),
md AS (SELECT event_type, round(quantile_cont(dev, 0.5), 6) AS mad FROM d GROUP BY 1)
SELECT d.event_type, MAX(d.med) AS med, MAX(mad) AS mad,
CAST(SUM(CASE WHEN dev > mad * 4.4478 THEN 1 ELSE 0 END) AS BIGINT) AS outlier_ct
FROM d JOIN md ON d.event_type = md.event_type
GROUP BY d.event_type""",

    "a25_lateness_profile" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS tsu,
MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM events),
b AS (SELECT greatest(0, coalesce(prev_max - tsu, 0)) AS late_us FROM l)
SELECT CASE WHEN late_us = 0 THEN 'in_order'
WHEN late_us < 1000000 THEN 'lt_1s' WHEN late_us < 10000000 THEN 'lt_10s'
WHEN late_us < 60000000 THEN 'lt_60s' ELSE 'ge_60s' END AS bucket,
COUNT(*) AS n_events, CAST(MAX(late_us) AS BIGINT) AS max_late_us
FROM b GROUP BY bucket""",

    "a27_inter_event_gaps" ->
      """WITH g AS (SELECT event_type,
lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev,
epoch_us(ts) AS tsu FROM events),
d AS (SELECT event_type, CAST(tsu - prev AS DOUBLE) / 1e6 AS gap_s FROM g WHERE prev IS NOT NULL)
SELECT event_type, COUNT(*) AS n_gaps,
round(quantile_cont(gap_s, 0.5), 6) AS p50_s,
round(quantile_cont(gap_s, 0.95), 6) AS p95_s
FROM d GROUP BY event_type""",

    // integer-exact ACF: c_t = n·x_t − S so every sum is decimal;
    // gap-filled hour grid (missing hours are true zeros)
    "a28_hourly_acf" ->
      """WITH hc AS (SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS x FROM events GROUP BY 1),
hb AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hc),
hd AS (SELECT t.h, coalesce(x, 0) AS x
  FROM (SELECT unnest(range((SELECT h0 FROM hb), (SELECT h1 FROM hb) + 1)) AS h) t
  LEFT JOIN hc ON t.h = hc.h),
hst AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM hd),
hcent AS (SELECT h, CAST(n * x - s AS DECIMAL(19,0)) AS c FROM hd, hst),
hden AS (SELECT SUM(c * c) AS den FROM hcent),
hnum AS (SELECT lag, SUM(a.c * b.c) AS num
  FROM hcent a CROSS JOIN (SELECT unnest(range(1, 25)) AS lag) l
  JOIN hcent b ON b.h = a.h + lag
  GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
FROM hnum, hden""",

    // CUSUM changepoint on the gap-filled daily grid; cum_t = n*CUSUM_t
    // stays integer, argmax ties to the earliest day
    "a30_cusum_change" ->
      """WITH dc AS (SELECT epoch_us(ts) // 86400000000 AS d, COUNT(*) AS x FROM events GROUP BY 1),
db AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM dc),
dd AS (SELECT t.d, coalesce(x, 0) AS x
  FROM (SELECT unnest(range((SELECT d0 FROM db), (SELECT d1 FROM db) + 1)) AS d) t
  LEFT JOIN dc ON t.d = dc.d),
dst AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM dd),
dcum AS (SELECT d, x, n, CAST(SUM(n * x - s) OVER (ORDER BY d) AS BIGINT) AS cum FROM dd, dst),
dpick AS (SELECT d AS cd, cum AS cusum_scaled, n FROM dcum
  ORDER BY abs(cum) DESC, d ASC LIMIT 1)
SELECT cd AS change_day, cusum_scaled, n AS n_days,
round(CAST(SUM(CASE WHEN d <= cd THEN x END) AS DOUBLE) /
  SUM(CASE WHEN d <= cd THEN 1 ELSE 0 END), 6) AS mean_before,
round(CAST(SUM(CASE WHEN d > cd THEN x END) AS DOUBLE) /
  SUM(CASE WHEN d > cd THEN 1 ELSE 0 END), 6) AS mean_after
FROM dd, dpick GROUP BY cd, cusum_scaled, n""",

    // weekly seasonal profile on the gap-filled hour grid; integer
    // calendar (dow = (h//24 + 3) % 7, 0 = Monday), a22 MAD anomaly rule
    "a31_dow_profile" ->
      """WITH whc AS (SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS x FROM events GROUP BY 1),
whb AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM whc),
whd AS (SELECT (t.h // 24 + 3) % 7 AS dow, t.h % 24 AS hod, coalesce(x, 0) AS x
  FROM (SELECT unnest(range((SELECT h0 FROM whb), (SELECT h1 FROM whb) + 1)) AS h) t
  LEFT JOIN whc ON t.h = whc.h),
wp AS (SELECT dow, hod, COUNT(*) AS n_days, round(quantile_cont(x, 0.5), 6) AS med
  FROM whd GROUP BY dow, hod),
wdev AS (SELECT whd.dow, whd.hod, n_days, med, abs(CAST(x AS DOUBLE) - med) AS d
  FROM whd JOIN wp ON whd.dow = wp.dow AND whd.hod = wp.hod),
wm AS (SELECT dow, hod, round(quantile_cont(d, 0.5), 6) AS mad FROM wdev GROUP BY dow, hod)
SELECT wdev.dow, wdev.hod, MIN(n_days) AS n_days, MIN(med) AS med, MIN(mad) AS mad,
CAST(SUM(CASE WHEN d > mad * 4.4478 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM wdev JOIN wm ON wdev.dow = wm.dow AND wdev.hod = wm.hod
GROUP BY wdev.dow, wdev.hod""",

    // winsorized moments: exact p01/p99 cuts rounded 6dp BEFORE clamping,
    // decimal(28,10) mean folds (values exact 2dp, cuts exact 6dp)
    "a29_winsorized_stats" ->
      """WITH wc AS (SELECT event_type,
round(quantile_cont("value", 0.01), 6) AS p01,
round(quantile_cont("value", 0.99), 6) AS p99
FROM events GROUP BY event_type)
SELECT e.event_type, COUNT(*) AS n, p01, p99,
round(CAST(SUM(CAST("value" AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS mean_raw,
round(CAST(SUM(CAST(greatest(least("value", p99), p01) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS mean_winsor,
CAST(SUM(CASE WHEN "value" < p01 OR "value" > p99 THEN 1 ELSE 0 END) AS BIGINT) AS clipped
FROM events e JOIN wc ON e.event_type = wc.event_type
GROUP BY e.event_type, p01, p99""",

    // fixed reference instant 2024-02-01T00:00:00Z = 1706745600000000 µs;
    // divisor literal 2.592e12 = 86400e6 · 30-day half-life, matching the
    // engine's plan-time constant exactly
    "a26_value_decay" ->
      """WITH t AS (SELECT user_id,
CAST(round(value * pow(2.0, -(CAST(1706745600000000 - epoch_us(ts) AS DOUBLE) / 2592000000000.0)), 6) AS DECIMAL(28,10)) AS term
FROM events WHERE event_type = 'purchase')
SELECT user_id, COUNT(*) AS n_purchases,
round(CAST(SUM(term) AS DOUBLE), 6) AS decayed_value
FROM t GROUP BY user_id""",

    "mine_assoc_rules" ->
      s"""WITH pl AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
nb AS (SELECT COUNT(DISTINCT o) AS n FROM pl),
supp AS (SELECT p, COUNT(*) AS supp FROM pl GROUP BY p),
pairs AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS pair_ct
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING COUNT(*) >= 3),
rules AS (SELECT pa AS ante, pb AS cons, pair_ct FROM pairs
  UNION ALL SELECT pb AS ante, pa AS cons, pair_ct FROM pairs)
SELECT ante, cons, pair_ct,
round(CAST(pair_ct AS DOUBLE) / CAST(sa.supp AS DOUBLE), 6) AS confidence,
round(CAST(pair_ct AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(sa.supp AS DOUBLE) * CAST(sc.supp AS DOUBLE)), 6) AS lift
FROM rules JOIN supp sa ON ante = sa.p JOIN supp sc ON cons = sc.p CROSS JOIN nb""",

    // gap-window sequential rules: B within 3 events after A, same user
    "mine_seq_rules" ->
      s"""WITH seq AS (
  SELECT user_id, event_type,
    lead(event_type, 1) OVER w AS n1, lead(event_type, 2) OVER w AS n2, lead(event_type, 3) OVER w AS n3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
pairs AS (SELECT event_type AS ante, n FROM seq, unnest([n1, n2, n3]) t(n) WHERE n IS NOT NULL),
cnt AS (SELECT ante, n AS cons, CAST(COUNT(*) AS BIGINT) AS pair_ct FROM pairs GROUP BY 1, 2),
asup AS (SELECT event_type AS ante, COUNT(*) AS ante_ct FROM events GROUP BY 1)
SELECT ante, cons, pair_ct, round(CAST(pair_ct AS DOUBLE) / ante_ct, 6) AS confidence
FROM cnt JOIN asup USING (ante)""",

    "q13_order_dist" ->
      s"""SELECT order_ct, COUNT(*) AS cust_ct FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS order_ct
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY order_ct""",

    "q11_top_value" ->
      s"""WITH pv AS (
  SELECT l_partkey, SUM(${DEC("l_extendedprice")}) AS val_dec
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT SUM(val_dec) AS total_dec FROM pv)
SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM pv, t WHERE val_dec * 1000 > total_dec""",

    "q15_top_supplier" ->
      s"""WITH rev AS (
  SELECT l_suppkey, SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_shipdate < TIMESTAMP '2001-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)""",

    "q14_promo_share" ->
      s"""WITH s AS (
  SELECT
    SUM(CASE WHEN p_type = 'PROMO'
      THEN ${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})
      ELSE ${DEC("0")} END) AS promo_dec,
    SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS total_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_shipdate < TIMESTAMP '2001-02-01')
SELECT CAST(promo_dec AS DOUBLE) AS promo_revenue,
  CAST(total_dec AS DOUBLE) AS total_revenue,
  CAST(promo_dec AS DOUBLE) * 100.0 / CAST(total_dec AS DOUBLE) AS promo_share
FROM s""",

    "q6_forecast_revenue" ->
      s"""SELECT CAST(SUM(${DEC("l_extendedprice")} * ${DEC("l_discount")}) AS DOUBLE) AS revenue,
CAST(COUNT(*) AS BIGINT) AS line_ct
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "q8_market_share" ->
      s"""WITH rev AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr, sn.n_name AS supp_nation,
    ${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")}) AS v
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN part ON l_partkey = p_partkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY')
SELECT CAST(yr AS BIGINT) AS yr,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE ${DEC("0")} END) AS DOUBLE) AS nation_rev,
  CAST(SUM(v) AS DOUBLE) AS total_rev,
  round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE ${DEC("0")} END) AS DOUBLE)
    / CAST(SUM(v) AS DOUBLE), 6) AS mkt_share
FROM rev GROUP BY yr""",

    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
CAST(SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})
  - ${DEC("p_retailprice")} * ${DEC("l_quantity")}) AS DOUBLE) AS profit,
CAST(COUNT(*) AS BIGINT) AS line_ct
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)""",

    "q12_ship_lag" ->
      s"""SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 45
  THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_ct,
CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_ct
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1""",

    "q16_supplier_cnt" ->
      s"""SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supp_ct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size""",

    "q19_disjunctive_rev" ->
      s"""SELECT CAST(SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS DOUBLE) AS revenue,
CAST(COUNT(*) AS BIGINT) AS line_ct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""",

    "q20_excess_supp" ->
      s"""WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(${DEC("l_quantity")}) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
  GROUP BY l_partkey, l_suppkey),
tot AS (SELECT l_partkey AS tp, SUM(supp_qty) AS total_qty FROM ps GROUP BY 1)
SELECT s_suppkey, s_name, CAST(${DEC("s_acctbal")} AS DOUBLE) AS acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM ps JOIN tot ON l_partkey = tp WHERE supp_qty * 6 > total_qty)""",

    "q21_waiting_supp" ->
      s"""WITH roster AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
SELECT s_suppkey, s_name, numwait FROM (
  SELECT t.l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
  FROM late t
  WHERE EXISTS (SELECT 1 FROM roster r WHERE r.l_orderkey = t.l_orderkey AND r.l_suppkey <> t.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late o WHERE o.l_orderkey = t.l_orderkey AND o.l_suppkey <> t.l_suppkey)
  GROUP BY t.l_suppkey)
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_suppkey LIMIT 20""",

    "j9_interval_left" ->
      s"""SELECT o_orderkey, o_orderdate, l_linenumber, l_shipdate,
CASE WHEN l_linenumber IS NULL THEN 0 ELSE 1 END AS matched
FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY""",

    "a19_user_zscore" ->
      s"""WITH p AS (SELECT event_id, user_id, ${DEC("value")} AS v
  FROM events WHERE event_type = 'purchase'),
s AS (SELECT user_id AS m_uid, COUNT(*) AS cnt, SUM(v) AS sv, SUM(v * v) AS svv
  FROM p GROUP BY user_id)
SELECT event_id, user_id, CAST(v AS DOUBLE) AS value,
CASE WHEN cnt >= 2 AND (CAST(svv AS DOUBLE) / cnt - (CAST(sv AS DOUBLE) / cnt) * (CAST(sv AS DOUBLE) / cnt)) > 0
  THEN round((CAST(v AS DOUBLE) - CAST(sv AS DOUBLE) / cnt) /
    sqrt(CAST(svv AS DOUBLE) / cnt - (CAST(sv AS DOUBLE) / cnt) * (CAST(sv AS DOUBLE) / cnt)), 6)
  ELSE 0.0 END AS zscore
FROM p JOIN s ON user_id = m_uid""",

    "j1_interval_join" ->
      s"""SELECT o_orderkey, l_linenumber, o_orderdate, l_shipdate,
CAST(${DEC("l_extendedprice")} AS DOUBLE) AS price
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY""",

    "j2_interval_join_asym" ->
      s"""SELECT o_orderkey AS pay_orderkey, l_linenumber,
o_orderdate + INTERVAL 10 DAY AS pay_time, l_shipdate,
CAST(${DEC("o_totalprice")} AS DOUBLE) AS pay_amount
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
AND l_shipdate >= o_orderdate + INTERVAL 10 DAY - INTERVAL 15 DAY
AND l_shipdate <= o_orderdate + INTERVAL 10 DAY + INTERVAL 5 DAY
WHERE o_orderstatus = 'F'""",

    "j3_dim_enrich" ->
      s"""SELECT o_orderkey, o_custkey, c_name, c_mktsegment, n_name, r_name,
CAST(${DEC("o_totalprice")} AS DOUBLE) AS total_amount,
CAST(year(o_orderdate) AS BIGINT) AS order_year
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey""",

    "j4_bounce_detect" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, date_trunc('second', $ETS) AS tss FROM events),
w AS (SELECT *, lead(event_type) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS next_type,
lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS next_ts FROM e)
SELECT event_id, user_id, strftime(tss, '%Y-%m-%d %H:%M:%S') AS visit_ts FROM w
WHERE event_type = 'view' AND ((next_type = 'view' AND next_ts <= tss + INTERVAL 10 MINUTE)
OR next_ts IS NULL OR next_ts > tss + INTERVAL 10 MINUTE)""",

    // the times(2).consecutive() rendering matches the next-form semantics,
    // so it is gated by the SAME oracle result set as j4_bounce_detect
    "j4_bounce_times2" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, date_trunc('second', $ETS) AS tss FROM events),
w AS (SELECT *, lead(event_type) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS next_type,
lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS next_ts FROM e)
SELECT event_id, user_id, strftime(tss, '%Y-%m-%d %H:%M:%S') AS visit_ts FROM w
WHERE event_type = 'view' AND ((next_type = 'view' AND next_ts <= tss + INTERVAL 10 MINUTE)
OR next_ts IS NULL OR next_ts > tss + INTERVAL 10 MINUTE)""",

    "j6_asof_join" ->
      s"""WITH v AS (SELECT user_id, $ETS AS ts, MAX(event_id) AS view_id FROM events
WHERE event_type = 'view' GROUP BY user_id, $ETS),
c AS (SELECT event_id AS click_id, user_id, $ETS AS ts FROM events WHERE event_type = 'click')
SELECT click_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts, view_id
FROM c ASOF JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts""",

    "p1_parse_clean" ->
      """SELECT event_id, user_id, event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL""",

    "p2_delete_filter" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE event_type <> 'error'",

    "p3_column_prune" ->
      "SELECT event_id, user_id, event_type FROM events",

    "p4_derived_cols" ->
      s"""SELECT event_id, strftime($ETS, '%Y-%m-%d') AS create_date,
CAST(hour($ETS) AS BIGINT) AS create_hour,
epoch_ms(date_trunc('second', $ETS)) // 1000 AS create_ts FROM events""",

    "p8_explode_json" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",

    "sql_gmv_serving" ->
      s"""SELECT p_brand AS tm_name, CAST(SUM(${DEC("l_extendedprice")}) AS DOUBLE) AS order_amount
FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand
ORDER BY order_amount DESC, tm_name ASC LIMIT 5""",

    "sql_keyword_lateral" ->
      s"""SELECT lang, word, COUNT(*) AS ct FROM
(SELECT lang, unnest($TOKS) AS word FROM documents) GROUP BY lang, word""",

    // native-kernel LATERAL VIEW must match the UDF rendering exactly
    "sql_keyword_native" ->
      s"""SELECT lang, word, COUNT(*) AS ct FROM
(SELECT lang, unnest($TOKS) AS word FROM documents) GROUP BY lang, word""",

    "p6_conditional_measure" ->
      """SELECT event_id, user_id,
CAST(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS BIGINT) AS pv_ct,
CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT) AS click_ct,
CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS order_ct,
CAST(CASE WHEN event_type = 'signup' AND value > 100 THEN 1 ELSE 0 END AS BIGINT) AS sv_ct
FROM events""",

    "sp1_log_split" ->
      """SELECT 'start' AS stream, event_id, user_id, value FROM events WHERE event_type = 'signup'
UNION ALL SELECT 'page', event_id, user_id, value FROM events WHERE event_type IN ('view','click')
UNION ALL SELECT 'display', event_id, user_id, value FROM events WHERE event_type = 'purchase'""",

    "sp2_config_router" ->
      """SELECT event_id, user_id, event_type, sink_type, sink_table FROM events
JOIN (VALUES ('view','kafka','dwd_page_log'), ('click','kafka','dwd_click_log'),
('purchase','hbase','dim_order'), ('signup','hbase','dim_user'))
AS cfg(source_type, sink_type, sink_table) ON event_type = source_type""",

    "st1_is_new_fix" ->
      s"""SELECT event_id, user_id,
CAST(CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY $ETS, event_id) = 1
THEN 1 ELSE 0 END AS BIGINT) AS is_new FROM events""",

    "st2_daily_uv" ->
      s"""SELECT strftime(dt, '%Y-%m-%d') AS dt, COUNT(*) AS uv_ct FROM
(SELECT DISTINCT user_id, CAST($ETS AS DATE) AS dt FROM events) GROUP BY dt""",

    "a1_visitor_stats" ->
      s"""WITH e AS (SELECT time_bucket(INTERVAL '10 seconds', $ETS, TIMESTAMP '1970-01-01') AS w, event_type, value FROM events)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
strftime(w + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt, event_type,
CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS pv_ct,
CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS order_ct,
CAST(SUM(CASE WHEN event_type = 'signup' AND value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS sv_ct,
COUNT(*) AS total_ct FROM e GROUP BY w, event_type""",

    "a1_visitor_stats_4d" ->
      s"""WITH base AS (SELECT *, CAST(CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY $ETS, event_id) = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_new FROM events),
e AS (SELECT time_bucket(INTERVAL '10 seconds', $ETS, TIMESTAMP '1970-01-01') AS w,
user_id % 10 AS ar, event_type AS ch, is_new, event_id % 3 AS vc, event_type FROM base)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
strftime(w + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
ar, ch, is_new, vc,
CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS pv_ct,
CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS order_ct,
COUNT(*) AS total_ct FROM e GROUP BY w, ar, ch, is_new, vc""",

    "a2_product_stats" ->
      s"""WITH e AS (SELECT time_bucket(INTERVAL '1 day', $ETS, TIMESTAMP '1970-01-01') AS w, event_type, user_id, value FROM events)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
strftime(w + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS edt, event_type,
COUNT(DISTINCT user_id) AS user_ct,
CAST(SUM(${DEC("value")}) AS DOUBLE) AS amount,
COUNT(*) AS ct FROM e GROUP BY w, event_type""",

    "a3_province_stats" ->
      s"""WITH o AS (SELECT time_bucket(INTERVAL '7 days', o_orderdate, TIMESTAMP '1970-01-01') AS w,
n_name, o_orderkey, o_totalprice FROM orders
JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
strftime(w + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS edt, n_name,
COUNT(DISTINCT o_orderkey) AS order_count,
CAST(SUM(${DEC("o_totalprice")}) AS DOUBLE) AS order_amount
FROM o GROUP BY w, n_name""",

    "a4_keyword_stats" ->
      s"""SELECT lang, keyword, COUNT(*) AS ct, 'search' AS source FROM
(SELECT lang, unnest($TOKS) AS keyword FROM documents) GROUP BY lang, keyword""",

    "a5_gmv_by_day" ->
      s"""SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS dt,
CAST(SUM(${DEC("o_totalprice")}) AS DOUBLE) AS order_amount FROM orders GROUP BY dt""",

    "a5_top_brands" ->
      s"""SELECT p_brand, CAST(SUM(${DEC("l_extendedprice")}) AS DOUBLE) AS order_amount
FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand
ORDER BY order_amount DESC, p_brand ASC LIMIT 5""",

    "a6_session_window" ->
      s"""WITH e AS (SELECT user_id, $ETS AS t, value FROM events),
m AS (SELECT *, CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM e),
s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid FROM m)
SELECT strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS stt, user_id, COUNT(*) AS events_ct,
CAST(SUM(${DEC("value")}) AS DOUBLE) AS value_sum FROM s GROUP BY user_id, sid""",

    "a8_percentiles" ->
      s"""SELECT event_type,
round(quantile_cont(value, 0.5), 6) AS p50,
round(quantile_cont(value, 0.95), 6) AS p95,
round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type""",

    "a9_rollup" ->
      s"""SELECT r_name, n_name,
CAST(GROUPING(r_name) AS BIGINT) AS g_region, CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
CAST(SUM(${DEC("l_extendedprice")}) AS DOUBLE) AS revenue, COUNT(*) AS line_ct
FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)""",

    "a10_pivot" ->
      s"""SELECT strftime($ETS, '%Y-%m-%d') AS dt,
SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view_ct,
SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click_ct,
SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase_ct,
SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup_ct,
SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error_ct
FROM events GROUP BY dt""",

    "a11_window_funcs" ->
      s"""SELECT event_id, user_id, strftime($ETS, '%Y-%m-%d %H:%M:%S') AS ets,
lag(event_type) OVER w AS prev_type,
CAST(ntile(4) OVER w AS BIGINT) AS quartile,
round(cume_dist() OVER w, 6) AS cume,
CAST(rank() OVER w AS BIGINT) AS rnk
FROM events WHERE user_id < 200
WINDOW w AS (PARTITION BY user_id ORDER BY $ETS, event_id)""",

    "a12_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
CAST(SUM(${DEC("l_quantity")}) AS DOUBLE) AS sum_qty,
COUNT(*) AS line_ct
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",

    "a24_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
CAST(SUM(${DEC("l_quantity")}) AS DOUBLE) AS sum_qty,
COUNT(*) AS line_ct
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""",

    "p9_set_ops" ->
      """SELECT 'view_and_purchase' AS cohort, user_id FROM
(SELECT user_id FROM events WHERE event_type = 'view'
 INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT 'view_no_click', user_id FROM
(SELECT user_id FROM events WHERE event_type = 'view'
 EXCEPT SELECT user_id FROM events WHERE event_type = 'click')""",

    "j7_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""",

    "a7_sliding_window" ->
      s"""WITH e AS (SELECT time_bucket(INTERVAL '5 minutes', $ETS, TIMESTAMP '1970-01-01') AS tb, event_type FROM events),
x AS (SELECT tb - i * INTERVAL 5 MINUTE AS w, event_type FROM e, (SELECT unnest([0, 1]) AS i) t)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt, strftime(w + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
event_type, COUNT(*) AS ct FROM x GROUP BY w, event_type""",

    "a13_event_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, $ETS AS t FROM events),
s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN t END) OVER (PARTITION BY user_id) AS t1 FROM e),
s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t > t1 THEN t END) OVER (PARTITION BY user_id) AS t2 FROM s1),
s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t > t2 THEN t END) OVER (PARTITION BY user_id) AS t3 FROM s2)
SELECT count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_view_click,
count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_view_click_purchase FROM s3""",

    "a14_cohort_retention" ->
      s"""WITH e AS (SELECT user_id, CAST($ETS AS DATE) AS d FROM events),
c AS (SELECT *, min(d) OVER (PARTITION BY user_id) AS cd FROM e)
SELECT strftime(cd, '%Y-%m-%d') AS cohort_day,
CAST(date_diff('day', cd, d) AS BIGINT) AS day_offset,
count(DISTINCT user_id) AS users FROM c GROUP BY cd, date_diff('day', cd, d)""",

    "a15_rfm_segments" ->
      s"""WITH m AS (SELECT user_id, max(CAST($ETS AS DATE)) AS last_day,
count(CASE WHEN event_type = 'purchase' THEN 1 END) AS frequency,
coalesce(sum(CASE WHEN event_type = 'purchase' THEN ${DEC("value")} END), 0) AS mon_dec
FROM events GROUP BY user_id),
g AS (SELECT max(CAST($ETS AS DATE)) AS corpus_max FROM events),
mm AS (SELECT m.*, CAST(date_diff('day', last_day, corpus_max) AS BIGINT) AS recency_days,
CAST(mon_dec * 100 AS BIGINT) AS mon_cents FROM m, g),
b AS (SELECT quantile_disc(recency_days, 0.25) AS r1, quantile_disc(recency_days, 0.5) AS r2,
quantile_disc(recency_days, 0.75) AS r3, quantile_disc(frequency, 0.25) AS f1,
quantile_disc(frequency, 0.5) AS f2, quantile_disc(frequency, 0.75) AS f3,
quantile_disc(mon_cents, 0.25) AS m1, quantile_disc(mon_cents, 0.5) AS m2,
quantile_disc(mon_cents, 0.75) AS m3 FROM mm)
SELECT user_id, recency_days, frequency, CAST(mon_dec AS DOUBLE) AS monetary,
CAST(1 + CAST(recency_days > r1 AS INT) + CAST(recency_days > r2 AS INT) + CAST(recency_days > r3 AS INT) AS BIGINT) AS r_seg,
CAST(1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT) + CAST(frequency > f3 AS INT) AS BIGINT) AS f_seg,
CAST(1 + CAST(mon_cents > m1 AS INT) + CAST(mon_cents > m2 AS INT) + CAST(mon_cents > m3 AS INT) AS BIGINT) AS m_seg
FROM mm, b""",

    "a20_path_transitions" ->
      s"""WITH e AS (SELECT user_id, event_type, $ETS AS t, event_id FROM events),
s AS (SELECT event_type, lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev_event FROM e),
p AS (SELECT prev_event, event_type AS next_event, COUNT(*) AS pair_ct
  FROM s WHERE prev_event IS NOT NULL GROUP BY 1, 2)
SELECT prev_event, next_event, pair_ct,
CAST(pair_ct AS DOUBLE) / CAST(SUM(pair_ct) OVER (PARTITION BY prev_event) AS DOUBLE) AS prob
FROM p""",

    "a21_path_topk" ->
      s"""WITH e AS (SELECT user_id, event_type, $ETS AS t, event_id FROM events),
s AS (SELECT event_type,
  lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY t, event_id) AS e1,
  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS e2 FROM e)
SELECT e1 || '>' || e2 || '>' || event_type AS path, COUNT(*) AS path_ct
FROM s WHERE e1 IS NOT NULL GROUP BY 1
ORDER BY path_ct DESC, path ASC LIMIT 20""",

    "a16_attribution" ->
      s"""WITH e AS (SELECT user_id, event_type, value, $ETS AS t, event_id FROM events),
w AS (SELECT *, last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
OVER (PARTITION BY user_id ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
FROM e)
SELECT coalesce(touch, 'direct') AS channel, count(*) AS purchases,
CAST(SUM(${DEC("value")}) AS DOUBLE) AS revenue
FROM w WHERE event_type = 'purchase' GROUP BY 1""",

    "a17_funnel_latency" ->
      s"""WITH e AS (SELECT user_id, event_type, $ETS AS t FROM events),
s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN t END) OVER (PARTITION BY user_id) AS t1 FROM e),
s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t > t1 THEN t END) OVER (PARTITION BY user_id) AS t2 FROM s1),
s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t > t2 THEN t END) OVER (PARTITION BY user_id) AS t3 FROM s2),
u AS (SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3 FROM s3 GROUP BY user_id),
l AS (SELECT date_diff('microsecond', t1, t2) AS lat12, date_diff('microsecond', t2, t3) AS lat23 FROM u)
SELECT count(lat12) AS n_view_click, count(lat23) AS n_click_purchase,
round(quantile_cont(lat12, 0.5) / 1e6, 6) AS p50_view_click_s,
round(quantile_cont(lat12, 0.9) / 1e6, 6) AS p90_view_click_s,
round(quantile_cont(lat23, 0.5) / 1e6, 6) AS p50_click_purchase_s,
round(quantile_cont(lat23, 0.9) / 1e6, 6) AS p90_click_purchase_s FROM l""",

    "a18_active_users" ->
      s"""WITH a AS (SELECT DISTINCT CAST($ETS AS DATE) AS d, user_id FROM events),
dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM a GROUP BY d),
w AS (SELECT a.d + CAST(x.k AS INT) AS wd, a.user_id FROM a, (SELECT unnest(range(0, 7)) AS k) x),
wau AS (SELECT wd, count(DISTINCT user_id) AS wau7 FROM w GROUP BY wd)
SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau7,
round(CAST(dau.dau AS DOUBLE) / wau.wau7, 6) AS stickiness
FROM dau JOIN wau ON dau.d = wau.wd""",

    "cdc_scd2_history" ->
      s"""WITH ops AS (SELECT user_id, $ETS AS t, event_id, value,
CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op FROM events),
c AS (SELECT *, lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS vt FROM ops),
u AS (SELECT user_id, value, t, vt, row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS version
FROM c WHERE op = 'upsert')
SELECT user_id, version, value, strftime(t, '%Y-%m-%d %H:%M:%S') AS valid_from,
strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
CASE WHEN vt IS NULL THEN 1 ELSE 0 END AS is_current FROM u""",

    "cdc_snapshot_at" ->
      s"""WITH ops AS (SELECT user_id, $ETS AS t, event_id, value,
CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op FROM events),
c AS (SELECT *, lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS vt FROM ops),
u AS (SELECT user_id, value, t, vt, row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS version
FROM c WHERE op = 'upsert')
SELECT user_id, version, value, strftime(t, '%Y-%m-%d %H:%M:%S') AS valid_from FROM u
WHERE t <= TIMESTAMP '2024-01-15 00:00:00'
AND (vt IS NULL OR vt > TIMESTAMP '2024-01-15 00:00:00')""",

    "text_ngram_freq" ->
      s"""WITH t AS (SELECT $TOKS AS toks FROM documents),
b AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t)
SELECT bigram, COUNT(*) AS ct FROM b GROUP BY bigram ORDER BY ct DESC, bigram ASC LIMIT 200""",

    "text_hashed_features" ->
      s"""SELECT doc_id, CAST(CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 64 AS BIGINT) AS bucket, COUNT(*) AS n
FROM (SELECT doc_id, unnest($TOKS) AS tok FROM documents)
GROUP BY doc_id, bucket""",

    // per-doc 3-gram novelty vs ingest (doc_id) order: fraction of the
    // doc's DISTINCT grams first introduced by this doc
    "text_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
dg AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(toks) - 1),
i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS gram
FROM t WHERE len(toks) >= 3),
f AS (SELECT gram, MIN(doc_id) AS first_doc FROM dg GROUP BY gram)
SELECT dg.doc_id, COUNT(*) AS n_grams,
CAST(SUM(CASE WHEN first_doc = dg.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
round(CAST(SUM(CASE WHEN first_doc = dg.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS novelty
FROM dg JOIN f USING (gram) GROUP BY dg.doc_id""",

    // PSI between doc_id-parity cohorts over two features; Laplace +1 over
    // the observed cell union, per-term 6dp rounds folded in exact decimal
    "quality_psi_drift" ->
      """WITH base AS (SELECT doc_id, lang, n_chars, doc_id % 2 AS cohort FROM documents),
cells AS (SELECT 'len_bucket' AS feature, CAST(least(n_chars // 50, 9) AS VARCHAR) AS cell, cohort FROM base
UNION ALL SELECT 'lang' AS feature, lang AS cell, cohort FROM base),
ct AS (SELECT feature, cell, SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS ct_a,
SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS ct_b FROM cells GROUP BY feature, cell),
tot AS (SELECT feature, CAST(SUM(ct_a) AS BIGINT) AS n_a, CAST(SUM(ct_b) AS BIGINT) AS n_b,
COUNT(*) AS n_cells FROM ct GROUP BY feature),
p AS (SELECT ct.feature, n_cells,
CAST(ct_a + 1 AS DOUBLE) / (n_a + n_cells) AS pa,
CAST(ct_b + 1 AS DOUBLE) / (n_b + n_cells) AS pb FROM ct JOIN tot USING (feature)),
terms AS (SELECT feature, n_cells,
CAST(round((pa - pb) * ln(pa / pb), 6) AS DECIMAL(28,10)) AS term FROM p)
SELECT feature, n_cells, round(CAST(SUM(term) AS DOUBLE), 6) AS psi
FROM terms GROUP BY feature, n_cells""",

    "text_collocations" ->
      s"""WITH t AS (SELECT $TOKS AS toks FROM documents),
cu AS (SELECT tok, COUNT(*) AS cu FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
nt AS (SELECT CAST(SUM(cu) AS BIGINT) AS nt FROM cu),
b AS (SELECT unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS pr
FROM t WHERE len(toks) >= 2),
cb AS (SELECT pr[1] AS w1, pr[2] AS w2, COUNT(*) AS c_ab FROM b GROUP BY w1, w2 HAVING COUNT(*) >= 5),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM b)
SELECT w1 || ' ' || w2 AS bigram, c_ab,
round(ln(((CAST(c_ab AS DOUBLE) * nt) * nt) / ((CAST(nb AS DOUBLE) * ca.cu) * cbu.cu)), 6) AS pmi
FROM cb JOIN cu ca ON ca.tok = cb.w1 JOIN cu cbu ON cbu.tok = cb.w2
CROSS JOIN nt CROSS JOIN nb
ORDER BY pmi DESC, bigram ASC LIMIT 100""",

    "text_bpe_pairs" ->
      s"""WITH wf AS (SELECT tok AS word, COUNT(*) AS wf FROM (SELECT unnest($TOKS) AS tok FROM documents) GROUP BY tok),
pr AS (SELECT wf, unnest(list_transform(range(1, len(word)), i -> substring(word, CAST(i AS INT), 2))) AS pair
FROM wf WHERE len(word) >= 2)
SELECT pair, CAST(SUM(wf) AS BIGINT) AS freq FROM pr GROUP BY pair ORDER BY freq DESC, pair ASC LIMIT 200""",

    "u1_split_words" ->
      s"SELECT doc_id, unnest($TOKS) AS word FROM documents WHERE doc_id < 20",

    // CJK tokenizer leg over the planted fixture: DuckDB rebuilds the same
    // strings via chr() over the integer code-point formula, then replays
    // the identical rule — whitespace split, maximal Han/non-Han runs
    // (explicit URO+ExtA ranges), Han runs ≥ 2 → overlapping bigrams
    "u1_split_words_cjk" ->
      raw"""WITH h AS (
  SELECT i AS fid,
    array_to_string(list_transform(range(0, 4), j -> chr(CAST(19968 + (i*31 + j*7) % 256 AS INT))), '') AS h0,
    array_to_string(list_transform(range(0, 5), j -> chr(CAST(19968 + (i*31 + 17 + j*7) % 256 AS INT))), '') AS h1,
    array_to_string(list_transform(range(0, 1), j -> chr(CAST(19968 + (i*31 + 34 + j*7) % 256 AS INT))), '') AS h2,
    array_to_string(list_transform(range(0, 3), j -> chr(CAST(19968 + (i*31 + 51 + j*7) % 256 AS INT))), '') AS h3
  FROM range(30) t(i)),
base AS (SELECT fid, 'Alpha' || CAST(fid AS VARCHAR) || ' ' || h0 || ' beta' || h1 || 'x ' || h2 || ' mix' || h3 || 'end' AS text FROM h),
parts AS (SELECT fid, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS part FROM base),
runs AS (SELECT fid, unnest(regexp_extract_all(part, '[\x{4e00}-\x{9fff}\x{3400}-\x{4dbf}]+|[^\x{4e00}-\x{9fff}\x{3400}-\x{4dbf}]+')) AS run FROM parts),
toks AS (SELECT fid, unnest(CASE WHEN len(run) >= 2 AND regexp_matches(substring(run, 1, 1), '[\x{4e00}-\x{9fff}\x{3400}-\x{4dbf}]')
  THEN list_transform(range(1, len(run)), j -> substring(run, CAST(j AS INT), 2))
  ELSE [run] END) AS word FROM runs)
SELECT fid, word FROM toks""",

    "text_lang_id" ->
      s"""$OracleLangPred
SELECT doc_id, labeled_lang, pred_lang FROM pred""",

    // classifier EVAL: confusion matrix of the lang-ID heuristic against
    // the corpus's labeled lang column — the accuracy audit you run
    // before trusting any filter built on the predictor
    "text_langid_eval" ->
      s"""$OracleLangPred
SELECT labeled_lang AS labeled, pred_lang AS predicted, COUNT(*) AS n
FROM pred GROUP BY labeled, predicted""",

    "text_quality_score" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
CAST(len($TOKS) AS BIGINT) AS n_tokens,
round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio,
round(CAST(len(list_filter($TOKS, x -> x IN ('the','a','of','and','to'))) AS DOUBLE) / greatest(CAST(len($TOKS) AS DOUBLE), 1.0), 6) AS stopword_ratio,
round(CAST(len(list_distinct($TOKS)) AS DOUBLE) / greatest(CAST(len($TOKS) AS DOUBLE), 1.0), 6) AS unique_ratio
FROM documents""",

    "text_token_counts" ->
      s"""SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS ws_tokens,
CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS subword_tokens
FROM documents""",

    "text_fingerprints" ->
      s"""SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
${MD5P("text")} AS fp64 FROM documents""",

    "text_pii_redact" ->
      """SELECT doc_id,
regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'), '[0-9]{6,}', '<NUM>', 'g') AS clean_text,
CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_long_numbers
FROM documents""",

    "text_length_hist" ->
      s"""SELECT lang, CAST(floor(len($TOKS) / 10) * 10 AS BIGINT) AS bucket, COUNT(*) AS ct
FROM documents GROUP BY lang, bucket""",

    "pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source, CAST(len($TOKS) AS BIGINT) AS n_toks FROM documents),
c AS (SELECT *, SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id) - n_toks AS cum_before FROM t)
SELECT source, CAST(floor(cum_before / 256) AS BIGINT) AS bin, COUNT(*) AS n_docs,
CAST(SUM(n_toks) AS BIGINT) AS bin_tokens, MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY source, bin""",

    "text_filter_reasons" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
f AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
  CASE WHEN len(toks) > 1 THEN round(1.0 -
    CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) /
    (len(toks) - 1), 6) ELSE 0.0 END AS dup_frac,
  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS uniq_ratio FROM t)
SELECT doc_id, n_tokens,
CASE WHEN n_tokens >= 20 AND n_tokens <= 80 AND dup_frac <= 0.05 AND uniq_ratio >= 0.4
  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS kept,
COALESCE(array_to_string(list_filter([
  CASE WHEN n_tokens < 20 THEN 'too_short' END,
  CASE WHEN n_tokens > 80 THEN 'too_long' END,
  CASE WHEN dup_frac > 0.05 THEN 'repetitive' END,
  CASE WHEN uniq_ratio < 0.4 THEN 'low_diversity' END], x -> x IS NOT NULL), ','), '') AS reasons
FROM f""",

    // asymmetric batch-vs-corpus LSH: same signature/band machinery as
    // dedup_minhash_lsh, but only src7×rest collisions are candidates
    "dedup_incremental" ->
      s"""WITH ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
b AS (SELECT * FROM bands WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src7')),
c AS (SELECT * FROM bands WHERE doc_id IN (SELECT doc_id FROM documents WHERE source <> 'src7')),
pairs AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id,
round(CAST(len(list_filter(list_zip(b.sig, c.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) AS est_jaccard
FROM b JOIN c ON b.bd = c.bd AND b.band_key = c.band_key)
SELECT batch_id, corpus_id, est_jaccard FROM pairs WHERE est_jaccard >= 0.5""",

    "multimodal_features" ->
      """SELECT doc_id, lang AS media_type, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
md5(text) AS content_hash FROM documents""",

    "dedup_exact" ->
      s"""SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
MIN(doc_id) AS canonical_id, COUNT(*) AS dup_ct FROM documents GROUP BY fp""",

    "dedup_minhash_sig" ->
      s"""WITH ${minhashHs("WHERE doc_id < 20")}
SELECT doc_id, CAST(i AS BIGINT) AS hash_idx, $minhashSlot AS minhash
FROM hs, (SELECT unnest(range(0, 64)) AS i) idx""",

    "dedup_minhash_lsh" ->
      s"""WITH ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) AS est_jaccard
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id)
SELECT doc_a, doc_b, est_jaccard FROM pairs WHERE est_jaccard >= 0.5""",

    "dedup_minhash_acc" ->
      s"""$OracleMinhashAcc
SELECT doc_a, doc_b, est_jaccard, exact_jaccard,
round(abs(est_jaccard - exact_jaccard), 6) AS abs_err FROM acc""",

    // threshold-sensitivity histogram over the audit table: how many
    // candidate pairs sit in each 0.05-wide exact-similarity bin, and how
    // far the estimator strays there — the evidence for picking a dedup cut
    "dedup_threshold_hist" ->
      s"""$OracleMinhashAcc
SELECT floor(exact_jaccard * 20) / 20.0 AS bin, COUNT(*) AS n_pairs,
round(CAST(SUM(CAST(round(abs(est_jaccard - exact_jaccard), 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS mean_abs_err
FROM acc GROUP BY bin""",

    "pipeline_funnel" ->
      s"""WITH RECURSIVE corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 50),
tq AS (SELECT doc_id, $TOKS AS tk FROM documents),
f AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
  CASE WHEN len(tk) > 1 THEN round(1.0 -
    CAST(len(list_distinct(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]))) AS DOUBLE) /
    (len(tk) - 1), 6) ELSE 0.0 END AS dup_frac,
  round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6) AS uniq_ratio FROM tq),
s1 AS (SELECT c.doc_id, c.text FROM corpus c JOIN f USING (doc_id)
WHERE f.n_tokens >= 20 AND f.n_tokens <= 80 AND f.dup_frac <= 0.05 AND f.uniq_ratio >= 0.4),
e AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM s1),
s2 AS (SELECT doc_id FROM (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY fp) AS canon FROM e)
WHERE doc_id = canon),
${minhashHs("WHERE doc_id IN (SELECT doc_id FROM s2)")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id
WHERE round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) >= 0.5),
s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 3),
i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]))) AS gram
FROM tq WHERE len(tk) >= 5),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 50),
flagged AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram) WHERE g.doc_id >= 50),
s4 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM flagged))
SELECT CAST(0 AS BIGINT) AS stage_idx, 'ingest' AS stage, COUNT(*) AS n_docs FROM corpus
UNION ALL SELECT 1, 'quality', COUNT(*) FROM s1
UNION ALL SELECT 2, 'exact_dedup', COUNT(*) FROM s2
UNION ALL SELECT 3, 'near_dedup', COUNT(*) FROM s3
UNION ALL SELECT 4, 'decontaminated', COUNT(*) FROM s4""",

    "dedup_source_overlap" ->
      s"""WITH ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) AS est_jaccard
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
m AS (SELECT LEAST(da.source, db.source) AS src_a, GREATEST(da.source, db.source) AS src_b,
CAST(est_jaccard AS DECIMAL(28,10)) AS est
FROM pairs JOIN documents da ON pairs.doc_a = da.doc_id JOIN documents db ON pairs.doc_b = db.doc_id
WHERE est_jaccard >= 0.5)
SELECT src_a, src_b, COUNT(*) AS n_pairs,
round(CAST(SUM(est) AS DOUBLE) / COUNT(*), 6) AS mean_est FROM m GROUP BY src_a, src_b""",

    "dedup_corpus_clean" ->
      s"""WITH ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) AS est_jaccard
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT DISTINCT doc_b FROM pairs WHERE est_jaccard >= 0.5)""",

    "multimodal_decode" ->
      """SELECT doc_id AS id, lang AS media_type,
CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents""",

    "dedup_clusters" ->
      s"""WITH RECURSIVE ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id
WHERE round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) >= 0.5),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(id, lab) AS (SELECT doc_id, doc_id FROM documents
UNION SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id""",

    "sample_split" ->
      s"""WITH RECURSIVE ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id
WHERE round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) >= 0.5),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(id, lab) AS (SELECT doc_id, doc_id FROM documents
UNION SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
cl AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
CASE WHEN ${MD5P("CAST(cluster_id AS VARCHAR)")} % 1000 < 10 THEN 'test'
WHEN ${MD5P("CAST(cluster_id AS VARCHAR)")} % 1000 < 20 THEN 'val'
ELSE 'train' END AS split FROM cl""",

    // leakage audit: near-dup pairs straddling the split boundary under a
    // naive per-doc hash vs the cluster-aware split (must audit to zero)
    "split_leakage_audit" ->
      s"""WITH RECURSIVE ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id
WHERE round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) >= 0.5),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(id, lab) AS (SELECT doc_id, doc_id FROM documents
UNION SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
cl AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
sp AS (SELECT doc_id,
CASE WHEN ${MD5P("CAST(cluster_id AS VARCHAR)")} % 1000 < 10 THEN 'test'
WHEN ${MD5P("CAST(cluster_id AS VARCHAR)")} % 1000 < 20 THEN 'val'
ELSE 'train' END AS split FROM cl),
nv AS (SELECT doc_id,
CASE WHEN ${MD5P("CAST(doc_id AS VARCHAR)")} % 1000 < 10 THEN 'test'
WHEN ${MD5P("CAST(doc_id AS VARCHAR)")} % 1000 < 20 THEN 'val'
ELSE 'train' END AS split FROM documents)
SELECT 'naive_doc_hash' AS method,
coalesce(CAST(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT), 0) AS straddling_pairs,
COUNT(*) AS total_pairs
FROM pairs JOIN nv a ON doc_a = a.doc_id JOIN nv b ON doc_b = b.doc_id
UNION ALL
SELECT 'cluster_aware' AS method,
coalesce(CAST(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT), 0) AS straddling_pairs,
COUNT(*) AS total_pairs
FROM pairs JOIN sp a ON doc_a = a.doc_id JOIN sp b ON doc_b = b.doc_id""",

    // global quality rank (distinct-token ratio) -> equal-mass phases 0..9
    "curriculum_phase" ->
      s"""WITH cq AS (SELECT doc_id,
round(CAST(len(list_distinct($TOKS)) AS DOUBLE) / greatest(CAST(len($TOKS) AS DOUBLE), 1.0), 6) AS quality
FROM documents),
cr AS (SELECT doc_id, quality, row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS rnk FROM cq),
cn AS (SELECT COUNT(*) AS n FROM cq)
SELECT doc_id, quality, CAST(((rnk - 1) * 10) // n AS BIGINT) AS phase FROM cr, cn""",

    "dedup_keep_best" ->
      s"""WITH RECURSIVE ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id
WHERE round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) >= 0.5),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(id, lab) AS (SELECT doc_id, doc_id FROM documents
UNION SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
cl AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
q AS (SELECT doc_id,
round(CAST(len(list_distinct($TOKS)) AS DOUBLE) / greatest(CAST(len($TOKS) AS DOUBLE), 1.0), 6) AS quality
FROM documents),
r AS (SELECT cl.cluster_id, cl.doc_id, q.quality,
row_number() OVER (PARTITION BY cl.cluster_id ORDER BY q.quality DESC, cl.doc_id ASC) AS rk
FROM cl JOIN q USING (doc_id))
SELECT cluster_id, doc_id AS keep_id, quality FROM r WHERE rk = 1""",

    "dedup_contamination" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS gram
FROM t WHERE len(toks) >= 5),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 50)
SELECT doc_id, COUNT(*) AS n_shared FROM g JOIN bench USING (gram)
WHERE doc_id >= 50 GROUP BY doc_id""",

    // benchmark grams → 3 md5 bit positions each, distinct set bits;
    // a corpus gram is bloom-positive when all 3 of its bits are set
    "sketch_bloom_contam" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS gram
FROM t WHERE len(toks) >= 5),
bits AS (SELECT DISTINCT ${MD5P("concat(j, '_', gram)")} % 16384 AS bit
  FROM (SELECT DISTINCT gram FROM g WHERE doc_id < 50), unnest([0, 1, 2]) t(j)),
probe AS (SELECT doc_id, gram, ${MD5P("concat(j, '_', gram)")} % 16384 AS bit
  FROM g, unnest([0, 1, 2]) t(j) WHERE doc_id >= 50),
pos AS (SELECT doc_id, gram FROM probe JOIN bits USING (bit)
  GROUP BY doc_id, gram HAVING COUNT(*) = 3)
SELECT doc_id, COUNT(*) AS n_bloom_pos FROM pos GROUP BY doc_id""",

    "dedup_substr_spans" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
i -> struct_pack(pos := i, h := ${MD5P15("array_to_string(list_slice(toks, i, i + 4), ' ')")}))) AS p
FROM t WHERE len(toks) >= 5),
g AS (SELECT doc_id, CAST(p.pos AS BIGINT) AS pos, p.h AS h FROM g0),
dup AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM g GROUP BY h) WHERE c >= 2),
cov AS (SELECT doc_id, pos FROM g JOIN dup USING (h)),
brk AS (SELECT doc_id, pos,
CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5 THEN 1 ELSE 0 END AS brk FROM cov),
isl AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM brk)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 4 AS span_end, COUNT(*) AS n_seeds
FROM isl GROUP BY doc_id, island""",

    "dedup_substr_strip" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
i -> struct_pack(pos := i, h := ${MD5P15("array_to_string(list_slice(toks, i, i + 4), ' ')")}))) AS p
FROM t WHERE len(toks) >= 5),
g AS (SELECT doc_id, CAST(p.pos AS BIGINT) AS pos, p.h AS h FROM g0),
dup AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM g GROUP BY h) WHERE c >= 2),
cov AS (SELECT doc_id, pos FROM g JOIN dup USING (h)),
brk AS (SELECT doc_id, pos,
CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5 THEN 1 ELSE 0 END AS brk FROM cov),
isl AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM brk),
spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 4 AS e FROM isl GROUP BY doc_id, island),
sp AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS spans FROM spans GROUP BY doc_id),
j AS (SELECT t.doc_id, t.toks, COALESCE(sp.spans, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS spans
FROM t LEFT JOIN sp USING (doc_id)),
kp AS (SELECT doc_id, toks, list_filter(range(1, len(toks) + 1),
p -> len(list_filter(spans, x -> x.s <= p AND p <= x.e)) = 0) AS kept FROM j)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
COALESCE(array_to_string(list_transform(kept, p -> toks[CAST(p AS INT)]), ' '), '') AS clean_text FROM kp""",

    "dedup_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS gram
FROM t WHERE len(toks) >= 5),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 50),
flagged AS (SELECT DISTINCT doc_id FROM g JOIN bench USING (gram) WHERE doc_id >= 50)
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM flagged)""",

    "text_bigram_surprisal" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
cu AS (SELECT tok, COUNT(*) AS cu FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
v AS (SELECT COUNT(*) AS v FROM cu),
bg AS (SELECT doc_id, len(toks) - 1 AS total,
unnest(list_transform(range(1, len(toks)), i -> struct_pack(tok := toks[i], bigram := toks[i] || ' ' || toks[i+1]))) AS p
FROM t WHERE len(toks) >= 2),
b AS (SELECT doc_id, total, p.tok AS tok, p.bigram AS bigram FROM bg),
cb AS (SELECT bigram, COUNT(*) AS cb FROM b GROUP BY bigram),
d AS (SELECT doc_id, total, tok, bigram, COUNT(*) AS bf FROM b GROUP BY doc_id, total, tok, bigram),
terms AS (SELECT d.doc_id, d.total,
CAST(round(d.bf * ln(CAST(cu.cu + v.v AS DOUBLE) / (cb.cb + 1)), 6) AS DECIMAL(28,10)) AS term
FROM d JOIN cu USING (tok) JOIN cb USING (bigram) CROSS JOIN v)
SELECT doc_id, round(CAST(SUM(term) AS DOUBLE) / total, 6) AS bigram_surprisal
FROM terms GROUP BY doc_id, total""",

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
b AS (SELECT doc_id, list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg FROM t)
SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
CAST(len(bg) - len(list_distinct(bg)) AS BIGINT) AS n_repeated,
CASE WHEN len(bg) > 0 THEN round(CAST(1 AS DOUBLE) - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE), 6)
ELSE 0.0 END AS dup_frac FROM b""",

    "text_surprisal" -> OracleSurprisal,

    "text_quality_buckets" ->
      s"""WITH s AS ($OracleSurprisal),
r AS (SELECT doc_id, surprisal,
  row_number() OVER (ORDER BY surprisal ASC, doc_id ASC) AS rnk FROM s),
c AS (SELECT COUNT(*) AS n FROM s)
SELECT doc_id, surprisal, CAST((rnk - 1) * 10 // n + 1 AS BIGINT) AS bucket FROM r, c""",

    "text_tfidf_topk" ->
      s"""WITH t AS (SELECT doc_id, unnest($TOKS) AS tok FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (SELECT doc_id, tok, round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS score
FROM tf JOIN dfreq USING (tok), n WHERE doc_id < 100),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rnk FROM s)
SELECT doc_id, tok, score, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 5""",

    "sample_bottomk" ->
      s"""SELECT doc_id, source, smp_rank FROM (
  SELECT doc_id, source, row_number() OVER (
    PARTITION BY source ORDER BY ${MD5P("CAST(doc_id AS VARCHAR)")}, doc_id) AS smp_rank
  FROM documents)
WHERE smp_rank <= 50""",

    // per-epoch deterministic shuffle: shard = hash(epoch, doc) mod 8,
    // order = hash rank within the shard
    "sample_epoch_shuffle" ->
      s"""WITH d AS (SELECT doc_id, epoch FROM documents, unnest(range(0, 3)) t(epoch)),
h AS (SELECT epoch, doc_id, ${MD5P("'ep_' || epoch || '_' || doc_id")} AS h FROM d),
s AS (SELECT epoch, doc_id, h, h % 8 AS shard FROM h)
SELECT CAST(epoch AS BIGINT) AS epoch, doc_id, CAST(shard AS BIGINT) AS shard,
CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS ord
FROM s""",

    "sketch_kmv_distinct" ->
      s"""WITH uh AS (SELECT DISTINCT event_type, ${MD5P15("CAST(user_id AS VARCHAR)")} AS h FROM events),
rk AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM uh),
agg AS (SELECT event_type, COUNT(*) AS m, MAX(CASE WHEN rn = 64 THEN h END) AS hk FROM rk GROUP BY 1),
ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_ct FROM events GROUP BY 1)
SELECT agg.event_type, exact_ct,
round(CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
  ELSE 63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END, 6) AS kmv_est,
round((round(CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
  ELSE 63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END, 6) - CAST(exact_ct AS DOUBLE))
  / CAST(exact_ct AS DOUBLE), 6) AS rel_err
FROM agg JOIN ex ON agg.event_type = ex.event_type""",

    "sketch_kmv_overlap" ->
      s"""WITH uh AS (SELECT DISTINCT event_type, ${MD5P15("CAST(user_id AS VARCHAR)")} AS h FROM events),
sk AS (SELECT event_type, h FROM (
  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM uh) WHERE rn <= 64),
ty AS (SELECT DISTINCT event_type FROM sk),
pr AS (SELECT a.event_type AS et_a, b.event_type AS et_b FROM ty a, ty b WHERE a.event_type < b.event_type),
u AS (SELECT et_a, et_b, h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
  SELECT et_a, et_b, h, 1 AS ia, 0 AS ib FROM pr JOIN sk ON sk.event_type = pr.et_a
  UNION ALL
  SELECT et_a, et_b, h, 0 AS ia, 1 AS ib FROM pr JOIN sk ON sk.event_type = pr.et_b)
  GROUP BY 1, 2, 3),
uk AS (SELECT et_a, et_b, COUNT(*) AS uct, SUM(ia * ib) AS bth FROM (
  SELECT *, row_number() OVER (PARTITION BY et_a, et_b ORDER BY h) AS rn FROM u) WHERE rn <= 64
  GROUP BY 1, 2),
du AS (SELECT DISTINCT user_id, event_type FROM events),
inter AS (SELECT a.event_type AS xa, b.event_type AS xb, COUNT(*) AS inter_ct
  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type GROUP BY 1, 2),
sz AS (SELECT event_type, COUNT(DISTINCT user_id) AS sz FROM events GROUP BY 1)
SELECT et_a, et_b, round(CAST(bth AS DOUBLE) / CAST(uct AS DOUBLE), 6) AS jaccard_est,
round(CAST(coalesce(inter_ct, 0) AS DOUBLE)
  / CAST(sa.sz + sb.sz - coalesce(inter_ct, 0) AS DOUBLE), 6) AS jaccard_exact
FROM uk LEFT JOIN inter ON et_a = xa AND et_b = xb
JOIN sz sa ON sa.event_type = et_a JOIN sz sb ON sb.event_type = et_b""",

    "sample_stratified" ->
      s"""SELECT doc_id, source, ${MD5P("CAST(doc_id AS VARCHAR)")} % 1000 AS bucket FROM documents
WHERE ${MD5P("CAST(doc_id AS VARCHAR)")} % 1000 <
CASE WHEN length(source) = 4 THEN 250 ELSE 750 END""",

    "sample_token_budget" ->
      s"""WITH q AS (SELECT doc_id,
round(CAST(len(list_distinct($TOKS)) AS DOUBLE) / greatest(CAST(len($TOKS) AS DOUBLE), 1.0), 6) AS quality,
CAST(len($TOKS) AS BIGINT) AS n_tokens FROM documents),
c AS (SELECT doc_id, quality, n_tokens,
SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum_tokens FROM q)
SELECT doc_id, quality, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= 20000""",

    "shard_assign" ->
      s"""WITH h AS (SELECT doc_id, ${MD5P("CAST(doc_id AS VARCHAR)")} AS h64 FROM documents)
SELECT doc_id, CAST(h64 % 64 AS BIGINT) AS shard,
CAST(row_number() OVER (PARTITION BY h64 % 64 ORDER BY h64, doc_id) AS BIGINT) AS pos FROM h""",

    // dataset-card rollup: doc/token counts, quality pass rate, and
    // within-source near-dup pairs per source (composes the filter and
    // LSH oracles)
    "corpus_report" ->
      s"""WITH ${minhashHs("")},
sigs AS (SELECT doc_id, list_transform(range(0, 64), i -> $minhashSlot) AS sig FROM hs),
bands AS (SELECT doc_id, sig, bd, array_to_string(list_slice(sig, bd*4 + 1, bd*4 + 4), '_') AS band_key
FROM sigs, (SELECT unnest(range(0, 16)) AS bd) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
round(CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2])) AS DOUBLE) / 64.0, 6) AS est_jaccard
FROM bands x JOIN bands y ON x.bd = y.bd AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
np AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= 0.5),
src AS (SELECT doc_id, source FROM documents),
sp AS (SELECT a.source, COUNT(*) AS dup_pairs FROM np p
  JOIN src a ON a.doc_id = p.doc_a JOIN src b ON b.doc_id = p.doc_b AND b.source = a.source
  GROUP BY a.source),
tq AS (SELECT doc_id, $TOKS AS toks FROM documents),
fq AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
  CASE WHEN len(toks) >= 20 AND len(toks) <= 80
    AND (CASE WHEN len(toks) > 1 THEN round(1.0 -
      CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) /
      (len(toks) - 1), 6) ELSE 0.0 END) <= 0.05
    AND round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) >= 0.4
    THEN 1 ELSE 0 END AS kept FROM tq),
agg AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
  round(CAST(SUM(n_toks) AS DOUBLE) / COUNT(*), 2) AS mean_tokens,
  (1000 * SUM(kept)) // COUNT(*) AS kept_permille
  FROM fq JOIN src USING (doc_id) GROUP BY source)
SELECT agg.source, n_docs, n_tokens, mean_tokens,
CAST(kept_permille AS BIGINT) AS kept_permille,
CAST(COALESCE(sp.dup_pairs, 0) AS BIGINT) AS dup_pairs
FROM agg LEFT JOIN sp ON agg.source = sp.source""",

    // rate ∝ n_s^(τ−1) (τ=0.7), normalized so the smallest source keeps
    // permille 1000; same md5 membership cut as every sampler
    "sample_temperature" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
q AS (SELECT source, round(pow(n_s, 0.7::DOUBLE), 6) / n_s AS q FROM c),
m AS (SELECT MAX(q) AS mq FROM q),
r AS (SELECT source, least(1000, CAST(floor(1000.0::DOUBLE * q / mq) AS BIGINT)) AS permille FROM q, m)
SELECT doc_id, d.source AS source, permille FROM documents d JOIN r ON d.source = r.source
WHERE ${MD5P("CAST(doc_id AS VARCHAR)")} % 1000 < permille""",

    // Efraimidis–Spirakis: k smallest −ln(u)/w (u md5-derived, w = token
    // count); selection orders on the UNROUNDED priority, ties by doc_id
    "sample_priority" ->
      s"""WITH t AS (SELECT doc_id,
CAST(greatest(len($TOKS), 1) AS BIGINT) AS n_tokens,
CAST(${MD5P("CAST(doc_id AS VARCHAR)")} % 1000000 + 1 AS DOUBLE) / 1000001.0 AS u
FROM documents),
p AS (SELECT doc_id, n_tokens, -ln(u) / CAST(n_tokens AS DOUBLE) AS prio FROM t)
SELECT doc_id, n_tokens, round(prio, 6) AS priority
FROM p ORDER BY prio ASC, doc_id ASC LIMIT 100""",

    // two-sample KS over cohort length ECDFs (curated short-name sources
    // vs rest): D = sup|F_a − F_b|, α=0.05 critical value 1.358·√((a+b)/ab)
    "quality_ks_lengths" ->
      s"""WITH t AS (SELECT CASE WHEN length(source) = 4 THEN 'a' ELSE 'b' END AS c,
CAST(len($TOKS) AS BIGINT) AS v FROM documents),
h AS (SELECT v, SUM(CASE WHEN c = 'a' THEN 1 ELSE 0 END) AS na,
SUM(CASE WHEN c = 'b' THEN 1 ELSE 0 END) AS nb FROM t GROUP BY v),
tot AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb FROM h),
cum AS (SELECT SUM(na) OVER (ORDER BY v) AS ca, SUM(nb) OVER (ORDER BY v) AS cb FROM h),
d AS (SELECT MAX(ABS(CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE) -
  CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))) AS dmax FROM cum, tot),
k AS (SELECT ta, tb, dmax,
  1.358 * sqrt(CAST(ta + tb AS DOUBLE) / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))) AS crit
  FROM d, tot)
SELECT ta AS n_a, tb AS n_b, round(dmax, 6) AS ks_stat, round(crit, 6) AS crit_05,
CAST(CASE WHEN dmax > crit THEN 1 ELSE 0 END AS BIGINT) AS reject FROM k""",

    // Benford first-digit audit: obs vs log10(1+1/d) expectation
    "quality_benford" ->
      s"""WITH g AS (SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
FROM lineitem),
h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM g WHERE digit >= 1 GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
s AS (SELECT CAST(digit AS BIGINT) AS digit, n,
round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_share,
round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6) AS exp_share FROM h, t)
SELECT digit, n, obs_share, exp_share,
round(ABS(obs_share - exp_share), 6) AS abs_dev FROM s""",

    // control-char strip (C0 minus \n, plus DEL) → space/tab-run collapse
    // → trim; per-doc before/after audit
    "text_normalize_stats" ->
      raw"""WITH n AS (SELECT doc_id, source, text,
trim(regexp_replace(regexp_replace(text, '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
  '[ \t]+', ' ', 'g')) AS norm FROM documents)
SELECT doc_id, source,
CAST(length(text) AS BIGINT) AS raw_len,
CAST(length(norm) AS BIGINT) AS norm_len,
CAST(length(text) - length(norm) AS BIGINT) AS removed,
CAST(CASE WHEN norm <> text THEN 1 ELSE 0 END AS BIGINT) AS changed FROM n""",

    "sample_lang_balance" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
m AS (SELECT MIN(n_l) AS n_min FROM c),
r AS (SELECT lang, least(1000, (1000 * n_min) // n_l) AS permille FROM c, m)
SELECT doc_id, d.lang AS lang, CAST(permille AS BIGINT) AS permille
FROM documents d JOIN r ON d.lang = r.lang
WHERE ${MD5P("CAST(doc_id AS VARCHAR)")} % 1000 < permille""",

    "text_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, $TOKS AS t FROM documents),
g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 4), ' ') AS gram
FROM toks, unnest(range(1, greatest(len(t) - 3, 1))) s(i) WHERE len(t) >= 5)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs FROM g GROUP BY gram HAVING COUNT(*) >= 3""",

    "text_boilerplate_strip" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
g AS (SELECT doc_id, s, array_to_string(list_slice(toks, s + 1, s + 5), ' ') AS gram
FROM d, unnest(range(0, len(toks) - 4)) t(s) WHERE len(toks) >= 5),
mined AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY gram)
WHERE n_docs >= 3),
cov AS (SELECT doc_id, list_sort(list(DISTINCT s)) AS starts FROM g JOIN mined USING (gram) GROUP BY doc_id),
j AS (SELECT d.doc_id, toks, CASE WHEN starts IS NULL THEN CAST([] AS BIGINT[]) ELSE starts END AS starts
FROM d LEFT JOIN cov USING (doc_id)),
k AS (SELECT doc_id, toks,
list_filter(range(0, len(toks)), p -> len(list_filter(starts, s -> s <= p AND p <= s + 4)) = 0) AS kept FROM j)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
COALESCE(array_to_string(list_transform(kept, p -> toks[p + 1]), ' '), '') AS clean_text FROM k""",

    "text_vocab_coverage" ->
      s"""WITH t AS (SELECT unnest($TOKS) AS tok FROM documents),
f AS (SELECT tok, COUNT(*) AS freq FROM t GROUP BY tok),
tot AS (SELECT CAST(SUM(freq) AS DOUBLE) AS total FROM f),
r AS (SELECT tok, freq,
row_number() OVER (ORDER BY freq DESC, tok ASC) AS rnk,
SUM(freq) OVER (ORDER BY freq DESC, tok ASC ROWS UNBOUNDED PRECEDING) AS cum_freq FROM f)
SELECT tok, CAST(freq AS BIGINT) AS freq, CAST(rnk AS BIGINT) AS rnk,
round(CAST(cum_freq AS DOUBLE) / total, 6) AS coverage
FROM r, tot WHERE rnk <= 20""",

    "text_oov_rate" ->
      s"""WITH t AS (SELECT doc_id, unnest($TOKS) AS tok FROM documents),
f AS (SELECT tok, COUNT(*) AS freq FROM t GROUP BY tok),
r AS (SELECT tok, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rnk FROM f),
v AS (SELECT tok FROM r WHERE rnk <= 20)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
CAST(COUNT(*) FILTER (t.tok NOT IN (SELECT tok FROM v)) AS BIGINT) AS n_oov,
round(CAST(COUNT(*) FILTER (t.tok NOT IN (SELECT tok FROM v)) AS DOUBLE) / COUNT(*), 6) AS oov_rate
FROM t GROUP BY doc_id""",

    "text_zipf_fit" ->
      s"""WITH t AS (SELECT unnest($TOKS) AS tok FROM documents),
f AS (SELECT tok, COUNT(*) AS freq FROM t GROUP BY tok),
r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rnk FROM f),
terms AS (SELECT CAST(round(ln(rnk), 6) AS DECIMAL(28,10)) AS x,
  CAST(round(ln(freq), 6) AS DECIMAL(28,10)) AS y,
  CAST(round(ln(rnk) * ln(rnk), 6) AS DECIMAL(28,10)) AS xx,
  CAST(round(ln(rnk) * ln(freq), 6) AS DECIMAL(28,10)) AS xy FROM r),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(x) AS DOUBLE) AS sx,
  CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(xx) AS DOUBLE) AS sxx,
  CAST(SUM(xy) AS DOUBLE) AS sxy FROM terms)
SELECT CAST(n AS BIGINT) AS n_vocab,
round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept FROM s""",

    // MOSS winnowing: char-5-gram md5 hashes, min per 4-hash window,
    // distinct selected hashes = the doc fingerprint set
    "text_winnow_fps" ->
      s"""WITH $OracleWinnowFps
SELECT doc_id, fph FROM wf""",

    // partial-copy pairs: docs sharing >= 2 winnow fingerprints after
    // dropping boilerplate hashes present in > 50 docs
    "dedup_winnow_pairs" ->
      s"""WITH $OracleWinnowFps,
rare AS (SELECT fph FROM wf GROUP BY fph HAVING COUNT(*) <= 50),
p AS (SELECT wf.doc_id, wf.fph FROM wf JOIN rare USING (fph))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM p a JOIN p b ON a.fph = b.fph AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2""",

    // vocab growth at 10 corpus prefixes; checkpoint = ceil(ndocs*i/10),
    // prefix totals from the per-doc count / first-appearance tables
    "text_heaps_fit" ->
      s"""WITH occ AS (SELECT doc_id, unnest($TOKS) AS tok FROM documents),
nd AS (SELECT COUNT(*) AS ndocs FROM documents),
cps AS (SELECT i, (ndocs * i + 9) // 10 AS cp FROM nd, unnest(range(1, 11)) t(i)),
dc AS (SELECT doc_id, COUNT(*) AS cnt FROM occ GROUP BY doc_id),
fd AS (SELECT tok, MIN(doc_id) AS fdoc FROM occ GROUP BY tok),
nn AS (SELECT i, CAST(SUM(cnt) AS BIGINT) AS n FROM cps JOIN dc ON dc.doc_id < cps.cp GROUP BY i),
vv AS (SELECT i, COUNT(*) AS v FROM cps JOIN fd ON fd.fdoc < cps.cp GROUP BY i),
pts AS (SELECT ln(n) AS lx, ln(v) AS ly FROM nn JOIN vv USING (i)),
terms AS (SELECT CAST(round(lx, 6) AS DECIMAL(28,10)) AS x,
  CAST(round(ly, 6) AS DECIMAL(28,10)) AS y,
  CAST(round(lx * lx, 6) AS DECIMAL(28,10)) AS xx,
  CAST(round(lx * ly, 6) AS DECIMAL(28,10)) AS xy FROM pts),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(x) AS DOUBLE) AS sx,
  CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(xx) AS DOUBLE) AS sxx,
  CAST(SUM(xy) AS DOUBLE) AS sxy FROM terms)
SELECT CAST(n AS BIGINT) AS n_points,
round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept FROM s""",

    "text_span_corrupt" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
ex AS (SELECT doc_id, pos, toks[pos] AS tok FROM t, unnest(range(1, len(toks) + 1)) u(pos)),
s AS (SELECT doc_id, pos, tok,
  (${MD5P("CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")} % 10 = 0) AS st FROM ex),
w AS (SELECT *, (coalesce(st, false)
  OR coalesce(lag(st, 1) OVER (PARTITION BY doc_id ORDER BY pos), false)
  OR coalesce(lag(st, 2) OVER (PARTITION BY doc_id ORDER BY pos), false)) AS masked FROM s),
r AS (SELECT *, (masked AND NOT coalesce(lag(masked, 1) OVER (PARTITION BY doc_id ORDER BY pos), false)) AS runstart FROM w),
c AS (SELECT *, SUM(CASE WHEN runstart THEN 1 ELSE 0 END)
  OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS runidx FROM r),
p AS (SELECT doc_id, pos, masked,
  CASE WHEN runstart THEN '<extra_id_' || (runidx - 1) || '>'
       WHEN NOT masked THEN tok END AS in_piece,
  CASE WHEN runstart THEN '<extra_id_' || (runidx - 1) || '> ' || tok
       WHEN masked THEN tok END AS tgt_piece FROM c)
SELECT doc_id, CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
CAST(COUNT(CASE WHEN in_piece LIKE '<extra_id_%' THEN 1 END) AS BIGINT) AS n_spans,
coalesce(string_agg(in_piece, ' ' ORDER BY pos), '') AS input_text,
coalesce(string_agg(tgt_piece, ' ' ORDER BY pos), '') AS target_text
FROM p GROUP BY doc_id""",

    "text_chunks" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
nz AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0)
SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
CAST(len(list_slice(toks, s + 1, least(s + 32, n))) AS BIGINT) AS n_tokens,
array_to_string(list_slice(toks, s + 1, least(s + 32, n)), ' ') AS chunk
FROM nz, unnest(range(0, n, 24)) t(s)""",

    "text_dsir_weight" -> OracleDsir,

    "sample_dsir" ->
      s"""WITH w AS ($OracleDsir),
n AS (SELECT COUNT(*) AS n FROM w),
u AS (SELECT doc_id, dsir_weight,
  (CAST(('0x' || substring(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0 AS uu
  FROM w),
k AS (SELECT doc_id, dsir_weight, round(dsir_weight - ln(-ln(uu)), 6) AS gumbel_key FROM u),
r AS (SELECT *, row_number() OVER (ORDER BY gumbel_key DESC, doc_id ASC) AS rnk FROM k)
SELECT doc_id, dsir_weight, gumbel_key, CAST(rnk AS BIGINT) AS rnk
FROM r, n WHERE rnk <= (n * 250 + 999) // 1000""",

    "dedup_dupfreq_hist" ->
      s"""WITH g AS (SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
COUNT(*) AS dup_ct FROM documents GROUP BY fp)
SELECT dup_ct, COUNT(*) AS n_groups, dup_ct * COUNT(*) AS n_docs FROM g GROUP BY dup_ct""",

    "text_char_entropy" ->
      """WITH ch AS (SELECT doc_id, regexp_extract_all(text, '.') AS cs FROM documents),
d AS (SELECT doc_id, cs, CAST(len(cs) AS DOUBLE) AS n, list_sort(list_distinct(cs)) AS u FROM ch)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
round(list_reduce(list_prepend(0.0, list_transform(u,
  c -> -((CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE)/n) * ln(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE)/n)))), (a,b) -> a+b), 6) AS entropy
FROM d""",

    "dedup_simhash" ->
      s"""WITH toks AS (SELECT doc_id, list_sort(list_distinct($TOKS)) AS t FROM documents),
hs AS (SELECT doc_id, list_transform(t, w -> ${MD5P("w")}) AS h FROM toks)
SELECT doc_id, CAST(list_sum(list_transform(range(0, 32),
i -> CASE WHEN 2 * len(list_filter(h, x -> ((x >> i) & 1) = 1)) > len(h)
THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash FROM hs""",

    "dedup_simhash_pairs" ->
      s"""WITH toks AS (SELECT doc_id, list_sort(list_distinct($TOKS)) AS t FROM documents),
hs AS (SELECT doc_id, list_transform(t, w -> ${MD5P("w")}) AS h FROM toks),
sh AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 32),
i -> CASE WHEN 2 * len(list_filter(h, x -> ((x >> i) & 1) = 1)) > len(h)
THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash FROM hs),
blocked AS (SELECT doc_id, simhash, bk, (simhash >> (bk * 8)) & 255 AS block_key
FROM sh, (SELECT unnest(range(0, 4)) AS bk) t),
pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.simhash AS sa, y.simhash AS sb
FROM blocked x JOIN blocked y ON x.bk = y.bk AND x.block_key = y.block_key AND x.doc_id < y.doc_id)
SELECT doc_a, doc_b, CAST(len(list_filter(range(0, 32), i -> ((xor(sa, sb) >> i) & 1) = 1)) AS INTEGER) AS hamming
FROM pairs WHERE len(list_filter(range(0, 32), i -> ((xor(sa, sb) >> i) & 1) = 1)) <= 3""",

    "dedup_ngram_jaccard" -> OracleNgramJaccard,

    "dedup_containment" -> OracleContainment,
    "dedup_containment_prefix" -> OracleContainment,

    // the prefix-filtered join must produce the IDENTICAL pair set — same
    // oracle, independently gated
    "dedup_ngram_prefix" -> OracleNgramJaccard,

    // the cost-based dispatcher returns one of the two gated renderings —
    // same oracle again, so whichever route the data picks is verified
    "dedup_ngram_adaptive" -> OracleNgramJaccard,

    "dedup_passage_strip" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
nz AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
p AS (SELECT doc_id, CAST(s // 32 AS BIGINT) AS pidx,
array_to_string(list_slice(toks, s + 1, least(s + 32, n)), ' ') AS passage
FROM nz, unnest(range(0, n, 32)) t(s)),
r AS (SELECT doc_id, pidx, passage,
row_number() OVER (PARTITION BY passage ORDER BY doc_id, pidx) AS rk FROM p)
SELECT doc_id, COUNT(*) AS n_passages,
CAST(COUNT(*) FILTER (WHERE rk = 1) AS BIGINT) AS n_kept,
coalesce(array_to_string(list(passage ORDER BY pidx ASC) FILTER (WHERE rk = 1), ' '), '') AS text_clean
FROM r GROUP BY doc_id""",

    "mine_contrastive" ->
      s"""WITH pairs AS ($OracleNgramJaccard),
sym AS (SELECT doc_a, doc_b, jaccard FROM pairs
UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b, jaccard FROM pairs),
docs AS (SELECT doc_id, source FROM documents),
anchors AS (SELECT DISTINCT s.doc_a, d.source FROM sym s JOIN docs d ON d.doc_id = s.doc_a),
cand AS (SELECT a.doc_a, c.doc_id AS cand FROM anchors a
JOIN docs c ON c.source = a.source AND c.doc_id <> a.doc_a
WHERE NOT EXISTS (SELECT 1 FROM sym s WHERE s.doc_a = a.doc_a AND s.doc_b = c.doc_id)),
neg AS (SELECT doc_a, (min(struct_pack(k := md5(doc_a || ':' || cand), c := cand))).c AS negative
FROM cand GROUP BY doc_a)
SELECT s.doc_a AS anchor, s.doc_b AS positive, n.negative, s.jaccard AS pos_jaccard
FROM sym s JOIN neg n ON n.doc_a = s.doc_a""",

    "dedup_jaccard_knn" ->
      s"""WITH pairs AS ($OracleNgramJaccard),
sym AS (SELECT doc_a, doc_b, jaccard FROM pairs
UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b, jaccard FROM pairs),
r AS (SELECT doc_a AS doc_id, doc_b AS neighbor, jaccard,
row_number() OVER (PARTITION BY doc_a ORDER BY jaccard DESC, doc_b ASC) AS rank FROM sym)
SELECT doc_id, rank, neighbor, jaccard FROM r WHERE rank <= 3""",

    "dedup_embedding" ->
      s"""WITH $embNorms
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.emb", "b.emb", "a.nrm", "b.nrm")} AS cos
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ${cosSql("a.emb", "b.emb", "a.nrm", "b.nrm")} >= 0.4""",

    "ann_lsh_topk" ->
      s"""WITH $embNorms,
$LshBuckets,
q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn, bucket FROM nb WHERE vec_id < 10),
c AS (SELECT query_id, a.vec_id AS neighbor_id, ${cosSql("qe", "a.emb", "qn", "a.nrm")} AS cos
FROM nb a JOIN q USING (bucket) WHERE a.vec_id <> query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    "ann_lsh_multiprobe" ->
      s"""WITH $embNorms,
$LshBuckets,
q0 AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn, bucket AS own FROM nb WHERE vec_id < 10),
q AS (SELECT query_id, qe, qn, CASE WHEN f = -1 THEN own
  ELSE xor(own, CAST(1 AS BIGINT) << f) END AS bucket FROM q0, unnest(range(-1, 8)) t(f)),
c AS (SELECT query_id, a.vec_id AS neighbor_id, ${cosSql("qe", "a.emb", "qn", "a.nrm")} AS cos
FROM nb a JOIN q USING (bucket) WHERE a.vec_id <> query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    // PQ-ADC: 16 subspaces of 4 dims, 16-centroid codebook per subspace
    // (seeds = first 16 vectors + one decimal-exact Lloyd iteration),
    // approximate cosine from the code lookup table over true norms
    "ann_pq_topk" ->
      s"""WITH $embNorms,
$OraclePqCtes,
sc AS (SELECT l.query_id, k.vec_id AS neighbor_id, SUM(l.pd) AS spd
  FROM codes k JOIN lut l ON l.s = k.s AND l.cell = k.code AND k.vec_id <> l.query_id GROUP BY 1, 2),
$OraclePqFinish""",

    // IVF-PQ: same trained codebook + ADC table as ann_pq_topk, same
    // coarse quantizer as ann_ivf_topk; the scoring join additionally
    // requires the candidate's IVF cell to be probed by the query
    "ann_ivfpq_topk" ->
      s"""WITH $embNorms,
$OraclePqCtes,
icents AS (SELECT vec_id AS icell, emb AS ice, nrm AS icn FROM n WHERE vec_id < 8),
irk AS (SELECT vec_id, icell, row_number() OVER (PARTITION BY vec_id ORDER BY icos DESC, icell ASC) AS icrk FROM
  (SELECT a.vec_id, icell, ${cosSql("a.emb", "ice", "a.nrm", "icn")} AS icos FROM n a CROSS JOIN icents)),
cellof AS (SELECT vec_id, icell FROM irk WHERE icrk = 1),
iprobes AS (SELECT vec_id AS p_query, icell FROM irk WHERE vec_id < 10 AND icrk <= 2),
sc AS (SELECT l.query_id, k.vec_id AS neighbor_id, SUM(l.pd) AS spd
  FROM codes k JOIN cellof co ON co.vec_id = k.vec_id JOIN iprobes p ON p.icell = co.icell
  JOIN lut l ON l.query_id = p.p_query AND l.s = k.s AND l.cell = k.code AND k.vec_id <> l.query_id
  GROUP BY 1, 2),
$OraclePqFinish""",

    // tuned PQ operating point: 32 subspaces × 2 dims, 2 Lloyd rounds —
    // same machinery, the parameters the ANN scale sweep gates recall on
    "ann_pq_tuned" ->
      s"""WITH $embNorms,
$OraclePqTunedCtes,
sc AS (SELECT l.query_id, k.vec_id AS neighbor_id, SUM(l.pd) AS spd
  FROM codes k JOIN lut l ON l.s = k.s AND l.cell = k.code AND k.vec_id <> l.query_id GROUP BY 1, 2),
$OraclePqFinish""",

    // the gated sweep config exactly: tuned codebook + nProbe 3 coarse
    // pruning + depth-50 exact rerank (FAISS IVF-PQ + refine)
    "ann_ivfpq_tuned" ->
      s"""WITH $embNorms,
$OraclePqTunedCtes,
icents AS (SELECT vec_id AS icell, emb AS ice, nrm AS icn FROM n WHERE vec_id < 8),
irk AS (SELECT vec_id, icell, row_number() OVER (PARTITION BY vec_id ORDER BY icos DESC, icell ASC) AS icrk FROM
  (SELECT a.vec_id, icell, ${cosSql("a.emb", "ice", "a.nrm", "icn")} AS icos FROM n a CROSS JOIN icents)),
cellof AS (SELECT vec_id, icell FROM irk WHERE icrk = 1),
iprobes AS (SELECT vec_id AS p_query, icell FROM irk WHERE vec_id < 10 AND icrk <= 3),
sc AS (SELECT l.query_id, k.vec_id AS neighbor_id, SUM(l.pd) AS spd
  FROM codes k JOIN cellof co ON co.vec_id = k.vec_id JOIN iprobes p ON p.icell = co.icell
  JOIN lut l ON l.query_id = p.p_query AND l.s = k.s AND l.cell = k.code AND k.vec_id <> l.query_id
  GROUP BY 1, 2),
fin AS (SELECT query_id, neighbor_id, round(CAST(spd AS DOUBLE) / (qn.nrm * nn.nrm), 6) AS acos
  FROM sc JOIN n qn ON qn.vec_id = sc.query_id JOIN n nn ON nn.vec_id = sc.neighbor_id),
short AS (SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY acos DESC, neighbor_id ASC) AS srnk FROM fin)
  WHERE srnk <= 50),
c AS (SELECT query_id, neighbor_id, ${cosSql("qn.emb", "nn.emb", "qn.nrm", "nn.nrm")} AS cos
  FROM short JOIN n qn ON qn.vec_id = query_id JOIN n nn ON nn.vec_id = neighbor_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    // PQ-ADC shortlist (depth 50) + exact full-dim rerank — the FAISS
    // refine composition; the shortlist ranks by the same acos as
    // ann_pq_tuned, the final top-5 by true cosine
    "ann_pq_rerank" ->
      s"""WITH $embNorms,
$OraclePqTunedCtes,
sc AS (SELECT l.query_id, k.vec_id AS neighbor_id, SUM(l.pd) AS spd
  FROM codes k JOIN lut l ON l.s = k.s AND l.cell = k.code AND k.vec_id <> l.query_id GROUP BY 1, 2),
fin AS (SELECT query_id, neighbor_id, round(CAST(spd AS DOUBLE) / (qn.nrm * nn.nrm), 6) AS acos
  FROM sc JOIN n qn ON qn.vec_id = sc.query_id JOIN n nn ON nn.vec_id = sc.neighbor_id),
short AS (SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY acos DESC, neighbor_id ASC) AS srnk FROM fin)
  WHERE srnk <= 50),
c AS (SELECT query_id, neighbor_id, ${cosSql("qn.emb", "nn.emb", "qn.nrm", "nn.nrm")} AS cos
  FROM short JOIN n qn ON qn.vec_id = query_id JOIN n nn ON nn.vec_id = neighbor_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    // real WAV round-trip: engine synthesizes PCM, RIFF-encodes, chunk-
    // walk decodes, aggregates integer-exactly; the oracle regenerates
    // the closed-form samples directly — equality witnesses the codec
    "multimodal_wav_stats" ->
      """WITH s AS (SELECT doc_id, 200 + doc_id % 57 AS n FROM documents),
sm AS (SELECT doc_id, n, k, (doc_id * 7919 + k * 104729) % 65536 - 32768 AS v
  FROM s, unnest(range(0, n)) t(k)),
lg AS (SELECT doc_id, n, k, v, lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM sm),
agg AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_samples, SUM(v) AS sum_amp, SUM(v * v) AS sum_sq,
  CAST(MAX(abs(v)) AS BIGINT) AS peak,
  CAST(COALESCE(SUM(CASE WHEN pv IS NOT NULL AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END), 0) AS BIGINT) AS zero_crossings
  FROM lg GROUP BY doc_id)
SELECT doc_id AS id, CAST(16000 AS BIGINT) AS sample_rate, n_samples,
  round(CAST(sum_amp AS DOUBLE) / n_samples, 6) AS mean_amp,
  round(sqrt(CAST(sum_sq AS DOUBLE) / n_samples), 6) AS rms,
  zero_crossings, peak FROM agg""",

    // real P6/PPM round-trip: engine synthesizes RGB, encodes a real
    // Netpbm header + raster, header-parse decodes, aggregates channel
    // sums integer-exactly; the oracle regenerates the closed-form pixels
    "multimodal_ppm_stats" ->
      """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS w, CAST(6 + doc_id % 7 AS BIGINT) AS h FROM documents),
px AS (SELECT doc_id, w, h, idx, (doc_id * 31 + idx * 17) % 256 AS v, idx % 3 AS ch, idx // 3 AS p
  FROM d, unnest(range(0, 3 * w * h)) t(idx)),
pix AS (SELECT doc_id, w, h, p,
  MAX(CASE WHEN ch = 0 THEN v END) AS r, MAX(CASE WHEN ch = 1 THEN v END) AS g,
  MAX(CASE WHEN ch = 2 THEN v END) AS b FROM px GROUP BY doc_id, w, h, p),
agg AS (SELECT doc_id, w, h, CAST(COUNT(*) AS BIGINT) AS n_pixels,
  SUM(r) AS sr, SUM(g) AS sg, SUM(b) AS sb,
  CAST(MAX(r * 299 + g * 587 + b * 114) AS BIGINT) AS max_luma_milli
  FROM pix GROUP BY doc_id, w, h)
SELECT doc_id AS id, w AS width, h AS height, n_pixels,
  round(CAST(sr AS DOUBLE) / n_pixels, 6) AS mean_r,
  round(CAST(sg AS DOUBLE) / n_pixels, 6) AS mean_g,
  round(CAST(sb AS DOUBLE) / n_pixels, 6) AS mean_b,
  max_luma_milli FROM agg""",

    // audio resample leg: closed-form regeneration of out[i] = in[⌊i·n/128⌋]
    // over the synthetic PCM; position-weighted checksum is order-sensitive
    "multimodal_wav_resample" ->
      """WITH s AS (SELECT doc_id AS id, 200 + doc_id % 57 AS n FROM documents),
o AS (SELECT id, i, ((id * 7919 + ((i * n) // 128) * 104729) % 65536) - 32768 AS v
FROM s, unnest(range(0, 128)) t(i))
SELECT id, CAST(128 AS BIGINT) AS n_out, CAST(SUM(v) AS BIGINT) AS sum_amp,
CAST(MIN(v) AS BIGINT) AS min_amp, CAST(MAX(v) AS BIGINT) AS max_amp,
CAST(SUM((i + 1) * v) AS BIGINT) AS checksum
FROM o GROUP BY id""",

    // resize leg: closed-form regeneration of the nearest-neighbor
    // ⌊x·w/16⌋/⌊y·h/12⌋ index map over the synthetic raster; the
    // position-weighted checksum fails on any pixel-ORDER mistake
    "multimodal_ppm_resize" ->
      """WITH d AS (SELECT doc_id AS id, CAST(8 + doc_id % 9 AS BIGINT) AS w, CAST(6 + doc_id % 7 AS BIGINT) AS h FROM documents),
px AS (SELECT id, p, ((p % 16) * w) // 16 AS sx, ((p // 16) * h) // 12 AS sy, w FROM d, unnest(range(0, 192)) t(p)),
ch AS (SELECT id, p,
  ((id * 31 + (3 * (sy * w + sx)) * 17) % 256) AS r,
  ((id * 31 + (3 * (sy * w + sx) + 1) * 17) % 256) AS g,
  ((id * 31 + (3 * (sy * w + sx) + 2) * 17) % 256) AS b FROM px)
SELECT id, CAST(16 AS BIGINT) AS out_w, CAST(12 AS BIGINT) AS out_h,
CAST(SUM(r) AS BIGINT) AS sum_r, CAST(SUM(g) AS BIGINT) AS sum_g, CAST(SUM(b) AS BIGINT) AS sum_b,
CAST(SUM((p + 1) * (299 * r + 587 * g + 114 * b)) AS BIGINT) AS checksum
FROM ch GROUP BY id""",

    // multi-table LSH: 4 independent 8-plane tables over disjoint slices
    // of the hyperplane family (table t = planes t*8..t*8+7); candidates
    // deduped across tables before the single scoring join
    "ann_lsh_multitable" ->
      s"""WITH $embNorms,
nbt AS (SELECT vec_id, t, CAST(list_sum(list_transform(range(0, 8),
  h -> CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(0, 64),
    i -> emb[CAST(i AS INTEGER) + 1] * (CASE WHEN CAST(('0x' || substring(md5((t * 8 + h) || '_' || i), 1, 4)) AS BIGINT) % 2 = 0
      THEN 1.0 ELSE -1.0 END))), (a, c) -> a + c) >= 0
  THEN CAST(1 AS BIGINT) << h ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
  FROM n, unnest(range(0, 4)) tt(t)),
q AS (SELECT vec_id AS query_id, t, bucket FROM nbt WHERE vec_id < 10),
cand AS (SELECT DISTINCT query_id, a.vec_id AS neighbor_id
  FROM nbt a JOIN q USING (t, bucket) WHERE a.vec_id <> query_id),
c AS (SELECT query_id, neighbor_id, ${cosSql("qn.emb", "nn.emb", "qn.nrm", "nn.nrm")} AS cos
  FROM cand JOIN n qn ON qn.vec_id = query_id JOIN n nn ON nn.vec_id = neighbor_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    // add-one smoothing over the corpus vocabulary; per-token terms
    // rounded 10dp (they range to ~1e-9), decimal sum, 6dp final
    "text_kl_per_source" ->
      s"""WITH occ AS (SELECT source, unnest($TOKS) AS tok FROM documents),
cc AS (SELECT tok, COUNT(*) AS cc FROM occ GROUP BY tok),
sc AS (SELECT source, tok, COUNT(*) AS cs FROM occ GROUP BY source, tok),
st AS (SELECT source, COUNT(*) AS ns FROM occ GROUP BY source),
tot AS (SELECT CAST(SUM(cc) AS BIGINT) AS nc, COUNT(*) AS v FROM cc),
grid AS (SELECT st.source, cc.tok, cc.cc, st.ns, coalesce(sc.cs, 0) AS cs, nc, v
  FROM cc CROSS JOIN st LEFT JOIN sc ON sc.source = st.source AND sc.tok = cc.tok, tot),
terms AS (SELECT source,
  round(((cs + 1.0::DOUBLE) / (ns + v)) * ln(((cs + 1.0::DOUBLE) / (ns + v)) / ((cc + 1.0::DOUBLE) / (nc + v))), 10) AS term
  FROM grid)
SELECT source, round(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6) AS kl
FROM terms GROUP BY source""",

    // d=4 hash rows × w=1024 buckets; md5-bucketed so every cell is
    // engine-reproducible; threshold on the ESTIMATE (no false negatives)
    "sketch_cms_tokens" ->
      s"""WITH occ AS (SELECT unnest($TOKS) AS tok FROM documents),
vocab AS (SELECT tok, COUNT(*) AS exact FROM occ GROUP BY tok),
tot AS (SELECT SUM(exact) AS n_total FROM vocab),
wb AS (SELECT tok, exact, j, ${MD5P("concat(j, '_', tok)")} % 1024 AS bucket FROM vocab, unnest([0, 1, 2, 3]) t(j)),
cells AS (SELECT j, bucket, SUM(exact) AS cnt FROM wb GROUP BY j, bucket),
est AS (SELECT tok, exact, MIN(cnt) AS est FROM wb JOIN cells USING (j, bucket) GROUP BY tok, exact)
SELECT tok, CAST(exact AS BIGINT) AS exact, CAST(est AS BIGINT) AS est
FROM est, tot WHERE est * 1000 >= n_total * 2""",

    // positional phrase search: each query doc's first bigram probed
    // against per-position postings, adjacency = pos2 = pos1 + 1
    "index_phrase_match" ->
      s"""WITH ppp AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM (SELECT doc_id, $TOKS AS t FROM documents) d, unnest(range(1, len(t) + 1)) u(i)),
ppq AS (SELECT doc_id AS query_id,
  MAX(CASE WHEN pos = 0 THEN tok END) AS w1,
  MAX(CASE WHEN pos = 1 THEN tok END) AS w2
  FROM ppp WHERE doc_id < 10 AND pos <= 1 GROUP BY doc_id),
ppv AS (SELECT * FROM ppq WHERE w1 IS NOT NULL AND w2 IS NOT NULL),
pm1 AS (SELECT query_id, doc_id, pos FROM ppp JOIN ppv ON tok = w1),
pm2 AS (SELECT query_id AS q2, doc_id AS d2, pos - 1 AS pm1 FROM ppp JOIN ppv ON tok = w2)
SELECT query_id, doc_id, COUNT(*) AS n_occurrences
FROM pm1 JOIN pm2 ON query_id = q2 AND doc_id = d2 AND pos = pm1
GROUP BY query_id, doc_id""",

    // reshard-cost audit: moved fraction under mod vs rendezvous hashing
    // when shards grow 16 -> 17; rendezvous winner = argmax of keyed md5s
    "shard_rebalance" ->
      s"""WITH rsh AS (SELECT doc_id, ${MD5P("CAST(doc_id AS VARCHAR)")} AS h,
  list_transform(range(0, 17), s -> ${MD5P("CAST(doc_id AS VARCHAR) || '_' || CAST(s AS VARCHAR)")}) AS scores
  FROM documents),
rsm AS (SELECT doc_id,
  CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END AS mv_mod,
  CASE WHEN list_position(scores, list_max(scores)) = 17 THEN 1 ELSE 0 END AS mv_rdv FROM rsh)
SELECT 'mod' AS method, COUNT(*) AS n_docs, CAST(SUM(mv_mod) AS BIGINT) AS n_moved,
round(CAST(SUM(mv_mod) AS DOUBLE) / COUNT(*), 6) AS moved_frac FROM rsm
UNION ALL
SELECT 'rendezvous' AS method, COUNT(*) AS n_docs, CAST(SUM(mv_rdv) AS BIGINT) AS n_moved,
round(CAST(SUM(mv_rdv) AS DOUBLE) / COUNT(*), 6) AS moved_frac FROM rsm""",

    // mixture waterfill: sqrt-target weights (6dp terms, decimal-summed
    // normalizer), budget = min over sources of floor(n/w)
    "sample_mixture_plan" ->
      s"""WITH ms AS (SELECT source, CAST(SUM(len($TOKS)) AS BIGINT) AS n_tokens FROM documents GROUP BY source),
mt AS (SELECT SUM(CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(28,10))) AS sq_sum FROM ms),
mw AS (SELECT source, n_tokens,
  round(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) / CAST(sq_sum AS DOUBLE), 6) AS weight FROM ms, mt),
mb AS (SELECT MIN(CAST(floor(CAST(n_tokens AS DOUBLE) / weight) AS BIGINT)) AS budget FROM mw)
SELECT source, n_tokens, weight, budget,
round(weight * CAST(budget AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS rate,
CAST(floor(weight * CAST(budget AS DOUBLE)) AS BIGINT) AS take_tokens
FROM mw, mb""",

    "index_postings" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM (
  SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY doc_id, tok)
SELECT tok AS term, doc_id // 128 AS seg, COUNT(*) AS seg_df, CAST(SUM(tf) AS BIGINT) AS seg_cf,
array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids,
array_to_string(list(tf ORDER BY doc_id), ',') AS tfs
FROM tf GROUP BY term, seg""",

    "retrieval_bm25" ->
      s"""WITH $OracleBm25Ranked
SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rnk, bm25 FROM bmr WHERE rnk <= 10""",

    // retrieval EVAL: P@k / capped recall@k against same-source relevance
    // (the corpus's topical blocks), per query
    "retrieval_eval" ->
      s"""WITH $OracleBm25Ranked,
rtop AS (SELECT query_id, doc_id FROM bmr WHERE rnk <= 10),
rsrc AS (SELECT doc_id, source FROM documents),
rsct AS (SELECT source, COUNT(*) AS src_ct FROM rsrc GROUP BY source),
rq AS (SELECT s.doc_id AS query_id, s.source AS q_src, src_ct - 1 AS n_rel
FROM rsrc s JOIN rsct USING (source) WHERE s.doc_id < 10),
rh AS (SELECT t.query_id, CAST(SUM(CASE WHEN d.source = q.q_src THEN 1 ELSE 0 END) AS BIGINT) AS hits
FROM rtop t JOIN rsrc d ON d.doc_id = t.doc_id JOIN rq q ON q.query_id = t.query_id
GROUP BY t.query_id)
SELECT h.query_id, hits, CAST(n_rel AS BIGINT) AS n_rel,
round(hits / 10.0, 6) AS p_at_k,
CASE WHEN n_rel = 0 THEN 0.0
     ELSE round(CAST(hits AS DOUBLE) / least(n_rel, 10), 6) END AS recall_at_k
FROM rh h JOIN rq q ON q.query_id = h.query_id""",

    // dense leg = brute cosine top-20 (vec_id ≡ doc_id), sparse leg =
    // BM25 top-20, fused by reciprocal-rank with c = 60
    "retrieval_hybrid_rrf" ->
      s"""WITH $OracleHybridFused
SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rnk, rrf FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rnk FROM hf) WHERE rnk <= 10""",

    // stage 1 = the hybrid fused top-10, stage 2 = exact embedding cosine
    // over the candidate list only (the cross-encoder stand-in), top-5
    "retrieval_rerank" ->
      s"""WITH $OracleHybridFused,
hfk AS (SELECT query_id, doc_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rnk FROM hf) WHERE rnk <= 10),
rq AS (SELECT vec_id AS r_qid, emb AS rqe, nrm AS rqn FROM n),
rd2 AS (SELECT vec_id AS r_did, emb AS rde, nrm AS rdn FROM n),
rsc AS (SELECT query_id, doc_id, ${cosSql("rqe", "rde", "rqn", "rdn")} AS ce_score
  FROM hfk JOIN rq ON r_qid = query_id JOIN rd2 ON r_did = doc_id)
SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rnk, ce_score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ce_score DESC, doc_id ASC) AS rnk FROM rsc) WHERE rnk <= 5""",

    "ann_brute_topk" ->
      s"""WITH $embNorms,
q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn FROM n WHERE vec_id < 10),
c AS (SELECT query_id, a.vec_id AS neighbor_id, ${cosSql("qe", "a.emb", "qn", "a.nrm")} AS cos
FROM n a CROSS JOIN q WHERE a.vec_id <> query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    "quantize_int8" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
m AS (SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS ma FROM e)
SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
CAST(floor(emb[i] * 127.0 / ma + 0.5) AS BIGINT) AS qval, ma / 127 AS scale
FROM m, unnest(range(1, len(emb) + 1)) t(i) WHERE ma > 0""",

    "ann_quant_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
m AS (SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS ma FROM e),
qz AS (SELECT vec_id, list_transform(emb, x -> floor(x * 127.0 / ma + 0.5)) AS qv FROM m WHERE ma > 0),
n AS (SELECT vec_id, qv AS emb, sqrt(list_reduce(list_prepend(0.0, list_transform(qv, x -> x * x)), (a, b) -> a + b)) AS nrm FROM qz),
q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn FROM n WHERE vec_id < 10),
c AS (SELECT query_id, a.vec_id AS neighbor_id, ${cosSql("qe", "a.emb", "qn", "a.nrm")} AS cos
FROM n a CROSS JOIN q WHERE a.vec_id <> query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    "ann_filtered_topk" ->
      s"""WITH $embNorms,
q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn FROM n WHERE vec_id < 10),
c AS (SELECT query_id, a.vec_id AS neighbor_id, ${cosSql("qe", "a.emb", "qn", "a.nrm")} AS cos
FROM n a CROSS JOIN q WHERE a.vec_id <> query_id AND a.label >= 5),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    "ann_ivf_topk" ->
      s"""WITH $embNorms,
cents AS (SELECT vec_id AS cell, emb AS ce, nrm AS cn FROM n WHERE vec_id < 8),
scored AS (SELECT a.vec_id, a.emb, a.nrm, cell, ${cosSql("a.emb", "ce", "a.nrm", "cn")} AS c_cos
FROM n a CROSS JOIN cents),
ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cell ASC) AS crk FROM scored),
corpus AS (SELECT vec_id AS neighbor_id, emb, nrm, cell FROM ranked WHERE crk = 1),
probes AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn, cell FROM ranked WHERE vec_id < 10 AND crk <= 2),
c AS (SELECT query_id, neighbor_id, ${cosSql("qe", "a.emb", "qn", "a.nrm")} AS cos
FROM corpus a JOIN probes USING (cell) WHERE neighbor_id <> query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    // one Lloyd iteration: seed = first 8 vectors, assign, exact-decimal
    // element-wise means rounded to 6dp, re-assign
    "dedup_semantic" ->
      s"""WITH $embNorms,
c AS (SELECT vec_id AS cell, emb AS ce, nrm AS cn FROM n WHERE vec_id < 8),
s AS (SELECT a.vec_id, cell, ${cosSql("a.emb", "ce", "a.nrm", "cn")} AS c_cos FROM n a CROSS JOIN c),
asg AS (SELECT vec_id, cell FROM
  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cell ASC) AS crk FROM s) WHERE crk <= 2),
cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id)
SELECT vec_a, vec_b, ${cosSql("a.emb", "b.emb", "a.nrm", "b.nrm")} AS cos
FROM cand JOIN n a ON a.vec_id = vec_a JOIN n b ON b.vec_id = vec_b
WHERE ${cosSql("a.emb", "b.emb", "a.nrm", "b.nrm")} >= 0.4""",

    "kmeans_assign" -> OracleKmeans,
    "embedding_silhouette" -> OracleSilhouette,
    "sample_kcenter" -> OracleKcenter,
    "sample_kcenter_weights" -> OracleKcenterWeights,
    "embedding_labelprop" -> OracleLabelProp,

    // closed-form aHash replay of the codec path: synthetic raster value
    // (bid*31 + j*17 + bid*j*13) % 256 at j = 3*idx + c (the cross term
    // decorrelates bases), two floor index maps (base->variant->8x8
    // thumbnail), bit = luma*64 >= total, byte-block candidates,
    // verified Hamming <= 7
    "multimodal_phash_pairs" -> (s"WITH $OraclePhashBits" + mihTailSql("pbit", "p", 8, 7)),

    // probed-MIH rendering: 16-bit substrings + 1-bit probe expansion is
    // EXACT at radius 7 (pigeonhole), so the oracle is the byte-block one
    "multimodal_phash_probed" -> (s"WITH $OraclePhashBits" + mihTailSql("pbit", "p", 8, 7)),

    // the multi-index scale form: 4x16-bit substrings, radius 3
    "multimodal_phash_mih" -> (s"WITH $OraclePhashBits" + mihTailSql("pbit", "p", 16, 3)),

    // closed-form energy-delta audio fingerprint: plateau raster
    // (bid*7919 + p*104729 + bid*p*p*13) % 65536 - 32768 at p = bk // 16,
    // two nearest-resample floor maps (base->variant->256), 32 window
    // energies, circular delta bits, 4 hash bytes, verified Hamming <= 2
    "multimodal_afp_pairs" -> (s"WITH $OracleAfpBits" + mihTailSql("apb", "w", 8, 2)),

    // probed-MIH rendering, exact at radius 2 — byte-block oracle again
    "multimodal_afp_probed" -> (s"WITH $OracleAfpBits" + mihTailSql("apb", "w", 8, 2)),

    // audio multi-index scale form: 2x16-bit substrings, radius 1
    "multimodal_afp_mih" -> (s"WITH $OracleAfpBits" + mihTailSql("apb", "w", 16, 1)),

    // image cluster collapse: components over mih pairs, keep the
    // highest-resolution variant per cluster
    "multimodal_phash_clusters" -> OraclePhashClusters,

    // audio cluster collapse: components over radius-1 mih pairs, keep
    // the longest clip per cluster
    "multimodal_afp_clusters" ->
      (s"WITH RECURSIVE $OracleAfpBits" + mihPairsCtes("apb", "w", 16) + s""",
cpr AS (SELECT doc_a, doc_b FROM fham WHERE hamming <= 1),
cedges AS (SELECT doc_a AS src, doc_b AS dst FROM cpr UNION ALL SELECT doc_b, doc_a FROM cpr),
creach(id, lab) AS (SELECT doc_id, doc_id FROM documents
UNION SELECT e.dst, r.lab FROM creach r JOIN cedges e ON e.src = r.id),
ccl AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM creach GROUP BY id),
clen AS (SELECT doc_id, cluster_id, 160 + doc_id % 97 AS n_samples FROM ccl),
cr AS (SELECT cluster_id, doc_id, n_samples,
  row_number() OVER (PARTITION BY cluster_id ORDER BY n_samples DESC, doc_id ASC) AS rk,
  COUNT(*) OVER (PARTITION BY cluster_id) AS n_members FROM clen)
SELECT cluster_id, doc_id AS keep_id, CAST(n_samples AS BIGINT) AS n_samples, n_members
FROM cr WHERE rk = 1"""),
    "embedding_fisher" ->
      """WITH ef AS (SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i)),
fcm AS (SELECT label, dim, COUNT(*) AS nc,
  round(CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mu
  FROM ef GROUP BY label, dim),
fgm AS (SELECT dim, round(CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS gmu
  FROM ef GROUP BY dim),
fw AS (SELECT ef.dim,
  round(CAST(SUM(CAST(round((v - mu) * (v - mu), 6) AS DECIMAL(28,10))) AS DOUBLE), 6) AS within_ss
  FROM ef JOIN fcm ON ef.label = fcm.label AND ef.dim = fcm.dim GROUP BY ef.dim),
fb AS (SELECT fcm.dim,
  round(CAST(SUM(CAST(round(nc * (mu - gmu) * (mu - gmu), 6) AS DECIMAL(28,10))) AS DOUBLE), 6) AS between_ss
  FROM fcm JOIN fgm ON fcm.dim = fgm.dim GROUP BY fcm.dim)
SELECT CAST(fb.dim AS BIGINT) AS dim, between_ss, within_ss,
  CASE WHEN within_ss = 0.0::DOUBLE THEN 0.0::DOUBLE ELSE round(between_ss / within_ss, 6) END AS fisher
FROM fb JOIN fw ON fb.dim = fw.dim""",

    // bottom-decile centroid affinity per trained cluster
    "embedding_outliers" ->
      s"""WITH km AS ($OracleKmeans),
sz AS (SELECT cluster, COUNT(*) AS n_c FROM km GROUP BY cluster)
SELECT vec_id, cluster, cos, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT km.vec_id, km.cluster, km.cos, sz.n_c,
    row_number() OVER (PARTITION BY km.cluster ORDER BY cos ASC, vec_id ASC) AS rnk
  FROM km JOIN sz USING (cluster))
WHERE rnk * 1000 <= n_c * 100""",

    // Johnson-Lindenstrauss ±1 projection: sign = md5("jl_<j>_<i>")
    // first-4-hex-char parity (the LSH hyperplane derivation under its own
    // namespace); same left-fold order as graft_dot
    "embedding_jl_project" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings)
SELECT vec_id, CAST(j AS BIGINT) AS j,
round(list_reduce(list_prepend(0.0, list_transform(range(0, 64),
  i -> emb[CAST(i AS INTEGER) + 1] * (CASE WHEN CAST(('0x' || substring(md5('jl_' || j || '_' || i), 1, 4)) AS BIGINT) % 2 = 0
    THEN 1.0 ELSE -1.0 END))), (a, c) -> a + c) / sqrt(16.0), 6) AS value
FROM e, unnest(range(0, 16)) t(j)""",

    // brute top-k in the 16-dim projected space (recall vs float brute
    // force is spec-gated, not oracle-checked — the oracle checks the
    // projected-space ranking itself, bit-exact)
    "ann_jl_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
v AS (SELECT vec_id, list_transform(range(0, 16),
  j -> list_reduce(list_prepend(0.0, list_transform(range(0, 64),
    i -> emb[CAST(i AS INTEGER) + 1] * (CASE WHEN CAST(('0x' || substring(md5('jl_' || j || '_' || i), 1, 4)) AS BIGINT) % 2 = 0
      THEN 1.0 ELSE -1.0 END))), (a, c) -> a + c) / sqrt(16.0)) AS proj
  FROM e),
nv AS (SELECT vec_id, proj, sqrt(list_reduce(list_prepend(0.0, list_transform(proj, x -> x * x)), (a, b) -> a + b)) AS pn FROM v),
q AS (SELECT vec_id AS query_id, proj AS qp, pn AS qn FROM nv WHERE vec_id < 10),
c AS (SELECT query_id, a.vec_id AS neighbor_id, ${cosSql("qp", "a.proj", "qn", "a.pn")} AS cos
FROM nv a CROSS JOIN q WHERE a.vec_id <> query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM c)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    // two-stage: depth-100 candidates by projected cosine, exact full-dim
    // rerank of candidates only
    "ann_jl_rerank" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
v AS (SELECT vec_id, emb, list_transform(range(0, 16),
  j -> list_reduce(list_prepend(0.0, list_transform(range(0, 64),
    i -> emb[CAST(i AS INTEGER) + 1] * (CASE WHEN CAST(('0x' || substring(md5('jl_' || j || '_' || i), 1, 4)) AS BIGINT) % 2 = 0
      THEN 1.0 ELSE -1.0 END))), (a, c) -> a + c) / sqrt(16.0)) AS proj
  FROM e),
nv AS (SELECT vec_id, emb, proj,
  sqrt(list_reduce(list_prepend(0.0, list_transform(emb, x -> x * x)), (a, b) -> a + b)) AS nrm,
  sqrt(list_reduce(list_prepend(0.0, list_transform(proj, x -> x * x)), (a, b) -> a + b)) AS pn FROM v),
q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn, proj AS qp, pn AS qpn FROM nv WHERE vec_id < 10),
c AS (SELECT query_id, a.vec_id AS neighbor_id, qe, qn, a.emb AS ne, a.nrm AS nn,
  ${cosSql("qp", "a.proj", "qpn", "a.pn")} AS pcos
FROM nv a CROSS JOIN q WHERE a.vec_id <> query_id),
cand AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, neighbor_id ASC) AS prnk FROM c) WHERE prnk <= 100),
sc AS (SELECT query_id, neighbor_id, ${cosSql("qe", "ne", "qn", "nn")} AS cos FROM cand),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM sc)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos FROM r WHERE rnk <= 5""",

    // distance-distortion audit over the first-40 pair set; both distances
    // from the shared identity ||a-b||^2 = a.a + b.b - 2 a.b
    "embedding_jl_audit" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
v AS (SELECT vec_id, emb, list_transform(range(0, 16),
  j -> list_reduce(list_prepend(0.0, list_transform(range(0, 64),
    i -> emb[CAST(i AS INTEGER) + 1] * (CASE WHEN CAST(('0x' || substring(md5('jl_' || j || '_' || i), 1, 4)) AS BIGINT) % 2 = 0
      THEN 1.0 ELSE -1.0 END))), (a, c) -> a + c) / sqrt(16.0)) AS proj
  FROM e WHERE vec_id < 40),
p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
  ${dotSql("a.emb", "b.emb")} AS oab, ${dotSql("a.emb", "a.emb")} AS oaa, ${dotSql("b.emb", "b.emb")} AS obb,
  ${dotSql("a.proj", "b.proj")} AS pab, ${dotSql("a.proj", "a.proj")} AS paa, ${dotSql("b.proj", "b.proj")} AS pbb
  FROM v a JOIN v b ON a.vec_id < b.vec_id)
SELECT a_id, b_id,
round(sqrt(oaa + obb - 2.0 * oab), 6) AS dist_orig,
round(sqrt(paa + pbb - 2.0 * pab), 6) AS dist_proj,
round(sqrt((paa + pbb - 2.0 * pab) / (oaa + obb - 2.0 * oab)), 6) AS ratio
FROM p""",

    "sample_cluster_balance" ->
      s"""WITH km AS ($OracleKmeans)
SELECT vec_id, cluster, CAST(rnk AS BIGINT) AS rnk FROM
(SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
  ORDER BY ${MD5P("CAST(vec_id AS VARCHAR)")} % 1000000, vec_id) AS rnk FROM km)
WHERE rnk <= 40""",

    // layout / table management
    "profile_columns" ->
      Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")
        .map(c =>
          s"""SELECT '$c' AS col_name, COUNT($c) AS non_null,
CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
CAST(MIN($c) AS VARCHAR) AS min_val, CAST(MAX($c) AS VARCHAR) AS max_val FROM lineitem""")
        .mkString("\nUNION ALL\n"),

    "graph_pagerank" -> {
      // integer micro-unit pipeline (see Graph.pageRank): HALF_UP integer
      // division (2·num + den) DIV (2·den) at every step, bit-exact both engines
      val iters = (1 to 3).map { k =>
        val (prev, cur) = (s"pr${k - 1}", s"pr$k")
        s"""c$k AS (SELECT dst, SUM((2 * pr_u + od) // (2 * od)) AS su
  FROM edges JOIN outdeg USING (src) JOIN $prev ON node = src GROUP BY dst),
$cur AS (SELECT node, (2 * 150000000000 + n) // (2 * n) + (2 * 85 * COALESCE(su, 0) + 100) // 200 AS pr_u
  FROM nodes CROSS JOIN nn LEFT JOIN c$k ON dst = node)"""
      }.mkString(",\n")
      s"""WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (SELECT 'c' || c AS src, 's' || s AS dst FROM pairs
  UNION ALL SELECT 's' || s AS src, 'c' || c AS dst FROM pairs),
outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
pr0 AS (SELECT node, (2 * 1000000000000 + n) // (2 * n) AS pr_u FROM nodes CROSS JOIN nn),
$iters
SELECT node, CAST(pr_u AS DOUBLE) / 1000000000000.0 AS pagerank FROM pr3"""
    },

    "graph_triangles" ->
      s"""WITH pl AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS pa, b.p AS pb FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p),
deg AS (SELECT v, COUNT(*) AS d FROM (
  SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e) GROUP BY v),
tri AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
tv AS (SELECT v, COUNT(*) AS tri_ct FROM (
  SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri UNION ALL SELECT z AS v FROM tri)
  GROUP BY v)
SELECT deg.v AS part_id, deg.d AS degree, COALESCE(tri_ct, 0) AS tri_ct,
round(CASE WHEN d >= 2 THEN 2.0 * COALESCE(tri_ct, 0) / (CAST(d AS DOUBLE) * (d - 1))
  ELSE 0.0 END, 6) AS clust_coeff
FROM deg LEFT JOIN tv ON deg.v = tv.v""",

    // per-key count distribution facts for events.user_id as a shuffle
    // key: Gini via the rank identity 2·Σ i·cᵢ/(n·Σc) − (n+1)/n (counts
    // ascending), salt factor = ceil(max/mean)
    "layout_skew_profile" ->
      s"""WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
r AS (SELECT c, row_number() OVER (ORDER BY c ASC, user_id ASC) AS rnk FROM c)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
CAST(SUM(c) AS BIGINT) AS total_rows,
CAST(MAX(c) AS BIGINT) AS max_count,
round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top1_share,
round(2.0 * CAST(SUM(rnk * c) AS DOUBLE) /
  (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) -
  CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS gini,
CAST((MAX(c) * COUNT(*) + SUM(c) - 1) // SUM(c) AS BIGINT) AS salt_factor
FROM r""",

    "layout_partitioned" ->
      s"""SELECT l_returnflag, COUNT(*) AS line_ct,
CAST(SUM(${DEC("l_extendedprice")}) AS DOUBLE) AS revenue
FROM lineitem WHERE strftime(l_shipdate, '%Y-%m') = '1997-03'
GROUP BY l_returnflag""",

    // dynamic partition pruning: the quarter predicate arrives through the
    // joined calendar dim, never as a literal on the fact
    "layout_dpp" ->
      s"""WITH cal AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS cal_month
  FROM orders
  WHERE CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) || '-Q' ||
        CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR) = '1997-Q1')
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, COUNT(*) AS line_ct,
CAST(SUM(${DEC("l_extendedprice")}) AS DOUBLE) AS revenue
FROM lineitem JOIN cal ON strftime(l_shipdate, '%Y-%m') = cal_month
GROUP BY 1""",

    // data-quality expectation suite: one report row per rule
    "quality_expectations" ->
      s"""SELECT 'lineitem.l_quantity.range_1_50' AS rule,
  CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS violation_ct,
  CAST(COUNT(*) AS BIGINT) AS checked_ct FROM lineitem
UNION ALL SELECT 'lineitem.l_discount.max_0.07',
  CAST(SUM(CASE WHEN l_discount > 0.07 THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM lineitem
UNION ALL SELECT 'supplier.s_acctbal.nonnegative',
  CAST(SUM(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM supplier
UNION ALL SELECT 'documents.n_chars.positive',
  CAST(SUM(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM documents
UNION ALL SELECT 'events.value.nonnull',
  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM events
UNION ALL SELECT 'orders.o_orderkey.unique',
  CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT), CAST(COUNT(*) AS BIGINT)
  FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL SELECT 'orders.o_custkey.fk_customer',
  CAST((SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
  CAST((SELECT COUNT(*) FROM orders) AS BIGINT)""",

    "text_keyphrases" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
ph0 AS (SELECT doc_id, array_to_string(list_transform(toks,
  w -> CASE WHEN w IN ('the', 'a', 'of', 'and', 'to') THEN '|' ELSE w END), ' ') AS joined FROM t),
ph AS (SELECT doc_id, trim(p) AS phrase FROM ph0, unnest(string_split(joined, '|')) s(p)
  WHERE trim(p) <> ''),
w AS (SELECT doc_id, phrase, CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen,
  unnest(string_split(phrase, ' ')) AS word FROM ph),
ws AS (SELECT doc_id, word,
  CAST(round(CAST(SUM(plen) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS wscore
  FROM w GROUP BY doc_id, word),
dp AS (SELECT DISTINCT doc_id, phrase FROM ph),
pw AS (SELECT doc_id, phrase, unnest(string_split(phrase, ' ')) AS word FROM dp),
ps AS (SELECT doc_id, phrase, round(CAST(SUM(wscore) AS DOUBLE), 6) AS score
  FROM pw JOIN ws USING (doc_id, word) GROUP BY doc_id, phrase),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, phrase ASC) AS rnk FROM ps)
SELECT doc_id, phrase, CAST(rnk AS BIGINT) AS rnk, score FROM r WHERE rnk <= 3""",

    "text_topngram_frac" ->
      s"""WITH base AS (SELECT doc_id, $TOKS AS toks FROM documents WHERE len($TOKS) >= 2),
b2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM base),
g AS (
  SELECT doc_id, n_tokens, 2 AS n, array_to_string(list_slice(toks, i, i + 1), ' ') AS gram
    FROM b2, unnest(range(1, len(toks))) s(i)
  UNION ALL
  SELECT doc_id, n_tokens, 3 AS n, array_to_string(list_slice(toks, i, i + 2), ' ') AS gram
    FROM b2, unnest(range(1, len(toks) - 1)) s(i) WHERE len(toks) >= 3
  UNION ALL
  SELECT doc_id, n_tokens, 4 AS n, array_to_string(list_slice(toks, i, i + 3), ' ') AS gram
    FROM b2, unnest(range(1, len(toks) - 2)) s(i) WHERE len(toks) >= 4),
ct AS (SELECT doc_id, n_tokens, n, gram, COUNT(*) AS ct FROM g GROUP BY 1, 2, 3, 4),
mx AS (SELECT doc_id, n_tokens, n, MAX(ct) AS maxct FROM ct GROUP BY 1, 2, 3)
SELECT doc_id, n_tokens,
round(CAST(2 * COALESCE(MAX(CASE WHEN n = 2 THEN maxct END), 0) AS DOUBLE) / n_tokens, 6) AS top2_frac,
round(CAST(3 * COALESCE(MAX(CASE WHEN n = 3 THEN maxct END), 0) AS DOUBLE) / n_tokens, 6) AS top3_frac,
round(CAST(4 * COALESCE(MAX(CASE WHEN n = 4 THEN maxct END), 0) AS DOUBLE) / n_tokens, 6) AS top4_frac
FROM mx GROUP BY doc_id, n_tokens""",

    "layout_bucketed_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS line_ct,
CAST(SUM(${DEC("l_extendedprice")} * (${DEC("1")} - ${DEC("l_discount")})) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority""",

    "layout_zorder" -> {
      val z = (0 until 16).flatMap(i => Seq(
        s"(((l_partkey >> $i) & 1) << ${2 * i})",
        s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
l_partkey, l_suppkey, CAST($z AS BIGINT) AS zval,
CAST(($z) >> 27 AS BIGINT) AS zbucket FROM lineitem"""
    },

    "skew_salted_distinct" ->
      "SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users FROM events GROUP BY event_type",

    // corpus mining
    "mine_bitext" ->
      s"""WITH $embNorms,
j AS (SELECT vec_id, lang, emb, nrm FROM n JOIN documents ON vec_id = doc_id),
src AS (SELECT vec_id AS src_id, lang AS src_lang, emb AS se, nrm AS sn FROM j WHERE lang <> 'en'),
tgt AS (SELECT vec_id AS tgt_id, emb AS te, nrm AS tn FROM j WHERE lang = 'en'),
sc AS (SELECT src_id, src_lang, tgt_id, ${cosSql("se", "te", "sn", "tn")} AS cos
FROM src CROSS JOIN tgt),
w AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id ASC) AS rnk,
round(cos - lead(cos) OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id ASC), 6) AS margin FROM sc)
SELECT src_id, src_lang, tgt_id, cos, margin FROM w WHERE rnk = 1 AND cos >= 0.3""",

    "mine_bitext_lsh" ->
      s"""WITH $embNorms,
$LshBuckets,
j AS (SELECT vec_id, lang, emb, nrm, bucket FROM nb JOIN documents ON vec_id = doc_id),
s0 AS (SELECT vec_id AS src_id, lang AS src_lang, emb AS se, nrm AS sn, bucket AS own FROM j WHERE lang <> 'en'),
s AS (SELECT src_id, src_lang, se, sn, CASE WHEN f = -1 THEN own
  ELSE xor(own, CAST(1 AS BIGINT) << f) END AS bucket FROM s0, unnest(range(-1, 8)) t(f)),
t AS (SELECT vec_id AS tgt_id, emb AS te, nrm AS tn, bucket FROM j WHERE lang = 'en'),
c AS (SELECT src_id, src_lang, tgt_id, ${cosSql("se", "te", "sn", "tn")} AS cos FROM t JOIN s USING (bucket)),
w AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id ASC) AS rnk,
round(cos - lead(cos) OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id ASC), 6) AS margin FROM c)
SELECT src_id, src_lang, tgt_id, cos, margin FROM w WHERE rnk = 1 AND cos >= 0.3""",

    "er_blocked_pairs" ->
      """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
a.c_name AS a_name, b.c_name AS b_name,
CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2""",

    "er_sorted_neighborhood" ->
      """WITH r AS (SELECT c_custkey, c_name,
row_number() OVER (ORDER BY c_name, c_custkey) AS rnk FROM customer)
SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
a.c_name AS a_name, b.c_name AS b_name,
CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 4
WHERE levenshtein(a.c_name, b.c_name) <= 2""",

    "er_entities" ->
      s"""$OracleErReach
SELECT id AS c_custkey, MIN(lab) AS entity_id FROM reach GROUP BY id""",

    "er_golden_records" ->
      s"""$OracleErReach,
lbl AS (SELECT id AS c_custkey, MIN(lab) AS entity_id FROM reach GROUP BY id),
m AS (SELECT l.entity_id, c.c_custkey, c.c_name, CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal, c.c_mktsegment
FROM lbl l JOIN customer c USING (c_custkey))
SELECT entity_id, COUNT(*) AS n_members, MIN(c_custkey) AS canonical_key,
(max(struct_pack(b := bal, k := -c_custkey, nm := c_name))).nm AS best_name,
CAST(SUM(bal) AS DOUBLE) AS total_balance,
COUNT(DISTINCT c_mktsegment) AS n_segments
FROM m GROUP BY entity_id""",

    "j8_bloom_semi" ->
      s"""SELECT l_returnflag, COUNT(*) AS line_ct,
CAST(SUM(${DEC("l_extendedprice")}) AS DOUBLE) AS revenue
FROM lineitem WHERE l_orderkey IN
(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0)
GROUP BY l_returnflag""",

    // iterative BPE merges, unrolled as one CTE chain per step: pair
    // counts over the step-k symbol strings → 1-row top pair b{k} →
    // double literal replace (same two-pass fuse as the engine)
    "text_bpe_train" -> {
      val steps = (1 to 8).map { k =>
        val (prev, cur) = (s"s${k - 1}", s"s$k")
        s"""p$k AS (SELECT l[i] AS a, l[i + 1] AS b, SUM(wf) AS freq FROM
  (SELECT string_split(trim(sym), ' ') AS l, wf FROM $prev),
  unnest(range(1, len(l))) AS t(i) GROUP BY a, b),
b$k AS (SELECT a, b, CAST(freq AS BIGINT) AS freq FROM p$k
  ORDER BY freq DESC, a ASC, b ASC LIMIT 1),
$cur AS (SELECT replace(replace(sym, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
  ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS sym, wf FROM $prev CROSS JOIN b$k)"""
      }.mkString(",\n")
      val out = (1 to 8)
        .map(k => s"SELECT CAST($k AS BIGINT) AS step, a AS pair_a, b AS pair_b, freq FROM b$k")
        .mkString("\nUNION ALL\n")
      s"""WITH wf AS (SELECT tok AS word, COUNT(*) AS wf FROM
  (SELECT unnest($TOKS) AS tok FROM documents) GROUP BY tok),
s0 AS (SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS sym, wf
  FROM wf WHERE len(word) >= 2),
$steps
$out"""
    },

    "text_bpe_encode" -> {
      // the same 8-step training chain, then the vocabulary (ALL words,
      // single-char included) is encoded with each step's winning pair and
      // docs join the encoded word table for per-doc piece counts
      val steps = (1 to 8).map { k =>
        val (prev, cur) = (s"s${k - 1}", s"s$k")
        s"""p$k AS (SELECT l[i] AS a, l[i + 1] AS b, SUM(wf) AS freq FROM
  (SELECT string_split(trim(sym), ' ') AS l, wf FROM $prev),
  unnest(range(1, len(l))) AS t(i) GROUP BY a, b),
b$k AS (SELECT a, b, CAST(freq AS BIGINT) AS freq FROM p$k
  ORDER BY freq DESC, a ASC, b ASC LIMIT 1),
$cur AS (SELECT replace(replace(sym, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
  ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS sym, wf FROM $prev CROSS JOIN b$k)"""
      }.mkString(",\n")
      val vsteps = (1 to 8).map { k =>
        s"""v$k AS (SELECT word, replace(replace(sym, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
  ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS sym FROM v${k - 1} CROSS JOIN b$k)"""
      }.mkString(",\n")
      s"""WITH wf AS (SELECT tok AS word, COUNT(*) AS wf FROM
  (SELECT unnest($TOKS) AS tok FROM documents) GROUP BY tok),
s0 AS (SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS sym, wf
  FROM wf WHERE len(word) >= 2),
$steps,
v0 AS (SELECT word, ' ' || CASE WHEN len(word) >= 2
  THEN array_to_string(regexp_extract_all(word, '.'), ' ') ELSE word END || ' ' AS sym FROM wf),
$vsteps,
enc AS (SELECT word, CAST(len(string_split(trim(sym), ' ')) AS BIGINT) AS np FROM v8),
d AS (SELECT doc_id, unnest($TOKS) AS word FROM documents)
SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(np) AS BIGINT) AS n_pieces,
round(CAST(SUM(np) AS DOUBLE) / COUNT(*), 6) AS pieces_per_word
FROM d JOIN enc USING (word) GROUP BY doc_id"""
    },
  )
}
