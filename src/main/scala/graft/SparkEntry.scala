package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.dedup.Dedup
import graft.ann.Ann
import graft.textanalysis.TextAnalysis
import graft.multimodal.Multimodal
import graft.pipeline.CorpusClean

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  private def q(f: Tables => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(Tables(s, dir))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // core relational (SURVEY §2)
    "q1_pricing" -> q(Relational.q1Pricing),
    "q3_shipping" -> q(Relational.q3Shipping),
    "q3_bucketed" -> q(graft.storage.Bucketing.q3Bucketed),
    "q5_region_rollup" -> q(Relational.q5RegionRollup),
    "top3_per_category" -> q(Relational.top3PerCategory),
    "blacklist_filter" -> q(Relational.blacklistFilter),
    "kv_extract_count" -> q(Relational.kvExtractCount),
    "q18_large_orders" -> q(Relational.q18LargeOrders),
    "q7_nation_volume" -> q(Relational.q7NationVolume),
    "q10_returned_customers" -> q(Relational.q10ReturnedCustomers),
    "q16_supplier_diversity" -> q(Relational.q16SupplierDiversity),
    "q14_promo_share" -> q(Relational.q14PromoShare),
    "q2_min_cost_supplier" -> q(RelationalTpch.q2MinCostSupplier),
    "q4_priority_exists" -> q(RelationalTpch.q4PriorityExists),
    "q9_product_profit" -> q(RelationalTpch.q9ProductProfit),
    "q11_important_parts" -> q(RelationalTpch.q11ImportantParts),
    "q12_priority_class" -> q(RelationalTpch.q12PriorityClass),
    "q13_order_distribution" -> q(RelationalTpch.q13OrderDistribution),
    "q15_top_supplier" -> q(RelationalTpch.q15TopSupplier),
    "q17_small_qty_revenue" -> q(RelationalTpch.q17SmallQtyRevenue),
    "q22_churn_balance" -> q(RelationalTpch.q22ChurnBalance),
    "q6_forecast_revenue" -> q(RelationalTpch2.q6ForecastRevenue),
    "q8_market_share" -> q(RelationalTpch2.q8MarketShare),
    "q19_bracket_revenue" -> q(RelationalTpch2.q19BracketRevenue),
    "q20_dominant_supplier" -> q(RelationalTpch2.q20DominantSupplier),
    "q21_sole_blame" -> q(RelationalTpch2.q21SoleBlame),
    // wordcount family
    "word_count" -> q(WordCounts.wordCount),
    "word_count_salted" -> q(WordCounts.wordCountSalted),
    "hdfs_word_count" -> q(WordCounts.hdfsWordCount),
    "persist_word_count" -> q(WordCounts.persistWordCount),
    "running_count" -> q(WordCounts.runningCount),
    // windowed
    "tumbling_counts" -> q(Windows.tumblingCounts),
    "sliding_counts" -> q(Windows.slidingCounts),
    "window_hot_word" -> q(Windows.windowHotWord),
    "sessionize" -> q(Windows.sessionize),
    "sessionize_split" -> q(Windows.sessionizeSplit),
    "event_stats" -> q(Windows.eventStats),
    // rows-only driver check: quantile sketches are engine-specific, so
    // there is deliberately no oracleSql entry (WindowsSpec pins values
    // against the exact event_stats instead)
    "event_stats_approx" -> q(t => Windows.eventStatsApprox(t)),
    "event_stats_bounded" -> q(Windows.eventStatsBounded),
    // dedup family (LLM pipeline)
    "dedup_exact" -> q(Dedup.dedupExact),
    "dedup_ngram_jaccard" -> q(t => Dedup.dedupNgramJaccard(t)),
    "dedup_ngram_jaccard_mat" -> q(Dedup.dedupNgramJaccardMat),
    "dedup_ngram_jaccard_bucketed" -> q(Dedup.dedupNgramJaccardBucketed),
    "dedup_minhash" -> q(Dedup.dedupMinhash),
    "dedup_minhash_bucketed" -> q(Dedup.dedupMinhashBucketed),
    "dedup_minhash_verified" -> q(Dedup.dedupMinhashVerified),
    "dedup_minhash_verified_mat" -> q(Dedup.dedupMinhashVerifiedMat),
    "dedup_minhash_verified_salted" -> q(Dedup.dedupMinhashVerifiedSalted),
    "dedup_pair_evidence" -> q(Dedup.dedupPairEvidence),
    "dedup_clusters" -> q(Dedup.nearDupClusters),
    "dedup_cluster_rank" -> q(Dedup.clusterRank),
    "dedup_clusters_delta" -> q(Dedup.nearDupClustersDelta),
    "dedup_simhash" -> q(t => Dedup.dedupSimhash(t)),
    "dedup_simhash_mat" -> q(Dedup.dedupSimhashMat),
    "dedup_embedding" -> q(Dedup.dedupEmbedding),
    "dedup_embedding_mt" -> q(Dedup.dedupEmbeddingMultitable),
    "dedup_embedding_mp" -> q(t => Dedup.dedupEmbeddingMultiprobe(t)),
    "dedup_containment" -> q(Dedup.dedupContainment),
    "dedup_decontaminate" -> q(Dedup.dedupDecontaminate),
    "dedup_decontaminate_dir" -> q(Dedup.dedupDecontaminateDir),
    "doc_boilerplate_frac" -> q(Dedup.docBoilerplateFrac),
    "embed_dedup_clusters" -> q(Dedup.embedDedupClusters),
    // similarity search
    "embed_topk" -> q(Ann.embedTopK),
    "embed_ann_lsh" -> q(Ann.embedAnnLsh),
    "embed_ann_multiprobe" -> q(t => Ann.embedAnnMultiprobe(t)),
    "embed_ann_ivf" -> q(Ann.embedAnnIvf),
    "embed_ann_pq" -> q(Ann.embedAnnPq),
    "embed_ann_ivf_pq" -> q(Ann.embedAnnIvfPq),
    "embed_ann_ivf_part" -> q(Ann.embedAnnIvfPartitioned),
    "embed_ann_ivf_pq_res" -> q(Ann.embedAnnIvfPqResidual),
    "embed_ann_opq_pq" -> q(graft.ann.Opq.embedAnnOpqPq),
    "ann_recall_report" -> q(Ann.annRecallReport),
    "embed_margin_mine" -> q(Ann.embedMarginMine),
    "contrastive_pairs" -> q(Ann.contrastivePairs),
    // text analysis
    "token_count" -> q(TextAnalysis.tokenCount),
    "lang_id" -> q(TextAnalysis.langId),
    "report_lang_confusion" -> q(TextAnalysis.langIdConfusion),
    "quality_score" -> q(TextAnalysis.qualityScore),
    "doc_fingerprint" -> q(TextAnalysis.docFingerprint),
    "lm_bigram_score" -> q(TextAnalysis.lmBigramScore),
    "quality_repetition" -> q(TextAnalysis.qualityRepetition),
    "tfidf_top_terms" -> q(TextAnalysis.tfidfTopTerms),
    "top_ngrams" -> q(t => TextAnalysis.topNgrams(t)),
    "text_collocations" -> q(TextAnalysis.textCollocations),
    "quality_classify" -> q(graft.textanalysis.QualityModel.qualityClassify),
    "report_distill_confusion" ->
      q(graft.textanalysis.QualityModel.distillConfusion),
    "report_distill_calibration" ->
      q(graft.textanalysis.QualityModel.distillCalibration),
    // rows-only driver check: the BPE greedy fold is not portably
    // SQL-expressible (see rowsOnly) — BpeSpec gates values instead
    "token_count_bpe" -> q(graft.functions.Bpe.tokenCountBpe),
    // multimodal
    "multimodal_meta" -> q(Multimodal.multimodalMeta),
    "multimodal_features" -> q(Multimodal.multimodalFeatures),
    // composite pipeline
    "corpus_clean" -> q(CorpusClean.corpusClean),
    "corpus_clean_neardup" -> q(CorpusClean.corpusCleanNearDup),
    "corpus_clean_clustered" -> q(CorpusClean.corpusCleanClustered),
    // training-mix (LLM pipeline)
    "corpus_sample_stratified" -> q(graft.pipeline.Mixing.sampleStratified),
    "corpus_split" -> q(graft.pipeline.Mixing.corpusSplit),
    "lm_ccnet_bucket" -> q(graft.pipeline.Mixing.ccnetBucket),
    "lm_ccnet_bucket_bounded" -> q(graft.pipeline.Mixing.ccnetBucketBounded),
    "corpus_sample_ccnet" -> q(graft.pipeline.Mixing.sampleCcnet),
    "corpus_sample_temperature" -> q(graft.pipeline.Mixing.sampleTemperature),
    "lm_quality_decile" -> q(graft.pipeline.Mixing.qualityDecile),
    "lm_rebucket_delta" -> q(graft.pipeline.Mixing.rebucketDelta),
    "corpus_admit" -> q(graft.pipeline.Intake.corpusAdmit),
    "corpus_admit_verdicts" -> q(graft.pipeline.Intake.corpusAdmitVerdicts),
    // corpus-audit reports (LLM pipeline)
    "report_stats_by_source" -> q(graft.pipeline.Reports.statsBySource),
    "report_neardup_matrix" -> q(graft.pipeline.Reports.sourceNearDupMatrix),
    "report_dup_matrix" -> q(graft.pipeline.Reports.sourceDupMatrix),
    "shard_manifest" -> q(graft.pipeline.Reports.shardManifest),
    "report_token_histogram" -> q(graft.pipeline.Reports.tokenHistogram),
    "report_mix_rollup" -> q(graft.pipeline.Reports.mixRollup),
    "report_lang_pivot" -> q(graft.pipeline.Reports.langPivot),
    "report_key_skew" -> q(graft.pipeline.Reports.keySkew),
    "report_join_cardinality" -> q(graft.pipeline.Reports.joinCardinality),
    // delete propagation (right-to-be-forgotten)
    "forget_keepers" -> q(graft.pipeline.Forget.forgetKeepers),
    "forget_exact_keepers" -> q(graft.pipeline.Forget.forgetExactKeepers),
    "forget_stats" -> q(graft.pipeline.Forget.forgetStats),
    // export + scrub + soft dedup (LLM pipeline)
    "corpus_shuffle_order" -> q(graft.pipeline.Export.corpusShuffleOrder),
    "corpus_pack" -> q(graft.pipeline.Export.corpusPack),
    "corpus_pack_stats" -> q(graft.pipeline.Export.corpusPackStats),
    "corpus_pack_delta" -> q(graft.pipeline.Export.corpusPackDelta),
    "embed_label_purity" -> q(graft.dedup.Dedup.embedLabelPurity),
    "pii_scrub" -> q(graft.textanalysis.Pii.piiScrub),
    "pii_stats" -> q(graft.textanalysis.Pii.piiStats),
    "dedup_weighted" -> q(graft.dedup.Dedup.dedupWeighted),
    "dedup_clusters_quality" -> q(graft.dedup.Dedup.nearDupClustersQuality),
    // event sequences (as-of / funnel / retention)
    "event_asof_join" -> q(Sequences.eventAsofJoin),
    "event_asof_join_native" -> q(Sequences.eventAsofJoinNative),
    "event_funnel" -> q(Sequences.eventFunnel),
    "event_retention" -> q(Sequences.eventRetention),
    "event_gap_stats" -> q(Sequences.eventGapStats),
    "event_top_paths" -> q(Sequences.eventTopPaths),
    "event_daily_anomaly" -> q(Sequences.eventDailyAnomaly),
    "event_daily_anomaly_robust" -> q(Sequences.eventDailyAnomalyRobust),
    "event_transitions" -> q(Sequences.eventTransitions),
    "event_interval_join" -> q(Sequences.eventIntervalJoin),
    "event_interval_unmatched" -> q(Sequences.eventIntervalUnmatched),
    // bloom membership pre-filter
    "bloom_dup_candidates" -> q(graft.dedup.Bloom.bloomDupCandidates),
    // count-min sketch (bounded-memory frequency estimation)
    "sketch_countmin" -> q(Sketches.countMinSketch),
    "sketch_heavy_hitters" -> q(Sketches.countMinHeavyHitters),
    "sketch_hll_registers" -> q(Sketches.hllRegisters),
    "sketch_hll_merged" -> q(Sketches.hllMergedUniques),
    "event_daily_uniques" -> q(Sketches.eventDailyUniques),
    "sketch_kmv" -> q(Sketches.kmvSketch),
    "sketch_kmv_est" -> q(Sketches.kmvEstimate),
    "report_source_overlap" -> q(Sketches.reportSourceOverlap),
    // rows-only: the linear-counting branch needs libm ln (not
    // bit-portable); SketchesSpec value-gates it (see rowsOnly)
    "event_daily_uniques_est" -> q(Sketches.eventDailyUniquesEst),
    // exact-count sampling (OrderStat threshold, no global sort)
    "corpus_sample_fixed" -> q(graft.pipeline.Mixing.sampleFixed),
    "corpus_sample_quota" -> q(graft.pipeline.Mixing.sampleQuota),
    "corpus_sample_priority" -> q(graft.pipeline.Mixing.samplePriority),
    "corpus_sample_block" -> q(graft.pipeline.Mixing.sampleBlock),
    // data layout (Z-order clustering + zone-map pruning audit)
    "layout_zorder_stats" -> q(Layout.zorderStats),
    "layout_compare" -> q(Layout.layoutCompare),
    "layout_bloom_skip" -> q(Layout.layoutBloomSkip),
    "layout_hilbert_compare" -> q(Layout.layoutHilbertCompare),
    // warehouse maintenance (incremental rollup, compaction planning)
    "event_rollup_incremental" -> q(graft.pipeline.Maintenance.eventRollupIncremental),
    "compaction_plan" -> q(graft.pipeline.Maintenance.compactionPlan),
    "corpus_refresh_merge" -> q(graft.pipeline.Maintenance.corpusRefreshMerge),
    "corpus_refresh_merge_bucketed" ->
      q(graft.pipeline.Maintenance.corpusRefreshMergeBucketed),
    // calendar timeline (gap-filled resample, SCD-2 history)
    "event_gapfill" -> q(Timeline.eventGapfill),
    "scd2_history" -> q(Timeline.scd2History),
    "scd2_history_split" -> q(Timeline.scd2HistorySplit),
    // planner column stats (equi-depth histogram)
    "report_equidepth_hist" -> q(graft.pipeline.Reports.equidepthHist),
    "report_selectivity_est" -> q(graft.pipeline.Reports.selectivityEst),
    "report_equidepth_merge" -> q(graft.pipeline.Reports.equidepthMerge),
    "report_column_stats" -> q(graft.pipeline.Reports.columnStats),
    "plan_join_decisions" -> q(graft.pipeline.Planner.joinDecisions),
    "plan_partition_advisor" -> q(graft.pipeline.Planner.partitionAdvisor),
    "plan_skew_advisor" -> q(graft.pipeline.Planner.skewAdvisor),
    "report_event_freshness" -> q(graft.pipeline.Reports.eventFreshness),
    "corpus_interleave" -> q(graft.pipeline.Export.corpusInterleave),
    "corpus_interleave_delta" -> q(graft.pipeline.Export.corpusInterleaveDelta),
    "report_histogram_drift" -> q(graft.pipeline.Reports.histogramDrift),
    "corpus_mix_solver" -> q(graft.pipeline.Mixing.mixSolver),
    "corpus_sample_waterfill" -> q(graft.pipeline.Mixing.sampleWaterfill)
  )

  /** Queries whose driver check is deliberately rows-only: no portable
    * DuckDB oracle exists (engine-specific sketches etc.). Every entry
    * MUST name the ScalaTest spec that value-gates it instead;
    * ContractSpec enforces that this set, `queries`, and `oracleSql`
    * stay mutually consistent.
    */
  val rowsOnly: Map[String, String] = Map(
    "event_stats_approx" ->
      "WindowsSpec: exact moments match event_stats; sketch rank within 2%",
    "event_daily_uniques_est" ->
      ("SketchesSpec: est6 ≡ hllEstimateFromMoments over the oracle-checked " +
        "moments exactly; within 5% of exact daily uniques"),
    "token_count_bpe" ->
      ("BpeSpec: every row ≡ a JVM reference tokenizer applying the stored " +
        "merge table; fit ≡ the reference merge sequence; chained merges " +
        "pinned on a planted corpus")
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops — such
    * keys must be declared in `rowsOnly` with their spec gate.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> Relational.q1PricingSql,
    "q3_shipping" -> Relational.q3ShippingSql,
    "q3_bucketed" -> Relational.q3ShippingSql,
    "q5_region_rollup" -> Relational.q5RegionRollupSql,
    "top3_per_category" -> Relational.top3PerCategorySql,
    "blacklist_filter" -> Relational.blacklistFilterSql,
    "kv_extract_count" -> Relational.kvExtractCountSql,
    "q18_large_orders" -> Relational.q18LargeOrdersSql,
    "q7_nation_volume" -> Relational.q7NationVolumeSql,
    "q10_returned_customers" -> Relational.q10ReturnedCustomersSql,
    "q16_supplier_diversity" -> Relational.q16SupplierDiversitySql,
    "q14_promo_share" -> Relational.q14PromoShareSql,
    "q2_min_cost_supplier" -> RelationalTpch.q2MinCostSupplierSql,
    "q4_priority_exists" -> RelationalTpch.q4PriorityExistsSql,
    "q9_product_profit" -> RelationalTpch.q9ProductProfitSql,
    "q11_important_parts" -> RelationalTpch.q11ImportantPartsSql,
    "q12_priority_class" -> RelationalTpch.q12PriorityClassSql,
    "q13_order_distribution" -> RelationalTpch.q13OrderDistributionSql,
    "q15_top_supplier" -> RelationalTpch.q15TopSupplierSql,
    "q17_small_qty_revenue" -> RelationalTpch.q17SmallQtyRevenueSql,
    "q22_churn_balance" -> RelationalTpch.q22ChurnBalanceSql,
    "q6_forecast_revenue" -> RelationalTpch2.q6ForecastRevenueSql,
    "q8_market_share" -> RelationalTpch2.q8MarketShareSql,
    "q19_bracket_revenue" -> RelationalTpch2.q19BracketRevenueSql,
    "q20_dominant_supplier" -> RelationalTpch2.q20DominantSupplierSql,
    "q21_sole_blame" -> RelationalTpch2.q21SoleBlameSql,
    "word_count" -> WordCounts.wordCountSql,
    "word_count_salted" -> WordCounts.wordCountSaltedSql,
    "hdfs_word_count" -> WordCounts.hdfsWordCountSql,
    "persist_word_count" -> WordCounts.persistWordCountSql,
    "running_count" -> WordCounts.runningCountSql,
    "tumbling_counts" -> Windows.tumblingCountsSql,
    "sliding_counts" -> Windows.slidingCountsSql,
    "window_hot_word" -> Windows.windowHotWordSql,
    "sessionize" -> Windows.sessionizeSql,
    "sessionize_split" -> Windows.sessionizeSql,
    "event_stats" -> Windows.eventStatsSql,
    "event_stats_bounded" -> Windows.eventStatsBoundedSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_ngram_jaccard_mat" -> Dedup.dedupNgramJaccardSql,
    "dedup_ngram_jaccard_bucketed" -> Dedup.dedupNgramJaccardSql,
    "dedup_minhash" -> Dedup.dedupMinhashSql,
    "dedup_minhash_bucketed" -> Dedup.dedupMinhashSql,
    "dedup_minhash_verified" -> Dedup.dedupMinhashVerifiedSql,
    "dedup_minhash_verified_mat" -> Dedup.dedupMinhashVerifiedSql,
    "dedup_minhash_verified_salted" -> Dedup.dedupMinhashVerifiedSql,
    "dedup_pair_evidence" -> Dedup.dedupPairEvidenceSql,
    "dedup_clusters" -> Dedup.nearDupClustersSql,
    "dedup_cluster_rank" -> Dedup.clusterRankSql,
    "dedup_clusters_delta" -> Dedup.nearDupClustersDeltaSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "dedup_simhash_mat" -> Dedup.dedupSimhashSql,
    "dedup_embedding" -> Dedup.dedupEmbeddingSql,
    "dedup_embedding_mt" -> Dedup.dedupEmbeddingMultitableSql,
    "dedup_embedding_mp" -> Dedup.dedupEmbeddingMultiprobeSql,
    "dedup_containment" -> Dedup.dedupContainmentSql,
    "dedup_decontaminate" -> Dedup.dedupDecontaminateSql,
    "dedup_decontaminate_dir" -> Dedup.dedupDecontaminateDirSql,
    "doc_boilerplate_frac" -> Dedup.docBoilerplateFracSql,
    "embed_dedup_clusters" -> Dedup.embedDedupClustersSql,
    "embed_topk" -> Ann.embedTopKSql,
    "embed_ann_lsh" -> Ann.embedAnnLshSql,
    "embed_ann_multiprobe" -> Ann.embedAnnMultiprobeSql,
    "embed_ann_ivf" -> Ann.embedAnnIvfSql,
    "embed_ann_pq" -> Ann.embedAnnPqSql,
    "embed_ann_ivf_pq" -> Ann.embedAnnIvfPqSql,
    "embed_ann_ivf_part" -> Ann.embedAnnIvfSql,
    "embed_ann_ivf_pq_res" -> Ann.embedAnnIvfPqResidualSql,
    // inlines the per-corpus fitted rotation — Verify runs the query
    // (which fits + persists it) before dumping this SQL
    "embed_ann_opq_pq" -> graft.ann.Opq.embedAnnOpqPqSql,
    "ann_recall_report" -> Ann.annRecallReportSql,
    "embed_margin_mine" -> Ann.embedMarginMineSql,
    "contrastive_pairs" -> Ann.contrastivePairsSql,
    "token_count" -> TextAnalysis.tokenCountSql,
    "lang_id" -> TextAnalysis.langIdSql,
    "report_lang_confusion" -> TextAnalysis.langIdConfusionSql,
    "quality_score" -> TextAnalysis.qualityScoreSql,
    "doc_fingerprint" -> TextAnalysis.docFingerprintSql,
    "lm_bigram_score" -> TextAnalysis.lmBigramScoreSql,
    "quality_repetition" -> TextAnalysis.qualityRepetitionSql,
    "tfidf_top_terms" -> TextAnalysis.tfidfTopTermsSql,
    "top_ngrams" -> TextAnalysis.topNgramsSql,
    "text_collocations" -> TextAnalysis.textCollocationsSql,
    // inlines the per-corpus fitted weights — Verify runs the query
    // (which fits + persists them) before dumping this SQL
    "quality_classify" -> graft.textanalysis.QualityModel.qualityClassifySql,
    "report_distill_confusion" ->
      graft.textanalysis.QualityModel.distillConfusionSql,
    "report_distill_calibration" ->
      graft.textanalysis.QualityModel.distillCalibrationSql,
    "multimodal_meta" -> Multimodal.multimodalMetaSql,
    "multimodal_features" -> Multimodal.multimodalFeaturesSql,
    "corpus_clean" -> CorpusClean.corpusCleanSql,
    "corpus_clean_neardup" -> CorpusClean.corpusCleanNearDupSql,
    "corpus_clean_clustered" -> CorpusClean.corpusCleanClusteredSql,
    "corpus_sample_stratified" -> graft.pipeline.Mixing.sampleStratifiedSql,
    "corpus_split" -> graft.pipeline.Mixing.corpusSplitSql,
    "lm_ccnet_bucket" -> graft.pipeline.Mixing.ccnetBucketSql,
    "lm_ccnet_bucket_bounded" -> graft.pipeline.Mixing.ccnetBucketBoundedSql,
    "corpus_sample_ccnet" -> graft.pipeline.Mixing.sampleCcnetSql,
    "corpus_sample_temperature" -> graft.pipeline.Mixing.sampleTemperatureSql,
    "lm_quality_decile" -> graft.pipeline.Mixing.qualityDecileSql,
    "lm_rebucket_delta" -> graft.pipeline.Mixing.rebucketDeltaSql,
    "corpus_admit" -> graft.pipeline.Intake.corpusAdmitSql,
    "corpus_admit_verdicts" -> graft.pipeline.Intake.corpusAdmitVerdictsSql,
    "report_stats_by_source" -> graft.pipeline.Reports.statsBySourceSql,
    "report_neardup_matrix" -> graft.pipeline.Reports.sourceNearDupMatrixSql,
    "report_dup_matrix" -> graft.pipeline.Reports.sourceDupMatrixSql,
    "shard_manifest" -> graft.pipeline.Reports.shardManifestSql,
    "report_token_histogram" -> graft.pipeline.Reports.tokenHistogramSql,
    "report_mix_rollup" -> graft.pipeline.Reports.mixRollupSql,
    "report_lang_pivot" -> graft.pipeline.Reports.langPivotSql,
    "report_key_skew" -> graft.pipeline.Reports.keySkewSql,
    "report_join_cardinality" -> graft.pipeline.Reports.joinCardinalitySql,
    "forget_keepers" -> graft.pipeline.Forget.forgetKeepersSql,
    "forget_exact_keepers" -> graft.pipeline.Forget.forgetExactKeepersSql,
    "forget_stats" -> graft.pipeline.Forget.forgetStatsSql,
    "corpus_shuffle_order" -> graft.pipeline.Export.corpusShuffleOrderSql,
    "corpus_pack" -> graft.pipeline.Export.corpusPackSql,
    "corpus_pack_stats" -> graft.pipeline.Export.corpusPackStatsSql,
    "corpus_pack_delta" -> graft.pipeline.Export.corpusPackDeltaSql,
    "embed_label_purity" -> graft.dedup.Dedup.embedLabelPuritySql,
    "pii_scrub" -> graft.textanalysis.Pii.piiScrubSql,
    "pii_stats" -> graft.textanalysis.Pii.piiStatsSql,
    "dedup_weighted" -> graft.dedup.Dedup.dedupWeightedSql,
    "dedup_clusters_quality" -> graft.dedup.Dedup.nearDupClustersQualitySql,
    "event_asof_join" -> Sequences.eventAsofJoinSql,
    "event_asof_join_native" -> Sequences.eventAsofJoinSql,
    "event_funnel" -> Sequences.eventFunnelSql,
    "event_retention" -> Sequences.eventRetentionSql,
    "event_gap_stats" -> Sequences.eventGapStatsSql,
    "event_top_paths" -> Sequences.eventTopPathsSql,
    "event_daily_anomaly" -> Sequences.eventDailyAnomalySql,
    "event_daily_anomaly_robust" -> Sequences.eventDailyAnomalyRobustSql,
    "event_transitions" -> Sequences.eventTransitionsSql,
    "event_interval_join" -> Sequences.eventIntervalJoinSql,
    "event_interval_unmatched" -> Sequences.eventIntervalUnmatchedSql,
    "bloom_dup_candidates" -> graft.dedup.Bloom.bloomDupCandidatesSql,
    "sketch_countmin" -> Sketches.countMinSketchSql,
    "sketch_heavy_hitters" -> Sketches.countMinHeavyHittersSql,
    "sketch_hll_registers" -> Sketches.hllRegistersSql,
    "sketch_hll_merged" -> Sketches.hllMergedUniquesSql,
    "event_daily_uniques" -> Sketches.eventDailyUniquesSql,
    "sketch_kmv" -> Sketches.kmvSketchSql,
    "sketch_kmv_est" -> Sketches.kmvEstimateSql,
    "report_source_overlap" -> Sketches.reportSourceOverlapSql,
    "corpus_sample_fixed" -> graft.pipeline.Mixing.sampleFixedSql,
    "corpus_sample_quota" -> graft.pipeline.Mixing.sampleQuotaSql,
    "corpus_sample_priority" -> graft.pipeline.Mixing.samplePrioritySql,
    "corpus_sample_block" -> graft.pipeline.Mixing.sampleBlockSql,
    "layout_zorder_stats" -> Layout.zorderStatsSql,
    "layout_compare" -> Layout.layoutCompareSql,
    "event_rollup_incremental" -> graft.pipeline.Maintenance.eventRollupIncrementalSql,
    "compaction_plan" -> graft.pipeline.Maintenance.compactionPlanSql,
    "corpus_refresh_merge" ->
      graft.pipeline.Maintenance.corpusRefreshMergeSql,
    "corpus_refresh_merge_bucketed" ->
      graft.pipeline.Maintenance.corpusRefreshMergeSql,
    "layout_bloom_skip" -> Layout.layoutBloomSkipSql,
    "layout_hilbert_compare" -> Layout.layoutHilbertCompareSql,
    "event_gapfill" -> Timeline.eventGapfillSql,
    "scd2_history" -> Timeline.scd2HistorySql,
    "scd2_history_split" -> Timeline.scd2HistorySql,
    "report_equidepth_hist" -> graft.pipeline.Reports.equidepthHistSql,
    "report_selectivity_est" -> graft.pipeline.Reports.selectivityEstSql,
    "report_equidepth_merge" -> graft.pipeline.Reports.equidepthMergeSql,
    "report_column_stats" -> graft.pipeline.Reports.columnStatsSql,
    "plan_join_decisions" -> graft.pipeline.Planner.joinDecisionsSql,
    "plan_partition_advisor" -> graft.pipeline.Planner.partitionAdvisorSql,
    "plan_skew_advisor" -> graft.pipeline.Planner.skewAdvisorSql,
    "report_event_freshness" -> graft.pipeline.Reports.eventFreshnessSql,
    "corpus_interleave" -> graft.pipeline.Export.corpusInterleaveSql,
    "corpus_interleave_delta" -> graft.pipeline.Export.corpusInterleaveDeltaSql,
    "report_histogram_drift" -> graft.pipeline.Reports.histogramDriftSql,
    "corpus_mix_solver" -> graft.pipeline.Mixing.mixSolverSql,
    "corpus_sample_waterfill" -> graft.pipeline.Mixing.sampleWaterfillSql
  )
}
