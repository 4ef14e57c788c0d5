package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 re-expressed
  * Spark-first; [[oracleSql]] carries the DuckDB-equivalent SQL the driver
  * checks it against (column names aligned on both sides — the driver hashes
  * column-name-sorted values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"   -> (Relational.q01PricingSummary _),
    "q02_minmax_per_type"   -> (Relational.q02MinMaxPerType _),
    "q03_global_stats"      -> (Relational.q03GlobalStats _),
    "q04_filtered_count"    -> (Relational.q04FilteredCount _),
    "q05_gap_lead"          -> (Relational.q05GapLead _),
    "q06_latest_per_key"    -> (Relational.q06LatestPerKey _),
    "q07_keyset_page"       -> (Relational.q07KeysetPage _),
    "q08_offset_limit"      -> (Relational.q08OffsetLimit _),
    "q09_top_recent"        -> (Relational.q09TopRecent _),
    "q10_success_first"     -> (Relational.q10SuccessFirst _),
    "q11_fk_join"           -> (Relational.q11FkJoin _),
    "q12_adjacent_coalesce" -> (Relational.q12AdjacentCoalesce _),
    "q13_union_two_scans"   -> (Relational.q13UnionTwoScans _),
    "q14_exists"            -> (Relational.q14Exists _),
    "q15_meta_count"        -> (Relational.q15MetaCount _),
    "q16_like_search"       -> (Relational.q16LikeSearch _),
    "q17_search_predicate"  -> (Relational.q17SearchPredicate _),
    "q18_json_group"        -> (Relational.q18JsonGroup _),
    "q19_point_lookup"      -> (Relational.q19PointLookup _),
    "q20_rich_list"         -> (Relational.q20RichList _),
    "q21_cumulative_supply" -> (Relational.q21CumulativeSupply _),
    "q22_collect_sorted"    -> (Relational.q22CollectSorted _),
    "q23_continuation_chain"-> (Relational.q23ContinuationChain _),
    "q24_range_chunks"      -> (Relational.q24RangeChunks _),
    "q25_bounded_offset"    -> (Paging.q25BoundedOffset _),
    "q26_bounded_limit"     -> (Paging.q26BoundedLimit _),
    "q27_dedup_exact"       -> (Dedup.q27DedupExact _),
    "q28_minhash_signature" -> (Dedup.q28MinhashSignature _),
    "q29_lsh_near_dup"      -> (Dedup.q29LshNearDup _),
    "q30_simhash"           -> (Dedup.q30Simhash _),
    "q31_embedding_near_dup"-> (Dedup.q31EmbeddingNearDup _),
    "q32_ann_brute"         -> (Similarity.q32AnnBrute _),
    "q33_ann_ivf"           -> (Similarity.q33AnnIvf _),
    "q34_lang_id"           -> (TextOps.q34LangId _),
    "q35_quality_score"     -> (TextOps.q35QualityScore _),
    "q36_token_count"       -> (TextOps.q36TokenCount _),
    "q37_fingerprint"       -> (TextOps.q37Fingerprint _),
    "q38_tumbling_window"   -> (Windowed.q38TumblingWindow _),
    "q39_multimodal_meta"   -> (Multimodal.q39MultimodalMeta _),
    "q40_asof_supply"       -> (AsOfJoin.q40AsofSupply _),
    "q41_sessionize"        -> (Sessionize.q41Sessionize _),
    "q42_dedup_clusters"    -> (Dedup.q42DedupClusters _),
    "q43_vocab_topk"        -> (Corpus.q43VocabTopk _),
    "q44_stratified_sample" -> (Corpus.q44StratifiedSample _),
    "q45_contamination"     -> (Corpus.q45Contamination _),
    "q46_length_hist"       -> (Corpus.q46LengthHist _),
    "q47_mixture_weights"   -> (Corpus.q47MixtureWeights _),
    "q48_top_per_group"     -> (Corpus.q48TopPerGroup _),
    "q49_median_length"     -> (Corpus.q49MedianLength _),
    "q50_star_revenue"      -> (Relational.q50StarRevenue _),
    "q51_anti_blocklist"    -> (Relational.q51AntiBlocklist _),
    "q52_mixture_rollup"    -> (Corpus.q52MixtureRollup _),
    "q53_ann_multiprobe"    -> (Similarity.q53AnnMultiProbe _),
    "q54_range_frame"       -> (Windowed.q54RangeFrame _),
    "q55_pivot_counts"      -> (Windowed.q55PivotCounts _),
    "q56_unpivot"           -> (Corpus.q56Unpivot _),
    "q57_distinct_agg"      -> (Corpus.q57DistinctAgg _),
    "q58_holdout_except"    -> (Corpus.q58HoldoutExcept _),
    "q59_dim_stats"         -> (Similarity.q59DimStats _),
    "q60_quartiles"         -> (Corpus.q60Quartiles _),
    "q61_weighted_sample"   -> (Corpus.q61WeightedSample _),
    "q62_session_window"    -> (Sessionize.q62SessionWindow _),
    "q63_search_chain_code" -> (TxSearch.q63SearchChainCode _),
    "q64_coin_supply"       -> (Coins.q64CoinSupply _),
    "q65_resize_stub"       -> (Multimodal.q65ResizeStub _),
    "q66_frame_sample"      -> (Multimodal.q66FrameSample _),
    "q67_decontaminate"     -> (Corpus.q67Decontaminate _),
    "q68_pack_sequences"    -> (Corpus.q68PackSequences _),
    "q69_repetition_ratio"  -> (TextOps.q69RepetitionRatio _),
    "q70_tfidf_terms"       -> (Corpus.q70TfidfTerms _),
    "q71_kmeans_iter"       -> (Similarity.q71KmeansIter _),
    "q72_ann_hyperplane"    -> (Similarity.q72AnnHyperplane _),
    "q73_bigram_lm"         -> (Corpus.q73BigramLm _),
    "q74_dedup_apply"       -> (Dedup.q74DedupApply _),
    "q75_mixture_target"    -> (Corpus.q75MixtureTarget _),
    "q76_asof_big_join"     -> (AsOfJoin.q76AsofBigJoin _),
    "q77_attribution_window"-> (RangeJoin.q77AttributionWindow _),
    "q78_boilerplate_ratio" -> (Corpus.q78BoilerplateRatio _),
    "q79_chunk_windows"     -> (Corpus.q79ChunkWindows _),
    "q80_stop_strip"        -> (TextOps.q80StopStrip _),
    "q81_incremental_dedup" -> (Dedup.q81IncrementalDedup _),
    "q82_jaccard_join"      -> (SimJoin.q82JaccardJoin _),
    "q83_epoch_shuffle"     -> (TrainPrep.q83EpochShuffle _),
    "q84_quantize_int8"     -> (TrainPrep.q84QuantizeInt8 _),
    "q85_padding_waste"     -> (TrainPrep.q85PaddingWaste _),
    "q86_hll_distinct"      -> (Sketches.q86HllDistinct _),
    "q87_simhash_pairs"     -> (Dedup.q87SimhashPairs _),
    "q88_minhash_estimate"  -> (Dedup.q88MinhashEstimate _),
    "q89_ann_recall"        -> (Similarity.q89AnnRecall _),
    "q90_hll_rollup"        -> (Sketches.q90HllRollup _),
    "q91_simhash64_pairs"   -> (Dedup.q91Simhash64Pairs _),
    "q92_jaccard_join_maxdf"-> (SimJoin.q92JaccardJoinMaxDf _),
    "q93_weighted_jaccard"  -> (SimJoin.q93WeightedJaccardJoin _),
    "q94_jl_project"        -> (Similarity.q94JlProject _),
    "q95_jl_recall"         -> (Similarity.q95JlRecall _),
    "q96_cluster_precision" -> (Dedup.q96ClusterPrecision _),
    "q97_weighted_lsh"      -> (SimJoin.q97WeightedLshNearDup _),
    "q98_cms_df_topk"       -> (Sketches.q98CmsDfTopk _),
    "q99_cms_rollup"        -> (Sketches.q99CmsRollup _),
    "q100_bloom_decontaminate" -> (Bloom.q100BloomDecontaminate _),
    "q101_bloom_audit"      -> (Bloom.q101BloomAudit _),
    "q102_hist_median"      -> (Sketches.q102HistMedian _),
    "q103_priority_sample"  -> (Corpus.q103PrioritySample _),
    "q104_curation_funnel"  -> (TrainPrep.q104CurationFunnel _),
    "q105_substr_shared"    -> (TextOps.q105SubstrShared _),
    "q106_substr_cut"       -> (TextOps.q106SubstrCut _),
    "q107_kmv_distinct"     -> (Sketches.q107KmvDistinct _),
    "q108_kmv_rollup"       -> (Sketches.q108KmvRollup _),
    "q109_semantic_dedup"   -> (Dedup.q109SemanticDedup _),
    "q110_semantic_recall"  -> (Dedup.q110SemanticRecall _),
    "q111_dsir_weights"     -> (Corpus.q111DsirWeights _),
    "q112_dsir_audit"       -> (Corpus.q112DsirAudit _),
    "q113_quality_rules"    -> (TextOps.q113QualityRules _),
    "q114_hist_p90"         -> (Sketches.q114HistP90 _),
    "q115_embed_outliers"   -> (Similarity.q115EmbedOutliers _),
    "q116_funnel_v2"        -> (TrainPrep.q116FunnelV2 _),
    "q117_mixture_drift"    -> (Corpus.q117MixtureDrift _),
    "q118_lm_score"         -> (Corpus.q118LmScore _),
    "q119_rules_lm_agree"   -> (TextOps.q119RulesLmAgreement _),
    "q120_snapshot_diff"    -> (Snapshot.q120SnapshotDiff _),
    "q121_sample_quantile"  -> (Sketches.q121SampleQuantile _),
    "q122_sample_quantile_rollup" -> (Sketches.q122SampleQuantileRollup _),
    "q123_source_novelty"   -> (Corpus.q123SourceNovelty _),
    "q124_token_waterfill"  -> (TrainPrep.q124TokenWaterfill _),
    "q125_dup_burden"       -> (Dedup.q125DupBurden _),
    "q126_chunk_dup"        -> (Corpus.q126ChunkDupProfile _),
    "q127_quality_quota"    -> (TrainPrep.q127QualityQuota _),
    "q128_pq_encode"        -> (Similarity.q128PqEncode _),
    "q129_pq_recall"        -> (Similarity.q129PqRecall _),
    "q130_ivfpq_recall"     -> (Similarity.q130IvfPqRecall _),
    "q131_ppl_buckets"      -> (Corpus.q131PerplexityBuckets _),
    "q132_temperature_quota" -> (TrainPrep.q132TemperatureQuota _),
    "q133_epoch_plan"       -> (TrainPrep.q133EpochPlan _),
    "q134_ks_drift"         -> (Corpus.q134KsDrift _),
    "q135_vocab_coverage"   -> (Corpus.q135VocabCoverage _),
    "q136_cluster_sample"   -> (Similarity.q136ClusterSample _),
    "q137_pack_audit"       -> (Corpus.q137PackAudit _),
    "q138_split_leakage"    -> (Dedup.q138SplitLeakage _),
    "q139_weighted_maxdf"   -> (SimJoin.q139WeightedJaccardMaxDf _),
    "q140_image_decode"     -> (Multimodal.q140ImageDecode _),
    "q141_hll_persist"      -> (Sketches.q141HllPersistRollup _),
    "q142_kmv_persist"      -> (Sketches.q142KmvPersistRollup _),
    "q143_cms_persist"      -> (Sketches.q143CmsPersistRollup _),
    "q144_pii_scan"         -> (Pii.q144PiiScan _),
    "q145_pii_redact"       -> (Pii.q145PiiRedact _),
    "q146_bpe_merges"       -> (Bpe.q146BpeMerges _),
    "q147_bpe_apply"        -> (Bpe.q147BpeApply _),
    "q148_url_blocklist"    -> (UrlOps.q148UrlBlocklist _),
    "q149_funnel_v3"        -> (TrainPrep.q149FunnelV3 _),
    "q150_bm25_topk"        -> (Retrieval.q150Bm25TopK _),
    "q151_winnow"           -> (Winnow.q151Winnow _),
    "q152_domain_pagerank"  -> (UrlOps.q152DomainPagerank _),
    "q153_encoding_qa"      -> (EncodingQa.q153EncodingQa _),
    "q154_cluster_canonical" -> (Dedup.q154ClusterCanonical _),
    "q155_hard_negatives"   -> (Similarity.q155HardNegatives _),
    "q156_domain_quality"   -> (UrlOps.q156DomainQuality _),
    "q157_mmr_rerank"       -> (Similarity.q157MmrRerank _),
    "q158_winnow_pairs"     -> (Winnow.q158WinnowPairs _),
    "q159_sq8_recall"       -> (Similarity.q159Sq8Recall _),
    "q160_kmv_setops"       -> (Sketches.q160KmvSetOps _),
    "q161_seg_dedup_rewrite" -> (Corpus.q161SegDedupRewrite _),
    "q162_ivfpq_refine"     -> (Similarity.q162IvfPqRefine _),
    "q163_gopher_coverage"  -> (TextOps.q163GopherCoverage _),
    "q164_url_canon_dedup"  -> (UrlOps.q164UrlCanonDedup _),
    "q165_batch_plan"       -> (TrainPrep.q165BatchPlan _),
    "q166_lexicon_filter"   -> (Lexicon.q166LexiconFilter _),
    "q167_quality_auc"      -> (Lexicon.q167QualityAuc _),
    "q168_hashed_classifier" -> (Lexicon.q168HashedClassifier _),
    "q169_calibration_bins"  -> (Lexicon.q169CalibrationBins _),
    "q170_ivf_drift"        -> (Similarity.q170IvfDrift _),
    "q171_centroid_drift"   -> (Similarity.q171CentroidDrift _),
    "q172_truncation_loss"  -> (TrainPrep.q172TruncationLoss _),
    "q173_fuzzy_decontam"   -> (Dedup.q173FuzzyDecontam _),
    "q174_funnel_v4"        -> (TrainPrep.q174FunnelV4 _),
    "q175_rrf_fusion"       -> (Retrieval.q175RrfFusion _),
    "q176_nprobe_sweep"     -> (Similarity.q176NprobeSweep _),
    "q177_lang_confusion"   -> (TextOps.q177LangConfusion _),
    "q178_length_gini"      -> (TextOps.q178LengthGini _),
    "q179_embed_hygiene"    -> (Similarity.q179EmbeddingHygiene _),
    "q180_audio_decode"     -> (Multimodal.q180AudioDecode _),
    "q181_data_card"        -> (DataCard.q181DataCard _),
    "q182_gif_decode"       -> (Multimodal.q182GifDecode _),
    "q183_embed_dedup_capped" -> (Dedup.q183EmbedDedupCapped _),
    "q184_lsh_band_sweep"   -> (Dedup.q184LshBandSweep _),
    "q185_release_diff"     -> (Releases.q185ReleaseDiff _),
    "q186_metadata_kappa"   -> (TextOps.q186MetadataKappa _),
    "q187_collocations"     -> (TextOps.q187Collocations _),
    "q188_integrity_audit"  -> (Integrity.q188IntegrityAudit _),
    "q189_percentile_gate"  -> (TextOps.q189PercentileGate _),
    "q190_simpson_conc"     -> (TextOps.q190SimpsonConcentration _),
    "q191_stratified_split" -> (TrainPrep.q191StratifiedSplit _),
    "q192_video_decode"     -> (Multimodal.q192VideoDecode _),
    "q193_fluency_score"    -> (Corpus.q193FluencyScore _),
    "q194_filter_overlap"   -> (TrainPrep.q194FilterOverlap _),
    "q195_release_drift"    -> (Releases.q195ReleaseDrift _),
    "q196_hubness_audit"    -> (Similarity.q196HubnessAudit _),
    "q197_memorization"     -> (Corpus.q197MemorizationProbe _),
    "q198_nfc_audit"        -> (EncodingQa.q198NfcAudit _),
    "q199_source_overlap"   -> (Dedup.q199SourceOverlap _),
    "q200_ensemble_rank"    -> (Ensemble.q200EnsembleRank _),
    "q201_curriculum"       -> (TrainPrep.q201CurriculumPhases _),
    "q202_contrastive_pairs" -> (Corpus.q202ContrastivePairs _),
    "q203_length_bias"      -> (Bias.q203LengthBias _),
    "q204_audio_segments"   -> (Multimodal.q204AudioSegments _),
    "q205_span_corruption"  -> (TrainPrep.q205SpanCorruption _),
    "q206_k_anonymity"      -> (Pii.q206KAnonymity _),
    "q207_jsonl_roundtrip"  -> (graft.sources.Jsonl.q207JsonlRoundTrip _),
    "q208_lexical_richness" -> (TextOps.q208LexicalRichness _),
    "q209_containment_join" -> (SimJoin.q209ContainmentJoin _),
    "q210_image_ahash"      -> (Multimodal.q210ImageAhash _),
    "q211_keeper_sweep"     -> (Dedup.q211KeeperPolicySweep _),
    "q212_quantile_norm"    -> (Bias.q212QuantileNorm _),
    "q213_audio_envelope"   -> (Multimodal.q213AudioFingerprint _),
    "q214_novelty_quality"  -> (Corpus.q214NoveltyByQuality _),
    "q215_pii_cooccur"      -> (Pii.q215PiiCooccurrence _),
    "q216_shard_plan"       -> (TrainPrep.q216ShardPlan _),
    "q217_bpe_vocab_sweep"  -> (Bpe.q217BpeVocabSweep _),
    "q218_bbit_minhash"     -> (Dedup.q218BbitMinhash _),
    "q219_zipf_decay"       -> (TextOps.q219ZipfDecay _),
    "q220_code_detect"      -> (CodeDetect.q220CodeDetect _),
    "q221_centroid_affinity" -> (Similarity.q221CentroidAffinity _),
    "q222_cdc_chunks"       -> (Cdc.q222CdcChunks _),
    "q223_bitext_margin"    -> (Similarity.q223BitextMargin _),
    "q224_image_dhash"      -> (Multimodal.q224ImageDhash _),
    "q225_loop_detect"      -> (TextOps.q225LoopDetect _),
    "q226_source_minhash_sim" -> (Dedup.q226SourceMinhashSim _),
    "q227_top_pc"           -> (Similarity.q227TopPc _),
    "q228_pc_projection"    -> (Similarity.q228PcProjection _),
    "q229_image_near_dup"   -> (Multimodal.q229ImageNearDup _),
    "q230_matryoshka_recall" -> (Similarity.q230MatryoshkaRecall _),
    "q231_split_leak_neardup" -> (Dedup.q231SplitLeakNearDup _),
    "q232_skipgram_decay"   -> (TextOps.q232SkipgramDecay _),
    "q233_audio_dup_groups" -> (Multimodal.q233AudioDupGroups _),
    "q234_sketch_referee"   -> (Dedup.q234SketchReferee _),
    "q235_release_chunk_novelty" -> (Cdc.q235ReleaseChunkNovelty _),
    "q236_chunk_size_audit" -> (Cdc.q236ChunkSizeAudit _),
    "q237_image_phash"      -> (Multimodal.q237ImagePhash _),
    "q238_mrr_eval"         -> (Retrieval.q238MrrEval _),
    "q239_hybrid_retrieval" -> (Retrieval.q239HybridRetrieval _),
    "q240_cluster_purity"   -> (Dedup.q240ClusterPurity _),
    "q241_paraphrase_pairs" -> (Dedup.q241ParaphrasePairs _),
    "q242_lsh_band_planner" -> (Dedup.q242LshBandPlanner _),
    "q243_cluster_cohesion" -> (Dedup.q243ClusterCohesion _),
    "q244_soft_dedup"       -> (Dedup.q244SoftDedupWeights _),
    "q245_ivf_rebalance"    -> (Similarity.q245IvfRebalance _),
    "q246_ivf_persist"      -> (Similarity.q246IvfPersist _),
    "q247_passage_retrieval" -> (Retrieval.q247PassageRetrieval _),
    "q248_context_pack"     -> (Retrieval.q248ContextPack _),
    "q249_ivf_upsert"       -> (Similarity.q249IvfUpsert _),
    "q250_ivf_upsert_query" -> (Similarity.q250IvfUpsertQuery _),
    "q251_binary_quant"     -> (Similarity.q251BinaryQuantRecall _),
    "q252_ndcg_eval"        -> (Retrieval.q252NdcgEval _),
    "q253_grounding_audit"  -> (Retrieval.q253GroundingAudit _),
    "q254_clip_align_stub"  -> (Multimodal.q254ClipAlignStub _),
    "q255_license_tag"      -> (License.q255LicenseTag _),
    "q256_streaming_ivf_upsert" -> (Similarity.q256StreamingIvfUpsert _),
    "q257_context_reuse"    -> (Retrieval.q257ContextReuse _),
    "q258_ivf_delete_query" -> (Similarity.q258IvfDeleteQuery _),
    "q259_ivf_compact_query" -> (Similarity.q259IvfCompactQuery _),
    "q260_ivf_compact_accounting" -> (Similarity.q260IvfCompactAccounting _),
    "q261_token_fertility"  -> (TextOps.q261TokenFertility _),
    "q262_bt_strength"      -> (Preference.q262BtStrength _),
    "q263_text_index_build" -> (Retrieval.q263TextIndexBuild _),
    "q264_text_index_query" -> (Retrieval.q264TextIndexQuery _),
    "q265_pref_cycles"      -> (Preference.q265PrefCycles _),
    "q266_text_upsert"      -> (Retrieval.q266TextUpsert _),
    "q267_text_upsert_query" -> (Retrieval.q267TextUpsertQuery _),
    "q268_text_delete_query" -> (Retrieval.q268TextDeleteQuery _),
    "q269_text_compact_query" -> (Retrieval.q269TextCompactQuery _),
    "q270_text_compact_accounting" -> (Retrieval.q270TextCompactAccounting _),
    "q271_hybrid_from_stores" -> (Retrieval.q271HybridFromStores _),
    "q272_streaming_text_upsert" -> (Retrieval.q272StreamingTextUpsert _),
  )

  /** DuckDB-equivalent ANSI SQL per query (same parquet tables, same column
    * names/aliases). Convention: exact DECIMAL(18,6) arithmetic for float
    * aggregates cast to DOUBLE at the end; deterministic total ORDER BY. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_minmax_per_type" ->
      """SELECT event_type, min(event_id) AS min_id, max(event_id) AS max_id,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q03_global_stats" ->
      "SELECT max(event_id) AS max_id, max(user_id) AS max_user, count(*) AS n FROM events",
    "q04_filtered_count" ->
      """SELECT count(*) AS n FROM events
        |WHERE event_type = 'purchase'
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "q05_gap_lead" ->
      """SELECT user_id, event_id AS gap_start, next_id AS gap_end
        |FROM (SELECT user_id, event_id,
        |        lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_id
        |      FROM events)
        |WHERE next_id - event_id > 50
        |ORDER BY user_id, gap_start""".stripMargin,
    "q06_latest_per_key" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q07_keyset_page" ->
      """SELECT user_id, event_id, event_type FROM events
        |WHERE (user_id, event_id) < (7, 500)
        |ORDER BY user_id DESC, event_id DESC LIMIT 25""".stripMargin,
    "q08_offset_limit" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id DESC LIMIT 20 OFFSET 50""".stripMargin,
    "q09_top_recent" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY event_id DESC LIMIT 10""".stripMargin,
    "q10_success_first" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) DESC,
        |         o_orderkey DESC
        |LIMIT 50""".stripMargin,
    "q11_fk_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_orderdate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'O' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q12_adjacent_coalesce" ->
      """SELECT e.event_id, e.user_id,
        |  coalesce(c.c_k, v.v_k, '-') AS prior_k
        |FROM events e
        |LEFT JOIN (SELECT event_id AS c_id, json_extract_string(props, '$.k') AS c_k
        |           FROM events WHERE event_type = 'click') c
        |  ON c.c_id = e.event_id - 1
        |LEFT JOIN (SELECT event_id AS v_id, json_extract_string(props, '$.k') AS v_k
        |           FROM events WHERE event_type = 'view') v
        |  ON v.v_id = e.event_id - 1
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,
    "q13_union_two_scans" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey, l_quantity
        |  FROM lineitem WHERE l_suppkey = 3
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey, l_quantity
        |  FROM lineitem WHERE l_partkey = 42)
        |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_partkey""".stripMargin,
    "q14_exists" ->
      "SELECT CAST(count(*) > 0 AS INT) AS has_rows FROM events WHERE event_type = 'signup'",
    "q15_meta_count" ->
      "SELECT count(*) AS n FROM lineitem",
    "q16_like_search" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE coalesce(text, '') LIKE '%merge join%'
        |ORDER BY doc_id""".stripMargin,
    "q17_search_predicate" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE (event_type LIKE '%sign%' OR props LIKE '%"k": 7%')
        |  AND value >= 10 AND value < 500 AND user_id < 10
        |ORDER BY event_id""".stripMargin,
    "q18_json_group" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  count(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY k_val ORDER BY k_val""".stripMargin,
    "q19_point_lookup" ->
      """SELECT event_id, user_id, event_type, props FROM events
        |WHERE event_id = 777""".stripMargin,
    "q20_rich_list" ->
      """SELECT o_custkey,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS balance,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY balance DESC, o_custkey LIMIT 100""".stripMargin,
    "q21_cumulative_supply" ->
      """SELECT p_partkey,
        |  CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6)))
        |       OVER (ORDER BY p_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DECIMAL(38,4)) AS DOUBLE) AS cum_supply
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q22_collect_sorted" ->
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q23_continuation_chain" ->
      """WITH RECURSIVE edges AS (
        |  SELECT event_id AS id,
        |         lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS parent_id
        |  FROM events),
        |chain AS (
        |  SELECT e.event_id AS seed_event_id, 0 AS depth, e.event_id AS ancestor_id
        |  FROM events e WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT c.seed_event_id, c.depth + 1, ed.parent_id
        |  FROM chain c JOIN edges ed ON ed.id = c.ancestor_id
        |  WHERE c.depth < 3 AND ed.parent_id IS NOT NULL)
        |SELECT seed_event_id, depth, ancestor_id FROM chain
        |WHERE depth >= 1 ORDER BY seed_event_id, depth""".stripMargin,
    "q24_range_chunks" ->
      """SELECT event_type, chunk_lo, least(chunk_lo + 119, hi) AS chunk_hi
        |FROM (SELECT event_type, unnest(generate_series(lo, hi, 120)) AS chunk_lo, hi
        |      FROM (SELECT event_type, min(event_id) AS lo, max(event_id) AS hi
        |            FROM events GROUP BY event_type))
        |ORDER BY event_type, chunk_lo""".stripMargin,
    "q25_bounded_offset" ->
      """SELECT user_id, event_id, scan_num, found_num FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (ORDER BY user_id DESC, event_id DESC) AS scan_num,
        |    count(*) FILTER (WHERE match)
        |      OVER (ORDER BY user_id DESC, event_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS found_num
        |  FROM (SELECT user_id, event_id, event_type = 'click' AS match
        |        FROM events ORDER BY user_id DESC, event_id DESC LIMIT 200))
        |WHERE scan_num = 200 OR found_num = 30
        |ORDER BY scan_num LIMIT 1""".stripMargin,
    "q26_bounded_limit" ->
      """SELECT user_id, event_id, match, scan_num FROM (
        |  SELECT user_id, event_id, match,
        |    row_number() OVER (ORDER BY user_id DESC, event_id DESC) AS scan_num,
        |    count(*) FILTER (WHERE match)
        |      OVER (ORDER BY user_id DESC, event_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS found_num
        |  FROM (SELECT user_id, event_id, event_type = 'click' AS match
        |        FROM events ORDER BY user_id DESC, event_id DESC LIMIT 200))
        |WHERE (match AND found_num <= 10) OR scan_num = 200
        |ORDER BY scan_num""".stripMargin,
    "q27_dedup_exact"        -> Dedup.dedupExactOracle,
    "q28_minhash_signature"  -> Dedup.minhashOracle,
    "q29_lsh_near_dup"       -> Dedup.lshNearDupOracle,
    "q30_simhash"            -> Dedup.simhashOracle,
    "q31_embedding_near_dup" -> Dedup.embeddingNearDupOracle,
    "q32_ann_brute"          -> Similarity.annBruteOracle,
    "q33_ann_ivf"            -> Similarity.annIvfOracle,
    "q34_lang_id"            -> TextOps.langIdOracle,
    "q35_quality_score"      -> TextOps.qualityOracle,
    "q36_token_count"        -> TextOps.tokenCountOracle,
    "q37_fingerprint"        -> TextOps.fingerprintOracle,
    "q38_tumbling_window"    -> Windowed.tumblingOracle,
    "q39_multimodal_meta"    -> Multimodal.multimodalOracle,
    "q40_asof_supply"        -> AsOfJoin.asofOracle,
    "q41_sessionize"         -> Sessionize.sessionizeOracle,
    "q42_dedup_clusters"     -> Dedup.dedupClustersOracle,
    "q43_vocab_topk"         -> Corpus.vocabOracle,
    "q44_stratified_sample"  -> Corpus.stratifiedOracle,
    "q45_contamination"      -> Corpus.contaminationOracle,
    "q46_length_hist"        -> Corpus.lengthHistOracle,
    "q47_mixture_weights"    -> Corpus.mixtureOracle,
    "q48_top_per_group"      -> Corpus.topPerGroupOracle,
    "q49_median_length"      -> Corpus.medianOracle,
    "q50_star_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q51_anti_blocklist" -> {
      val cases = graft.operators.Corpus.phrases
        .map(p => s"text LIKE '%$p%'").mkString(" OR ")
      s"""SELECT lang, count(*) AS n_clean FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE $cases)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q52_mixture_rollup"     -> Corpus.mixtureRollupOracle,
    "q53_ann_multiprobe"     -> Similarity.annMultiProbeOracle,
    "q54_range_frame"        -> Windowed.rangeFrameOracle,
    "q55_pivot_counts"       -> Windowed.pivotOracle,
    "q56_unpivot"            -> Corpus.unpivotOracle,
    "q57_distinct_agg"       -> Corpus.distinctAggOracle,
    "q58_holdout_except"     -> Corpus.holdoutExceptOracle,
    "q59_dim_stats"          -> Similarity.dimStatsOracle,
    "q60_quartiles"          -> Corpus.quartilesOracle,
    "q61_weighted_sample"    -> Corpus.weightedSampleOracle,
    "q62_session_window"     -> Sessionize.sessionWindowOracle,
    "q63_search_chain_code"  -> TxSearch.searchChainCodeOracle,
    "q64_coin_supply"        -> Coins.coinSupplyOracle,
    "q65_resize_stub"        -> Multimodal.resizeStubOracle,
    "q66_frame_sample"       -> Multimodal.frameSampleOracle,
    "q67_decontaminate"      -> Corpus.decontaminateOracle,
    "q68_pack_sequences"     -> Corpus.packSequencesOracle,
    "q69_repetition_ratio"   -> TextOps.repetitionOracle,
    "q70_tfidf_terms"        -> Corpus.tfidfOracle,
    "q71_kmeans_iter"        -> Similarity.kmeansIterOracle,
    "q72_ann_hyperplane"     -> Similarity.annHyperplaneOracle,
    "q73_bigram_lm"          -> Corpus.bigramLmOracle,
    "q74_dedup_apply"        -> Dedup.dedupApplyOracle,
    "q75_mixture_target"     -> Corpus.mixtureTargetOracle,
    "q76_asof_big_join"      -> AsOfJoin.asofBigJoinOracle,
    "q77_attribution_window" -> RangeJoin.attributionOracle,
    "q78_boilerplate_ratio"  -> Corpus.boilerplateOracle,
    "q79_chunk_windows"      -> Corpus.chunkWindowsOracle,
    "q80_stop_strip"         -> TextOps.stopStripOracle,
    "q81_incremental_dedup"  -> Dedup.incrementalDedupOracle,
    "q82_jaccard_join"       -> SimJoin.jaccardJoinOracle,
    "q83_epoch_shuffle"      -> TrainPrep.epochShuffleOracle,
    "q84_quantize_int8"      -> TrainPrep.quantizeInt8Oracle,
    "q85_padding_waste"      -> TrainPrep.paddingWasteOracle,
    "q86_hll_distinct"       -> Sketches.hllDistinctOracle,
    "q87_simhash_pairs"      -> Dedup.simhashPairsOracle,
    "q88_minhash_estimate"   -> Dedup.minhashEstimateOracle,
    "q89_ann_recall"         -> Similarity.annRecallOracle,
    "q90_hll_rollup"         -> Sketches.hllRollupOracle,
    "q91_simhash64_pairs"    -> Dedup.simhash64PairsOracle,
    // q92's oracle is q82's naive spec VERBATIM: the cut configuration
    // must lose nothing on this corpus — equality IS the check
    "q92_jaccard_join_maxdf" -> SimJoin.jaccardJoinOracle,
    "q93_weighted_jaccard"   -> SimJoin.weightedJaccardJoinOracle,
    "q94_jl_project"         -> Similarity.jlProjectOracle,
    "q95_jl_recall"          -> Similarity.jlRecallOracle,
    "q96_cluster_precision"  -> Dedup.clusterPrecisionOracle,
    "q97_weighted_lsh"       -> SimJoin.weightedLshNearDupOracle,
    "q98_cms_df_topk"        -> Sketches.cmsDfTopkOracle,
    "q99_cms_rollup"         -> Sketches.cmsRollupOracle,
    // q100 is the q92 pattern: the bloom prefilter must not change the
    // exact join's output, so its oracle is q67's VERBATIM.
    "q100_bloom_decontaminate" -> Corpus.decontaminateOracle,
    "q101_bloom_audit"       -> Bloom.bloomAuditOracle,
    "q102_hist_median"       -> Sketches.histMedianOracle,
    "q103_priority_sample"   -> Corpus.prioritySampleOracle,
    "q104_curation_funnel"   -> TrainPrep.curationFunnelOracle,
    "q105_substr_shared"     -> TextOps.substrSharedOracle,
    "q106_substr_cut"        -> TextOps.substrCutOracle,
    "q107_kmv_distinct"      -> Sketches.kmvDistinctOracle,
    // q108 oracle builds the global bottom-k from scratch — the
    // union-retruncate merge must equal it (the q90/q99 pattern).
    "q108_kmv_rollup"        -> Sketches.kmvRollupOracle,
    "q109_semantic_dedup"    -> Dedup.semanticDedupOracle,
    "q110_semantic_recall"   -> Dedup.semanticRecallOracle,
    "q111_dsir_weights"      -> Corpus.dsirWeightsOracle,
    "q112_dsir_audit"        -> Corpus.dsirAuditOracle,
    "q113_quality_rules"     -> TextOps.qualityRulesOracle,
    // q114 oracle builds the global histogram from scratch — the
    // per-source cell-sum merge must equal it.
    "q114_hist_p90"          -> Sketches.histP90Oracle,
    "q115_embed_outliers"    -> Similarity.embedOutliersOracle,
    "q116_funnel_v2"         -> TrainPrep.funnelV2Oracle,
    "q117_mixture_drift"     -> Corpus.mixtureDriftOracle,
    "q118_lm_score"          -> Corpus.lmScoreOracle,
    "q119_rules_lm_agree"    -> TextOps.rulesLmAgreementOracle,
    "q120_snapshot_diff"     -> Snapshot.snapshotDiffOracle,
    "q121_sample_quantile"   -> Sketches.sampleQuantileOracle,
    // q122 oracle builds the global bottom-k sample from scratch — the
    // per-lang union-retruncate merge must equal it.
    "q122_sample_quantile_rollup" -> Sketches.sampleQuantileRollupOracle,
    "q123_source_novelty"    -> Corpus.sourceNoveltyOracle,
    "q124_token_waterfill"   -> TrainPrep.tokenWaterfillOracle,
    "q125_dup_burden"        -> Dedup.dupBurdenOracle,
    "q126_chunk_dup"         -> Corpus.chunkDupProfileOracle,
    "q127_quality_quota"     -> TrainPrep.qualityQuotaOracle,
    "q128_pq_encode"         -> Similarity.pqEncodeOracle,
    "q129_pq_recall"         -> Similarity.pqRecallOracle,
    "q130_ivfpq_recall"      -> Similarity.ivfPqRecallOracle,
    "q131_ppl_buckets"       -> Corpus.perplexityBucketsOracle,
    "q132_temperature_quota" -> TrainPrep.temperatureQuotaOracle,
    "q133_epoch_plan"        -> TrainPrep.epochPlanOracle,
    "q134_ks_drift"          -> Corpus.ksDriftOracle,
    "q135_vocab_coverage"    -> Corpus.vocabCoverageOracle,
    "q136_cluster_sample"    -> Similarity.clusterSampleOracle,
    "q137_pack_audit"        -> Corpus.packAuditOracle,
    "q138_split_leakage"     -> Dedup.splitLeakageOracle,
    // the q92 hatch-declaration pattern: q139's oracle IS q93's naive spec,
    // verbatim — the relative-df cut must cost nothing in correctness
    "q139_weighted_maxdf"    -> SimJoin.weightedJaccardJoinOracle,
    // real-codec proof: Spark round-trips pixels through actual PNG/BMP
    // encode+decode; the oracle recomputes the same pixels analytically
    "q140_image_decode"      -> Multimodal.imageDecodeOracle,
    // persistence round-trips declared against the from-scratch GLOBAL
    // builds, verbatim — storage must cost nothing (the q92/q100 pattern)
    "q141_hll_persist"       -> Sketches.hllRollupOracle,
    "q142_kmv_persist"       -> Sketches.kmvRollupOracle,
    "q143_cms_persist"       -> Sketches.cmsRollupOracle,
    // PII fixture derived deterministically from doc_id (q140's pattern);
    // the md5 fingerprints in q145 pin byte-identical redaction output
    "q144_pii_scan"          -> Pii.piiScanOracle,
    "q145_pii_redact"        -> Pii.piiRedactOracle,
    // independent from-scratch replay: the oracle re-learns all 8 merges
    // as a generated CTE chain, not a dump of the Spark output
    "q146_bpe_merges"        -> Bpe.bpeMergesOracle,
    // train→apply closed: the oracle re-learns the segmentation from
    // scratch, then re-tokenizes the corpus against it
    "q147_bpe_apply"         -> Bpe.bpeApplyOracle,
    // blocklist literal shared: ONE Scala Seq renders into the Spark
    // broadcast dimension AND this VALUES list
    "q148_url_blocklist"     -> UrlOps.urlBlocklistOracle,
    // funnel v3: URL gate -> PII redact -> dedup-on-redacted -> sample,
    // same stage definitions chained as CTEs
    "q149_funnel_v3"         -> TrainPrep.funnelV3Oracle,
    // integer-ppm BM25 with log-free linear IDF: the probe query set is
    // ONE Scala literal rendered into both the broadcast relation and
    // this VALUES list; every division is an explicit integral DIV
    "q150_bm25_topk"         -> Retrieval.bm25Oracle,
    // winnowing fingerprint selection: rightmost-min tie rule encoded
    // structurally as min over the `hash || lpad(10^9 - pos)` string key
    "q151_winnow"            -> Winnow.winnowOracle,
    // bounded-iteration PageRank, oracle re-runs all 8 steps as a
    // generated CTE chain (the q146 discipline); integer-ppm mass
    "q152_domain_pagerank"   -> UrlOps.domainPagerankOracle,
    // mojibake/control/non-ASCII scan; injected BMP markers, char-mass
    // counting idiom (no division), chr()/char() built the same chars
    "q153_encoding_qa"       -> EncodingQa.encodingQaOracle,
    // keep-best-quality per near-dup cluster: chains q42's cluster CTE
    // with q35's quality CTE; keeper = row_number over (quality DESC, id)
    "q154_cluster_canonical" -> Dedup.clusterCanonicalOracle,
    // contrastive mining: positives + top-3 hard negatives in ONE window
    // over the (query, same-label) partition key
    "q155_hard_negatives"    -> Similarity.hardNegativesOracle,
    // provenance triage: per-domain doc/source counts + integer-ppm
    // average of q35 quality + q148 blocklist flag
    "q156_domain_quality"    -> UrlOps.domainQualityOracle,
    // MMR greedy diversity re-rank: integer-tenths λ, K-step generated
    // CTE replay, candidate pool bounded per anchor
    "q157_mmr_rerank"        -> Similarity.mmrRerankOracle,
    // MOSS-style match pairs off the winnowing index; max-df stop-shingle
    // cut before the pair join (the q92 hatch on fingerprints)
    "q158_winnow_pairs"      -> Winnow.winnowPairsOracle,
    // SQ8 per-dim min/max quantization; search on dequantized vectors,
    // recall vs float truth — completes JL/PQ/SQ8 compression audits
    "q159_sq8_recall"        -> Similarity.sq8RecallOracle,
    // theta-style KMV set algebra: intersection/Jaccard between two
    // release sketches, exact legs beside the estimates
    "q160_kmv_setops"        -> Sketches.kmvSetOpsOracle,
    // C4/Dolma duplicate-segment REMOVAL + doc reassembly; md5
    // min/max/distinct over rebuilt texts = byte-parity check
    "q161_seg_dedup_rewrite" -> Corpus.segDedupRewriteOracle,
    // FAISS-style IVF-PQ + exact refine: ADC shortlist re-ranked with
    // true vectors; refine recall ≥ ADC recall by construction
    "q162_ivfpq_refine"      -> Similarity.ivfPqRefineOracle,
    // Gopher char-coverage repetition: top-bigram + duplicated-5-gram
    // position coverage per doc (union semantics, no clipping needed)
    "q163_gopher_coverage"   -> TextOps.gopherCoverageOracle,
    // RefinedWeb URL-level dedup: scheme/www/query/fragment/slash
    // canonicalization, per-source collapse counts
    "q164_url_canon_dedup"   -> UrlOps.urlCanonDedupOracle,
    // dynamic-batching audit: arrival vs length-sorted batch padding
    // via the distributed two-phase global rank (q60 shape)
    "q165_batch_plan"        -> TrainPrep.batchPlanOracle,
    // C4 §2.2 bad-word document filter over the injected-lexicon table
    "q166_lexicon_filter"    -> Lexicon.lexiconFilterOracle,
    // exact tie-aware Mann–Whitney AUC of q35 quality vs the lexicon label
    "q167_quality_auc"       -> Lexicon.qualityAucOracle,
    // hashed-feature linear classifier: train on even half, eval on odd
    "q168_hashed_classifier" -> Lexicon.hashedClassifierOracle,
    // reliability-diagram bins over the classifier's eval-half scores
    "q169_calibration_bins"  -> Lexicon.calibrationBinsOracle,
    // persisted-IVF maintenance: new-release assignment drift per cell
    "q170_ivf_drift"         -> Similarity.ivfDriftOracle,
    // per-label release-over-release centroid cosine (micro-unit exact)
    "q171_centroid_drift"    -> Similarity.centroidDriftOracle,
    // context-window truncation loss per (max_len, source)
    "q172_truncation_loss"   -> TrainPrep.truncationLossOracle,
    // MinHash-LSH fuzzy decontamination vs the carved benchmark
    "q173_fuzzy_decontam"    -> Dedup.fuzzyDecontamOracle,
    // classifier-gated curation funnel (lexgate → clsgate → dedup → sample)
    "q174_funnel_v4"         -> TrainPrep.funnelV4Oracle,
    // reciprocal-rank fusion of BM25 + IDF-overlap rankings (hybrid search)
    "q175_rrf_fusion"        -> Retrieval.rrfFusionOracle,
    // IVF recall-vs-nprobe tuning curve against brute-force truth
    "q176_nprobe_sweep"      -> Similarity.nprobeSweepOracle,
    // content-vs-declared language confusion matrix
    "q177_lang_confusion"    -> TextOps.langConfusionOracle,
    // exact histogram-derived Gini of per-source token lengths
    "q178_length_gini"       -> TextOps.lengthGiniOracle,
    // vector-store pre-flight: dims / NaN / zero vectors / norm envelope
    "q179_embed_hygiene"     -> Similarity.embeddingHygieneOracle,
    // hand-rolled WAV container round-trip: encode → chunk-walk parse
    "q180_audio_decode"      -> Multimodal.audioDecodeOracle,
    // per-source dataset card composing the library's hygiene signals
    "q181_data_card"         -> DataCard.dataCardOracle,
    "q182_gif_decode"        -> Multimodal.gifDecodeOracle,
    "q183_embed_dedup_capped" -> Dedup.embedDedupCappedOracle,
    "q184_lsh_band_sweep"    -> Dedup.lshBandSweepOracle,
    "q185_release_diff"      -> Releases.releaseDiffOracle,
    "q186_metadata_kappa"    -> TextOps.metadataKappaOracle,
    "q187_collocations"      -> TextOps.collocationsOracle,
    "q188_integrity_audit"   -> Integrity.integrityAuditOracle,
    "q189_percentile_gate"   -> TextOps.percentileGateOracle,
    "q190_simpson_conc"      -> TextOps.simpsonConcentrationOracle,
    "q191_stratified_split"  -> TrainPrep.stratifiedSplitOracle,
    "q192_video_decode"      -> Multimodal.videoDecodeOracle,
    "q193_fluency_score"     -> Corpus.fluencyScoreOracle,
    "q194_filter_overlap"    -> TrainPrep.filterOverlapOracle,
    "q195_release_drift"     -> Releases.releaseDriftOracle,
    "q196_hubness_audit"     -> Similarity.hubnessAuditOracle,
    "q197_memorization"      -> Corpus.memorizationProbeOracle,
    "q198_nfc_audit"         -> EncodingQa.nfcAuditOracle,
    "q199_source_overlap"    -> Dedup.sourceOverlapOracle,
    "q200_ensemble_rank"     -> Ensemble.ensembleRankOracle,
    "q201_curriculum"        -> TrainPrep.curriculumPhasesOracle,
    "q202_contrastive_pairs" -> Corpus.contrastivePairsOracle,
    "q203_length_bias"       -> Bias.lengthBiasOracle,
    "q204_audio_segments"    -> Multimodal.audioSegmentsOracle,
    "q205_span_corruption"   -> TrainPrep.spanCorruptionOracle,
    "q206_k_anonymity"       -> Pii.kAnonymityOracle,
    "q207_jsonl_roundtrip"   -> graft.sources.Jsonl.jsonlRoundTripOracle,
    "q208_lexical_richness"  -> TextOps.lexicalRichnessOracle,
    "q209_containment_join"  -> SimJoin.containmentJoinOracle,
    "q210_image_ahash"       -> Multimodal.imageAhashOracle,
    "q211_keeper_sweep"      -> Dedup.keeperPolicySweepOracle,
    "q212_quantile_norm"     -> Bias.quantileNormOracle,
    "q213_audio_envelope"    -> Multimodal.audioFingerprintOracle,
    "q214_novelty_quality"   -> Corpus.noveltyByQualityOracle,
    "q215_pii_cooccur"       -> Pii.piiCooccurrenceOracle,
    "q216_shard_plan"        -> TrainPrep.shardPlanOracle,
    "q217_bpe_vocab_sweep"   -> Bpe.bpeVocabSweepOracle,
    "q218_bbit_minhash"      -> Dedup.bbitMinhashOracle,
    "q219_zipf_decay"        -> TextOps.zipfDecayOracle,
    "q220_code_detect"       -> CodeDetect.codeDetectOracle,
    "q221_centroid_affinity" -> Similarity.centroidAffinityOracle,
    "q222_cdc_chunks"        -> Cdc.cdcChunksOracle,
    "q223_bitext_margin"     -> Similarity.bitextMarginOracle,
    "q224_image_dhash"       -> Multimodal.imageDhashOracle,
    "q225_loop_detect"       -> TextOps.loopDetectOracle,
    "q226_source_minhash_sim" -> Dedup.sourceMinhashSimOracle,
    "q227_top_pc"            -> Similarity.topPcOracle,
    "q228_pc_projection"     -> Similarity.pcProjectionOracle,
    "q229_image_near_dup"    -> Multimodal.imageNearDupOracle,
    "q230_matryoshka_recall" -> Similarity.matryoshkaRecallOracle,
    "q231_split_leak_neardup" -> Dedup.splitLeakNearDupOracle,
    "q232_skipgram_decay"    -> TextOps.skipgramDecayOracle,
    "q233_audio_dup_groups"  -> Multimodal.audioDupGroupsOracle,
    "q234_sketch_referee"    -> Dedup.sketchRefereeOracle,
    "q235_release_chunk_novelty" -> Cdc.releaseChunkNoveltyOracle,
    "q236_chunk_size_audit"  -> Cdc.chunkSizeAuditOracle,
    "q237_image_phash"       -> Multimodal.imagePhashOracle,
    "q238_mrr_eval"          -> Retrieval.mrrEvalOracle,
    "q239_hybrid_retrieval"  -> Retrieval.hybridRetrievalOracle,
    "q240_cluster_purity"    -> Dedup.clusterPurityOracle,
    "q241_paraphrase_pairs"  -> Dedup.paraphrasePairsOracle,
    "q242_lsh_band_planner"  -> Dedup.lshBandPlannerOracle,
    "q243_cluster_cohesion"  -> Dedup.clusterCohesionOracle,
    "q244_soft_dedup"        -> Dedup.softDedupWeightsOracle,
    "q245_ivf_rebalance"     -> Similarity.ivfRebalanceOracle,
    "q246_ivf_persist"       -> Similarity.ivfPersistOracle,
    "q247_passage_retrieval" -> Retrieval.passageRetrievalOracle,
    "q248_context_pack"      -> Retrieval.contextPackOracle,
    "q249_ivf_upsert"        -> Similarity.ivfUpsertOracle,
    "q250_ivf_upsert_query"  -> Similarity.ivfUpsertQueryOracle,
    "q251_binary_quant"      -> Similarity.binaryQuantRecallOracle,
    "q252_ndcg_eval"         -> Retrieval.ndcgEvalOracle,
    "q253_grounding_audit"   -> Retrieval.groundingAuditOracle,
    "q254_clip_align_stub"   -> Multimodal.clipAlignStubOracle,
    "q255_license_tag"       -> License.licenseTagOracle,
    "q256_streaming_ivf_upsert" -> Similarity.streamingIvfUpsertOracle,
    "q257_context_reuse"     -> Retrieval.contextReuseOracle,
    "q258_ivf_delete_query"  -> Similarity.ivfDeleteQueryOracle,
    "q259_ivf_compact_query" -> Similarity.ivfCompactQueryOracle,
    "q260_ivf_compact_accounting" -> Similarity.ivfCompactAccountingOracle,
    "q261_token_fertility"   -> TextOps.tokenFertilityOracle,
    "q262_bt_strength"       -> Preference.btStrengthOracle,
    "q263_text_index_build"  -> Retrieval.textIndexBuildOracle,
    "q264_text_index_query"  -> Retrieval.textIndexQueryOracle,
    "q265_pref_cycles"       -> Preference.prefCyclesOracle,
    "q266_text_upsert"       -> Retrieval.textUpsertOracle,
    "q267_text_upsert_query" -> Retrieval.textUpsertQueryOracle,
    "q268_text_delete_query" -> Retrieval.textDeleteQueryOracle,
    "q269_text_compact_query" -> Retrieval.textCompactQueryOracle,
    "q270_text_compact_accounting" -> Retrieval.textCompactAccountingOracle,
    "q271_hybrid_from_stores" -> Retrieval.hybridFromStoresOracle,
    "q272_streaming_text_upsert" -> Retrieval.streamingTextUpsertOracle,
  )
}
