package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is one operator from SURVEY.md §2's inventory;
  * each oracle-checkable query has an ANSI-SQL twin in `oracleSql`
  * (column names aligned on both sides — the driver sorts columns by name
  * and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * "What does each drone output at time T?" — the reference's whole
    * reason to exist (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    Reference.q17EffectiveChannels(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational inventory
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_region_rollup" -> (Relational.q02RegionRollup _),
    "q03_revenue_by_priority" -> (Relational.q03RevenueByPriority _),
    "q04_semi_join" -> (Relational.q04SemiJoin _),
    "q05_anti_join" -> (Relational.q05AntiJoin _),
    "q06_filter_pushdown" -> (Relational.q06FilterPushdown _),
    "q07_top_orders_per_customer" -> (Relational.q07TopOrdersPerCustomer _),
    "q08_running_total" -> (Relational.q08RunningTotal _),
    "q09_top_customers" -> (Relational.q09TopCustomers _),
    "q10_set_ops" -> (Relational.q10SetOps _),
    "q11_rollup" -> (Relational.q11Rollup _),
    "q12_distinct_users" -> (Relational.q12DistinctUsers _),
    // §2.1 reference-semantics operators (batch twins)
    "q13_validate_cascade" -> (Reference.q13ValidateCascade _),
    "q14_json_extract" -> (Reference.q14JsonExtract _),
    "q15_mac_format" -> (Reference.q15MacFormat _),
    "q16_rescale" -> (Reference.q16Rescale _),
    "q17_effective_channels" -> (Reference.q17EffectiveChannels _),
    "q18_sentinel_merge" -> (Reference.q18SentinelMerge _),
    "q19_forward_fill" -> (Reference.q19ForwardFill _),
    "q20_last_per_key" -> (Reference.q20LastPerKey _),
    "q21_sessionize" -> (Reference.q21Sessionize _),
    "q22_snapshot_derived" -> (Reference.q22SnapshotDerived _),
    // LLM-data-pipeline operators (SURVEY.md §2.2 last row; VERDICT r1 #1)
    "q23_exact_dedup" -> (Pipeline.q23ExactDedup _),
    "q24_near_dup_minhash" -> (Pipeline.q24NearDupMinhash _),
    "q25_similarity_topk" -> (Pipeline.q25SimilarityTopk _),
    "q26_text_stats" -> (Pipeline.q26TextStats _),
    "q27_lang_id" -> (Pipeline.q27LangId _),
    "q28_simhash" -> (Pipeline.q28Simhash _),
    "q29_fingerprint" -> (Pipeline.q29Fingerprint _),
    "q30_embedding_near_dup" -> (Pipeline.q30EmbeddingNearDup _),
    "q31_ivf_ann" -> (Pipeline.q31IvfAnn _),
    // full command lifecycle (R1/P5/F1 complete) + multimodal plumbing
    "q32_command_router" -> (Router.q32CommandRouter _),
    "q33_multimodal_stats" -> (Multimodal.q33MultimodalStats _),
    // J2 mac-keyed lookup + J3 positional access; full set-op family
    "q34_mac_lookup" -> (Reference.q34MacLookup _),
    "q35_set_ops" -> (Reference.q35SetOps _),
    // approximate aggregates (HLL sketch — estimate is engine-specific,
    // so the oracle checks exact counts + the 5% accuracy contract)
    "q36_approx_distinct" -> (Relational.q36ApproxDistinct _),
    // generalized as-of join (library operator graft.operators.Joins)
    "q37_asof_join" -> (Joins.q37AsofJoin _),
    "q38_range_join" -> (Joins.q38RangeJoin _),
    "q39_cube" -> (Relational.q39Cube _),
    // round 3: prefix-filter near-dup + deterministic corpus split
    "q40_ngram_jaccard" -> (Pipeline.q40NgramJaccard _),
    "q41_stratified_split" -> (Pipeline.q41StratifiedSplit _),
    // quantile family + time-range window frames + pivot
    "q42_percentiles" -> (Relational.q42Percentiles _),
    "q43_rolling_window" -> (Relational.q43RollingWindow _),
    "q44_pivot" -> (Relational.q44Pivot _),
    "q45_unpivot" -> (Relational.q45Unpivot _),
    // round 4: corpus-curation operators — quality gate, vocabulary
    // top-k, PII scrub, test-set decontamination, dup-cluster CC
    "q46_quality_filter" -> (Pipeline.q46QualityFilter _),
    "q47_vocab_topk" -> (Pipeline.q47VocabTopk _),
    "q48_pii_scrub" -> (Pipeline.q48PiiScrub _),
    "q49_contamination" -> (Pipeline.q49Contamination _),
    "q50_dedup_clusters" -> (Pipeline.q50DedupClusters _),
    // round 5: SemDeDup-shaped cluster-scoped embedding dedup +
    // map-typed channel-name lookup (SURVEY §2.2 scalar row)
    "q51_semantic_dedup" -> (Pipeline.q51SemanticDedup _),
    "q52_channel_map" -> (Reference.q52ChannelMap _),
    // round 6: corpus-derived k-means centroids (the SemDeDup "choose k"
    // step without a label crutch) + deterministic corpus mixing
    "q53_kmeans_clusters" -> (Pipeline.q53KmeansClusters _),
    "q54_corpus_mix" -> (Pipeline.q54CorpusMix _),
    "q55_quantized_ann" -> (Pipeline.q55QuantizedAnn _),
    "q56_passage_dedup" -> (Pipeline.q56PassageDedup _),
    "q57_bm25" -> (Pipeline.q57Bm25 _),
    "q58_unigram_quality" -> (Pipeline.q58UnigramQuality _),
    "q59_sequence_packing" -> (Pipeline.q59SequencePacking _),
    // round 10: the GK-sketch quantile path (q42's constant-state twin)
    // + the label-free derived-centroid SemDeDup composition
    "q60_approx_percentiles" -> (Relational.q60ApproxPercentiles _),
    "q61_derived_semantic_dedup" -> (Pipeline.q61DerivedSemanticDedup _),
    // second + third real multimodal modalities: WAV/PCM decode via
    // javax.sound, frame-packed video via per-frame javax.imageio
    "q62_audio_stats" -> (Multimodal.q62AudioStats _),
    "q63_video_stats" -> (Multimodal.q63VideoStats _),
    // bounded-memory heavy hitters (Misra-Gries + exact recount) — the
    // 100 TB twin of q47's full-vocabulary groupBy
    "q64_heavy_hitters" -> (Pipeline.q64HeavyHitters _),
    // statistical moment aggregates (corr/stddev/covar co-moments)
    "q65_stats_moments" -> (Relational.q65StatsMoments _),
    // deterministic per-stratum sample (bounded TopK on portable hash)
    "q66_deterministic_sample" -> (Pipeline.q66DeterministicSample _),
    // OLS regression aggregates (slope/intercept/r2 co-moments)
    "q67_regression" -> (Relational.q67Regression _),
    // round 11: intra-document repetition (Gopher duplicated-3-gram
    // rule) — the quality signal corpus-level dedup can't see
    "q68_repetition_filter" -> (Pipeline.q68RepetitionFilter _),
    // frame-sample + real thumbnail resize: decode cost scales with
    // SAMPLED frames, not stored ones
    "q69_video_thumbnails" -> (Multimodal.q69VideoThumbnails _),
    // bigram-LM quality (add-one smoothed conditional model) — q58's
    // unigram can't see broken word order; this can
    "q70_bigram_quality" -> (Pipeline.q70BigramQuality _),
    // incremental crawl dedup: batch anti-join vs the reference corpus,
    // Bloom-pruned reference exchange (the production L1 shape)
    "q71_incremental_dedup" -> (Pipeline.q71IncrementalDedup _),
    // content-defined chunking passage dedup — catches the shifted
    // copies fixed-grid chunking (q56) structurally cannot see
    "q72_cdc_passage_dedup" -> (Pipeline.q72CdcPassageDedup _),
    // Count-Min sketch frequency estimation — the third bounded-memory
    // sketch (MG finds top keys, GK summarizes quantiles, CMS answers
    // point frequency queries from 4096 counters)
    "q73_cms_frequency" -> (Pipeline.q73CmsFrequency _),
    // priority sampling (Duffield-Lund-Thorup): weight-proportional
    // per-stratum sample + unbiased subset-sum estimator, division-only
    // priorities (IEEE-exact across engines, no libm dependence)
    "q74_priority_sample" -> (Pipeline.q74PrioritySample _),
    // hashed-feature linear classifier (fastText-shaped quality gate):
    // the model is a plan-literal weight array over 4096 hash buckets —
    // vocabulary-independent, one map-side scan, integer-exact scores
    "q75_classifier_filter" -> (Pipeline.q75ClassifierFilter _),
    // substring-level duplicate-span dedup: corpus-wide repeated
    // 8-gram positions → per-document interval union — the distributed
    // analog of suffix-array substring dedup, no all-pairs
    "q76_duplicate_spans" -> (Pipeline.q76DuplicateSpans _),
    // ordered event-sequence funnel: view→click→purchase with strict
    // temporal order, every keyed op on ONE user_id partitioning
    "q77_funnel" -> (Relational.q77Funnel _),
    // cohort retention triangle on exact integer epoch weeks
    "q78_cohort_retention" -> (Relational.q78CohortRetention _),
    // per-source quota cap: k best docs per domain by the q75
    // classifier score, selected by the bounded TopK aggregator
    "q79_source_quota" -> (Pipeline.q79SourceQuota _),
    // JL random-projection dim reduction: plan-literal ±1 matrix,
    // map-side codegen'd projection, per-label distortion certificate
    "q80_random_projection" -> (Pipeline.q80RandomProjection _),
    // fixed-point PageRank over the customer-supplier order graph:
    // integer-exact iterations, pre-partitioned persisted edges
    "q81_pagerank" -> (Pipeline.q81PageRank _),
    // equi-width price histogram: integer-cent buckets, map-side
    // partials into a value-range-bounded key space
    "q82_histogram" -> (Relational.q82Histogram _),
    // market-basket co-occurrence: in-row pair expansion bounded by
    // basket width — no self-join, two exchanges + TakeOrdered
    "q83_cooccurrence" -> (Relational.q83CoOccurrence _),
    // first-order (lerp) resample: q19's spine machinery with a
    // forward fill added — one user-partition exchange, no grid join
    "q84_lerp_resample" -> (Reference.q84LerpResample _),
    // ANN from the PERSISTED cluster-bucketed IVF index (index at
    // rest): build-if-absent at ingest, serve with zero re-clustering
    "q85_indexed_ann" -> (Pipeline.q85IndexedAnn _),
    // BM25 from the PERSISTED term-bucketed inverted index (q85's
    // index-at-rest posture applied to text retrieval)
    "q86_indexed_bm25" -> (Pipeline.q86IndexedBm25 _),
    // blocked fuzzy join by edit distance: broadcast vocabulary dim,
    // codegen'd map-side levenshtein, blocking exact by construction
    "q87_fuzzy_join" -> (Pipeline.q87FuzzyJoin _),
    // strong-tie triangle participation: degree-oriented wedge join
    // (compact-forward O(m^1.5) bound), corpus-derived support cut
    "q88_triangles" -> (Graph.q88Triangles _),
    // median/MAD robust outliers: two-pass exact medians via the
    // engine-shared interpolation tree, broadcast per-type stats
    "q89_robust_outliers" -> (Relational.q89RobustOutliers _),
    // Markov event-type transitions: one per-user window exchange
    // into a ≤|types|²-key count relation
    "q90_transition_matrix" -> (Relational.q90TransitionMatrix _),
    // canonicalize-then-dedup: digest groupBy over the normalized
    // text, formatting variants collapse on top of byte-exact dedup
    "q91_normalized_dedup" -> (Pipeline.q91NormalizedDedup _),
    // time-weighted average: trapezoid over lag pairs, window and
    // aggregate share one user-key exchange
    "q92_twap" -> (Relational.q92Twap _),
    // association rules on the q83 baskets: support/confidence/lift,
    // broadcast single-item counts, TakeOrdered top-20 by lift
    "q93_association_rules" -> (Relational.q93AssociationRules _),
    // single-scan data profiling: per-column nulls/distincts/ranges
    // from ONE pass (expand-planned multi-distinct), stack-unpivoted
    "q94_profile" -> (Relational.q94Profile _),
    // per-user EWMA: sequential left fold in-row over time-ordered
    // values — one user exchange, engine-shared arithmetic
    "q95_ewma" -> (Relational.q95Ewma _),
    // rank-distribution windows: percent_rank/cume_dist/ntile share
    // one per-type sort, deterministic tie order
    "q96_rank_distribution" -> (Relational.q96RankDistribution _),
    // image dedup, exact + perceptual: real-PNG corpus, digest groupBy,
    // aHash/dHash from decoded pixels, banded dHash join (pigeonhole-
    // exact at Hamming <= 3) — never all-pairs
    "q97_image_dedup" -> (Multimodal.q97ImageDedup _),
    // audio dedup, exact + gain-invariant: real-WAV corpus, digest
    // groupBy, energy-profile fingerprint from decoded PCM (comparisons
    // survive any positive gain) — pure groupBys, never all-pairs
    "q98_audio_dedup" -> (Multimodal.q98AudioDedup _),
    // video dedup, exact + trim-robust: real frame-packed corpus, every
    // frame individually decoded; containment pairs blocked on the
    // frame key (shared = min(n1, n2) — the re-cut-copy relation)
    "q99_video_dedup" -> (Multimodal.q99VideoDedup _),
    // BPE-style tokenizer merge learning: per-round corpus-wide pair
    // count (map-side partial combine), 1-row argmax snapshot inlined
    // as literals, greedy left-to-right merge fold — map-side rewrite
    "q100_bpe_merges" -> (Pipeline.q100BpeMerges _),
    // product-quantization ADC ANN: 4-byte codes (128x memory shrink),
    // bounded codebook snapshot as plan literals, map-side encode,
    // per-query 64-entry lookup table, integer micro-unit sums
    "q101_pq_ann" -> (Pipeline.q101PqAnn _),
    // cross-source near-dup contamination matrix: q24's LSH pair
    // derivation verbatim, source-pair rollup, exact E4-integer mass
    "q102_source_dup_matrix" -> (Pipeline.q102SourceDupMatrix _),
    // PQ index AT REST: build-if-absent, serve from persisted 4-int
    // codes + stored codebook (zero re-encoding), frozen-codebook
    // appends with a quantization-error rebuild trigger
    "q103_indexed_pq_ann" -> (Pipeline.q103IndexedPqAnn _),
    // per-language tokenizer fertility: q100's learn loop unchanged,
    // one extra bounded rollup — compression asymmetry feeds mixing
    "q104_tokenizer_fertility" -> (Pipeline.q104TokenizerFertility _),
    // per-type autocorrelation at lags 1-3: one window sort, co-moment
    // aggregates, in-row stack unpivot — serial-dependence diagnostics
    "q105_autocorrelation" -> (Relational.q105Autocorrelation _),
    // corpus snapshot diff: both crawls reduce to digests before the
    // exchange, one full-outer id join, added/removed/modified rollup
    "q106_snapshot_diff" -> (Pipeline.q106SnapshotDiff _),
    // IVF-PQ composed: coarse stage prunes candidates, PQ prunes
    // bytes — q31's membership + q101's integer ADC, one persist
    "q107_ivf_pq_ann" -> (Pipeline.q107IvfPqAnn _),
    // multi-touch attribution credit over the stream-stream join's
    // pair relation: equi user-key join, integer micro-unit shares
    "q108_attribution_credit" -> (Relational.q108AttributionCredit _),
    // residual IVF-PQ: the codebook spends itself on within-cell
    // variation (r = v - centroid), same 4-int codes, same integer ADC
    "q109_ivf_pq_residual" -> (Pipeline.q109IvfPqResidual _),
    // dedup yield curve: per-crawl-batch share of first-seen digests,
    // the crawl-saturation signal — one scan, one digest exchange
    "q110_dedup_yield" -> (Pipeline.q110DedupYield _),
    // quality-aware keeper per duplicate cluster: star CC components,
    // max_by on the exact len-then-id integer key, bounded rollup
    "q111_cluster_keepers" -> (Pipeline.q111ClusterKeepers _),
    // markup/boilerplate extraction: tag-strip + line-rule cascade
    // over the deterministic page fixture, per-language shares
    "q112_markup_extract" -> (Pipeline.q112MarkupExtract _),
    // end-to-end curation funnel: gate → canonical dedup → near-dup
    // keepers → decontam → mixing quota, per-stage survivor counts
    "q113_curation_funnel" -> (Pipeline.q113CurationFunnel _),
    // ANN tuning sweep: recall@5 vs candidates at probe radius 0/1 —
    // the nprobe knob table, measured against the exact top-5
    "q114_ann_recall_sweep" -> (Pipeline.q114AnnRecallSweep _),
    // crawl-over-crawl token-distribution drift: integer-exact total
    // variation per language — the refit signal for tokenizer/LM/mix
    "q115_token_drift" -> (Pipeline.q115TokenDrift _),
    // length-distribution drift: per-language lower deciles of both
    // crawls + shift, pure integer arithmetic — the structural axis
    "q116_length_drift" -> (Pipeline.q116LengthDrift _),
    // embedding-centroid drift: per-label centroid cosine + norm ratio
    // between re-embeddings — the corpus-level index-staleness signal
    "q117_embedding_drift" -> (Pipeline.q117EmbeddingDrift _),
    // multi-probe ANN serve: q85's persisted index served at probe
    // radius 1 — the q114 knob turned, index untouched
    "q118_multi_probe_ann" -> (Pipeline.q118MultiProbeAnn _),
    // q114's sweep with the coarse stage swapped to Lloyd-trained
    // corpus-derived centroids — the label-free production router
    "q119_trained_coarse_sweep" -> (Pipeline.q119TrainedCoarseSweep _),
    // the full production stack at nprobe > 1: IVF prunes candidates,
    // PQ prunes bytes, radius-1 probes buy back boundary recall
    "q120_multi_probe_ivf_pq" -> (Pipeline.q120MultiProbeIvfPq _),
    // residual IVF-PQ at radius 1: probes stay inside the coarse
    // cell, so one residual ADC table per query stays exact
    "q121_multi_probe_residual" -> (Pipeline.q121MultiProbeResidual _),
    // deterministic shuffle + shard export manifest: the training-order
    // permutation as one hash exchange + in-partition sort, with an
    // order-sensitive checksum per shard
    "q122_shard_manifest" -> (Pipeline.q122ShardManifest _),
    // temperature mixing (XLM-R α-sampling) at α = 1/2: kept ∝ n^α,
    // sqrt-exact cross-engine — q54's uniform mix with the knob added
    "q123_temperature_mix" -> (Pipeline.q123TemperatureMix _),
    // near-dup decontamination of the train/eval split boundary: the
    // leakage mode exact-gram decontam (q49) misses
    "q124_split_decontam" -> (Pipeline.q124SplitDecontam _),
    // q59's concat-and-chunk packing composed with q122's shuffle:
    // per-shard sequence counts in the order a trainer actually reads
    "q125_packed_shards" -> (Pipeline.q125PackedShards _),
    // token-budget temperature mixing: B-token mix at α = 1/2 with
    // nested (consistent-sampling) membership — the production ask
    "q126_token_budget_mix" -> (Pipeline.q126TokenBudgetMix _),
    // long-document chunking: cut docs past the context width into
    // fixed chunks — packing's complement for fitting sequences
    "q127_doc_chunking" -> (Pipeline.q127DocChunking _),
    // the complete nprobe knob table: q114's sweep at radius 0/1/2 —
    // brackets where recall-per-candidate flattens
    "q128_recall_sweep_r2" -> (Pipeline.q128RecallSweepR2 _),
    // seeded epoch orderings: one independent deterministic
    // permutation per training epoch, reproducible from the seed alone
    "q129_epoch_orders" -> (Pipeline.q129EpochOrders _),
    // the trained-coarse router SERVED: q119's sweep configuration as
    // a radius-1 serve path — both measured routers now servable
    "q130_trained_coarse_ann" -> (Pipeline.q130TrainedCoarseAnn _),
    // the LSH banding knob table: candidate volume + recall vs the
    // EXACT >=0.5-Jaccard truth for every banding of the 16-hash
    // signature — the dedup family's q114
    "q131_banding_sweep" -> (Pipeline.q131BandingSweep _),
    // duplicate-aware soft dedup: weight docs by 1/|near-dup cluster|
    // instead of dropping — per-language effective vs raw token mass
    "q132_soft_dedup_weights" -> (Pipeline.q132SoftDedupWeights _),
    // hybrid retrieval: per-query BM25 (sparse) + cosine (dense) legs
    // fused by integer reciprocal-rank fusion — the RAG serving stack
    "q133_hybrid_rrf" -> (Pipeline.q133HybridRrf _),
    // q126's token-budget mix with language masses in q132's
    // duplicate-discounted effective micro-tokens — dedup-aware mixing
    "q134_weighted_budget_mix" -> (Pipeline.q134WeightedBudgetMix _),
    // known-item retrieval eval: planted twins with asymmetric
    // modality coverage grade sparse vs dense vs hybrid — integer
    // MRR/hits, the measured argument for the second leg
    "q135_retrieval_eval" -> (Pipeline.q135RetrievalEval _),
    // the fusion-weight knob table: weighted RRF over the q135
    // fixture — where MRR peaks is where a deployment fixes weights
    "q136_fusion_weights" -> (Pipeline.q136FusionWeights _),
    // curriculum export: q122's shards with shortest-first within-shard
    // order, certified by the order-sensitive manifest checksum
    "q137_curriculum_manifest" -> (Pipeline.q137CurriculumManifest _),
    // the production hybrid: BM25 from the inverted index at rest +
    // dense from the IVF index at radius 1, integer RRF fusion
    "q138_hybrid_at_rest" -> (Pipeline.q138HybridAtRest _),
    // the known-item eval under IVF pruning: what candidate pruning
    // costs twin recall/MRR — q114's price measured against a task
    "q139_pruned_eval" -> (Pipeline.q139PrunedEval _),
    // coverage-aware RRF vs plain on the q135 fixture: the weight of
    // a leg that cannot rank a doc shifts to the leg that can —
    // dominates plain on found/hits@1/MRR at every gate SF
    "q140_coverage_fusion" -> (Pipeline.q140CoverageFusion _),
    // incremental-export manifest algebra: two ingest waves, appended
    // vs full-re-export order checksums per shard — the oracle face
    // of Layout.appendShards' commutative sidecar merge
    "q141_append_manifest" -> (Pipeline.q141AppendManifest _),
    // the near-dup ingest gate's capacity audit: 16-bit signature
    // occupancy by distinct canonical digest — the measured
    // false-collapse curve the horizon is sized from
    "q142_gate_capacity" -> (Pipeline.q142GateCapacity _),
    // the gate's signature-WIDTH knob table: false collapse vs
    // planted edited-copy recall per width — fix nearDupBits where
    // false collapse dies while recall survives
    "q143_gate_width_sweep" -> (Pipeline.q143WidthSweep _),
    // the BANDED gate knob table: per (bands, bandBits) config the
    // one-hop false-collapse ceiling vs any-band planted recall —
    // prices the recall lever q143 proved necessary, and ingestGate
    // serves the chosen config (nearDupBands) with per-band bootstrap
    "q144_banded_gate_sweep" -> (Pipeline.q144BandedGateSweep _),
    // the composed IVF-PQ index at rest serving EXTERNAL queries:
    // routing-sidecar assignment + banked codes/codebook — row-identical
    // to q107, so the hash match certifies the whole banked round-trip
    "q145_ivfpq_routed" -> (Pipeline.q145IvfPqRouted _),
    // the standing manifest-vs-bytes reconcile audit, oracle-faced: a
    // real export at rest with the consistent replay window planted —
    // counts/checksums reconcile cleanly, only distinct-ids flags it
    "q146_export_reconcile" -> (Pipeline.q146ExportReconcile _),
    // the VERIFIED gate's knob table: exact-truth recall/precision per
    // (bands, rowsPerBand) prefix-band config — the gate's precision
    // is exact by construction, so this prices the one open axis,
    // candidate recall; (4,4) reconciles with q131's row
    "q147_verified_gate_sweep" -> (Pipeline.q147VerifiedGateSweep _),
    // the external-query face at nprobe > 1: routed assignment +
    // radius-1 probe expansion — row-identical to q120, so the hash
    // match certifies multi-probe over the banked round-trip
    "q148_routed_multiprobe" -> (Pipeline.q148RoutedMultiProbe _),
    // the verified gate's bucketCap knob table: FIFO-eviction recall
    // loss and worst-case keeper-state bytes per (config, cap) — the
    // ∞ row reconciles with q147's hit counts
    "q149_verified_cap_sweep" -> (Pipeline.q149VerifiedCapSweep _),
    // the banked-index duplicate audit, oracle-faced: real builds +
    // the production appends with a %17 replay planted — the
    // keys_unique flag catches exactly the IndexMaintain replay
    // window the drift reports see only inferentially
    "q150_index_reconcile" -> (Pipeline.q150IndexReconcile _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.sql
}
