"""Correctness-gate queries: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB oracle SQL string.

Every Spark query and its oracle are written against the driver's
testdata tables; the scalar math uses identical expression trees and the
aggregates use fixed-point integer sums (see :mod:`trx_spark.exact`), so
the two engines produce bit-identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trx_spark.queries import (
    auditq,
    bpe,
    classifier,
    corpus,
    curation,
    curriculum,
    embstats,
    layout,
    lm,
    multimodalq,
    packing,
    ranking,
    relational,
    similarity,
    sketches,
    streamingq,
    temporal,
    textdata,
    textquality,
    trxdomain,
    unigram,
    weburl,
    wordpiece,
    trxdomain2,
    trxdomain3,
    dataops,
    relational2,
    relational3,
    linkage,
    contracts,
    driftstats,
    bucketing,
    mgsketch,
    mlops,
    evolution,
    graphq,
    preference,
    langid,
    stataudit,
    lshtune,
)
from trx_spark.sources import textio

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (
    relational,
    relational2,
    trxdomain,
    trxdomain2,
    trxdomain3,
    textdata,
    similarity,
    corpus,
    curation,
    textquality,
    packing,
    layout,
    weburl,
    temporal,
    curriculum,
    sketches,
    ranking,
    bpe,
    wordpiece,
    unigram,
    embstats,
    auditq,
    lm,
    classifier,
    multimodalq,
    streamingq,
    dataops,
    textio,
    linkage,
    contracts,
    relational3,
    driftstats,
    bucketing,
    mlops,
    evolution,
    graphq,
    preference,
    langid,
    stataudit,
    lshtune,
    mgsketch,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# The driver's correctness gate hashes the first 50 registry entries per
# round.  The r01-r07 union covers every name that had a registry slot by
# r7-close (all latest rows green), so rotation optimizes for CODE
# CURRENCY: names with NO driver row ever go first, then names whose
# newest driver row is oldest.  Round-8 window: the 13 late-r7 queries
# that shipped after the r7 gate snapshot (local parity only — first
# driver hash here), `pq_codes` (newest row was r04; everything else is
# r05+), the 10 r05-era names queued by the r7 rotation note, then r8's
# new gate entries, then the oldest remaining r05-row names as fillers.
# (The r8 window itself — 14 never-checked + 10 queued-r05 +
# ann_cosine_topk + 25 r8-touched names — is recorded in
# CORRECTNESS_r08.json; the list literals were dropped once _order
# stopped reading them.)
# (The r9 window — all 47 never-checked late-r8 names + the 3 r9 gate
# entries — is recorded in CORRECTNESS_r09.json; r9 closed with zero
# never-driver-checked names, so rotation is pure code-currency now.)
# Round-10 window, executing the r9 verdict's rotation note exactly:
# (a) the no-oracle trio — their only driver rows ever are r5-era
# no_oracle errs; a current rows+schema row removes the last
# never-green ledger entries; (b) the 33 names still carrying r05-era
# rows; (c) r10-touched names: the two unigram-LM trainer gate entries
# (new this round — 2 new entries, well under the ~14 cap) plus the
# three decode gates riding the r10 JPEG-truncation/SOS/DHT parser
# hardening; (d) fillers = the alphabetically-first 9 of the oldest
# remaining rows (r06-era).
_R10_TRIO = [
    "compression_ratio", "lm_perplexity", "quality_classifier_scores",
]
_R10_STALE_R05 = [
    "ann_ivfpq_topk", "ann_lsh_buckets", "asof_interp_per_user",
    "asof_interp_refs", "azint_1d", "azint_2d", "chi2_filter_auto",
    "copurchase_lift", "dedup_exact", "dezinger_flags",
    "doc_fingerprints", "event_rate_cusum", "event_transition_matrix",
    "knn_triangles", "mad_outliers", "minhash_lsh_pairs",
    "minhash_signatures", "monitor_norm", "pricing_summary",
    "reflections_triclinic", "revenue_by_nation", "rolling_active_users",
    "scanpoint_stats", "sessionize_events", "simhash16",
    "streaming_incremental_stats", "streaming_pricing_summary",
    "streaming_running_stats", "tfidf_top_terms", "token_stats",
    "topk_orders_per_customer", "train_val_test_split",
    "user_rfm_segments",
]
_R10_TOUCHED = [
    "unigram_em_round_stats", "unigram_trained_encode",
    "jpeg_decode_stats", "video_decode_stats", "web_image_census",
]
_R10_FILLERS_R06 = [
    "ann_topk_lsh", "ann_topk_multiprobe", "audio_dedup_groups",
    "azint_qlims", "bigram_rarity", "cluster_topics",
    "concurrent_sessions_peak", "contamination_check", "corpus_keep_list",
]
# (The r10 window — trio + 33 r05-era + 5 r10-touched + 9 r06 fillers —
# is recorded in CORRECTNESS_r10.json; kept below only as history.)
_R10_WINDOW = _R10_TRIO + _R10_STALE_R05 + _R10_TOUCHED + _R10_FILLERS_R06
# Round-11 window, executing the r10 verdict's rotation note exactly:
# (a) the 11 r10 wave-2/3 queries that landed AFTER the r10 window
# sealed (local parity + the judge's own sf0.01 driver-sim 11/11 —
# first driver rows here); (b) ALL 38 names whose newest driver row is
# r06-era (the full remainder of the code-currency backlog — after
# this window no oracle-bearing name's newest row predates r07);
# (c) the one slot of slack goes to the r11 quantile-sketch batch gate
# (its streaming twin + the other r11 gate entries queue for r12).
_R11_WAVE3 = [
    "retrieval_mrr_audit", "ndcg_retrieval_audit", "sstem_rule_census",
    "fim_split_stats", "hilbert_layout_keys", "hilbert_scan_savings",
    "kmv_source_overlap", "streaming_kmv_sketch", "l_diversity_audit",
    "pagerank_copurchase", "bradley_terry_strengths",
]
_R11_STALE_R06 = [
    "curves_chi2_per_shot", "curves_scan_stats", "customers_without_orders",
    "decontaminated_docs", "dedup_clusters", "delay_codec",
    "diffs_plus_ref", "distinct_scan_points", "edit_distance_pairs",
    "events_pivot_counts", "filter_outlier_curves", "global_curve_stats",
    "image_dedup_groups", "lang_id", "lm_bigram_counts",
    "lsh_pairs_verified", "monitor_qwindow_median", "ngram_jaccard_pairs",
    "normalized_docs", "parts_with_orders", "polygon_mask_flags",
    "pricing_rollup", "quality_filter", "rebin_nearest",
    "reflections_cubic_si", "repetition_stats", "running_order_totals",
    "salted_skewjoin_stats", "shipping_priority", "slice_skip_first_last",
    "span_dedup", "supplier_revenue", "times_to_info", "token_count_bpe",
    "topk_ngrams", "value_gradient", "vocab_coverage",
    "winnowing_fingerprints",
]
_R11_NEW = ["quantile_sketch_events"]
# (The r11 window — wave3 + the 38 r06-era rows + the quantile gate —
# is recorded in CORRECTNESS_r11.json: 50/50 green; kept as history.)
_R11_WINDOW = _R11_WAVE3 + _R11_STALE_R06 + _R11_NEW
# Round-12 window, executing the r11 verdict's rotation note exactly:
# (a) the 11 r11 gate entries that landed AFTER the r11 window sealed
# (each verified vs its DuckDB oracle at sf0.001 AND sf0.01 in-session
# before landing; the r11 judge re-verified all 11 bit-exact — first
# driver rows here); (b) the 3 new r12 gates (MG heavy hitters batch +
# streaming, surprisal curriculum — same pre-landing verification);
# (c) code-currency: the alphabetically-first 36 of the 49 names whose
# newest driver row is r07-era.  The remaining 13 r07 names queue for
# r13 (priority_sample, quality_stratified_sample, readability_stats,
# semantic_dedup, shingle_minhash_recall, source_quality_rollup,
# stratified_sample, streaming_attribution_join, streaming_cms_cells,
# streaming_dedup_keys, streaming_hll_registers,
# streaming_session_stats, streaming_windowed_counts), PLUS
# heavy_hitters_by_source and dp_noisy_counts (landed after this
# window sealed; each verified vs its oracle at sf0.001 + sf0.01
# in-session) — after r13 no oracle-bearing name's newest row
# predates r08.
_R12_LATE_R11 = [
    "streaming_quantile_sketch", "ffd_pack_assignments", "ffd_pack_stats",
    "lang_id_trained", "t_closeness_audit", "training_dynamics_map",
    "benford_first_digit_audit", "hbos_outlier_scores", "neyman_allocation",
    "lsh_tuning_curve", "lm_surprisal_fix",
]
_R12_NEW = [
    "heavy_hitters_mg", "streaming_heavy_hitters", "surprisal_curriculum",
]
_R12_STALE_R07 = [
    "allpairs_jaccard_join", "ann_ivf_topk", "ann_ivf_trained_topk",
    "ann_pq_topk", "bm25_topk", "bpe_encode", "bpe_merges",
    "classifier_gd_round_stats", "cluster_balanced_sample",
    "cms_heavy_hitters", "cohort_retention", "curriculum_phases",
    "doc_chunks", "doclen_quantiles", "dsir_weights",
    "duplicate_ngram_spans", "embedding_covariance",
    "embedding_dim_quantiles", "embedding_moment_stats",
    "embedding_neardup_pairs", "epoch_shuffle", "event_funnel",
    "events_range_join", "hashed_tf_features", "hll_distinct_tokens",
    "jl_projection", "kcenter_coreset", "kmeans_cells", "kn_bigram_stats",
    "knn_graph", "knn_pagerank", "mixture_sample", "pack_sequences",
    "pca_leading_component", "per_source_sample", "pii_scrub",
]
_R12_WINDOW = _R12_LATE_R11 + _R12_NEW + _R12_STALE_R07
# (The r12 window is recorded in CORRECTNESS_r12.json: 50/50 green;
# kept as history.)
# Round-13 window, executing the r12 verdict's rotation note exactly:
# (a) the 13 names whose newest driver row is r07-era — the LAST of
# the code-currency backlog; (b) the 2 r12 gates that landed after the
# r12 window sealed (dp_noisy_counts, heavy_hitters_by_source — each
# verified vs its oracle at sf0.001 + sf0.01 in-session AND re-verified
# bit-exact by the r12 judge); (c) the 5 new r13 gates (windowed MG
# batch + streaming, DP heavy hitters + epsilon ledger, incremental
# manifest — same pre-landing verification, see LOCAL_VERIFICATION);
# (d) code-currency: the alphabetically-first 30 of the 48 names whose
# newest driver row is r08-era.  After r13 no oracle-bearing name's
# newest row predates r08 and never_checked == 0 for the first time.
# The remaining 18 r08-era names queue for r14 (pq_codes,
# promo_revenue_share, record_linkage_pairs, simhash_neardup_pairs,
# source_overlap_matrix, source_token_drift, split_leakage_audit,
# streaming_curation_keep, streaming_lsh_pairs, table_profile,
# tokenizer_fertility, training_set_manifest, trimmed_length_stats,
# url_dedup_keep, volume_shipping, wordpiece_encode,
# zorder_layout_keys, zorder_skipping_stats) PLUS dp_quantile, which
# landed after this window sealed (verified at sf0.001 + sf0.01
# in-session; provenance in LOCAL_VERIFICATION below).
_R13_STALE_R07 = [
    "priority_sample", "quality_stratified_sample", "readability_stats",
    "semantic_dedup", "shingle_minhash_recall", "source_quality_rollup",
    "stratified_sample", "streaming_attribution_join", "streaming_cms_cells",
    "streaming_dedup_keys", "streaming_hll_registers",
    "streaming_session_stats", "streaming_windowed_counts",
]
_R13_LATE_R12 = ["dp_noisy_counts", "heavy_hitters_by_source"]
_R13_NEW = [
    "heavy_hitters_windowed", "streaming_heavy_hitters_windowed",
    "dp_heavy_hitters", "dp_epsilon_ledger", "streaming_manifest",
]
_R13_STALE_R08 = [
    "ann_cosine_topk", "ann_opq_topk", "ann_recall_audit",
    "boilerplate_spans", "ccnet_quality_buckets", "cdc_chunk_dedup",
    "cdc_chunks", "cheapest_supplier_per_part", "contrastive_triples",
    "csv_ingest_stats", "curation_funnel_report", "decontam_bloom_flags",
    "dedup_report", "dedup_savings_report", "dictionary_tag_spans",
    "embedding_standardized", "event_type_correlation", "ewma_anomaly",
    "hybrid_rank_rrf", "jsonl_ingest_stats", "knn_reciprocal_pairs",
    "layout_scan_savings", "minhash_containment",
    "minhash_estimate_calibration", "mmr_diverse_topk",
    "national_market_share", "ngram_novelty", "opq_recall_audit",
    "padding_waste_audit", "png_decode_stats",
]
_R13_WINDOW = _R13_STALE_R07 + _R13_LATE_R12 + _R13_NEW + _R13_STALE_R08
# (The r13 window is recorded in CORRECTNESS_r13.json: 50/50 green;
# kept as history.)
# Round-14 window, executing the r13 verdict's rotation note exactly:
# (a) dp_quantile + dp_group_quantiles — the LAST two names with no
# driver row ever (landed after the r13 window sealed; verified vs
# their DuckDB oracles at sf0.001 + sf0.01 in-session, provenance in
# LOCAL_VERIFICATION) — after this window never_checked == 0 again;
# (b) the 18 names whose newest driver row is r08-era (the queue the
# r13 rotation note names explicitly); (c) code-currency fillers: the
# alphabetically-first 30 of the 49 names whose newest driver row is
# r09-era.  The remaining 19 r09-era names queue next
# (parts_supplier_relationship … xml_ingest_stats).
_R14_NEVER = ["dp_quantile", "dp_group_quantiles"]
_R14_STALE_R08 = [
    "pq_codes", "promo_revenue_share", "record_linkage_pairs",
    "simhash_neardup_pairs", "source_overlap_matrix", "source_token_drift",
    "split_leakage_audit", "streaming_curation_keep", "streaming_lsh_pairs",
    "table_profile", "tokenizer_fertility", "training_set_manifest",
    "trimmed_length_stats", "url_dedup_keep", "volume_shipping",
    "wordpiece_encode", "zorder_layout_keys", "zorder_skipping_stats",
]
_R14_STALE_R09 = [
    "ab_test_zscore", "bootstrap_replica_means", "bucketed_join_stats",
    "cdc_apply_changes", "conversion_latency_quantiles", "cuped_adjusted_ab",
    "customer_order_distribution", "disjunctive_discount_revenue",
    "embedding_int8_quantization", "event_path_trigrams",
    "event_trend_robust", "forecast_revenue_change", "image_augment_stats",
    "image_hist_equalization", "image_patch_stats", "inverted_index_stats",
    "k_anonymity_audit", "knn_label_agreement", "knn_label_propagation",
    "ks_two_sample", "large_volume_customers", "linestatus_priority",
    "lm_next_token_accuracy", "mannwhitney_u", "modality_alignment_audit",
    "moving_median_counts", "ols_trend_stats", "ops_health_report",
    "orc_roundtrip_stats", "order_priority_check",
]
_R14_WINDOW = _R14_NEVER + _R14_STALE_R08 + _R14_STALE_R09
# the driver hashes this many leading registry entries per round; the
# bench telemetry stamps it so committed artifacts track resizes
GATE_WINDOW = 50
assert len(_R14_WINDOW) == GATE_WINDOW, len(_R14_WINDOW)
_order = _R14_WINDOW + [n for n in QUERIES if n not in set(_R14_WINDOW)]
QUERIES = {n: QUERIES[n] for n in _order}
ORACLES = {n: ORACLES[n] for n in _order if n in ORACLES}

# Local-verification provenance for oracle-bearing names without a
# driver CORRECTNESS row yet (r12 verdict task 6): where/when the
# builder verified the gate vs its DuckDB oracle — cell-exact,
# order-insensitive, column-name-sorted (stricter than the driver's
# hash) — BEFORE landing it.  The bench stamps the relevant subset
# into BENCH_DETAIL's registry block so the artifact explains why a
# never-checked name is expected-green; entries are pruned once the
# name has a driver row.
LOCAL_VERIFICATION = {
    "heavy_hitters_windowed": {"round": 13, "sfs": ["0.001", "0.01"]},
    "streaming_heavy_hitters_windowed": {"round": 13, "sfs": ["0.001", "0.01"]},
    "dp_heavy_hitters": {"round": 13, "sfs": ["0.001", "0.01"]},
    "dp_epsilon_ledger": {"round": 13, "sfs": ["0.001", "0.01"]},
    "streaming_manifest": {"round": 13, "sfs": ["0.001", "0.01"]},
    # landed after the r13 window sealed; queued for the r14 window
    "dp_quantile": {"round": 13, "sfs": ["0.001", "0.01"]},
    "dp_group_quantiles": {"round": 13, "sfs": ["0.001", "0.01"]},
}
