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
    mlops,
    evolution,
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
# Round-9 rotation note: (a) late-r8 queries with local parity but no
# driver row yet — event_trend_robust, bootstrap_replica_means,
# lm_next_token_accuracy, xml_ingest_stats, orc_roundtrip_stats,
# table_expectations_audit, scd2_customer_versions, cdc_apply_changes,
# ab_test_zscore, moving_median_counts, seasonality_profile,
# ops_health_report, ks_two_sample, mannwhitney_u, order_priority_check,
# linestatus_priority, customer_order_distribution,
# sales_opportunity_by_nation, bucketed_join_stats,
# knn_label_agreement, image_patch_stats, returned_item_revenue,
# small_qty_order_revenue, pmi_collocations, knn_label_propagation,
# image_augment_stats, stratified_kfold_assign, unimax_language_sampling,
# k_anonymity_audit, forecast_revenue_change, suppliers_kept_waiting,
# schema_evolution_stats, embedding_int8_quantization, cuped_adjusted_ab,
# conversion_latency_quantiles, inverted_index_stats,
# image_hist_equalization, disjunctive_discount_revenue,
# parts_supplier_relationship, product_type_profit,
# large_volume_customers, event_path_trigrams, snapshot_diff_stats,
# ols_trend_stats, modality_alignment_audit, welch_t_stats,
# source_concentration — the last three are registry-only this round
# (landed after the final committed bench; add them to HEADLINE in r9)
# (the r8
# window was already full with the verdict-mandated rotation when they
# landed); (b) still carrying r05-era rows after this window —
# ann_ivfpq_topk, ann_lsh_buckets,
# asof_interp_per_user, asof_interp_refs, azint_1d, azint_2d,
# chi2_filter_auto, copurchase_lift, dedup_exact, dezinger_flags,
# doc_fingerprints, event_rate_cusum, event_transition_matrix,
# knn_triangles (displaced r8 fillers),
# mad_outliers, minhash_lsh_pairs, minhash_signatures, monitor_norm,
# pricing_summary,
# reflections_triclinic, revenue_by_nation, rolling_active_users,
# scanpoint_stats, sessionize_events, simhash16,
# streaming_incremental_stats, streaming_pricing_summary,
# streaming_running_stats, tfidf_top_terms, token_stats,
# topk_orders_per_customer, train_val_test_split, user_rfm_segments
# (plus the by-design no-oracle trio).  Rotate them (plus any
# r9-touched names) into the r9 window.
# Round-9 window: ALL 47 never-driver-checked late-r8 names (the full
# rotation-note list — their first driver rows) plus r9's 3 new gate
# entries, landed BEFORE the gate snapshot so they get rows in their
# own round (the growth cap the r8 verdict mandated: new oracle-gate
# names per round ≤ window slack after rotation; this round 47+3=50
# exactly). r9 therefore closes with ZERO never-checked names.
_R09_NEVER_CHECKED = [
    "event_trend_robust", "bootstrap_replica_means",
    "lm_next_token_accuracy", "xml_ingest_stats", "orc_roundtrip_stats",
    "table_expectations_audit", "scd2_customer_versions",
    "cdc_apply_changes", "ab_test_zscore", "moving_median_counts",
    "seasonality_profile", "ops_health_report", "ks_two_sample",
    "mannwhitney_u", "order_priority_check", "linestatus_priority",
    "customer_order_distribution", "sales_opportunity_by_nation",
    "bucketed_join_stats", "knn_label_agreement", "image_patch_stats",
    "returned_item_revenue", "small_qty_order_revenue",
    "pmi_collocations", "knn_label_propagation", "image_augment_stats",
    "stratified_kfold_assign", "unimax_language_sampling",
    "k_anonymity_audit", "forecast_revenue_change",
    "suppliers_kept_waiting", "schema_evolution_stats",
    "embedding_int8_quantization", "cuped_adjusted_ab",
    "conversion_latency_quantiles", "inverted_index_stats",
    "image_hist_equalization", "disjunctive_discount_revenue",
    "parts_supplier_relationship", "product_type_profit",
    "large_volume_customers", "event_path_trigrams",
    "snapshot_diff_stats", "ols_trend_stats", "modality_alignment_audit",
    "welch_t_stats", "source_concentration",
]
_R09_NEW = [
    # r9 gate entries (all in bench.HEADLINE): the WordPiece likelihood
    # trainer + its trained-vocab encode, and the wild-web image census
    # (Adam7 PNG + progressive JPEG + quarantine verdicts)
    "wordpiece_merges", "wordpiece_trained_encode", "web_image_census",
]
# Round-10 rotation note: (a) the no-oracle trio — compression_ratio,
# lm_perplexity, quality_classifier_scores — now that the never-checked
# backlog is clear, give each a rows+schema slot (their last driver
# rows are r5-era no_oracle errs; a current "runs clean, right shape"
# row removes the only never-green ledger rows); (b) names still
# carrying r05-era rows — ann_ivfpq_topk, ann_lsh_buckets,
# asof_interp_per_user, asof_interp_refs, azint_1d, azint_2d,
# chi2_filter_auto, copurchase_lift, dedup_exact, dezinger_flags,
# doc_fingerprints, event_rate_cusum, event_transition_matrix,
# knn_triangles, mad_outliers, minhash_lsh_pairs, minhash_signatures,
# monitor_norm, pricing_summary, reflections_triclinic,
# revenue_by_nation, rolling_active_users, scanpoint_stats,
# sessionize_events, simhash16, streaming_incremental_stats,
# streaming_pricing_summary, streaming_running_stats, tfidf_top_terms,
# token_stats, topk_orders_per_customer, train_val_test_split,
# user_rfm_segments; (c) any r10-touched names. Cap r10's new gate
# entries at the slack this leaves (~14).
_R09_WINDOW = _R09_NEVER_CHECKED + _R09_NEW
assert len(_R09_WINDOW) == 50, len(_R09_WINDOW)
_order = _R09_WINDOW + [n for n in QUERIES if n not in set(_R09_WINDOW)]
QUERIES = {n: QUERIES[n] for n in _order}
ORACLES = {n: ORACLES[n] for n in _order if n in ORACLES}
