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
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (
    relational,
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
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# The driver's correctness gate hashes the first 50 registry entries per
# round.  The r01-r06 union covers all prior names (133/133 oracles
# green), so rotation optimizes for CODE CURRENCY: every name whose
# driver row predates the code that currently backs it gets re-hashed
# first.  Round-7 window: the 36 names whose newest driver row is
# r04-era (the last stale cohort — the sketch/ranking/graph/curriculum/
# funnel/packing/contrastive waves; after this window every registry
# name's newest driver row is r05+ code), then the round-7 gate entries
# and queries whose code round 7 touched (36 + 14 = 50).
_R07_R04_ERA = [
    "ann_ivf_topk", "ann_ivf_trained_topk", "ann_pq_topk", "bm25_topk",
    "cluster_balanced_sample", "cms_heavy_hitters", "cohort_retention",
    "curriculum_phases", "doc_chunks", "doclen_quantiles",
    "dsir_weights", "embedding_neardup_pairs", "epoch_shuffle",
    "event_funnel", "events_range_join", "hashed_tf_features",
    "hll_distinct_tokens", "kmeans_cells", "knn_graph", "knn_pagerank",
    "mixture_sample", "pack_sequences", "per_source_sample",
    "pii_scrub", "priority_sample", "quality_stratified_sample",
    "semantic_dedup", "source_quality_rollup", "stratified_sample",
    "streaming_attribution_join", "streaming_cms_cells",
    "streaming_dedup_keys", "streaming_hll_registers",
    "streaming_session_stats", "streaming_windowed_counts",
]
_R07_NEW = [
    # round-7 additions + r7-touched code (allpairs gains the
    # prefix-key skew cap this round)
    "allpairs_jaccard_join",
    # the GD trainer's round-1 fixed-point sufficient statistics —
    # the driver now hashes the classifier's math
    "classifier_gd_round_stats",
    # round-7 gate entries: exact-substring span dedup (Lee et al.
    # 2022), readability sufficient statistics, Kneser-Ney continuation
    # counts — each a new oracle-bearing operator, hashed in its
    # landing round
    "duplicate_ngram_spans", "readability_stats", "kn_bigram_stats",
    "wordpiece_encode", "embedding_moment_stats",
    "embedding_dim_quantiles", "embedding_covariance",
    "kcenter_coreset", "jl_projection", "shingle_minhash_recall",
    "pca_leading_component",
    # remaining slots re-hash the oldest r05-row names for freshness
    "bpe_merges", "bpe_encode",
]
# Round-8 rotation note: the freshness fillers displaced by this
# round's new gate entries still carry r05-era rows —
# boilerplate_spans, simhash_neardup_pairs, contrastive_triples,
# dedup_report, training_set_manifest, knn_reciprocal_pairs,
# minhash_containment, mmr_diverse_topk, source_overlap_matrix,
# ngram_novelty — rotate them (plus any r8-touched names) into the r8
# window alongside whatever r8 adds. The late-r7 additions beyond slot
# 50 (dedup_savings_report, minhash_estimate_calibration,
# embedding_standardized, ann_recall_audit, curation_funnel_report,
# cdc_chunks, cdc_chunk_dedup, zorder_layout_keys,
# zorder_skipping_stats, layout_scan_savings, split_leakage_audit,
# url_dedup_keep, padding_waste_audit) have local oracle parity but no
# driver row yet — they go first.
_R07_WINDOW = _R07_R04_ERA + _R07_NEW
assert len(_R07_WINDOW) == 50, len(_R07_WINDOW)
_order = _R07_WINDOW + [n for n in QUERIES if n not in set(_R07_WINDOW)]
QUERIES = {n: QUERIES[n] for n in _order}
ORACLES = {n: ORACLES[n] for n in _order if n in ORACLES}
