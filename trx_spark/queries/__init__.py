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
    bpe,
    classifier,
    corpus,
    curation,
    curriculum,
    lm,
    packing,
    ranking,
    relational,
    similarity,
    sketches,
    streamingq,
    temporal,
    textdata,
    trxdomain,
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
    packing,
    temporal,
    curriculum,
    sketches,
    ranking,
    bpe,
    lm,
    classifier,
    streamingq,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# The driver's correctness gate hashes the first 50 registry entries per
# round (CORRECTNESS_r01..r03 each cover exactly the registry's first 50
# names).  Rounds 1-3 verified the relational/trx-domain/ANN block, so
# rotate the registry: the 37 queries that have never had a driver row
# (curation / PQ / packing / composed / streaming waves) come first, then
# the already-verified 50 in their original relative order.  Union of
# CORRECTNESS_r03 + r04 then covers all 87.
_R04_FIRST = [
    "embedding_neardup_pairs", "ann_ivf_topk", "kmeans_cells",
    "ann_ivf_trained_topk", "semantic_dedup", "pq_codes", "ann_pq_topk",
    "dedup_clusters", "span_dedup", "repetition_stats", "quality_filter",
    "corpus_keep_list", "contamination_check", "decontaminated_docs",
    "stratified_sample", "topk_ngrams", "bigram_rarity", "vocab_coverage",
    "cms_heavy_hitters", "per_source_sample", "token_count_bpe",
    "source_quality_rollup", "mixture_sample", "normalized_docs",
    "dsir_weights", "quality_stratified_sample", "decontam_bloom_flags",
    "pii_scrub", "pack_sequences", "doc_chunks", "epoch_shuffle",
    "events_range_join", "streaming_incremental_stats",
    "streaming_windowed_counts", "streaming_dedup_keys",
    "streaming_session_stats", "streaming_attribution_join",
]
# Round-4 additions (sketches / ranking / knn graph+pagerank /
# diversity sample / curriculum / funnel+cohort / streaming sketches /
# feature hashing) slot in right behind the rotated block:
# 37 + 13 = 50 — the driver's 50-row gate window is now EXACTLY full;
# any further query lands beyond it (local parity gate only) until the
# round-5 rotation.
_R04_NEW = [
    "hll_distinct_tokens", "bm25_topk", "knn_graph", "cluster_balanced_sample",
    "doclen_quantiles", "knn_pagerank", "curriculum_phases",
    "priority_sample", "event_funnel", "cohort_retention",
    "streaming_cms_cells", "streaming_hll_registers", "hashed_tf_features",
]
_order = (
    _R04_FIRST
    + _R04_NEW
    + [n for n in QUERIES if n not in set(_R04_FIRST) | set(_R04_NEW)]
)
QUERIES = {n: QUERIES[n] for n in _order}
ORACLES = {n: ORACLES[n] for n in _order if n in ORACLES}
