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
    multimodalq,
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
    multimodalq,
    streamingq,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# The driver's correctness gate hashes the first 50 registry entries per
# round.  The r01-r05 union covers all 127 pre-round-6 names (124/124
# oracles green), so rotation now optimizes for CODE CURRENCY: every
# name whose driver row predates the code that currently backs it gets
# re-hashed first.  Round-6 window: the 9 brand-new gate entries
# (perceptual image/audio dedup, the LM count model, the streaming
# curation twin, cluster topic labeling, winnowing fingerprints, the sweep-line
# concurrency peak, the AllPairs prefix-filtered exact Jaccard join, the Levenshtein
# candidate verify), then
# the 28 names whose newest driver row is r03-era
# (the oldest rows in the union), then 13 round-4-era names whose
# implementations were touched by the round-5 shared-helper refactors
# across curation/corpus/textdata/similarity (span dedup, quality gate,
# keep-list, vocab/bigram streams, clustering, decontam, sketches)
# (9 + 28 + 13 = 50).  The 36 remaining r04-era names rotate in r7.
_R06_NEW = [
    "image_dedup_groups", "audio_dedup_groups",
    "lm_bigram_counts", "streaming_curation_keep", "cluster_topics",
    "winnowing_fingerprints", "concurrent_sessions_peak",
    "allpairs_jaccard_join", "edit_distance_pairs",
]
_R06_R03_ERA = [
    "ann_topk_lsh", "ann_topk_multiprobe", "azint_qlims",
    "curves_chi2_per_shot", "curves_scan_stats",
    "customers_without_orders", "delay_codec", "diffs_plus_ref",
    "distinct_scan_points", "events_pivot_counts",
    "filter_outlier_curves", "global_curve_stats", "lang_id",
    "lsh_pairs_verified", "monitor_qwindow_median",
    "ngram_jaccard_pairs", "parts_with_orders", "polygon_mask_flags",
    "pricing_rollup", "rebin_nearest", "reflections_cubic_si",
    "running_order_totals", "salted_skewjoin_stats",
    "shipping_priority", "slice_skip_first_last", "supplier_revenue",
    "times_to_info", "value_gradient",
]
_R06_R5_TOUCHED = [
    "span_dedup", "quality_filter", "corpus_keep_list",
    "vocab_coverage", "bigram_rarity", "normalized_docs",
    "repetition_stats", "topk_ngrams", "dedup_clusters",
    "token_count_bpe", "contamination_check", "decontam_bloom_flags",
    "decontaminated_docs",
]
_R06_WINDOW = _R06_NEW + _R06_R03_ERA + _R06_R5_TOUCHED
assert len(_R06_WINDOW) == 50, len(_R06_WINDOW)
_order = _R06_WINDOW + [n for n in QUERIES if n not in set(_R06_WINDOW)]
QUERIES = {n: QUERIES[n] for n in _order}
ORACLES = {n: ORACLES[n] for n in _order if n in ORACLES}
