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
# round.  Rounds 1-3 verified the relational/trx-domain/ANN block and
# round 4's rotation verified the curation/PQ/packing/streaming waves
# (CORRECTNESS_r03 ∪ r04 = 100 distinct names, 99 green).  Round-5
# rotation: the 19 queries that have never had a driver row (the late
# round-4 waves beyond the window) come first, then the three streaming
# entries whose oracles are NEW this round (incremental_stats gained its
# batch GROUP-BY twin; running_stats and lsh_pairs are new gate entries
# for the stateful operator and the LSH index), then the 6 brand-new
# round-5 queries, then 22 round-1-era classics as regression
# re-checks of round-5 code (19 + 3 + 6 + 22 = 50).  Union r03∪r04∪r05
# then covers every oracle-bearing registry name.
_R05_UNCHECKED = [
    "boilerplate_spans", "ann_ivfpq_topk", "simhash_neardup_pairs",
    "streaming_pricing_summary", "contrastive_triples", "dedup_report",
    "bpe_merges", "bpe_encode", "compression_ratio", "lm_perplexity",
    "minhash_containment", "knn_reciprocal_pairs", "mmr_diverse_topk",
    "training_set_manifest", "quality_classifier_scores",
    "source_overlap_matrix", "ngram_novelty", "event_rate_cusum",
    "train_val_test_split",
]
_R05_NEW_ORACLES = [
    "streaming_incremental_stats", "streaming_running_stats",
    "streaming_lsh_pairs",
]
# Brand-new round-5 queries (c-TF-IDF source triage, Markov transition
# matrix, rolling DAU/WAU) go straight into the window so they get a
# driver row in their first round.
_R05_NEW_QUERIES = [
    "tfidf_top_terms", "event_transition_matrix", "rolling_active_users",
    "copurchase_lift", "knn_triangles", "user_rfm_segments",
]
_R05_RECHECK = [
    "pricing_summary", "revenue_by_nation", "topk_orders_per_customer",
    "azint_1d", "azint_2d", "dezinger_flags", "monitor_norm",
    "asof_interp_refs", "scanpoint_stats", "chi2_filter_auto",
    "mad_outliers", "dedup_exact", "token_stats", "minhash_signatures",
    "minhash_lsh_pairs", "doc_fingerprints", "ann_cosine_topk",
    "asof_interp_per_user", "sessionize_events", "simhash16",
    "ann_lsh_buckets", "reflections_triclinic",
]
_R05_WINDOW = (
    _R05_UNCHECKED + _R05_NEW_ORACLES + _R05_NEW_QUERIES + _R05_RECHECK
)
assert len(_R05_WINDOW) == 50, len(_R05_WINDOW)
_order = _R05_WINDOW + [n for n in QUERIES if n not in set(_R05_WINDOW)]
QUERIES = {n: QUERIES[n] for n in _order}
ORACLES = {n: ORACLES[n] for n in _order if n in ORACLES}
