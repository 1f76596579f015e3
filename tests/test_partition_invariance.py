"""Results must not depend on the physical partitioning. Every
oracle-gated query already uses partition-order-independent arithmetic
(fixed-point sums, exact percentiles, keyed windows) — this test pins
that property directly by running representative queries under
different shuffle-partition counts and demanding bit-identical rows.
On a real cluster the partition count is whatever AQE picks; a query
whose answer moves with it is broken even if it matches the oracle at
one setting.
"""

from __future__ import annotations

import pytest

from trx_spark.queries import QUERIES

_REPRESENTATIVE = [
    "scanpoint_stats",      # windows + fixed-point aggs
    "minhash_lsh_pairs",    # multi-join + bucket cap
    "sessionize_events",    # partitioned window + cumsum
    "topk_ngrams",          # TakeOrderedAndProject with tie-break
    "quality_filter",       # pure projection (control)
    "bpe_merges",           # iterative trainer (r4w3)
    "lm_perplexity",        # fixed-point log2 sums (r4w3)
    "compression_ratio",    # mapInPandas kernel (r4w3)
    "bpe_encode",           # trained merges + OOV fallback (r4w3)
    "mmr_diverse_topk",     # greedy loop, fixed-point sims (r4w4)
    "minhash_containment",  # blocked-join verifier (r4w4)
    "training_set_manifest",# composed keep-list -> shard rollup (r4w3)
    "source_overlap_matrix",# pair->source rollup (r4w4)
    "ngram_novelty",        # first-occurrence min-agg (r4w4)
    "event_rate_cusum",     # exact-integer cumulative deviation (r4w4)
    "train_val_test_split", # pure affine-hash projection (r4w4)
    "tfidf_top_terms",      # window top-k with weight/token tie-break (r5)
    "event_transition_matrix",  # lead window + row normalization (r5)
    "rolling_active_users", # distinct + trailing inequality join (r5)
    "copurchase_lift",      # basket self-join + broadcast annotation (r5)
    "knn_triangles",        # wedge join + closure over memoized edges (r5)
    "user_rfm_segments",    # exact-percentile cut assignment (r5)
]


def _rows(spark, name, sf_dir, n_shuffle):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
    try:
        df = QUERIES[name](spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", _REPRESENTATIVE)
def test_partition_count_invariance(spark, sf_dir, name):
    assert _rows(spark, name, sf_dir, 3) == _rows(spark, name, sf_dir, 17)
