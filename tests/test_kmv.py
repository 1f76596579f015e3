"""KMV sketch invariants beyond the oracle parity gate: the estimator
must track the exact overlap within its error bound, and the sketch
state must satisfy the order-statistic constraints by construction."""

from __future__ import annotations

import math

from trx_spark.queries.sketches import _KMV_K, kmv_source_overlap


def test_kmv_estimates_track_exact(spark, sf_dir):
    rows = kmv_source_overlap(spark, sf_dir).collect()
    assert rows, "no source pairs"
    # 3-sigma KMV bounds: sigma_jaccard ~ sqrt(j(1-j)/k), sigma_union
    # relative ~ 1/sqrt(k-2)
    for r in rows:
        assert r.n_common <= r.k_used
        assert r.k_used <= _KMV_K
        # theta is the k-th smallest of k_used distinct non-negative
        # hashes, so it is at least k_used - 1
        assert r.theta >= r.k_used - 1
        sig_j = math.sqrt(max(r.exact_jaccard * (1 - r.exact_jaccard), 1e-6) / r.k_used)
        assert abs(r.jaccard_est - r.exact_jaccard) <= 4 * sig_j + 1e-9, (
            r.src_a, r.src_b, r.jaccard_est, r.exact_jaccard)
        if r.k_used == _KMV_K:
            rel = abs(r.union_est - r.exact_union) / r.exact_union
            assert rel <= 4 / math.sqrt(_KMV_K - 2), (
                r.src_a, r.src_b, r.union_est, r.exact_union)
        else:
            # not-full sketch degenerates to the exact union count
            assert r.union_est == float(r.exact_union)
            assert r.inter_est == float(r.n_common)


def test_kmv_pairs_cover_all_source_pairs(spark, sf_dir):
    from trx_spark.tables import load_table

    n_src = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    n_pairs = kmv_source_overlap(spark, sf_dir).count()
    assert n_pairs == n_src * (n_src - 1) // 2
