"""Measured recall@k of every approximate ANN path against the
brute-force cosine truth (ann_cosine_topk). The approximate paths trade
recall for scan reduction; this test pins the measured floor so a
regression in bucketing/probing/quantizer quality fails loudly instead
of silently returning worse neighbours.

Everything is deterministic (fixed testdata, arithmetic hashes, seeded
k-means), so the floors are tight.
"""

from __future__ import annotations

import pytest

from trx_spark.queries import QUERIES

# measured at sf0.001: single-probe LSH ~0.1 (documented near-zero for
# uniform synthetic embeddings), multi-probe 0.5, IVF 0.7, trained 0.8
_FLOORS = {
    "ann_topk_multiprobe": 0.4,
    "ann_ivf_topk": 0.6,
    "ann_ivf_trained_topk": 0.7,
    "ann_pq_topk": 0.4,  # ADC shortlist (10% scan) + exact re-rank
    # IVF-PQ composite: probed-cell scan × approximate codes — measured
    # 0.7 (between trained-IVF 0.8 and PQ-alone 0.4, as expected)
    "ann_ivfpq_topk": 0.5,
}


@pytest.fixture(scope="module")
def truth(spark, sf_dir):
    rows = QUERIES["ann_cosine_topk"](spark, sf_dir).collect()
    return {r["vec_id"] for r in rows}


@pytest.mark.parametrize("name", sorted(_FLOORS))
def test_recall_floor(spark, sf_dir, truth, name):
    got = {r["vec_id"] for r in QUERIES[name](spark, sf_dir).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= _FLOORS[name], f"{name} recall@{len(truth)} = {recall}"


def test_trained_quantizer_beats_fixed_grid(spark, sf_dir, truth):
    fixed = {r["vec_id"] for r in QUERIES["ann_ivf_topk"](spark, sf_dir).collect()}
    trained = {
        r["vec_id"] for r in QUERIES["ann_ivf_trained_topk"](spark, sf_dir).collect()
    }
    assert len(trained & truth) >= len(fixed & truth)
