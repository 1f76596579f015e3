"""nDCG audit: the fixed-point DCG must equal a pure-Python recompute
from the shared ranking, and the discount table must be the canonical
1/log2(i+1) ladder."""

from __future__ import annotations

import math

from trx_spark.queries.similarity import (
    _MRR_K,
    _NDCG_DISC_FP,
    _NDCG_IDCG_FP,
    _ranked_eval,
    ndcg_retrieval_audit,
)


def test_discount_table_is_log2_ladder():
    assert len(_NDCG_DISC_FP) == _MRR_K
    for i, v in enumerate(_NDCG_DISC_FP, start=1):
        assert v == round((1 << 40) / math.log2(i + 1))
    # strictly decreasing, prefix sums strictly increasing
    assert all(a > b for a, b in zip(_NDCG_DISC_FP, _NDCG_DISC_FP[1:]))
    assert _NDCG_IDCG_FP == [
        sum(_NDCG_DISC_FP[: m + 1]) for m in range(_MRR_K)
    ]


def test_ndcg_matches_python_recompute(spark, sf_dir):
    ranked = _ranked_eval(spark, sf_dir).collect()
    got = {r.query_id: r for r in ndcg_retrieval_audit(spark, sf_dir).collect()}
    by_q: dict = {}
    for r in ranked:
        by_q.setdefault((r.qid, r.qlabel), []).append(r)
    assert set(got) == {q for q, _ in by_q}
    for (qid, qlabel), rows in by_q.items():
        rel_ranks = [r.rank for r in rows if r.label == qlabel]
        dcg = sum(_NDCG_DISC_FP[k - 1] for k in rel_ranks if k <= _MRR_K)
        n_rel = len(rel_ranks)
        idcg = _NDCG_IDCG_FP[min(n_rel, _MRR_K) - 1] if n_rel else 0
        g = got[qid]
        assert g.dcg_fp == dcg
        assert g.idcg_fp == idcg
        assert g.n_relevant == n_rel
        expect = dcg / idcg if idcg else 0.0
        assert g.ndcg_at_10 == expect
        assert 0.0 <= g.ndcg_at_10 <= 1.0
