"""Statistical audits: Benford shares/χ² structure, HBOS scores match
a pure-Python fixed-point twin, and the Neyman allocation is actually
variance-optimal vs proportional on the real strata."""

from __future__ import annotations

import math

import numpy as np

from trx_spark.queries.stataudit import (
    _BENFORD_P,
    _HBOS_BAND,
    _HBOS_CAP,
    _HBOS_TOPK,
    _NEYMAN_BUDGET,
    benford_first_digit_audit,
    hbos_outlier_scores,
    neyman_allocation,
)
from trx_spark.tables import load_table
from tests.test_langid import _l2fix_py


def test_benford_structure(spark, sf_dir):
    rows = benford_first_digit_audit(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    for r in rows:
        assert abs(r["p_expected"] - math.log10(1 + 1 / r["digit"])) < 1e-15
        assert r["chi2_term"] >= 0.0
    assert abs(sum(r["p_observed"] for r in rows) - 1.0) < 1e-12
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    cents = (li["l_extendedprice"] * 100).round().astype("int64")
    assert sum(r["n_obs"] for r in rows) == int((cents > 0).sum())


def test_hbos_matches_python_twin(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "ts_ns"
    ).toPandas()
    vband = np.minimum(
        ((ev["value"] * 100).round().astype("int64") // _HBOS_BAND), _HBOS_CAP
    )
    hour = (ev["ts_ns"] // 3_600_000_000_000) % 24
    n = len(ev)
    cv = vband.value_counts().to_dict()
    ch = hour.value_counts().to_dict()
    ct = ev["event_type"].value_counts().to_dict()
    l2n = _l2fix_py(n)
    scores = {}
    for eid, vb, hr, et in zip(ev["event_id"], vband, hour, ev["event_type"]):
        scores[int(eid)] = (
            (l2n - _l2fix_py(int(cv[vb])))
            + (l2n - _l2fix_py(int(ch[hr])))
            + (l2n - _l2fix_py(int(ct[et])))
        )
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_HBOS_TOPK]
    got = hbos_outlier_scores(spark, sf_dir).collect()
    assert len(got) == min(_HBOS_TOPK, n)
    assert [(r["event_id"], r["score_fix"]) for r in got] == want


def test_neyman_is_variance_optimal(spark, sf_dir):
    rows = neyman_allocation(spark, sf_dir).collect()
    assert abs(sum(r["neyman_share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 < r["neyman_n"] <= _NEYMAN_BUDGET
        assert abs(r["neyman_n"] - _NEYMAN_BUDGET * r["neyman_share"]) <= 1
    # sd matches numpy's ddof=1 on the cents
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    cents = (ev["value"] * 100).round().astype("int64")
    for r in rows:
        want = float(np.std(cents[ev["event_type"] == r["event_type"]], ddof=1))
        assert abs(r["sd_cents"] - want) < 1e-6 * max(want, 1.0)
    # the optimality the allocation exists for: the stratified-mean
    # variance Σ (N_h·S_h)²/n_h is no worse under Neyman
    v_ney = sum((r["nh"] * r["sd_cents"]) ** 2 / r["neyman_n"] for r in rows)
    v_prop = sum(
        (r["nh"] * r["sd_cents"]) ** 2 / r["proportional_n"] for r in rows
    )
    assert v_ney <= v_prop * (1 + 1e-9)


def test_benford_expected_table_is_complete():
    assert len(_BENFORD_P) == 9
    assert abs(sum(_BENFORD_P) - 1.0) < 1e-12
