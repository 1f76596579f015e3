"""Drift statistics: brute-force numpy cross-checks of the exact
integer KS and Mann–Whitney statistics, independent of both engines'
SQL (the oracle parity test covers Spark↔DuckDB; this covers
both↔definition)."""

from __future__ import annotations

import math

import numpy as np

from trx_spark.queries.driftstats import (
    _DRIFT_A,
    _DRIFT_B,
    _QUANT,
    ks_two_sample,
    mannwhitney_u,
)
from trx_spark.tables import load_table


def _samples(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .filter("event_type in ('%s','%s')" % (_DRIFT_A, _DRIFT_B))
        .select("event_type", "value")
        .collect()
    )
    a = np.array(
        [math.floor(r.value * _QUANT) for r in rows if r.event_type == _DRIFT_A],
        dtype=np.int64,
    )
    b = np.array(
        [math.floor(r.value * _QUANT) for r in rows if r.event_type == _DRIFT_B],
        dtype=np.int64,
    )
    return a, b


def test_ks_matches_bruteforce_definition(spark, sf_dir):
    a, b = _samples(spark, sf_dir)
    vals = np.unique(np.concatenate([a, b]))
    cum1 = np.searchsorted(np.sort(a), vals, side="right")
    cum2 = np.searchsorted(np.sort(b), vals, side="right")
    d_num = int(np.max(np.abs(cum1 * len(b) - cum2 * len(a))))
    row = ks_two_sample(spark, sf_dir).collect()[0]
    assert (row.n1, row.n2) == (len(a), len(b))
    assert row.d_num == d_num
    assert row.ks_d == d_num / (float(len(a)) * float(len(b)))


def test_mwu_matches_bruteforce_pairs(spark, sf_dir):
    a, b = _samples(spark, sf_dir)
    # 2*U1 = #(x>y)*2 + #(x==y), counted over all pairs
    gt = int((a[:, None] > b[None, :]).sum())
    eq = int((a[:, None] == b[None, :]).sum())
    row = mannwhitney_u(spark, sf_dir).collect()[0]
    assert row.u1_x2 == 2 * gt + eq
    assert 0.0 <= row.auc <= 1.0
    # AUC symmetry: U1/n1n2 + U2/n1n2 = 1 for the mirrored statistic
    lt = int((a[:, None] < b[None, :]).sum())
    assert (2 * gt + eq) + (2 * lt + eq) == 2 * len(a) * len(b)
