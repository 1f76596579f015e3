"""LSH banding auto-tuner: the embedded S-curve constants are the real
1 − (1 − s^r)^b, recall rises with band count at fixed family size,
and every expectation stays within the histogram's mass."""

from __future__ import annotations

from trx_spark.queries.lshtune import (
    _CONFIGS,
    _LSH_N_PERMS,
    _TUNE_BINS,
    _detect_probs,
    lsh_tuning_curve,
)


def test_scurve_constants():
    for b, r in _CONFIGS:
        assert b * r == _LSH_N_PERMS
        probs = _detect_probs(b, r)
        assert len(probs) == _TUNE_BINS
        for i, p in enumerate(probs):
            mid = (i + 0.5) / _TUNE_BINS
            want = 1.0 - (1.0 - mid**r) ** b
            assert abs(p - want) < 1e-12
        # monotone in s
        assert all(a <= c + 1e-15 for a, c in zip(probs, probs[1:]))


def test_tuning_curve_structure(spark, sf_dir):
    rows = {(r["bands"], r["rows_per_band"]): r for r in lsh_tuning_curve(spark, sf_dir).collect()}
    assert set(rows) == set(_CONFIGS)
    for (b, r), row in rows.items():
        assert 0.0 <= row["detected_est"] <= row["total_pairs"] + 1e-6
        assert row["detected_above_est"] <= row["detected_est"] + 1e-9
        if row["pairs_above_tau"]:
            assert 0.0 <= row["recall_at_tau_est"] <= 1.0 + 1e-9
        assert row["floor_truncated"] == (r == 1)
    # more bands (finer r) detect at least as much everywhere: the
    # curves dominate pointwise, so the expectations must order
    est = {cfg: rows[cfg]["detected_est"] for cfg in _CONFIGS}
    assert est[(8, 1)] >= est[(4, 2)] >= est[(2, 4)] >= est[(1, 8)] - 1e-9
