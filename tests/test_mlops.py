"""ML-ops wave: definitional invariants for the k-fold assignment,
the UNIMAX water-filling, and the k-anonymity census (oracle parity is
covered by test_oracle_parity; these pin the math against the paper
definitions)."""

from __future__ import annotations

import math

from trx_spark.queries.mlops import (
    _N_FOLDS,
    _UNIMAX_BUDGET_DEN,
    k_anonymity_audit,
    stratified_kfold_assign,
    unimax_language_sampling,
)


def test_kfold_is_exactly_stratified(spark, sf_dir):
    rows = stratified_kfold_assign(spark, sf_dir).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
    for source, fold_rows in per_source.items():
        assert len(fold_rows) == min(
            _N_FOLDS, sum(x.n_docs for x in fold_rows)
        ), source
        sizes = sorted(x.n_docs for x in fold_rows)
        # exact stratification: fold sizes within a stratum differ by <= 1
        assert sizes[-1] - sizes[0] <= 1, (source, sizes)


def test_unimax_water_filling_invariants(spark, sf_dir):
    rows = unimax_language_sampling(spark, sf_dir).collect()
    total = sum(r.avail_chars for r in rows)
    budget = total // _UNIMAX_BUDGET_DEN
    for r in rows:
        assert 0.0 < r.alloc_chars <= float(r.avail_chars) + 1e-9, r
        assert 0.0 < r.sampling_rate <= 1.0 + 1e-12, r
    # allocations exhaust the budget exactly (water-filling property)
    assert math.isclose(
        sum(r.alloc_chars for r in rows), float(budget), rel_tol=1e-12
    )
    # uncapped languages all sit at the same threshold
    uncapped = [r.alloc_chars for r in rows if r.sampling_rate < 1.0]
    if uncapped:
        assert max(uncapped) - min(uncapped) < 1e-6
    # capped languages are exactly fully taken
    for r in rows:
        if r.sampling_rate >= 1.0 - 1e-12:
            assert r.alloc_chars == float(r.avail_chars)


def test_k_anonymity_totals(spark, sf_dir):
    from trx_spark.tables import load_table

    row = k_anonymity_audit(spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "customer").count()
    assert row.n_rows == n
    assert 0 <= row.rows_at_risk <= n
    assert row.at_risk_share == row.rows_at_risk / float(n)
    assert row.anonymity_k >= 1


def test_dp_ledger_structural_release_counts(spark, sf_dir):
    """dp_epsilon_ledger derives n_released for the noisy_counts and
    group-quantile releases STRUCTURALLY (one row per distinct
    event_type) instead of re-running the children; this pins the
    assumption so a future filter/threshold added to either child
    breaks loudly here instead of silently skewing the ledger."""
    from pyspark.sql import functions as F

    from trx_spark.queries.mlops import dp_group_quantiles, dp_noisy_counts
    from trx_spark.tables import load_table

    n_types = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    assert dp_noisy_counts(spark, sf_dir).count() == n_types
    assert dp_group_quantiles(spark, sf_dir).count() == n_types
