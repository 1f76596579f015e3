"""Dataset-cartography over the balanced fixed-point batch perceptron:
the Spark trajectory matches an independent pure-Python replay exactly,
the certified margin bounds hold, and on a separable fixture the
easy/hard extremes actually emerge (the gate corpus's weak labels keep
its map in the oscillating band by design)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from trx_spark.queries.classifier import (
    _PCT_ROUNDS,
    _PCT_SCALE,
    _features,
    perceptron_dynamics,
    training_dynamics_map,
)


def _py_dynamics(rows, rounds=_PCT_ROUNDS):
    """Pure-Python balanced batch perceptron over (doc_id, dim, qx, yy)
    rows; returns {doc_id: (yy, [margins over rounds])}."""

    def signdiv(s, n):
        return s // n if s >= 0 else -((-s) // n)

    docs = defaultdict(list)
    for doc_id, dim, qx, yy in rows:
        docs[doc_id].append((dim, qx, yy))
    labels = {d: feats[0][2] for d, feats in docs.items()}
    n_pos = max(sum(1 for v in labels.values() if v == 1), 1)
    n_neg = max(sum(1 for v in labels.values() if v == -1), 1)
    w: dict = defaultdict(int)
    margins = {d: [] for d in docs}
    last = {d: 0 for d in docs}
    for _ in range(rounds):
        miscl = [d for d in docs if labels[d] * last[d] <= 0]
        sp: dict = defaultdict(int)
        sn: dict = defaultdict(int)
        for d in miscl:
            for dim, qx, yy in docs[d]:
                if yy == 1:
                    sp[dim] += qx
                else:
                    sn[dim] += qx
        for dim in set(sp) | set(sn):
            w[dim] += signdiv(sp[dim], n_pos) - signdiv(sn[dim], n_neg)
        for d in docs:
            m = sum(qx * w[dim] for dim, qx, _ in docs[d])
            margins[d].append(m)
            last[d] = m
    return {d: (labels[d], margins[d]) for d in docs}


def test_dynamics_match_python_twin(spark, sf_dir):
    from trx_spark.exact import fint

    feats = _features(spark, sf_dir)
    base = feats.select(
        "doc_id",
        "dim",
        fint(F.col("x"), _PCT_SCALE).alias("qx"),
        (F.lit(2.0) * F.col("y") - F.lit(1.0)).cast("long").alias("yy"),
    )
    rows = [tuple(r) for r in base.collect()]
    want = _py_dynamics(rows)
    got = {r["doc_id"]: r for r in training_dynamics_map(spark, sf_dir).collect()}
    assert set(got) == set(want)
    bound = 65 * int(_PCT_SCALE) * 2 * _PCT_ROUNDS * int(_PCT_SCALE)
    for d, (yy, ms) in want.items():
        r = got[d]
        assert r["label"] == yy
        assert r["margin_min"] == min(ms)
        assert r["margin_max"] == max(ms)
        assert r["margin_sum"] == sum(ms)
        assert r["margin_spread"] == max(ms) - min(ms)
        assert r["n_correct"] == sum(1 for m in ms if yy * m > 0)
        assert abs(r["margin_min"]) <= bound and abs(r["margin_max"]) <= bound


def test_separable_fixture_has_extremes(spark):
    """Two well-separated feature clusters + one contradictory pair:
    the cluster docs are 'easy' (correct every post-update round), the
    contradictory pair can never be (identical features, opposite
    labels — at most one side correct per round)."""
    rows = []
    for i in range(20):
        rows.append((i, 0, 1_000_000, 1))      # positives fire dim 0
        rows.append((100 + i, 1, 1_000_000, -1))  # negatives fire dim 1
    # the contradictory pair shares dim 2 with the same sign
    rows.append((500, 2, 1_000_000, 1))
    rows.append((501, 2, 1_000_000, -1))
    base = spark.createDataFrame(
        rows, "doc_id long, dim long, qx long, yy long"
    )
    out = {r["doc_id"]: r for r in perceptron_dynamics(base).collect()}
    for i in range(20):
        assert out[i]["category"] == "easy", out[i]
        assert out[100 + i]["category"] == "easy", out[100 + i]
    pair_cats = {out[500]["category"], out[501]["category"]}
    assert "easy" not in pair_cats or pair_cats != {"easy"}
    assert out[500]["n_correct"] + out[501]["n_correct"] <= _PCT_ROUNDS
