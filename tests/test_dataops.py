"""Property tests for the data-operations queries (queries/dataops.py):
brute-force recomputation of the dictionary tagger and EWMA baseline,
plus the profiler/fertility invariants the oracle-parity check cannot
express (cross-row semantics rather than cell equality)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from trx_spark.queries.dataops import (
    _DICT_TERMS,
    _EWMA_MIN_DEN,
    _EWMA_W,
    dictionary_tag_spans,
    event_type_correlation,
    ewma_anomaly,
    table_profile,
    tokenizer_fertility,
    trimmed_length_stats,
)
from trx_spark.tables import load_table


def test_dictionary_tags_match_bruteforce(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).collect()
    }
    got = {r["doc_id"]: r for r in dictionary_tag_spans(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    terms = set(_DICT_TERMS)
    for doc_id, text in docs.items():
        toks = re.findall("[a-z]+", text)
        hits = [
            (i + 1, f"{toks[i]} {toks[i + 1]}")
            for i in range(len(toks) - 1)
            if f"{toks[i]} {toks[i + 1]}" in terms
        ]
        row = got[doc_id]
        assert row["n_tags"] == len(hits)
        assert row["n_terms"] == len({t for _, t in hits})
        assert row["first_pos"] == (min(p for p, _ in hits) if hits else None)
        want_terms = ",".join(sorted({t for _, t in hits}))
        assert row["terms"] == want_terms


def test_ewma_matches_bruteforce(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts_ns").collect()
    counts: Counter = Counter()
    for r in ev:
        counts[(r["event_type"], (r["ts_ns"] // 1000) // 86_400_000_000)] += 1
    got = {(r["event_type"], r["day"]): r for r in ewma_anomaly(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    by_type: dict = {}
    for (et, day), n in sorted(counts.items()):
        by_type.setdefault(et, []).append((day, n))
    # den is a prefix sum of the weight vector — gaps in days don't
    # matter because the recurrence runs over observed buckets
    allowed_dens = {sum(_EWMA_W[:k]) for k in range(len(_EWMA_W) + 1)}
    for et, series in by_type.items():
        for i, (day, n) in enumerate(series):
            hist = series[max(0, i - len(_EWMA_W)) : i][::-1]  # most recent first
            num = sum(w * c for w, (_, c) in zip(_EWMA_W, hist))
            den = sum(w for w, _ in zip(_EWMA_W, hist))
            row = got[(et, day)]
            assert row["n_events"] == n
            assert row["baseline_num"] == num
            assert row["baseline_den"] == den
            assert den in allowed_dens
            if den >= _EWMA_MIN_DEN:
                assert row["is_anomaly"] == int(n * den > 2 * num)
            else:
                assert row["is_anomaly"] is None


def test_table_profile_invariants(spark, sf_dir):
    rows = {r["column_name"]: r for r in table_profile(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "orders").count()
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority",
    }
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
    # primary key: all distinct, no nulls
    assert rows["o_orderkey"]["n_distinct"] == n
    assert rows["o_orderkey"]["n_nulls"] == 0
    assert rows["o_orderkey"]["min_num"] <= rows["o_orderkey"]["max_num"]
    # string columns carry string bounds, numeric carry numeric
    assert rows["o_orderstatus"]["min_num"] is None
    assert rows["o_orderstatus"]["min_str"] <= rows["o_orderstatus"]["max_str"]
    assert rows["o_totalprice"]["min_str"] is None


def test_correlation_matrix_shape_and_range(spark, sf_dir):
    rows = event_type_correlation(spark, sf_dir).collect()
    types = {r["type_a"] for r in rows} | {r["type_b"] for r in rows}
    k = len(types)
    # complete upper triangle, canonical orientation, r in [-1, 1]
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert -1.0 <= r["corr"] <= 1.0
        assert r["n_days"] >= 1


def test_correlation_matches_numpy(spark, sf_dir):
    import numpy as np

    from trx_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts_ns").collect()
    counts: Counter = Counter()
    for r in ev:
        counts[(r["event_type"], (r["ts_ns"] // 1000) // 86_400_000_000)] += 1
    days = sorted({d for _, d in counts})
    types = sorted({t for t, _ in counts})
    series = {t: np.array([counts.get((t, d), 0) for d in days], float) for t in types}
    got = {
        (r["type_a"], r["type_b"]): r["corr"]
        for r in event_type_correlation(spark, sf_dir).collect()
    }
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            want = np.corrcoef(series[a], series[b])[0, 1]
            assert got[(a, b)] == pytest.approx(want, abs=1e-9)


def test_trimmed_stats_bounds(spark, sf_dir):
    for r in trimmed_length_stats(spark, sf_dir).collect():
        assert r["lo"] <= r["hi"]
        # the winsorized sum is squeezed into the clamp envelope
        assert r["n_docs"] * r["lo"] <= r["trimmed_sum"] <= r["n_docs"] * r["hi"]
        assert r["trimmed_mean_fp"] == (r["trimmed_sum"] * 1_000_000) // r["n_docs"]
        assert r["raw_mean_fp"] == (r["raw_sum"] * 1_000_000) // r["n_docs"]


def test_record_linkage_every_dirty_row_resolves(spark, sf_dir):
    from trx_spark.queries.linkage import record_linkage_pairs

    rows = record_linkage_pairs(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n
    for r in rows:
        # the true counterpart shares the block key by construction, so
        # it is always among the candidates and always verifies at 1
        assert r["matched_key"] == r["d_key"]
        assert r["match_dist"] == 1
        assert 1 <= r["n_verified"] <= r["n_candidates"]


def test_ccnet_buckets_partition_the_corpus(spark, sf_dir):
    from trx_spark.queries.dataops import ccnet_quality_buckets

    rows = ccnet_quality_buckets(spark, sf_dir).collect()
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail"}
    total = sum(r["n_docs"] for r in rows)
    # every doc with >= 2 tokens is scored and lands in exactly one tier
    docs = load_table(spark, sf_dir, "documents")
    n_scorable = docs.filter(
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")) >= 2
    ).count()
    assert total == n_scorable
    for r in rows:
        assert r["score_min"] <= r["score_max"]


def test_theil_sen_matches_bruteforce(spark, sf_dir):
    import statistics

    from trx_spark.queries.dataops import event_trend_robust

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts_ns").collect()
    counts: Counter = Counter()
    for r in ev:
        counts[(r["event_type"], (r["ts_ns"] // 1000) // 86_400_000_000)] += 1
    days = sorted({d for _, d in counts})
    types = sorted({t for t, _ in counts})
    got = {r["event_type"]: r for r in event_trend_robust(spark, sf_dir).collect()}
    for t in types:
        series = [counts.get((t, d), 0) for d in days]
        slopes = [
            (series[j] - series[i]) / (days[j] - days[i])
            for i in range(len(days))
            for j in range(i + 1, len(days))
        ]
        assert got[t]["n_pairs"] == len(slopes)
        assert got[t]["trend_slope"] == pytest.approx(
            statistics.median(slopes), abs=1e-12
        )


def test_bootstrap_replicas_are_genuine_resamples(spark, sf_dir):
    from trx_spark.queries.dataops import _BOOT_B, bootstrap_replica_means

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    true_sum = docs.agg(F.sum("n_chars")).first()[0]
    rows = bootstrap_replica_means(spark, sf_dir).collect()
    assert len(rows) == _BOOT_B
    means = [r["mean_fp"] for r in rows]
    for r in rows:
        # with-replacement sampling keeps the slot count at n
        assert r["n_sampled"] == n
    # replicas differ from each other and from the point estimate
    # (a permutation-resample bug would collapse every mean to truth)
    assert len(set(means)) > 1
    assert any(r["sum_chars"] != true_sum for r in rows)
    # and they bracket the point estimate
    point = (true_sum * 1_000_000) // n
    assert min(means) <= point <= max(means)


def test_fertility_bounds(spark, sf_dir):
    rows = tokenizer_fertility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every whitespace word yields >= 1 BPE-ish token
        assert r["n_bpe_tokens"] >= r["n_ws_tokens"] > 0
        assert r["fertility_fp"] >= 1_000_000
        # fixed-point ratio is floor((a * 1e6) / b) of the sums
        assert r["fertility_fp"] == (r["n_bpe_tokens"] * 1_000_000) // r["n_ws_tokens"]
        assert (
            r["bytes_per_token_fp"]
            == (r["n_chars"] * 1_000_000) // r["n_bpe_tokens"]
        )
