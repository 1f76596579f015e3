"""Semantic tests for the round-4 wave-2 operators (beyond the oracle
parity gate): HLL accuracy, BM25 golden recompute, k-NN graph
structure, cluster-balanced sample structure."""

from __future__ import annotations

import math
import re

import pytest


def test_hll_estimate_accuracy(spark, sf_dir):
    """m=64 HLL has ~13 % standard error; require every per-source
    estimate within 40 % (≈3σ) of the exact distinct count."""
    from trx_spark.queries.sketches import hll_distinct_tokens

    rows = hll_distinct_tokens(spark, sf_dir).collect()
    assert rows, "no sources"
    for r in rows:
        assert r["exact_distinct"] > 0
        rel = r["hll_estimate"] / r["exact_distinct"]
        assert 0.6 < rel < 1.4, (r["source"], rel)
        assert 1 <= r["n_registers_hit"] <= 64


def test_hll_registers_bounded(spark, sf_dir):
    """The shuffled state is ≤ m rows per source — the scale argument."""
    from trx_spark.queries.sketches import _HLL_M, hll_distinct_tokens

    rows = hll_distinct_tokens(spark, sf_dir).collect()
    for r in rows:
        assert r["n_registers_hit"] <= _HLL_M
        # denominator is consistent: hit registers contribute ≤ 2^30
        # each, unhit exactly 2^30 each
        assert r["harmonic_denom"] <= _HLL_M * (1 << 30)
        assert r["harmonic_denom"] > 0


def test_hll_merge_property(spark, sf_dir):
    """The defining sketch property: registers merged by MAX across two
    disjoint sub-streams equal the registers of the combined stream —
    i.e. the partial aggregation the 100 TB plan relies on is lossless.
    Recomputed in Python from the same hash construction."""
    from trx_spark.queries.sketches import _HLL_A, _HLL_B, _HLL_M, _HLL_WBITS
    from trx_spark.queries.textdata import _P
    from trx_spark.tables import load_table
    import re as _re

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def tok_hash(t):
        acc = 0
        for ch in t:
            acc = (acc * 31 + ord(ch)) % _P
        return acc

    def registers(texts):
        regs = {}
        for txt in texts:
            for t in _re.findall("[a-z]+", txt):
                h = (_HLL_A * tok_hash(t) + _HLL_B) % _P
                reg, w = h % _HLL_M, h // _HLL_M
                rho = (_HLL_WBITS + 1) if w == 0 else (_HLL_WBITS + 1 - w.bit_length())
                regs[reg] = max(regs.get(reg, 0), rho)
        return regs

    half_a = [r["text"] for r in docs if r["doc_id"] % 2 == 0]
    half_b = [r["text"] for r in docs if r["doc_id"] % 2 == 1]
    ra, rb, rall = registers(half_a), registers(half_b), registers(half_a + half_b)
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == rall

    # and the Python construction matches the engine's register counts
    from trx_spark.queries.sketches import hll_distinct_tokens

    src_docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    by_src: dict = {}
    for r in src_docs:
        by_src.setdefault(r["source"], []).append(r["text"])
    got = {r["source"]: r["n_registers_hit"] for r in hll_distinct_tokens(spark, sf_dir).collect()}
    for src, n_hit in got.items():
        assert n_hit == len(registers(by_src[src])), src


def test_bm25_golden_recompute(spark, sf_dir):
    """Recompute BM25 (log-free idf surrogate) in plain Python from
    the raw documents and compare the top-20 ranking."""
    from trx_spark.queries.ranking import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
        _K1P1,
        _ONE_MINUS_B,
        bm25_topk,
    )
    from trx_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: re.findall("[a-z]+", r["text"]) for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {
        term: sum(1 for t in toks.values() if term in t) for term in _BM25_TERMS
    }
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for term in _BM25_TERMS:
            tf = t.count(term)
            if tf == 0:
                continue
            idf = (n_docs - df[term] + 0.5) / (df[term] + 0.5)
            s += idf * (tf * _K1P1) / (tf + _BM25_K1 * (_ONE_MINUS_B + _BM25_B * (len(t) / avgdl)))
        if s > 0:
            scores[d] = s
    want = sorted(scores, key=lambda d: (-scores[d], d))[:_BM25_TOPK]

    got = bm25_topk(spark, sf_dir).collect()
    assert [r["doc_id"] for r in got] == want
    for r in got:
        # fixed-point truncation ≤ len(terms)/1e9
        assert math.isclose(r["bm25_score"], scores[r["doc_id"]], rel_tol=1e-6)


def test_doclen_quantile_sketch_bounds(spark, sf_dir):
    """The histogram sketch returns the upper edge of the bin holding
    the ceil(p·n)-th smallest value — exactly (absent CAP clamping).
    The interpolated exact percentile is NOT bounded by the sketch in
    general (interpolation reads past the order statistic), so the
    test pins the true invariant only."""
    from trx_spark.queries.sketches import (
        _HIST_CAP,
        _HIST_W,
        _QUANTILES,
        doclen_quantiles,
    )
    from trx_spark.tables import load_table

    lens: dict = {}
    for r in load_table(spark, sf_dir, "documents").select("source", "n_chars").collect():
        lens.setdefault(r["source"], []).append(r["n_chars"])
    for v in lens.values():
        v.sort()
    for r in doclen_quantiles(spark, sf_dir).collect():
        vals = lens[r["source"]]
        assert r["n_docs"] == len(vals)
        for p in _QUANTILES:
            tag = str(int(p * 100))
            sketch = r[f"p{tag}_sketch"]
            kth = vals[math.ceil(p * len(vals)) - 1]
            want_bin = min(kth // _HIST_W, _HIST_CAP)
            assert sketch == (want_bin + 1) * _HIST_W, (r["source"], p, kth, sketch)


def test_hashed_tf_features_structure(spark, sf_dir):
    """Feature-hashing invariants: dims within range, per-doc mass
    bounded by token count, duplicate texts map to identical sparse
    vectors, and a Python recompute matches exactly."""
    from trx_spark.queries.ranking import _FH_DIM, _FH_SIGN_A, _FH_SIGN_B, hashed_tf_features
    from trx_spark.queries.textdata import _P
    from trx_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def tok_hash(t):
        acc = 0
        for ch in t:
            acc = (acc * 31 + ord(ch)) % _P
        return acc

    def featurize(text):
        v: dict = {}
        for t in re.findall("[a-z]+", text):
            h = tok_hash(t)
            s = 1 if ((_FH_SIGN_A * h + _FH_SIGN_B) % _P) % 2 == 0 else -1
            v[h % _FH_DIM] = v.get(h % _FH_DIM, 0) + s
        return v

    want = {}
    n_toks = {}
    for r in docs:
        want[r["doc_id"]] = featurize(r["text"])
        n_toks[r["doc_id"]] = len(re.findall("[a-z]+", r["text"]))

    got: dict = {}
    for r in hashed_tf_features(spark, sf_dir).collect():
        assert 0 <= r["dim"] < _FH_DIM
        got.setdefault(r["doc_id"], {})[r["dim"]] = r["value"]
    for d, vec in got.items():
        assert vec == want[d], d
        assert sum(abs(x) for x in vec.values()) <= n_toks[d]
    # duplicate texts → identical vectors
    by_text: dict = {}
    for r in docs:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    for ids in by_text.values():
        if len(ids) > 1:
            assert all(got.get(i, {}) == got.get(ids[0], {}) for i in ids)


def test_knn_graph_structure(spark, sf_dir):
    from trx_spark.queries.similarity import _KNN_K, knn_graph
    from trx_spark.queries.textdata import ann_lsh_buckets

    rows = knn_graph(spark, sf_dir).collect()
    assert rows
    bucket = {
        r["vec_id"]: r["bucket"] for r in ann_lsh_buckets(spark, sf_dir).collect()
    }
    by_src: dict = {}
    for r in rows:
        assert r["vec_id"] != r["nbr_id"]
        assert bucket[r["vec_id"]] == bucket[r["nbr_id"]], "edge crosses buckets"
        assert -1.0001 <= r["cos_sim"] <= 1.0001
        by_src.setdefault(r["vec_id"], []).append(r)
    for src, es in by_src.items():
        ranks = sorted(e["knn_rank"] for e in es)
        assert ranks == list(range(1, len(es) + 1))
        assert len(es) <= _KNN_K
        es = sorted(es, key=lambda e: e["knn_rank"])
        sims = [e["cos_sim"] for e in es]
        assert all(a >= b - 1e-12 for a, b in zip(sims, sims[1:]))


def test_curriculum_phases_structure(spark, sf_dir):
    from trx_spark.queries.curriculum import _CURR_N_SHARDS, curriculum_phases

    rows = curriculum_phases(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    by_phase = {0: 0, 1: 0, 2: 0}
    for r in rows:
        assert r["phase"] in (0, 1, 2)
        assert 0 <= r["shard"] < _CURR_N_SHARDS
        assert r["quality_score"] > 0
        by_phase[r["phase"]] += 1
    # percentile cuts at 33/66 % → each phase holds roughly a third
    for ph, c in by_phase.items():
        assert 0.15 * n < c < 0.55 * n, (ph, c, n)


def test_priority_sample_golden(spark, sf_dir):
    """Recompute the deterministic priorities in Python and check the
    per-source top-k choice."""
    from trx_spark.queries.curriculum import _P as P
    from trx_spark.queries.curriculum import (
        _PRI_A,
        _PRI_B,
        _PRI_K,
        priority_sample,
    )
    from trx_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    pri = {}
    by_src: dict = {}
    for r in docs:
        h = (_PRI_A * r["doc_id"] + _PRI_B) % P
        pri[r["doc_id"]] = (float(r["n_chars"]) * float(P)) / float(h + 1)
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    want = {
        src: sorted(ids, key=lambda d: (-pri[d], d))[:_PRI_K]
        for src, ids in by_src.items()
    }
    got: dict = {}
    for r in priority_sample(spark, sf_dir).collect():
        got.setdefault(r["source"], []).append((r["pick_rank"], r["doc_id"]))
        assert r["priority"] == pytest.approx(pri[r["doc_id"]], rel=1e-12)
    for src, pairs in got.items():
        assert [d for _, d in sorted(pairs)] == want[src]


def test_event_funnel_golden(spark, sf_dir):
    from trx_spark.queries.temporal import _FUNNEL_WIN_US, event_funnel
    from trx_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_type", "ts_ns DIV 1000 AS t_us")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["t_us"], r["event_type"]))
    want = {}
    for u, evs in by_user.items():
        views = [t for t, k in evs if k == "view"]
        if not views:
            continue
        tv = min(views)
        clicks = [t for t, k in evs if k == "click" and tv < t <= tv + _FUNNEL_WIN_US]
        tc = min(clicks) if clicks else None
        tp = None
        if tc is not None:
            purch = [
                t for t, k in evs if k == "purchase" and tc < t <= tc + _FUNNEL_WIN_US
            ]
            tp = min(purch) if purch else None
        want[u] = (tv, tc, tp, 1 + (tc is not None) + (tp is not None))

    got = {
        r["user_id"]: (
            r["t_view_us"],
            r["t_click_us"],
            r["t_purchase_us"],
            r["funnel_stage"],
        )
        for r in event_funnel(spark, sf_dir).collect()
    }
    assert got == want


def test_cohort_retention_golden(spark, sf_dir):
    from trx_spark.queries.temporal import _DAY_US, cohort_retention
    from trx_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "ts_ns DIV 1000 AS t_us")
        .collect()
    )
    days: dict = {}
    for r in ev:
        days.setdefault(r["user_id"], set()).add(r["t_us"] // _DAY_US)
    want: dict = {}
    for u, ds in days.items():
        c = min(ds)
        for d in ds:
            want[(c, d - c)] = want.get((c, d - c), 0) + 1
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_active_users"]
        for r in cohort_retention(spark, sf_dir).collect()
    }
    assert got == want
    assert all(off >= 0 for _, off in got)


def test_knn_pagerank_golden(spark, sf_dir):
    """Recompute the 3-round lost-mass PageRank in plain Python from
    the same edge list (same fixed-point transfer) and compare."""
    from trx_spark.queries.similarity import (
        _PR_DAMP,
        _PR_ITERS,
        _PR_SCALE,
        knn_graph,
        knn_pagerank,
    )

    edges = [
        (r["vec_id"], r["nbr_id"]) for r in knn_graph(spark, sf_dir).collect()
    ]
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(_PR_ITERS):
        s_by_tgt = {v: 0 for v in nodes}
        for s, t in edges:
            s_by_tgt[t] += math.floor((pr[s] / outdeg[s]) * _PR_SCALE)
        pr = {
            v: (1.0 - _PR_DAMP) / n + _PR_DAMP * (s_by_tgt[v] / _PR_SCALE)
            for v in nodes
        }

    got = knn_pagerank(spark, sf_dir).collect()
    assert sorted(r["vec_id"] for r in got) == nodes
    total = 0.0
    for r in got:
        assert r["pagerank"] == pytest.approx(pr[r["vec_id"]], rel=1e-12)
        assert r["out_degree"] == outdeg.get(r["vec_id"], 0)
        total += r["pagerank"]
    assert 0.0 < total <= 1.0 + 1e-9  # lost-mass variant never exceeds 1


def test_contrastive_triples_structure(spark, sf_dir):
    from trx_spark.queries.similarity import contrastive_triples, kmeans_cells

    assign = {r["vec_id"]: r["cid"] for r in kmeans_cells(spark, sf_dir).collect()}
    rows = contrastive_triples(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["anchor_id"] != r["positive_id"]
        assert assign[r["anchor_id"]] == r["cid"]
        assert assign[r["positive_id"]] == r["cid"], "positive crosses cells"
        assert assign[r["negative_id"]] == r["neg_cid"]
        assert r["neg_cid"] != r["cid"], "negative from the anchor's own cell"
    # every multi-member cell's anchors produce triples
    from collections import Counter

    cell_sizes = Counter(assign.values())
    n_expected = sum(c for c in cell_sizes.values() if c > 1)
    assert len(rows) == n_expected


def test_cluster_balanced_sample_structure(spark, sf_dir):
    from trx_spark.queries.similarity import (
        _CBS_PER_CELL,
        cluster_balanced_sample,
        kmeans_cells,
    )

    sample = cluster_balanced_sample(spark, sf_dir).collect()
    assert sample
    assign = {r["vec_id"]: r["cid"] for r in kmeans_cells(spark, sf_dir).collect()}
    per_cell: dict = {}
    for r in sample:
        assert assign[r["vec_id"]] == r["cid"], "sample disagrees with assignment"
        per_cell.setdefault(r["cid"], []).append(r["pick_rank"])
    for cid, ranks in per_cell.items():
        assert len(ranks) <= _CBS_PER_CELL
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # every non-empty cell is represented — the diversity guarantee
    assert set(per_cell) == set(assign.values())


def test_hybrid_rank_rrf_properties(spark, sf_dir):
    """RRF invariants: every fused row came from at least one input
    ranking; ranks are dense 1..n; a doc surfaced by BOTH rankers
    outranks any doc surfaced by only one at an equal-or-worse
    position (1/(K+a)+1/(K+b) > max single term at those positions)."""
    from trx_spark.queries import QUERIES

    rows = {r["doc_id"]: r for r in QUERIES["hybrid_rank_rrf"](spark, sf_dir).collect()}
    sparse = {r["doc_id"] for r in QUERIES["bm25_topk"](spark, sf_dir).collect()}
    dense = {r["vec_id"] for r in QUERIES["ann_cosine_topk"](spark, sf_dir).collect()}
    assert set(rows) == sparse | dense
    assert sorted(r["fused_rank"] for r in rows.values()) == list(
        range(1, len(rows) + 1)
    )
    for r in rows.values():
        assert (r["bm25_rank"] is not None) or (r["dense_rank"] is not None)
        both = r["bm25_rank"] is not None and r["dense_rank"] is not None
        if both:
            for s in rows.values():
                single = (s["bm25_rank"] is None) != (s["dense_rank"] is None)
                pos = s["bm25_rank"] if s["bm25_rank"] is not None else s["dense_rank"]
                if single and pos >= max(r["bm25_rank"], r["dense_rank"]):
                    assert r["rrf_score"] > s["rrf_score"]
