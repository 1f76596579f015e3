"""Misra–Gries heavy-hitters family: the classic guarantees measured
on real data, a planted heavy hitter that MUST survive, purity of the
fold under partitioning, and the canon/fold algebra."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from trx_spark.queries.mgsketch import (
    _MG_B,
    _MG_K,
    heavy_hitters_mg,
    mg_batch_partials,
    mg_canon,
    mg_fold,
)


def test_guarantee_bounds(spark, sf_dir):
    rows = heavy_hitters_mg(spark, sf_dir).collect()
    assert 0 < len(rows) <= _MG_K
    n_total = rows[0]["n_total"]
    d_total = rows[0]["d_total"]
    # Σ decrements ≤ n/(K+1): each decrement d is applied where ≥ K+1
    # counters each lose ≥ d mass
    assert 0 <= d_total <= n_total // (_MG_K + 1)
    for r in rows:
        assert r["mg_count"] > 0
        # every kept count underestimates by at most the total decrement
        assert 0 <= r["underestimate"] <= d_total
        assert r["mg_count"] + r["underestimate"] == r["exact_count"]


def test_planted_heavy_hitter_survives(spark):
    # 40 docs: every doc carries the hot token 30×; the other tokens
    # are doc-unique → hot count 1200 ≫ n/(K+1) = 1600/9 ≈ 177
    rows = []
    for d in range(40):
        text = " ".join(["hot"] * 30 + [f"rare{d}w{i}" for i in range(10)])
        rows.append((d, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ts = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)).alias(
            "token"
        ),
    )
    state, d_total = mg_fold(mg_batch_partials(ts))
    n = 40 * 40
    assert d_total <= n // (_MG_K + 1)
    # true count > d_total ⇒ the residual cannot reach zero
    assert state.get("hot", 0) >= 1200 - d_total > 0


def test_fold_is_pure_function_of_multiset(spark, sf_dir):
    from trx_spark.queries.curation import _token_stream

    ts = _token_stream(spark, sf_dir)
    a = mg_fold(mg_batch_partials(ts.repartition(1)))
    b = mg_fold(mg_batch_partials(ts.repartition(7, "token")))
    assert a == b
    # ... and equals a plain-Python replay from the raw counts
    raw = ts.select("doc_id", "token").collect()
    per_batch: dict[int, Counter] = {i: Counter() for i in range(_MG_B)}
    for r in raw:
        per_batch[r["doc_id"] % _MG_B][r["token"]] += 1
    parts = []
    for i in range(_MG_B):
        part, d_b = mg_canon(dict(per_batch[i]), _MG_K)
        parts.append((i, part, d_b))
    assert mg_fold(parts) == a


def test_canon_and_fold_algebra():
    # canon keeps ≤ K strictly-positive residuals and is idempotent
    counts = {f"t{i}": 100 - i for i in range(20)}
    part, d = mg_canon(counts, 8)
    assert len(part) <= 8 and all(c > 0 for c in part.values())
    assert d == sorted(counts.values(), reverse=True)[8]
    again, d2 = mg_canon(part, 8)
    assert (again, d2) == (part, 0)
    # a single-batch fold is exactly that batch's canon
    state, d_total = mg_fold([(0, part, d)], 8)
    assert state == part and d_total == d
    # ties at the boundary: all-equal counts decrement to nothing
    flat = {f"x{i}": 5 for i in range(10)}
    p2, d3 = mg_canon(flat, 8)
    assert p2 == {} and d3 == 5


def test_surprisal_curriculum_easy_first(spark, sf_dir):
    """Within every (epoch, shard), curriculum_pos orders buckets
    non-decreasing (easy→hard), every doc appears once per epoch, and
    the quartile buckets are roughly balanced."""
    from trx_spark.queries.curriculum import surprisal_curriculum

    rows = surprisal_curriculum(spark, sf_dir).collect()
    per_es: dict[tuple, list] = {}
    for r in rows:
        per_es.setdefault((r["epoch"], r["shard"]), []).append(
            (r["curriculum_pos"], r["bucket"])
        )
    for key, lst in per_es.items():
        lst.sort()
        poss = [p for p, _ in lst]
        assert poss == list(range(1, len(lst) + 1)), key
        bks = [b for _, b in lst]
        assert bks == sorted(bks), key  # easy-first within the shard
    n_docs = len({r["doc_id"] for r in rows})
    epochs = {r["epoch"] for r in rows}
    assert len(rows) == n_docs * len(epochs)
    from collections import Counter

    bc = Counter(r["bucket"] for r in rows if r["epoch"] == 0)
    scored = sum(v for b, v in bc.items() if b < 4)
    for b in range(4):
        # quartiles of a continuous-ish score: each ~25 % of scored docs
        assert bc.get(b, 0) >= scored * 0.15, bc


def test_oracle_batch_spine_on_empty_batch(spark):
    """A corpus where one ``doc_id % B`` residue class has NO tokens:
    the grid-spine CTE must carry the recursion through the empty
    batch so the oracle still returns the full fold (the r12 ADVICE
    false-mismatch: without the spine the recursion halted and the
    oracle returned zero rows while Spark returned the summary)."""
    import duckdb

    from trx_spark.queries.mgsketch import _MG_SQL

    # doc_ids 0,1,3 (mod 4) populated; residue class 2 absent entirely
    rows = [(d, "alpha beta alpha") for d in (0, 1, 3, 4, 5, 7, 8)]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = con.execute(_MG_SQL).fetchall()
    assert got, "oracle returned zero rows on an empty-batch corpus"
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ts = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)
        ).alias("token"),
    )
    state, d_total = mg_fold(mg_batch_partials(ts))
    want = {(t, c) for t, c in state.items()}
    assert {(r[0], r[1]) for r in got} == want
    assert all(r[4] == d_total for r in got)


def test_windowed_guarantee_bounds(spark, sf_dir):
    """The sliding-window gate: ≤ K kept tokens, bounds measured on
    the WINDOW's mass, and every column consistent with the window-
    restricted exact counts."""
    from trx_spark.queries.curation import _token_stream
    from trx_spark.queries.mgsketch import _MG_W, heavy_hitters_windowed

    rows = heavy_hitters_windowed(spark, sf_dir).collect()
    assert 0 < len(rows) <= _MG_K
    n_total = rows[0]["n_total"]
    d_total = rows[0]["d_total"]
    lo = _MG_B - _MG_W
    n_window = (
        _token_stream(spark, sf_dir)
        .filter((F.col("doc_id") % _MG_B) >= lo)
        .count()
    )
    assert n_total == n_window < _token_stream(spark, sf_dir).count()
    assert 0 <= d_total <= n_total // (_MG_K + 1)
    for r in rows:
        assert r["mg_count"] > 0
        assert 0 <= r["underestimate"] <= d_total
        assert r["mg_count"] + r["underestimate"] == r["exact_count"]


def test_grouped_guarantee_bounds(spark, sf_dir):
    from trx_spark.queries.mgsketch import heavy_hitters_by_source

    rows = heavy_hitters_by_source(spark, sf_dir).collect()
    assert rows
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    for src, lst in per_src.items():
        assert 0 < len(lst) <= _MG_K, src
        d_total, n_total = lst[0]["d_total"], lst[0]["n_total"]
        assert 0 <= d_total <= n_total // (_MG_K + 1), src
        for r in lst:
            assert r["mg_count"] > 0
            assert 0 <= r["underestimate"] <= d_total


def test_dp_noisy_counts_transform(spark, sf_dir):
    """The fixed-point Laplace release: noise_fp32/2^32 tracks the
    exact inverse-CDF transform within the log2-table tolerance, and
    noisy_n is the round-to-nearest of n + noise."""
    import math

    from trx_spark.queries.mlops import _DP_A, _DP_B, dp_noisy_counts
    from trx_spark.queries.textdata import _P

    def tok_hash(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % _P
        return acc

    rows = dp_noisy_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        h = (tok_hash(r["event_type"]) * _DP_A + _DP_B) % _P
        u = h / _P
        exact = -math.copysign(1.0, 2 * u - 1) * math.log(
            max(1 - 2 * abs(u - 0.5), 1 / _P)
        )
        got = r["noise_fp32"] / 2**32
        # 0.02-bit table error * ln2 + fixed-point rounding headroom
        assert abs(got - exact) < 0.03, (r["event_type"], got, exact)
        assert r["noisy_n"] == r["n"] + math.floor(got + 0.5)
        assert r["epsilon"] == 1.0 and r["sensitivity"] == 1


# ---------------------------------------------------------------------
# Property tests (pure-Python fold algebra — no Spark session needed)
# ---------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@st.composite
def _multisets(draw):
    n_items = draw(st.integers(1, 30))
    return {
        f"t{i}": draw(st.integers(1, 200)) for i in range(n_items)
    }


@given(st.lists(_multisets(), min_size=1, max_size=6), st.integers(2, 12))
@settings(max_examples=200, deadline=None)
def test_mg_fold_properties(batches, k):
    from collections import Counter

    parts = []
    for i, counts in enumerate(batches):
        part, d_b = mg_canon(counts, k)
        parts.append((i, part, d_b))
    state, d_total = mg_fold(parts, k)
    exact = Counter()
    for c in batches:
        exact.update(c)
    n = sum(exact.values())
    # capacity and positivity
    assert len(state) <= k and all(c > 0 for c in state.values())
    # total-decrement bound: every decrement hits >= k+1 counters
    assert 0 <= d_total <= n // (k + 1)
    # per-item sandwich: mg <= exact, and exact - mg <= d_total for
    # EVERY item (kept items via their residual; dropped items were
    # fully decremented, so their exact count is <= d_total too)
    for t, c in exact.items():
        mg = state.get(t, 0)
        assert mg <= c
        assert c - mg <= d_total
    # any item with exact count > d_total must survive
    for t, c in exact.items():
        if c > d_total:
            assert t in state
    # fold order is part of the definition, but batch RELABELING that
    # preserves order is a no-op, and feeding the parts list shuffled
    # re-sorts by batch id (purity of the fold input contract)
    shuffled = list(reversed(parts))
    assert mg_fold(shuffled, k) == (state, d_total)


def test_dp_heavy_hitters_release(spark, sf_dir):
    """The second DP mechanism: noise is the scale-2 (b = 1/eps = 2)
    fixed-point Laplace transform on this release's OWN Lehmer spread,
    the released flag is exactly the threshold rule, and the released
    token set is the MG kept set (the sketch bounds the candidates)."""
    import math

    from trx_spark.queries.curation import _token_stream
    from trx_spark.queries.mlops import (
        _DP_A2,
        _DP_B2,
        _DP_HH_T,
        dp_heavy_hitters,
    )
    from trx_spark.queries.textdata import _P

    def tok_hash(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % _P
        return acc

    rows = dp_heavy_hitters(spark, sf_dir).collect()
    assert rows
    state, _ = mg_fold(mg_batch_partials(_token_stream(spark, sf_dir)))
    assert {r["token"] for r in rows} == set(state)
    for r in rows:
        assert r["mg_count"] == state[r["token"]]
        h = (tok_hash(r["token"]) * _DP_A2 + _DP_B2) % _P
        u = h / _P
        exact = -2.0 * math.copysign(1.0, 2 * u - 1) * math.log(
            max(1 - 2 * abs(u - 0.5), 1 / _P)
        )
        got = r["noise_fp32"] / 2**32
        assert abs(got - exact) < 0.06, (r["token"], got, exact)
        assert r["noisy_n"] == r["mg_count"] + math.floor(
            r["noise_fp32"] / 2**32 + 0.5
        )
        assert r["released"] == (r["noisy_n"] > _DP_HH_T)
        assert r["threshold"] == _DP_HH_T
        assert r["epsilon"] == 0.5 and r["sensitivity"] == 1


def test_dp_epsilon_ledger_composition(spark, sf_dir):
    """Sequential composition: the ledger's running micro-epsilon is
    the prefix sum of the per-release budgets, and each row's
    n_released matches the release it accounts for."""
    from pyspark.sql import functions as F

    from trx_spark.queries.mlops import (
        dp_epsilon_ledger,
        dp_heavy_hitters,
        dp_noisy_counts,
    )

    rows = sorted(
        dp_epsilon_ledger(spark, sf_dir).collect(),
        key=lambda r: r["release_ord"],
    )
    assert [r["release"] for r in rows] == [
        "noisy_counts",
        "noisy_heavy_hitters",
        "dp_quantile",
        "dp_group_quantiles",
    ]
    cum = 0
    for r in rows:
        cum += r["epsilon_micro"]
        assert r["cum_epsilon_micro"] == cum
        assert r["cum_epsilon"] == cum / 1e6
    assert rows[0]["n_released"] == dp_noisy_counts(spark, sf_dir).count()
    assert (
        rows[1]["n_released"]
        == dp_heavy_hitters(spark, sf_dir).filter(F.col("released")).count()
    )
    assert rows[2]["n_released"] == 1  # one scalar per quantile release
    # parallel composition: the grouped release charges eps ONCE
    assert rows[3]["epsilon_micro"] == rows[2]["epsilon_micro"]
    assert rows[3]["mechanism"] == "exponential_base2_parallel"


def test_dp_quantile_exponential_mechanism(spark, sf_dir):
    """The base-2 exponential mechanism: the released cent reproduces
    an independent pure-Python replay from the raw values, lands
    within the 62-row weight window of the target rank (the
    deterministic uniform never reaches the floor-weight tail on real
    data), and the released value brackets the true median."""
    import bisect

    from trx_spark.queries.mlops import (
        _DPQ_GRID,
        _DPQ_SHIFT,
        _dpq_uh,
        dp_quantile,
    )
    from trx_spark.queries.textdata import _P
    from trx_spark.tables import load_table

    row = dp_quantile(spark, sf_dir).collect()[0]
    vals = sorted(
        int(v[0] * 100 // 1)
        for v in load_table(spark, sf_dir, "events").select("value").collect()
    )
    # independent replay (bisect over the sorted raw cents directly)
    n = len(vals)
    tgt = n // 2
    total, cw = 0, []
    for g in range(_DPQ_GRID):
        d = abs(bisect.bisect_left(vals, g) - tgt)
        total += 1 << (_DPQ_SHIFT - min(d, _DPQ_SHIFT))
        cw.append(total)
    thresh = _dpq_uh() * total
    sel = next(g for g in range(_DPQ_GRID) if cw[g] * _P > thresh)
    assert row["released_cents"] == sel
    assert row["n"] == n and row["q"] == 0.5
    assert row["d_sel"] == abs(bisect.bisect_left(vals, sel) - tgt) <= 62
    # rank-accuracy: the release sits between the order statistics 62
    # rows either side of the target rank (the weight window)
    assert vals[max(0, tgt - 63)] <= row["released_cents"] <= vals[
        min(n - 1, tgt + 63)
    ] + 1
    assert row["released_value"] == row["released_cents"] / 100.0


def test_dp_group_quantiles_per_group_mechanism(spark, sf_dir):
    """The grouped release: every event_type gets its own mechanism
    run on its own rows (an independent pure-Python replay per group),
    group row counts partition the table (the disjointness that makes
    parallel composition valid), and each group's uniform differs
    (decorrelated selections)."""
    import bisect

    from trx_spark.queries.mlops import (
        _DPQ_GRID,
        _DPQ_SHIFT,
        _dpq_grp_uh,
        dp_group_quantiles,
    )
    from trx_spark.queries.textdata import _P
    from trx_spark.tables import load_table

    rows = {r["event_type"]: r for r in dp_group_quantiles(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict[str, list[int]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(int(r["value"] * 100 // 1))
    assert set(rows) == set(by_type)
    assert sum(r["n"] for r in rows.values()) == len(ev)  # disjoint partition
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        tgt = n // 2
        total, cw = 0, []
        for g in range(_DPQ_GRID):
            d = abs(bisect.bisect_left(vals, g) - tgt)
            total += 1 << (_DPQ_SHIFT - min(d, _DPQ_SHIFT))
            cw.append(total)
        thresh = _dpq_grp_uh(et) * total
        sel = next(g for g in range(_DPQ_GRID) if cw[g] * _P > thresh)
        assert rows[et]["released_cents"] == sel, et
        assert rows[et]["n"] == n
        assert rows[et]["d_sel"] == abs(bisect.bisect_left(vals, sel) - tgt) <= 62
    assert len({_dpq_grp_uh(et) for et in by_type}) == len(by_type)
