"""Fixed-point PageRank: the Spark iteration must match a pure-Python
integer reference exactly (same div/floor discipline), conserve the
teleport floor, and be invariant to input partitioning."""

from __future__ import annotations

from trx_spark.queries.graphq import (
    _PR_DAMP_DEN,
    _PR_DAMP_NUM,
    _PR_SCALE,
    _PR_TELEPORT,
    pagerank_fixed_point,
)


def _ref_pagerank(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Pure-Python twin of the fixed-point iteration (// == Spark's
    div for the non-negative values used here)."""
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: _PR_SCALE for n in outdeg}
    for _ in range(rounds):
        contrib: dict[int, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank[s] // outdeg[s]
        rank = {
            d: (_PR_DAMP_NUM * c) // _PR_DAMP_DEN + _PR_TELEPORT
            for d, c in contrib.items()
        }
    return rank


def _edge_df(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    deg = df.groupBy("src").count().withColumnRenamed("count", "outdeg")
    return df.join(deg, "src")


def _sym(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def test_matches_python_reference_on_asymmetric_graph(spark):
    # directed graph with a hub, a chain, and a 2-cycle; node 5 is a
    # pure sink reachable only via 4 (it has no out-edges, so it leaves
    # the frame after round 1 — sources define the node set)
    edges = [(1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 1), (4, 2)]
    got = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(_edge_df(spark, edges), 4).collect()
    }
    assert got == _ref_pagerank(edges, 4)


def test_star_center_dominates_and_teleport_floor(spark):
    edges = _sym([(0, i) for i in range(1, 9)])
    got = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(_edge_df(spark, edges), 6).collect()
    }
    assert got == _ref_pagerank(edges, 6)
    assert got[0] == max(got.values())
    leaf = {got[i] for i in range(1, 9)}
    assert len(leaf) == 1  # symmetry: all leaves identical
    assert min(got.values()) >= _PR_TELEPORT


def test_symmetric_mass_is_bounded(spark):
    # total fixed-point mass never exceeds the initial N * SCALE on a
    # symmetric graph (flooring only loses mass; damping redistributes)
    edges = _sym([(i, (i + 1) % 10) for i in range(10)])
    rows = pagerank_fixed_point(_edge_df(spark, edges), 6).collect()
    assert sum(r.rank_fp for r in rows) <= 10 * _PR_SCALE
    assert len(rows) == 10


def test_partition_invariance(spark):
    edges = _sym([(i, j) for i in range(6) for j in range(i + 1, 6) if (i + j) % 3])
    df = _edge_df(spark, edges)
    a = {r.node: r.rank_fp for r in pagerank_fixed_point(df, 3).collect()}
    b = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(df.repartition(7), 3).collect()
    }
    assert a == b
