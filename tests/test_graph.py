"""Connected-components operator: convergence and labeling on shapes
the LSH pair graph can produce (chains being the worst case for plain
label propagation — pointer jumping must close a diameter-49 path well
inside the round budget)."""

from __future__ import annotations

from trx_spark.operators.graph import connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    return {r.id: r.lbl for r in rows}


def test_chain_collapses_to_min(spark):
    # path 0-1-2-...-49: diameter 49, needs pointer jumping to finish
    # in <= 20 rounds (plain propagation would need ~49)
    got = _labels(spark, [(i, i + 1) for i in range(49)])
    assert got == {i: 0 for i in range(50)}


def test_multiple_components_and_cliques(spark):
    edges = (
        # triangle {1,2,3}
        [(1, 2), (2, 3), (1, 3)]
        # pair {10, 11}
        + [(10, 11)]
        # star centered high: min is a leaf
        + [(20, 7), (20, 8), (20, 9)]
    )
    got = _labels(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 7, 7: 7, 8: 7, 9: 7}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
