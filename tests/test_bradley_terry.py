"""Fixed-point Bradley-Terry MM fit: the Spark rounds must match a
pure-Python integer twin exactly, rank dominant items first, and be
invariant to input partitioning."""

from __future__ import annotations

from trx_spark.queries.preference import (
    _BT_MAX_ITEMS,
    _BT_SCALE,
    _BT_SP,
    bt_fit,
)

_CAP = _BT_MAX_ITEMS * _BT_SCALE


def _ref_bt(pairs: list[tuple[int, int, int, int]], rounds: int) -> dict[int, int]:
    """Pure-Python twin: pairs are (ia, ib, n_ij, wins_a); // matches
    Spark's div for the non-negative values used here."""
    wins: dict[int, int] = {}
    for ia, ib, n, wa in pairs:
        wins[ia] = wins.get(ia, 0) + wa
        wins[ib] = wins.get(ib, 0) + (n - wa)
    w = {i: _BT_SCALE for i in wins}
    sym = [(ia, ib, n) for ia, ib, n, _ in pairs] + [
        (ib, ia, n) for ia, ib, n, _ in pairs
    ]
    for _ in range(rounds):
        denom: dict[int, int] = {}
        for i, j, n in sym:
            denom[i] = denom.get(i, 0) + (n * _BT_SP) // max(w[i] + w[j], 1)
        raw = {i: (wins[i] * _BT_SP) // max(denom[i], 1) for i in denom}
        tot = sum(raw.values())
        w = {
            i: min((r * _BT_MAX_ITEMS) // max(tot // _BT_SCALE, 1), _CAP)
            for i, r in raw.items()
        }
    return w


def _pk_df(spark, pairs):
    return spark.createDataFrame(
        pairs, "ia long, ib long, n_ij long, wins_a long"
    )


def test_matches_python_reference(spark):
    # 4 items, uneven outcomes incl. a zero-win item (3 loses everything)
    pairs = [
        (1, 2, 10, 7),
        (1, 3, 6, 6),
        (2, 3, 8, 8),
        (2, 4, 5, 2),
        (3, 4, 4, 0),
    ]
    got = {
        r.item: r.strength_fp for r in bt_fit(_pk_df(spark, pairs), 3).collect()
    }
    assert got == _ref_bt(pairs, 3)


def test_dominant_item_ranks_first_and_transitivity(spark):
    # round-robin where 1 beats everyone, 2 beats 3 and 4, 3 beats 4:
    # the fit must recover the total order 1 > 2 > 3 > 4
    pairs = [
        (1, 2, 10, 9),
        (1, 3, 10, 9),
        (1, 4, 10, 9),
        (2, 3, 10, 8),
        (2, 4, 10, 8),
        (3, 4, 10, 7),
    ]
    rows = bt_fit(_pk_df(spark, pairs)).collect()
    by_strength = sorted(rows, key=lambda r: -r.strength_fp)
    assert [r.item for r in by_strength] == [1, 2, 3, 4]
    assert {r.item: r.wins for r in rows} == {1: 27, 2: 17, 3: 10, 4: 6}
    assert all(r.n_duels == 30 for r in rows)


def test_symmetric_outcomes_give_equal_strengths(spark):
    pairs = [(1, 2, 10, 5), (1, 3, 10, 5), (2, 3, 10, 5)]
    rows = bt_fit(_pk_df(spark, pairs)).collect()
    assert len({r.strength_fp for r in rows}) == 1


def test_partition_invariance(spark):
    pairs = [
        (i, j, 4 + (i + j) % 3, (i * j) % 5)
        for i in range(1, 7)
        for j in range(i + 1, 7)
    ]
    # wins_a must be <= n_ij
    pairs = [(i, j, n, min(wa, n)) for i, j, n, wa in pairs]
    df = _pk_df(spark, pairs)
    a = {r.item: r.strength_fp for r in bt_fit(df, 2).collect()}
    b = {
        r.item: r.strength_fp
        for r in bt_fit(df.repartition(5), 2).collect()
    }
    assert a == b == _ref_bt(pairs, 2)
