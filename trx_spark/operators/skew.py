"""Skew mitigation: salted join and salted two-stage aggregation.

When a join key's distribution is pathological (a handful of hot keys
carrying most rows), a plain shuffle join serializes each hot key
through one task. AQE's skew-join split handles sort-merge cases at
runtime; SALTING is the declarative fix that also covers
aggregate-after-join pipelines: replicate the small side once per salt
value and spread the big side's hot keys across ``(key, salt)``
sub-partitions. The join RESULT is identical to the unsalted join for
any salt assignment, which is why the gate oracle is simply the plain
join/aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    on: str,
    salt_src: Column | str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, salted ``n_salt`` ways.

    ``salt_src`` is any big-side expression with per-row spread (a row
    id, a hash of other columns) — the salt is ``pmod(salt_src,
    n_salt)``, deterministic so plans replay stably (NULL salt sources
    coalesce to salt 0 rather than dropping the row). The small side is
    replicated once per salt value (rows × n_salt — keep it small) via
    an ``explode(sequence(...))``, then the join runs on ``(on, salt)``:
    a hot key now lands on n_salt reducers instead of one.

    Identity with the plain join holds for ``inner`` and ``left``;
    right/full outer would surface each unmatched SMALL-side row once
    per salt replica, so those modes are rejected.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left, not {how!r}: an outer "
            "small side is replicated per salt and would duplicate "
            "unmatched rows"
        )
    raw = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    salt = F.coalesce(F.pmod(raw, F.lit(n_salt)), F.lit(0))
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    *,
    keys: list[str],
    salt_src: Column | str,
    aggs: list[Column],
    finals: list[Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: stage 1 aggregates per
    ``(keys, salt)``, stage 2 combines the ≤ n_salt partials per key.
    Use with DECOMPOSABLE aggregates (sums, counts, min/max — pass the
    partial forms in ``aggs`` and the combining forms in ``finals``,
    both aliased). For algebraic aggregates Spark's own partial hash
    aggregation already does this map-side; the two-stage form matters
    when the first stage is NOT algebraic (distincts, collects) or when
    a downstream window would otherwise see the hot key whole."""
    salt = F.pmod(F.col(salt_src) if isinstance(salt_src, str) else salt_src, F.lit(n_salt))
    stage1 = df.withColumn("_salt", salt.cast("int")).groupBy(*keys, "_salt").agg(*aggs)
    return stage1.groupBy(*keys).agg(*finals)
