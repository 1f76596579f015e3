"""Bucketed range (interval) join.

Spark compiles a non-equi join condition like
``p.ts BETWEEN c.ts AND c.ts + W`` to BroadcastNestedLoopJoin — an
O(N·M) scan that is the canonical 100 TB cliff. The standard fix is to
quantize the range dimension into buckets of width >= the interval
width: each interval overlaps at most 2 buckets, so exploding the
interval side to its covered buckets and equi-joining on
(keys..., bucket) + re-checking the exact predicate gives the same
rows with a hash shuffle instead of a nested loop. (Same technique as
Spark's own range-join hints in Delta/Photon docs and the classic
bucketed interval-join literature.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    on: list[str],
    start: str,
    end: str,
    point: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join ``points`` rows into ``intervals`` rows with
    ``start <= point < end`` (half-open), equality on ``on`` keys.

    ``start``/``end``/``point`` are integer-valued columns (e.g.
    epoch nanos); ``bucket_width`` must be >= every interval's width so
    an interval spans at most two buckets. Output: all columns of
    ``intervals`` + all columns of ``points`` (names must not collide
    apart from ``on``).

    Plan shape: explode intervals x2 on the probe buckets, hash-join on
    (on..., bucket) — no nested loop, no broadcast of the big side;
    skew follows the key distribution like any equi-join (salt with
    operators.skew if a (key, bucket) is hot).
    """
    # integer DIV, not `/`: double division loses bits above 2^53
    # (epoch-nanos keys are ~2^60). Keys are assumed non-negative
    # (DIV truncates toward zero).
    b_lo = F.expr(f"{start} DIV {bucket_width}")
    b_hi = F.expr(f"({end} - 1) DIV {bucket_width}")
    iv = intervals.withColumn(
        "_bucket", F.explode(F.array_distinct(F.array(b_lo, b_hi)))
    )
    pt = points.withColumn("_bucket", F.expr(f"{point} DIV {bucket_width}"))
    return (
        iv.join(pt, [*on, "_bucket"])
        .filter((F.col(point) >= F.col(start)) & (F.col(point) < F.col(end)))
        .drop("_bucket")
    )
