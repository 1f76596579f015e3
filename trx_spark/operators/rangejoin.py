"""Bucketed range (interval) join.

Spark compiles a non-equi join condition like
``p.ts BETWEEN c.ts AND c.ts + W`` to BroadcastNestedLoopJoin — an
O(N·M) scan that is the canonical 100 TB cliff. The standard fix is to
quantize the range dimension into buckets of width >= the interval
width: each interval overlaps at most 2 buckets, so exploding the
interval side to its covered buckets and equi-joining on
(keys..., bucket) with the exact range predicate as a residual
condition gives the same rows with a hash shuffle instead of a nested
loop. (Same technique as Spark's own range-join hints in Delta/Photon
docs and the classic bucketed interval-join literature.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    on: list[str],
    start: str,
    end: str,
    point: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` rows into ``intervals`` rows with
    ``start <= point < end`` (half-open), equality on ``on`` keys.

    ``start``/``end``/``point`` are integer-valued columns (e.g. epoch
    micros); ``bucket_width`` must be >= every interval's width so an
    interval spans at most two buckets. Output: all columns of
    ``intervals`` + the non-key columns of ``points`` (names must not
    collide apart from ``on``).

    ``how="left"`` keeps interval rows with no matching point — note
    each interval is exploded to its (up to two) probe buckets BEFORE
    the join, so a matchless interval appears once per probe bucket
    with null point columns; aggregate on the interval's key to
    collapse (exactly what a count/exists consumer does anyway).

    Plan shape: explode intervals x2 on the probe buckets, single hash
    join on (on..., bucket) with the range predicate as the join's
    residual condition — no nested loop, no broadcast of the big side;
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
    pt = points.withColumn("_r_bucket", F.expr(f"{point} DIV {bucket_width}"))
    for c in on:
        pt = pt.withColumnRenamed(c, f"_r_{c}")
    cond = reduce(
        lambda a, b: a & b,
        [iv[c] == pt[f"_r_{c}"] for c in on]
        + [
            iv["_bucket"] == pt["_r_bucket"],
            pt[point] >= iv[start],
            pt[point] < iv[end],
        ],
    )
    return iv.join(pt, cond, how).drop(
        "_bucket", "_r_bucket", *[f"_r_{c}" for c in on]
    )
