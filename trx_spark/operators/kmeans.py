"""Distributed Lloyd iterations (k-means) for training the IVF coarse
quantizer — the trained upgrade over the deterministic stand-in
codebook in ``queries/similarity.py``.

Spark-first shape (the classic scalable k-means layout):
- the codebook is tiny (k x dim) → broadcast; scoring each vector
  against all k centroids is map-side (broadcast join + one zip_with
  fold per centroid, no per-element shuffle);
- the argmax is ``max(struct(dot, -cid))`` — partial-aggregatable, so
  the 16x score rows combine map-side before the one shuffle on
  vec_id (no window);
- the centroid update explodes assigned vectors to (cid, pos, x) and
  sums fixed-point integers per (cid, pos) — also partial-
  aggregatable, so the shuffle carries ~k*dim rows per input
  partition, not n*dim.

All arithmetic is fixed-point (floor(x*SCALE) int64 sums), so the
trained centroids and final assignment are bit-identical to the
DuckDB oracle's formulation — order-independent despite the floats.

Empty cells simply drop out of the codebook (documented Lloyd
degeneracy; no re-seeding) — deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1e12  # == textdata._EMB_SCALE; int64-safe for |x|<=~1, dim 64


def _fp_terms(x, y):
    return F.floor((x.cast("double") * y.cast("double")) * F.lit(_SCALE)).cast("long")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, _fp_terms), F.lit(0).cast("long"), lambda acc, v: acc + v
    ).cast("double") / F.lit(_SCALE)


def lloyd_assign(
    emb: DataFrame,
    k: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``rounds`` assignment steps with ``rounds - 1`` centroid
    updates between them (init codebook = the first ``k`` vectors by
    id), returning the final ``(id, cid, dot)`` assignment: each vector
    labeled with its argmax-dot-product centroid and that dot.
    Ties break toward the smallest cid.
    """
    cents = emb.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cent")
    )
    for r in range(rounds):
        scored = emb.crossJoin(F.broadcast(cents)).select(
            id_col,
            vec_col,
            "cid",
            _dot(F.col(vec_col), F.col("cent")).alias("dot"),
        )
        assign = (
            scored.groupBy(id_col)
            .agg(
                F.max(F.struct(F.col("dot"), (-F.col("cid")).alias("ncid"))).alias("m")
            )
            .select(id_col, (-F.col("m.ncid")).alias("cid"), F.col("m.dot").alias("dot"))
        )
        if r == rounds - 1:
            return assign
        ex = emb.join(assign.select(id_col, "cid"), id_col).select(
            "cid", F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        cent_val = (F.col("s").cast("double") / F.lit(_SCALE)) / F.col("n")
        cents = (
            ex.groupBy("cid", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("x").cast("double") * F.lit(_SCALE)).cast("long")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .withColumn("c", cent_val)
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("cent")
            )
        )
    raise AssertionError("rounds must be >= 1")
