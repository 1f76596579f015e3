"""Distributed Lloyd iterations (k-means) for training the IVF coarse
quantizer — the trained upgrade over the deterministic stand-in
codebook in ``queries/similarity.py``.

Spark-first shape (the classic scalable k-means layout):
- the codebook is tiny (k x dim) → broadcast; scoring each vector
  against all k centroids is map-side (broadcast join + one zip_with
  fold per centroid, no per-element shuffle);
- the argmax is ``max(struct(dot, -cid))`` — partial-aggregatable, so
  the k score rows per vector combine map-side before the one shuffle
  on vec_id (no window);
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


def score_cells(
    emb: DataFrame, cents: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, cid, dot) for every vector x centroid — broadcast join,
    map-side folds, no shuffle until the consumer aggregates."""
    return emb.crossJoin(F.broadcast(cents)).select(
        id_col, "cid", _dot(F.col(vec_col), F.col("cent")).alias("dot")
    )


def argmax_cell(scored: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Best cell per vector (ties -> smallest cid), as a partial-
    aggregatable groupBy max — no window."""
    return (
        scored.groupBy(id_col)
        .agg(F.max(F.struct(F.col("dot"), (-F.col("cid")).alias("ncid"))).alias("m"))
        .select(id_col, (-F.col("m.ncid")).alias("cid"), F.col("m.dot").alias("dot"))
    )


def _update_centroids(
    emb: DataFrame, assign: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    ex = emb.join(assign.select(id_col, "cid"), id_col).select(
        "cid", F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    cent_val = (F.col("s").cast("double") / F.lit(_SCALE)) / F.col("n")
    return (
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
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cent")
        )
    )


def lloyd_centroids(
    emb: DataFrame,
    k: int = 16,
    updates: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Codebook after ``updates`` Lloyd updates (init = the first ``k``
    vectors by id). Returns (cid, cent)."""
    cents = emb.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cent")
    )
    for _ in range(updates):
        assign = argmax_cell(score_cells(emb, cents, id_col, vec_col), id_col)
        cents = _update_centroids(emb, assign, id_col, vec_col)
    return cents


def lloyd_assign(
    emb: DataFrame,
    k: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final (id, cid, dot) assignment after ``rounds`` assignment
    steps with ``rounds - 1`` centroid updates between them."""
    cents = lloyd_centroids(emb, k, rounds - 1, id_col, vec_col)
    return argmax_cell(score_cells(emb, cents, id_col, vec_col), id_col)
