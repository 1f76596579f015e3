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


# ---------------------------------------------------------------------
# Grouped Lloyd: train MANY independent codebooks in one pass (one per
# value of the group key — e.g. every PQ subspace at once). Same
# arithmetic as the ungrouped stages (the PQ oracle, which unrolls the
# per-subspace math, pins the equivalence); the win is the job count:
# O(rounds) driver round-trips and ONE keyed shuffle per stage instead
# of O(groups x rounds) sequential jobs — the difference between
# M=4 and M=64 subspaces on a real cluster.
# ---------------------------------------------------------------------


def score_cells_grouped(
    emb: DataFrame,
    cents: DataFrame,
    group: list[str],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """cents carries the group key: broadcast equi-join on it (each
    vector meets only its own group's k centroids)."""
    return emb.join(F.broadcast(cents), group).select(
        *group, id_col, "cid", _dot(F.col(vec_col), F.col("cent")).alias("dot")
    )


def argmax_cell_grouped(
    scored: DataFrame, group: list[str], id_col: str = "vec_id"
) -> DataFrame:
    return (
        scored.groupBy(*group, id_col)
        .agg(F.max(F.struct(F.col("dot"), (-F.col("cid")).alias("ncid"))).alias("_mx"))
        .select(
            *group,
            id_col,
            (-F.col("_mx.ncid")).alias("cid"),
            F.col("_mx.dot").alias("dot"),
        )
    )


def _update_centroids_grouped(
    emb: DataFrame, assign: DataFrame, group: list[str], id_col: str, vec_col: str
) -> DataFrame:
    ex = emb.join(assign.select(*group, id_col, "cid"), [*group, id_col]).select(
        *group, "cid", F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    cent_val = (F.col("s").cast("double") / F.lit(_SCALE)) / F.col("n")
    return (
        ex.groupBy(*group, "cid", "pos")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * F.lit(_SCALE)).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("c", cent_val)
        .groupBy(*group, "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cent")
        )
    )


def lloyd_centroids_grouped(
    emb: DataFrame,
    k: int,
    updates: int,
    group: list[str],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group codebooks after ``updates`` Lloyd updates (init = the
    first ``k`` vectors by id WITHIN each group). Returns
    (group..., cid, cent)."""
    cents = emb.filter(F.col(id_col) < k).select(
        *group, F.col(id_col).alias("cid"), F.col(vec_col).alias("cent")
    )
    for _ in range(updates):
        assign = argmax_cell_grouped(
            score_cells_grouped(emb, cents, group, id_col, vec_col), group, id_col
        )
        cents = _update_centroids_grouped(emb, assign, group, id_col, vec_col)
    return cents
