"""Embedding-column statistics for ANN/quantizer hygiene (LLM-pipeline
extension; no reference counterpart — the standard preprocessing
readouts behind PCA/whitening/clipping decisions in FAISS-style
pipelines, cf. Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 §V.A).

Three queries over the ``embeddings`` table (``array<float>``, 64-d):

- ``embedding_moment_stats`` — per dimension: count, exact
  fixed-point mean and population std-dev, raw min/max. The inputs to
  standardization and to PQ sub-space balance checks.
- ``embedding_dim_quantiles`` — per dimension: exact interpolated
  p25/p50/p75/p95 (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
  the curriculum-phases precedent). The inputs to outlier clipping.
- ``embedding_covariance`` — the leading ``_COV_DIMS``×``_COV_DIMS``
  block of the covariance matrix via exact fixed-point cross-moments
  (cov = Σxy/n − ΣxΣy/n², every sum an integer). The input to PCA /
  OPQ rotation decisions; the gate hashes a representative block
  because the full 64×64 matrix is the same plan at 32× the tiny
  output size.

Scale design (the 100 TB story):
- All three are explode → partial-aggregatable groupBy with a
  dimension-bounded key space (64 / 64 / 36 groups): the shuffle
  carries per-partition partials only, never rows. The explode is
  map-side (×64 or ×36 row fan-out of a columnar scan, no shuffle).
- The exact-percentile aggregate is the gate formulation; at corpus
  scale the production spelling is ``approx_percentile`` (t-digest,
  partial-aggregatable) — the quantile query is the only one whose
  exact form buffers per-group values.
- Fixed-point scale 1e12 (exact.py): |x| < ~1 for unit-ish embeddings
  → per-row addends ≤ 1e12, giving ~9e6-row-per-group headroom in the
  int64 accumulator at the gate; production uses native double sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.exact import dsum
from trx_spark.tables import fan_out_small_scan, load_table

_EMB_SCALE = 1e12
_COV_DIMS = 6  # leading block hashed by the gate (21 pairs)
_QTILES = (0.25, 0.5, 0.75, 0.95)


def _dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dim 1-based, v as double): the exploded dimension
    stream (map-side; matches the oracle's generate_series subscript)."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "v")
    ).select(
        "vec_id",
        (F.col("p") + 1).cast("long").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )


def embedding_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension count/mean/std/min/max (mean and std via exact
    fixed-point sums; min/max are raw doubles — no arithmetic)."""
    d = _dims(spark, sf_dir)
    n = F.count(F.lit(1))
    s1 = dsum(F.col("v"), _EMB_SCALE)
    s2 = dsum(F.col("v") * F.col("v"), _EMB_SCALE)
    var = (s2 - s1 * s1 / n) / n
    return d.groupBy("dim").agg(
        n.alias("n"),
        (s1 / n).alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std_pop"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )


_MOMENTS_SQL = f"""
WITH d AS (
  SELECT u.i AS dim, CAST(embedding[u.i] AS DOUBLE) AS v
  FROM embeddings,
       UNNEST(generate_series(1, len(embedding))) AS u(i)
)
SELECT dim,
  CAST(COUNT(*) AS BIGINT) AS n,
  (CAST(SUM(CAST(FLOOR(v * {_EMB_SCALE}) AS BIGINT)) AS DOUBLE)
     / {_EMB_SCALE}) / COUNT(*) AS mean,
  sqrt(greatest(
    ((CAST(SUM(CAST(FLOOR(v * v * {_EMB_SCALE}) AS BIGINT)) AS DOUBLE)
        / {_EMB_SCALE})
     - (CAST(SUM(CAST(FLOOR(v * {_EMB_SCALE}) AS BIGINT)) AS DOUBLE)
          / {_EMB_SCALE})
       * (CAST(SUM(CAST(FLOOR(v * {_EMB_SCALE}) AS BIGINT)) AS DOUBLE)
            / {_EMB_SCALE}) / COUNT(*)) / COUNT(*),
    CAST(0.0 AS DOUBLE))) AS std_pop,
  MIN(v) AS v_min,
  MAX(v) AS v_max
FROM d GROUP BY dim
"""


def embedding_dim_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension exact interpolated quantiles (clipping inputs)."""
    d = _dims(spark, sf_dir)
    aggs = [
        F.expr(f"percentile(v, {q!r})").alias(f"p{int(q * 100)}")
        for q in _QTILES
    ]
    return d.groupBy("dim").agg(*aggs)


_QTILES_SQL = f"""
WITH d AS (
  SELECT u.i AS dim, CAST(embedding[u.i] AS DOUBLE) AS v
  FROM embeddings,
       UNNEST(generate_series(1, len(embedding))) AS u(i)
)
SELECT dim,
  {", ".join(
    f"quantile_cont(v, CAST({q!r} AS DOUBLE)) AS p{int(q * 100)}"
    for q in _QTILES
  )}
FROM d GROUP BY dim
"""


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leading _COV_DIMS×_COV_DIMS covariance block (upper
    triangle, i <= j): cov = Σxy/n − (Σx/n)(Σy/n), every sum an exact
    fixed-point integer. Map-side pair explosion (no self-join)."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    pairs = F.expr(
        f"flatten(transform(sequence(1, {_COV_DIMS}), i -> "
        f"transform(sequence(i, {_COV_DIMS}), j -> named_struct("
        f"'i', i, 'j', j, "
        f"'x', CAST(element_at(embedding, i) AS DOUBLE), "
        f"'y', CAST(element_at(embedding, j) AS DOUBLE)))))"
    )
    d = emb.select(F.explode(pairs).alias("p")).select(
        F.col("p.i").cast("long").alias("dim_i"),
        F.col("p.j").cast("long").alias("dim_j"),
        F.col("p.x").alias("x"),
        F.col("p.y").alias("y"),
    )
    n = F.count(F.lit(1))
    sx = dsum(F.col("x"), _EMB_SCALE)
    sy = dsum(F.col("y"), _EMB_SCALE)
    sxy = dsum(F.col("x") * F.col("y"), _EMB_SCALE)
    return d.groupBy("dim_i", "dim_j").agg(
        n.alias("n"),
        (sxy / n - (sx / n) * (sy / n)).alias("cov_pop"),
    )


_COV_SQL = f"""
WITH d AS (
  SELECT a.i AS dim_i, b.j AS dim_j,
         CAST(embedding[a.i] AS DOUBLE) AS x,
         CAST(embedding[b.j] AS DOUBLE) AS y
  FROM embeddings,
       UNNEST(generate_series(1, {_COV_DIMS})) AS a(i),
       UNNEST(generate_series(1, {_COV_DIMS})) AS b(j)
  WHERE b.j >= a.i
)
SELECT dim_i, dim_j,
  CAST(COUNT(*) AS BIGINT) AS n,
  (CAST(SUM(CAST(FLOOR(x * y * {_EMB_SCALE}) AS BIGINT)) AS DOUBLE)
     / {_EMB_SCALE}) / COUNT(*)
  - ((CAST(SUM(CAST(FLOOR(x * {_EMB_SCALE}) AS BIGINT)) AS DOUBLE)
        / {_EMB_SCALE}) / COUNT(*))
    * ((CAST(SUM(CAST(FLOOR(y * {_EMB_SCALE}) AS BIGINT)) AS DOUBLE)
         / {_EMB_SCALE}) / COUNT(*)) AS cov_pop
FROM d GROUP BY dim_i, dim_j
"""


# ---------------------------------------------------------------------
# Johnson-Lindenstrauss sparse random projection (Achlioptas,
# "Database-friendly random projections", JCSS 2003): project 64-d
# embeddings to _JL_DIMS dims with the sparse {+1, 0, -1} matrix drawn
# w.p. {1/6, 2/3, 1/6} — here DERIVED from a deterministic affine-mod
# formula over (in-dim, out-dim) so both engines materialize the
# identical matrix with no stored state. The standard cheap
# dimensionality reduction in front of ANN / clustering at scale.
# ---------------------------------------------------------------------

_JL_DIMS = 16
# sign(i, j) over 1-based dims: h = (1664525·i + 1013904223·j) mod 6
# → 0:+1, 1:-1, else 0 (the 1/6, 1/6, 2/3 Achlioptas masses)
_JL_A, _JL_B = 1664525, 1013904223


def jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, out_dim, proj): the unscaled sparse JL projection
    Σ_i s(i,j)·x_i as exact fixed-point sums (the √(3/k) factor is a
    constant left to the consumer, keeping the gate integer-exact).
    Entirely map-side: the per-vector fold runs inside one expression,
    rows fan out ×_JL_DIMS with ZERO shuffle."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    projs = F.expr(
        f"transform(sequence(1, {_JL_DIMS}), j -> named_struct("
        f"'j', CAST(j AS BIGINT), "
        f"'acc', aggregate(sequence(1, size(embedding)), 0L, (acc, i) -> "
        f"acc + CAST(FLOOR((CAST(element_at(embedding, i) AS DOUBLE) * "
        f"CAST(CASE (CAST({_JL_A} AS BIGINT) * i "
        f"+ CAST({_JL_B} AS BIGINT) * j) % 6 "
        f"WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS DOUBLE)) "
        f"* {_EMB_SCALE!r}) AS BIGINT))))"
    )
    return emb.select("vec_id", F.explode(projs).alias("p")).select(
        "vec_id",
        F.col("p.j").alias("out_dim"),
        (F.col("p.acc").cast("double") / F.lit(_EMB_SCALE)).alias("proj"),
    )


_JL_SQL = f"""
WITH d AS (
  SELECT vec_id, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS x
  FROM embeddings,
       UNNEST(generate_series(1, len(embedding))) AS u(i)
)
SELECT d.vec_id, CAST(j.j AS BIGINT) AS out_dim,
  CAST(SUM(CAST(FLOOR((d.x *
    CAST(CASE (CAST({_JL_A} AS BIGINT) * d.i
               + CAST({_JL_B} AS BIGINT) * j.j) % 6
         WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS DOUBLE))
    * {_EMB_SCALE!r}) AS BIGINT)) AS DOUBLE) / {_EMB_SCALE!r} AS proj
FROM d, UNNEST(generate_series(1, {_JL_DIMS})) AS j(j)
GROUP BY d.vec_id, j.j
"""


QUERIES = {
    "embedding_moment_stats": embedding_moment_stats,
    "embedding_dim_quantiles": embedding_dim_quantiles,
    "embedding_covariance": embedding_covariance,
    "jl_projection": jl_projection,
}

ORACLES = {
    "embedding_moment_stats": _MOMENTS_SQL,
    "embedding_dim_quantiles": _QTILES_SQL,
    "embedding_covariance": _COV_SQL,
    "jl_projection": _JL_SQL,
}
