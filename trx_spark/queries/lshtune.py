"""MinHash-LSH parameter auto-tuning: evaluate every banding of the
8-permutation family against the CORPUS'S OWN measured pair-similarity
distribution — the operator that turns the deployed (4 bands × 2 rows)
choice from a constant into a measured decision.

For a banding (b, r) the S-curve detection probability at similarity s
is 1 − (1 − s^r)^b.  Both powers have small INTEGER exponents, so the
curve is evaluated at the 20 histogram-bin midpoints IN PYTHON and
embedded as constant doubles (the ``_LC_TABLE`` discipline) — no
runtime pow/exp.  The similarity histogram comes from the exact
shingle-Jaccard pair table (``textdata.ngram_jaccard_pairs``), which
covers J ≥ 0.2: below that floor every r ≥ 2 curve is ≪ 1 %, so the
truncation understates only the r = 1 config's false-candidate mass
(noted in the output by the ``floor_truncated`` flag).

Scale shape: the pair table rides its own blocking join (the memoized
shingle machinery); the histogram is one ≤20-row partially-aggregatable
groupBy; each banding's expectation is a ≤20-term fold — folded through
fixed-point ``dsum`` because a plain float SUM would be
addition-order-dependent.  Output: one row per banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.exact import dlit, dsum, sql_dsum

_LSH_N_PERMS = 8            # the engine's MinHash family size
_TUNE_BINS = 20             # similarity histogram resolution (width .05)
_TUNE_TAU = 0.5             # "true duplicate" similarity target
_TUNE_SCALE = 1e6           # fint scale for the expectation folds
_CONFIGS = [(8, 1), (4, 2), (2, 4), (1, 8)]  # (bands, rows): b·r = 8


def _detect_probs(b: int, r: int) -> list[float]:
    """S-curve 1 − (1 − mid^r)^b at the 20 bin midpoints, computed
    with plain float multiplication chains (integer exponents)."""
    out = []
    for i in range(_TUNE_BINS):
        mid = (i + 0.5) / _TUNE_BINS
        sr = 1.0
        for _ in range(r):
            sr *= mid
        q = 1.0
        for _ in range(b):
            q *= 1.0 - sr
        out.append(1.0 - q)
    return out


def lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per banding of the 8-permutation MinHash family: expected
    detected candidate pairs over the measured J ≥ 0.2 pair histogram,
    split at τ = 0.5 into wanted (recall) and unwanted (false-candidate
    share) mass.  Output: (bands, rows_per_band, total_pairs,
    pairs_above_tau, detected_est, detected_above_est,
    detected_below_est, recall_at_tau_est, fp_share_est,
    floor_truncated)."""
    from trx_spark.queries.textdata import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(spark, sf_dir)
    hist = (
        pairs.select(
            F.least(
                F.floor(F.col("jaccard") * _TUNE_BINS).cast("long"),
                F.lit(_TUNE_BINS - 1).cast("long"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tau_bin = int(_TUNE_TAU * _TUNE_BINS)
    outs = []
    for b, r in _CONFIGS:
        probs = _detect_probs(b, r)
        p = F.element_at(
            F.array(*[F.lit(v) for v in probs]), F.col("bin").cast("int") + 1
        )
        above = F.col("bin") >= tau_bin
        det = F.col("n").cast("double") * p
        agg = hist.agg(
            F.lit(b).cast("long").alias("bands"),
            F.lit(r).cast("long").alias("rows_per_band"),
            F.sum("n").alias("total_pairs"),
            F.sum(F.when(above, F.col("n")).otherwise(F.lit(0))).alias(
                "pairs_above_tau"
            ),
            dsum(det, _TUNE_SCALE).alias("detected_est"),
            dsum(F.when(above, det).otherwise(F.lit(0.0)), _TUNE_SCALE).alias(
                "detected_above_est"
            ),
            dsum(F.when(~above, det).otherwise(F.lit(0.0)), _TUNE_SCALE).alias(
                "detected_below_est"
            ),
        )
        outs.append(agg)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    # zero-divisor guard (ADVICE r11): Spark's non-ANSI Divide yields
    # NULL on /0 but DuckDB's IEEE division yields inf/nan — an explicit
    # CASE (identical text in both dialects) pins NULL in both engines
    # when a degenerate corpus has no pairs above τ (or no detected mass)
    return out.select(
        "*",
        F.when(
            F.col("pairs_above_tau") != 0,
            F.col("detected_above_est")
            / F.col("pairs_above_tau").cast("double"),
        ).alias("recall_at_tau_est"),
        F.when(
            F.col("detected_est") != 0.0,
            F.col("detected_below_est") / F.col("detected_est"),
        ).alias("fp_share_est"),
        # the histogram floor (J ≥ 0.2) truncates the r=1 curve's
        # below-floor candidate mass; r ≥ 2 curves are ≪ 1 % there
        (F.col("rows_per_band") == 1).alias("floor_truncated"),
    )


def _tuning_sql() -> str:
    from trx_spark.queries.textdata import _JACCARD_SQL

    tau_bin = int(_TUNE_TAU * _TUNE_BINS)
    selects = []
    for b, r in _CONFIGS:
        probs = _detect_probs(b, r)
        plist = "[" + ", ".join(dlit(v) for v in probs) + "]"
        p = f"list_extract({plist}, CAST(bin AS INTEGER) + 1)"
        det = f"CAST(n AS DOUBLE) * {p}"
        selects.append(f"""
SELECT CAST({b} AS BIGINT) AS bands, CAST({r} AS BIGINT) AS rows_per_band,
  CAST(SUM(n) AS BIGINT) AS total_pairs,
  CAST(SUM(CASE WHEN bin >= {tau_bin} THEN n ELSE 0 END) AS BIGINT)
    AS pairs_above_tau,
  {sql_dsum(det, _TUNE_SCALE)} AS detected_est,
  {sql_dsum(f'CASE WHEN bin >= {tau_bin} THEN {det} ELSE CAST(0.0 AS DOUBLE) END', _TUNE_SCALE)}
    AS detected_above_est,
  {sql_dsum(f'CASE WHEN bin < {tau_bin} THEN {det} ELSE CAST(0.0 AS DOUBLE) END', _TUNE_SCALE)}
    AS detected_below_est
FROM hist""")
        # each SELECT aggregates the same ≤20-row histogram
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH pairs AS ({_JACCARD_SQL}),
hist AS (
  SELECT LEAST(CAST(FLOOR(jaccard * {_TUNE_BINS}) AS BIGINT),
               CAST({_TUNE_BINS - 1} AS BIGINT)) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs GROUP BY 1
),
curves AS ({body})
SELECT *,
  CASE WHEN pairs_above_tau = 0 THEN NULL
       ELSE detected_above_est / CAST(pairs_above_tau AS DOUBLE)
  END AS recall_at_tau_est,
  CASE WHEN detected_est = 0.0 THEN NULL
       ELSE detected_below_est / detected_est
  END AS fp_share_est,
  rows_per_band = 1 AS floor_truncated
FROM curves
"""


QUERIES = {"lsh_tuning_curve": lsh_tuning_curve}
ORACLES = {"lsh_tuning_curve": _tuning_sql()}
