"""Distribution-drift statistics, integer-exact: two-sample
Kolmogorov–Smirnov and Mann–Whitney U over the events stream.

A 100-TB training pipeline monitors *distribution* drift, not just
mean drift (the EWMA/CUSUM monitors in :mod:`temporal` cover means).
The two classical nonparametric two-sample tests are exactly
computable in 64-bit integers once the metric is quantized, so they
fit the repo's bit-exact oracle gate:

- **KS**: ``D = max_x |F1(x) − F2(x)|``. With cumulative per-sample
  counts ``cum1, cum2`` and totals ``n1, n2``, the numerator
  ``max |cum1·n2 − cum2·n1|`` is an exact BIGINT; ``D`` itself is ONE
  double division of two BIGINTs — bit-identical across engines.
- **Mann–Whitney U**: ``U1 = Σ_pairs 1[x>y] + ½·1[x=y]``. Per distinct
  value ``v`` with counts ``c1(v), c2(v)`` and the strictly-below
  cumulative ``cless2(v)``, ``2·U1 = Σ_v c1·(2·cless2 + c2)`` — an
  exact BIGINT (the ½-tie weight cleared by the factor 2). The
  common-language effect size (= AUC) is again one double division.

Scale design: both statistics aggregate the raw stream down to ONE row
per distinct quantized value FIRST (a map-side-combining groupBy on a
domain bounded by the quantization step — here cents, ≤ ~33k cells; at
100 TB you choose the bin width to bound the domain, exactly like a
histogram sketch). The single-partition window then runs over that
bounded per-bin aggregate, never over raw events — the same
bounded-domain contract as ``event_rate_cusum``. No joins, one shuffle
(the groupBy), one 1-row result.

Reference analogue: trx filters scan points by χ²-style statistics
(dataReduction.py:200 chi2Filter); these are the corpus-level
two-sample versions a data-curation pipeline runs between sources or
time slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.tables import load_table

_DRIFT_A = "click"  # sample 1
_DRIFT_B = "view"  # sample 2
_QUANT = 100  # cents: value has 2 decimals; floor(v*100) is exact


def _per_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per distinct quantized value: counts in each sample plus
    running (cumulative) and total counts. The window input is the
    per-bin aggregate — bounded by the quantization domain, not by the
    event count."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_DRIFT_A, _DRIFT_B)
    )
    per_v = ev.groupBy(
        F.floor(F.col("value") * _QUANT).cast("long").alias("v")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == _DRIFT_A, F.lit(1)).otherwise(F.lit(0))
        ).alias("c1"),
        F.sum(
            F.when(F.col("event_type") == _DRIFT_B, F.lit(1)).otherwise(F.lit(0))
        ).alias("c2"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_v.withColumn("cum1", F.sum("c1").over(w_cum))
        .withColumn("cum2", F.sum("c2").over(w_cum))
        .withColumn("n1", F.sum("c1").over(w_all))
        .withColumn("n2", F.sum("c2").over(w_all))
    )


def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the value
    distributions of two event types. One row: sample sizes, the exact
    integer numerator ``max |cum1·n2 − cum2·n1|``, and the KS distance
    as one double division."""
    c = _per_value_counts(spark, sf_dir)
    d_num = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    return c.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(d_num).alias("d_num"),
    ).select(
        "n1",
        "n2",
        "d_num",
        (
            F.col("d_num").cast("double")
            / (F.col("n1").cast("double") * F.col("n2").cast("double"))
        ).alias("ks_d"),
    )


def mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (with midrank tie handling) between the value
    distributions of two event types. One row: sample sizes, the exact
    integer ``2·U1``, and the common-language effect size (AUC) as one
    double division."""
    c = _per_value_counts(spark, sf_dir)
    cless2 = F.col("cum2") - F.col("c2")
    term = F.col("c1") * (F.lit(2) * cless2 + F.col("c2"))
    return c.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(term).alias("u1_x2"),
    ).select(
        "n1",
        "n2",
        "u1_x2",
        (
            F.col("u1_x2").cast("double")
            / (
                F.lit(2.0)
                * F.col("n1").cast("double")
                * F.col("n2").cast("double")
            )
        ).alias("auc"),
    )


_COUNTS_CTE = f"""
per_v AS (
  SELECT CAST(FLOOR(value * {_QUANT}) AS BIGINT) AS v,
    CAST(SUM(CASE WHEN event_type = '{_DRIFT_A}' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(SUM(CASE WHEN event_type = '{_DRIFT_B}' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM events WHERE event_type IN ('{_DRIFT_A}', '{_DRIFT_B}')
  GROUP BY 1
),
cum AS (
  SELECT v, c1, c2,
    CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
    CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2,
    CAST(SUM(c1) OVER () AS BIGINT) AS n1,
    CAST(SUM(c2) OVER () AS BIGINT) AS n2
  FROM per_v
)"""

_KS_SQL = f"""
WITH {_COUNTS_CTE}
SELECT n1, n2, d_num,
  CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d
FROM (
  SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
    CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num
  FROM cum
)
"""

_MWU_SQL = f"""
WITH {_COUNTS_CTE}
SELECT n1, n2, u1_x2,
  CAST(u1_x2 AS DOUBLE)
    / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc
FROM (
  SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
    CAST(SUM(c1 * (2 * (cum2 - c2) + c2)) AS BIGINT) AS u1_x2
  FROM cum
)
"""

# ---------------------------------------------------------------------
# Funnel conversion latency: first view → first purchase
# ---------------------------------------------------------------------
#
# The product-analytics companion to event_funnel: not just WHO
# converts but HOW FAST. Latency is integer seconds from the ns
# ordering key (integer DIV — no float time math), and the report is
# the exact percentile bridge (Spark ``percentile`` ≡ DuckDB
# ``quantile_cont``, the repo-wide contract). One per-user collapse
# (the only data-scale stage: min-aggregates, map-side combined), one
# 1-row summary.

_CONV_FROM, _CONV_TO = "view", "purchase"


def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: users seen, users converted (first purchase after
    first view), and p50/p90/p99/max of the conversion latency in
    whole seconds."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_CONV_FROM, _CONV_TO)
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == _CONV_FROM, F.col("ts_ns"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == _CONV_TO, F.col("ts_ns"))
        ).alias("t_buy"),
    )
    lat = per_user.withColumn(
        "latency_s",
        F.when(
            F.col("t_buy") > F.col("t_view"),
            F.expr("(t_buy - t_view) DIV 1000000000"),
        ),
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("latency_s").alias("n_converted"),
        F.expr("percentile(latency_s, 0.5D)").alias("p50_s"),
        F.expr("percentile(latency_s, 0.9D)").alias("p90_s"),
        F.expr("percentile(latency_s, 0.99D)").alias("p99_s"),
        F.max("latency_s").alias("max_s"),
    )


_CONV_SQL = f"""
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = '{_CONV_FROM}' THEN epoch_ns(ts) END) AS t_view,
    MIN(CASE WHEN event_type = '{_CONV_TO}' THEN epoch_ns(ts) END) AS t_buy
  FROM events
  WHERE event_type IN ('{_CONV_FROM}', '{_CONV_TO}')
  GROUP BY user_id
),
lat AS (
  SELECT *, CASE WHEN t_buy > t_view
                 THEN (t_buy - t_view) // 1000000000 END AS latency_s
  FROM per_user
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(COUNT(latency_s) AS BIGINT) AS n_converted,
  quantile_cont(latency_s, CAST(0.5 AS DOUBLE)) AS p50_s,
  quantile_cont(latency_s, CAST(0.9 AS DOUBLE)) AS p90_s,
  quantile_cont(latency_s, CAST(0.99 AS DOUBLE)) AS p99_s,
  CAST(MAX(latency_s) AS BIGINT) AS max_s
FROM lat
"""

# ---------------------------------------------------------------------
# Welch's t: unequal-variance mean comparison from exact integer sums
# ---------------------------------------------------------------------


def welch_t_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: per-sample exact integer sufficient statistics (n, Σx,
    Σx² over floor(value) units) for the two event-type samples, and
    Welch's t — means, sample variances and the t statistic as IEEE
    arithmetic (one sqrt) over those integers. The parametric
    complement to ``mannwhitney_u``/``ks_two_sample`` for mean drift
    with unequal variances."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_DRIFT_A, _DRIFT_B)
    )
    unit = F.floor(F.col("value")).cast("long")
    is_a = F.col("event_type") == _DRIFT_A
    s = ev.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(is_a, unit).otherwise(0)).alias("s1"),
        F.sum(F.when(is_a, unit * unit).otherwise(0)).alias("q1"),
        F.sum(F.when(is_a, 0).otherwise(1)).alias("n2"),
        F.sum(F.when(is_a, 0).otherwise(unit)).alias("s2"),
        F.sum(F.when(is_a, 0).otherwise(unit * unit)).alias("q2"),
    )

    def _mv(n, sx, qx):
        nd = F.col(n).cast("double")
        m = F.col(sx).cast("double") / nd
        v = (F.col(qx).cast("double") - F.col(sx).cast("double") * m) / (
            nd - F.lit(1.0)
        )
        return m, v, nd

    m1, v1, n1d = _mv("n1", "s1", "q1")
    m2, v2, n2d = _mv("n2", "s2", "q2")
    return s.select(
        "n1",
        "s1",
        "q1",
        "n2",
        "s2",
        "q2",
        ((m1 - m2) / F.sqrt(v1 / n1d + v2 / n2d)).alias("t_welch"),
    )


_WELCH_SQL = f"""
WITH s AS (
  SELECT
    CAST(SUM(CASE WHEN event_type = '{_DRIFT_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN event_type = '{_DRIFT_A}'
             THEN CAST(FLOOR(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN event_type = '{_DRIFT_A}'
             THEN CAST(FLOOR(value) AS BIGINT) * CAST(FLOOR(value) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS q1,
    CAST(SUM(CASE WHEN event_type = '{_DRIFT_A}' THEN 0 ELSE 1 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN event_type = '{_DRIFT_A}'
             THEN 0 ELSE CAST(FLOOR(value) AS BIGINT) END) AS BIGINT) AS s2,
    CAST(SUM(CASE WHEN event_type = '{_DRIFT_A}'
             THEN 0 ELSE CAST(FLOOR(value) AS BIGINT) * CAST(FLOOR(value) AS BIGINT)
             END) AS BIGINT) AS q2
  FROM events WHERE event_type IN ('{_DRIFT_A}', '{_DRIFT_B}')
)
SELECT n1, s1, q1, n2, s2, q2,
  ((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
     - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
   / SQRT(
      ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
          * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
        / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
    + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
          * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE)))
  AS t_welch
FROM s
"""


def source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: corpus-balance concentration indices over the source
    distribution — the Herfindahl–Hirschman index Σ share² and Gini
    impurity 1 − HHI (log-free diversity measures, unlike entropy), on
    both document and character mass. The monitoring number behind
    mixture rebalancing: HHI → 1 means one source dominates."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("n_chars").alias("nc")
    )
    # HHI = Σ n_i² / (Σ n_i)² — EXACT integer numerator and
    # denominator (a float Σ share² would accumulate order-dependently
    # and break cross-engine bit equality), ONE double division each
    s = per.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum(F.col("nd") * F.col("nd")).alias("sq_d"),
        F.sum("nd").alias("tot_d"),
        F.sum(F.col("nc") * F.col("nc")).alias("sq_c"),
        F.sum("nc").alias("tot_c"),
    )
    hhi_d = F.col("sq_d").cast("double") / (
        F.col("tot_d").cast("double") * F.col("tot_d").cast("double")
    )
    hhi_c = F.col("sq_c").cast("double") / (
        F.col("tot_c").cast("double") * F.col("tot_c").cast("double")
    )
    return s.select(
        "n_sources",
        hhi_d.alias("hhi_docs"),
        hhi_c.alias("hhi_chars"),
        (F.lit(1.0) - hhi_d).alias("gini_docs"),
        (F.lit(1.0) - hhi_c).alias("gini_chars"),
    )


_CONC_SQL = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS nd,
    CAST(SUM(n_chars) AS BIGINT) AS nc
  FROM documents GROUP BY source
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
    CAST(SUM(nd * nd) AS BIGINT) AS sq_d,
    CAST(SUM(nd) AS BIGINT) AS tot_d,
    CAST(SUM(nc * nc) AS BIGINT) AS sq_c,
    CAST(SUM(nc) AS BIGINT) AS tot_c
  FROM per
)
SELECT n_sources,
  CAST(sq_d AS DOUBLE) / (CAST(tot_d AS DOUBLE) * CAST(tot_d AS DOUBLE))
    AS hhi_docs,
  CAST(sq_c AS DOUBLE) / (CAST(tot_c AS DOUBLE) * CAST(tot_c AS DOUBLE))
    AS hhi_chars,
  1.0 - CAST(sq_d AS DOUBLE) / (CAST(tot_d AS DOUBLE) * CAST(tot_d AS DOUBLE))
    AS gini_docs,
  1.0 - CAST(sq_c AS DOUBLE) / (CAST(tot_c AS DOUBLE) * CAST(tot_c AS DOUBLE))
    AS gini_chars
FROM s
"""

QUERIES = {
    "ks_two_sample": ks_two_sample,
    "mannwhitney_u": mannwhitney_u,
    "conversion_latency_quantiles": conversion_latency_quantiles,
    "welch_t_stats": welch_t_stats,
    "source_concentration": source_concentration,
}

ORACLES = {
    "ks_two_sample": _KS_SQL,
    "mannwhitney_u": _MWU_SQL,
    "conversion_latency_quantiles": _CONV_SQL,
    "welch_t_stats": _WELCH_SQL,
    "source_concentration": _CONC_SQL,
}
