"""Statistical data-quality audits: Benford first-digit conformance,
HBOS histogram-based outlier scores, and Neyman-allocated stratified
sampling — the screening passes a data platform runs before trusting a
new drop of upstream data.

Scale design notes:

- ``benford_first_digit_audit``: first digits come from the integer
  cents' decimal string (``substr(CAST(x AS VARCHAR), 1, 1)`` —
  identical in both engines; no log10 at runtime).  The expected
  Benford shares log10(1 + 1/d) are NINE Python-precomputed double
  constants (the ``_LC_TABLE`` discipline).  One partially-aggregatable
  9-group count → a 9-row report with per-digit χ² terms built from
  exact integers and the constants.  One scan, one tiny shuffle.
- ``hbos_outlier_scores``: Histogram-Based Outlier Score (Goldstein &
  Dengel, KI 2012) — per-feature histograms, score = Σ_f −log density.
  The log is the shared fixed-point integer log2 from
  :mod:`trx_spark.queries.langid` (exact exponent bit math + a 64-entry
  constant mantissa table), so the per-event BIGINT score is
  hash-exact.  Each histogram is bounded BY CONSTRUCTION (≤ 256 value
  bands, 24 hours, |event types|) and broadcast back; scoring is one
  scan with three broadcast joins, the top-k a TakeOrderedAndProject.
  This adds the DENSITY-based member of the anomaly family next to the
  sequential CUSUM/EWMA monitors.
- ``neyman_allocation``: optimal (Neyman 1934) stratified sample
  allocation n_h ∝ N_h·S_h.  Per-stratum second moments are exact
  BIGINT sums of cents and cents² (bounded: cents ≤ 5·10⁴ → squares
  ≤ 2.5·10⁹/row, inside int64 to ~3.7·10⁹ rows per stratum at gate
  scale; production rescales the unit); S_h is one sqrt of an exact
  ratio (sqrt is IEEE-exact on both engines), the allocation one
  division against a 1-row broadcast total.  Output compares Neyman
  vs proportional allocation per stratum.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.exact import dlit, sql_dsum
from trx_spark.queries.langid import _l2fix_duck, _l2fix_spark
from trx_spark.tables import load_table

# ---------------------------------------------------------------------
# Benford's-law first-digit audit
# ---------------------------------------------------------------------

_BENFORD_P = [_math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of lineitem extended prices (integer
    cents) vs Benford's law: per digit the observed count/share, the
    expected share, and the χ² term (obs − n·p)²/(n·p).  Output: 9
    rows (digit, n_obs, p_expected, p_observed, chi2_term)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    digits = li.filter(F.col("cents") > 0).select(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("long").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    total = digits.agg(F.count(F.lit(1)).alias("n"))
    p_expected = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_P]), F.col("digit").cast("int")
    )
    exp_n = F.col("n").cast("double") * p_expected
    dev = F.col("n_obs").cast("double") - exp_n
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            p_expected.alias("p_expected"),
            (F.col("n_obs").cast("double") / F.col("n").cast("double")).alias(
                "p_observed"
            ),
            (dev * dev / exp_n).alias("chi2_term"),
        )
    )


_BENFORD_SQL = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM lineitem
  WHERE CAST(ROUND(l_extendedprice * 100) AS BIGINT) > 0
),
counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits GROUP BY 1),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits)
SELECT digit, n_obs,
  list_extract([{', '.join(dlit(p) for p in _BENFORD_P)}],
               CAST(digit AS INTEGER)) AS p_expected,
  CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS p_observed,
  (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * list_extract(
      [{', '.join(dlit(p) for p in _BENFORD_P)}], CAST(digit AS INTEGER)))
  * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * list_extract(
      [{', '.join(dlit(p) for p in _BENFORD_P)}], CAST(digit AS INTEGER)))
  / (CAST(n AS DOUBLE) * list_extract(
      [{', '.join(dlit(p) for p in _BENFORD_P)}], CAST(digit AS INTEGER)))
    AS chi2_term
FROM counts CROSS JOIN total
"""

# ---------------------------------------------------------------------
# HBOS outlier scores
# ---------------------------------------------------------------------

_HBOS_BAND = 1000   # value band = 10-currency-unit buckets of cents
_HBOS_CAP = 255
_HBOS_TOPK = 50
_NS_PER_HOUR = 3_600_000_000_000


def hbos_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``_HBOS_TOPK`` most anomalous events by HBOS over three
    features (value band, hour of day, event type): score_fix =
    Σ_f (L2fix(N) − L2fix(count_f(bin))) — the fixed-point −log₂ of
    the density product.  Ties break on event_id ascending.  Output:
    (event_id, event_type, vband, hour, score_fix)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.least(
            F.floor(F.round(F.col("value") * 100) / F.lit(float(_HBOS_BAND)))
            .cast("long"),
            F.lit(_HBOS_CAP).cast("long"),
        ).alias("vband"),
        (F.expr(f"ts_ns DIV {_NS_PER_HOUR}") % 24).alias("hour"),
    )
    hv = ev.groupBy("vband").agg(F.count(F.lit(1)).alias("cv"))
    hh = ev.groupBy("hour").agg(F.count(F.lit(1)).alias("ch"))
    ht = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("ct"))
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    l2n = F.expr(_l2fix_spark("n"))
    score = (
        (l2n - F.expr(_l2fix_spark("cv")))
        + (l2n - F.expr(_l2fix_spark("ch")))
        + (l2n - F.expr(_l2fix_spark("ct")))
    )
    return (
        ev.join(F.broadcast(hv), "vband")
        .join(F.broadcast(hh), "hour")
        .join(F.broadcast(ht), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_id",
            "event_type",
            "vband",
            "hour",
            score.cast("long").alias("score_fix"),
        )
        .orderBy(F.desc("score_fix"), F.asc("event_id"))
        .limit(_HBOS_TOPK)
    )


_HBOS_SQL = f"""
WITH ev AS (
  SELECT event_id, event_type,
    LEAST(CAST(FLOOR(CAST(ROUND(value * 100) AS BIGINT)
               / CAST({_HBOS_BAND} AS DOUBLE)) AS BIGINT),
          CAST({_HBOS_CAP} AS BIGINT)) AS vband,
    (epoch_ns(ts) // {_NS_PER_HOUR}) % 24 AS hour
  FROM events
),
hv AS (SELECT vband, CAST(COUNT(*) AS BIGINT) AS cv FROM ev GROUP BY 1),
hh AS (SELECT hour, CAST(COUNT(*) AS BIGINT) AS ch FROM ev GROUP BY 1),
ht AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ct FROM ev GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev)
SELECT ev.event_id, ev.event_type, ev.vband, ev.hour,
  ({_l2fix_duck('n')} - {_l2fix_duck('cv')})
  + ({_l2fix_duck('n')} - {_l2fix_duck('ch')})
  + ({_l2fix_duck('n')} - {_l2fix_duck('ct')}) AS score_fix
FROM ev
JOIN hv USING (vband) JOIN hh USING (hour) JOIN ht USING (event_type)
CROSS JOIN tot
ORDER BY score_fix DESC, event_id ASC
LIMIT {_HBOS_TOPK}
"""

# ---------------------------------------------------------------------
# Neyman allocation
# ---------------------------------------------------------------------

_NEYMAN_BUDGET = 1000
_NEYMAN_SUM_SCALE = 1e6  # fint scale for the Σ N_h·S_h fold: N_h·S_h ≤
# ~5·10^10 at gate magnitudes → quantized addends ≤ 5·10^16, exact


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Neyman vs proportional allocation of a
    ``_NEYMAN_BUDGET``-row sample: stratum size, mean and stddev of
    the value (cents — exact integer moments, one sqrt), the Neyman
    share N_h·S_h / Σ N_h·S_h, and both allocations (floor(x + 0.5)
    rounding, spelled identically in both engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cv")
    )
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("cv").alias("s1"),
        F.sum(F.col("cv") * F.col("cv")).alias("s2"),
    )
    var = (
        F.col("nh").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (F.col("nh").cast("double") * (F.col("nh") - 1).cast("double"))
    # nh=1 guard (ADVICE r11): the sample variance divides by nh·(nh−1);
    # a singleton stratum hits /0 — NULL under Spark's non-ANSI Divide,
    # inf/nan under DuckDB's IEEE ops.  An explicit CASE (same text in
    # both dialects) pins NULL in both engines; SUM skips NULLs in both,
    # so the Neyman total simply excludes undefined-spread strata.
    st = per.withColumn(
        "sd", F.when(F.col("nh") > 1, F.sqrt(var))
    ).withColumn("nhsh", F.col("nh").cast("double") * F.col("sd"))
    from trx_spark.exact import dsum

    tot = st.agg(
        F.sum("nh").alias("n_total"),
        # a float SUM over strata would be addition-order-dependent —
        # the fixed-point dsum makes the total exact and order-free
        dsum(F.col("nhsh"), _NEYMAN_SUM_SCALE).alias("sum_nhsh"),
    )
    alloc = F.floor(
        F.lit(float(_NEYMAN_BUDGET)) * F.col("nhsh") / F.col("sum_nhsh")
        + F.lit(0.5)
    ).cast("long")
    prop = F.floor(
        F.lit(float(_NEYMAN_BUDGET))
        * F.col("nh").cast("double")
        / F.col("n_total").cast("double")
        + F.lit(0.5)
    ).cast("long")
    return (
        st.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "nh",
            (F.col("s1").cast("double") / F.col("nh").cast("double")).alias(
                "mean_cents"
            ),
            F.col("sd").alias("sd_cents"),
            (F.col("nhsh") / F.col("sum_nhsh")).alias("neyman_share"),
            alloc.alias("neyman_n"),
            prop.alias("proportional_n"),
        )
    )


_NEYMAN_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cv FROM events
),
per AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nh,
         CAST(SUM(cv) AS BIGINT) AS s1,
         CAST(SUM(cv * cv) AS BIGINT) AS s2
  FROM ev GROUP BY 1
),
st AS (
  SELECT *,
    CASE WHEN nh > 1 THEN
      sqrt((CAST(nh AS DOUBLE) * CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
           / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE)))
    END AS sd
  FROM per
),
st2 AS (SELECT *, CAST(nh AS DOUBLE) * sd AS nhsh FROM st),
tot AS (
  SELECT CAST(SUM(nh) AS BIGINT) AS n_total,
         {sql_dsum('nhsh', _NEYMAN_SUM_SCALE)} AS sum_nhsh
  FROM st2
)
SELECT event_type, nh,
  CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE) AS mean_cents,
  sd AS sd_cents,
  nhsh / sum_nhsh AS neyman_share,
  CAST(FLOOR(CAST({float(_NEYMAN_BUDGET)!r} AS DOUBLE) * nhsh / sum_nhsh + 0.5)
       AS BIGINT) AS neyman_n,
  CAST(FLOOR(CAST({float(_NEYMAN_BUDGET)!r} AS DOUBLE) * CAST(nh AS DOUBLE)
             / CAST(n_total AS DOUBLE) + 0.5) AS BIGINT) AS proportional_n
FROM st2 CROSS JOIN tot
"""


QUERIES = {
    "benford_first_digit_audit": benford_first_digit_audit,
    "hbos_outlier_scores": hbos_outlier_scores,
    "neyman_allocation": neyman_allocation,
}

ORACLES = {
    "benford_first_digit_audit": _BENFORD_SQL,
    "hbos_outlier_scores": _HBOS_SQL,
    "neyman_allocation": _NEYMAN_SQL,
}
