"""Training-run operations: exact stratified k-fold assignment,
UNIMAX multilingual budget allocation, and a k-anonymity audit —
the governance/allocation layer a 100-TB training pipeline runs
between curation and the trainer.

Scale design notes:

- ``stratified_kfold_assign``: EXACT stratification (each fold gets
  every k-th document of every stratum) via one row_number window
  partitioned by source — thousands of independent per-source
  partitions, no global sort, no random() (reproducible across
  engines, retries and repartitionings). The gate aggregates the
  assignment to per-(source, fold) counts so the driver hash pins
  every single fold decision without hashing row-level output.
- ``unimax_language_sampling``: the UNIMAX water-filling allocation
  (Chung et al. 2023, public): give every language an equal share of
  the training budget, capped at what the language actually has; the
  spare from low-resource languages is re-spread over the rest. The
  closed form over languages sorted by availability — threshold
  ``t = (B − cum_below) / n_remaining`` at the first position where
  ``t ≤ avail`` — needs ONE window pass over the ≤|languages|-row
  aggregate and a 1-row threshold broadcast (the audited scalar
  pattern). All counts are exact BIGINTs; the threshold, allocation
  and sampling rate are each one IEEE division/min with identical
  expression trees on both engines.
- ``k_anonymity_audit``: the data-governance gate — group sizes over
  the quasi-identifier tuple, rows in groups smaller than k are
  re-identifiable. One map-side-combining groupBy + one 1-row
  summary; the share is one int64→double division.
- ``l_diversity_audit``: the complement gate (Machanavajjhala et al.
  2007) — a k-large group whose members all share one sensitive value
  still leaks it; requires ≥ l distinct sensitive values per group.
  Same aggregation shape as k-anonymity plus one COUNT(DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.tables import load_table

_N_FOLDS = 5


def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, fold) census of the exact stratified k-fold
    assignment: fold = rank-within-source mod k (rank ordered by
    doc_id — deterministic, engine-portable)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    fold = ((F.row_number().over(w) - 1) % _N_FOLDS).cast("int")
    return (
        docs.withColumn("fold", fold)
        .groupBy("source", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_KFOLD_SQL = f"""
SELECT source, fold,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
  CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM (
  SELECT doc_id, source, n_chars,
    CAST((ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)
         % {_N_FOLDS} AS INTEGER) AS fold
  FROM documents
)
GROUP BY source, fold
"""

# UNIMAX budget: half the corpus (in characters — the token proxy the
# other curation queries use); exact integer halving.
_UNIMAX_BUDGET_DEN = 2


def unimax_language_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language UNIMAX allocation: available characters, the
    water-filled allocation against a budget of total/2, and the
    per-language sampling rate."""
    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("lang").agg(
        F.sum("n_chars").alias("avail_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    w_all = Window.orderBy("avail_chars", "lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("avail_chars", "lang").rowsBetween(
        Window.unboundedPreceding, 0
    )
    staged = (
        avail.withColumn("total", F.sum("avail_chars").over(w_all))
        .withColumn("n_langs", F.count(F.lit(1)).over(w_all))
        .withColumn("i", F.row_number().over(Window.orderBy("avail_chars", "lang")))
        .withColumn(
            "cum_below", F.sum("avail_chars").over(w_cum) - F.col("avail_chars")
        )
        .withColumn(
            # integer DIV on both engines (double/2 then cast would
            # round in DuckDB but truncate in Spark)
            "budget", F.expr(f"total DIV {_UNIMAX_BUDGET_DEN}")
        )
        .withColumn(
            "t_cand",
            (F.col("budget") - F.col("cum_below")).cast("double")
            / (F.col("n_langs") - F.col("i") + 1).cast("double"),
        )
    )
    thresh = (
        staged.filter(F.col("t_cand") <= F.col("avail_chars").cast("double"))
        .orderBy("i")
        .limit(1)
        .select(F.col("t_cand").alias("t"))
    )
    return (
        staged.crossJoin(F.broadcast(thresh))
        .select(
            "lang",
            "n_docs",
            "avail_chars",
            F.least(F.col("avail_chars").cast("double"), F.col("t")).alias(
                "alloc_chars"
            ),
            (
                F.least(F.col("avail_chars").cast("double"), F.col("t"))
                / F.col("avail_chars").cast("double")
            ).alias("sampling_rate"),
        )
    )


_UNIMAX_SQL = f"""
WITH avail AS (
  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS avail_chars,
    CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
staged AS (
  SELECT lang, n_docs, avail_chars,
    CAST(SUM(avail_chars) OVER () AS BIGINT) AS total,
    CAST(COUNT(*) OVER () AS BIGINT) AS n_langs,
    ROW_NUMBER() OVER (ORDER BY avail_chars, lang) AS i,
    CAST(SUM(avail_chars) OVER (ORDER BY avail_chars, lang
      ROWS UNBOUNDED PRECEDING) AS BIGINT) - avail_chars AS cum_below
  FROM avail
),
staged2 AS (
  SELECT *,
    CAST((total // {_UNIMAX_BUDGET_DEN}) - cum_below AS DOUBLE)
      / CAST(n_langs - i + 1 AS DOUBLE) AS t_cand
  FROM staged
),
thresh AS (
  SELECT t_cand AS t FROM staged2
  WHERE t_cand <= CAST(avail_chars AS DOUBLE)
  ORDER BY i LIMIT 1
)
SELECT lang, n_docs, avail_chars,
  LEAST(CAST(avail_chars AS DOUBLE), t) AS alloc_chars,
  LEAST(CAST(avail_chars AS DOUBLE), t) / CAST(avail_chars AS DOUBLE)
    AS sampling_rate
FROM staged2 CROSS JOIN thresh
"""

_KANON_K = 5


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row k-anonymity report over the customer quasi-identifier
    tuple (nationkey, mktsegment): group count, groups below k, rows
    re-identifiable (in sub-k groups), the achieved anonymity (the
    smallest group), and the at-risk share."""
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("gsz")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(
            F.when(F.col("gsz") < _KANON_K, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_small_groups"),
        F.sum(
            F.when(F.col("gsz") < _KANON_K, F.col("gsz")).otherwise(F.lit(0))
        ).alias("rows_at_risk"),
        F.min("gsz").alias("anonymity_k"),
        F.sum("gsz").alias("n_rows"),
    ).select(
        "n_groups",
        "n_small_groups",
        "rows_at_risk",
        "anonymity_k",
        "n_rows",
        (
            F.col("rows_at_risk").cast("double") / F.col("n_rows").cast("double")
        ).alias("at_risk_share"),
    )


_KANON_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS gsz
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_groups,
  CAST(SUM(CASE WHEN gsz < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_small_groups,
  CAST(SUM(CASE WHEN gsz < {_KANON_K} THEN gsz ELSE 0 END) AS BIGINT)
    AS rows_at_risk,
  CAST(MIN(gsz) AS BIGINT) AS anonymity_k,
  CAST(SUM(gsz) AS BIGINT) AS n_rows,
  CAST(CAST(SUM(CASE WHEN gsz < {_KANON_K} THEN gsz ELSE 0 END) AS BIGINT)
       AS DOUBLE)
    / CAST(CAST(SUM(gsz) AS BIGINT) AS DOUBLE) AS at_risk_share
FROM groups
"""

_LDIV_L = 3  # require ≥ l distinct sensitive values per QI group


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row l-diversity report (Machanavajjhala et al. 2007,
    distinct-l-diversity) over the same customer quasi-identifier tuple
    as ``k_anonymity_audit``: a QI group whose members all share one
    sensitive value leaks that value even when the group is k-large.
    Sensitive attribute: the account-balance band floor(acctbal/1000)
    (bands make the attribute categorical, the setting l-diversity is
    defined for).  Reports the achieved l (min distinct bands per
    group), groups and rows below ``_LDIV_L``, and the at-risk share.

    Scale shape: two map-side-combining aggregations — (QI, band)
    distinct-ify, then per-QI distinct count — and a 1-row summary.
    No window, no join; identical expression trees on both engines."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("band"),
    )
    per_group = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("gsz"),
            F.countDistinct("band").alias("ldiv"),
        )
    )
    return per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("ldiv").alias("diversity_l"),
        F.sum(
            F.when(F.col("ldiv") < _LDIV_L, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_low_div_groups"),
        F.sum(
            F.when(F.col("ldiv") < _LDIV_L, F.col("gsz")).otherwise(F.lit(0))
        ).alias("rows_at_risk"),
        F.sum("gsz").alias("n_rows"),
    ).select(
        "n_groups",
        "diversity_l",
        "n_low_div_groups",
        "rows_at_risk",
        "n_rows",
        (
            F.col("rows_at_risk").cast("double") / F.col("n_rows").cast("double")
        ).alias("at_risk_share"),
    )


_LDIV_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(COUNT(*) AS BIGINT) AS gsz,
    CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT))
         AS BIGINT) AS ldiv
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_groups,
  CAST(MIN(ldiv) AS BIGINT) AS diversity_l,
  CAST(SUM(CASE WHEN ldiv < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_low_div_groups,
  CAST(SUM(CASE WHEN ldiv < {_LDIV_L} THEN gsz ELSE 0 END) AS BIGINT)
    AS rows_at_risk,
  CAST(SUM(gsz) AS BIGINT) AS n_rows,
  CAST(CAST(SUM(CASE WHEN ldiv < {_LDIV_L} THEN gsz ELSE 0 END) AS BIGINT)
       AS DOUBLE)
    / CAST(CAST(SUM(gsz) AS BIGINT) AS DOUBLE) AS at_risk_share
FROM groups
"""

# ---------------------------------------------------------------------
# t-closeness (Li, Li, Venkatasubramanian, ICDE 2007): the third leg of
# the privacy-audit trio.  k-anonymity bounds group size, l-diversity
# bounds distinct sensitive values, but a group whose sensitive
# DISTRIBUTION skews far from the table's global distribution still
# leaks (the "skewness attack").  t-closeness requires the Earth
# Mover's Distance between each QI group's sensitive distribution and
# the global one to stay ≤ t.  For the ORDERED band attribute the EMD
# has the closed form (1/(m−1))·Σ_i |Σ_{j≤i} (p_j − q_j)| — and with
# p_j = c_gj/g, q_j = C_j/N every cumulative term is the exact integer
# N·cum_c_g − g·cum_C over the common denominator g·N, so the per-group
# EMD numerator is a BIGINT and the only float op is one final IEEE
# division.  Overflow bound: |N·cum_c_g| ≤ N·g — inside int64 while
# N·max_group < 2^63 (certified far above audit scale; the PageRank
# mass-bound discipline).
#
# Plan shape: one (QI, band) count groupBy (partial-aggregatable), one
# (band) global count, one QI-group count — all bounded outputs
# (|QI grid| × |bands|); the group×band grid is a broadcast cross join
# of two aggregate dims (≤125 × ≤13 rows); the cumulative sum windows
# partition by QI group over ≤|bands| rows.  Nothing data-sized past
# the first aggregation.
# ---------------------------------------------------------------------

_TCLOSE_T = 0.2  # the paper's working threshold


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row t-closeness report over the same customer QI tuple and
    acctbal-band sensitive attribute as the k-anonymity / l-diversity
    audits: the achieved t (max ordered-EMD over groups), groups and
    rows beyond ``_TCLOSE_T``, and the at-risk share."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("band"),
    )
    gb = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("c")
    )
    gsz = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("gsz")
    )
    glob = cust.groupBy("band").agg(F.count(F.lit(1)).alias("gc"))
    nm = glob.agg(
        F.sum("gc").alias("n_total"), F.count(F.lit(1)).alias("m_bands")
    )
    grid = (
        gsz.crossJoin(F.broadcast(glob))
        .join(gb, ["c_nationkey", "c_mktsegment", "band"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0).cast("long")))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "gsz",
        F.sum("c").over(w).alias("cum_c"),
        F.sum("gc").over(w).alias("cum_gc"),
    )
    per_group = (
        cums.crossJoin(F.broadcast(nm))
        .groupBy("c_nationkey", "c_mktsegment", "gsz", "n_total", "m_bands")
        .agg(
            F.sum(
                F.abs(
                    F.col("n_total") * F.col("cum_c")
                    - F.col("gsz") * F.col("cum_gc")
                )
            ).alias("emd_num")
        )
        .withColumn(
            "emd",
            F.col("emd_num").cast("double")
            / (
                F.col("gsz") * F.col("n_total") * (F.col("m_bands") - 1)
            ).cast("double"),
        )
    )
    return per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.max("emd").alias("closeness_t"),
        F.sum(
            F.when(F.col("emd") > _TCLOSE_T, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_far_groups"),
        F.sum(
            F.when(F.col("emd") > _TCLOSE_T, F.col("gsz")).otherwise(F.lit(0))
        ).alias("rows_at_risk"),
        F.sum("gsz").alias("n_rows"),
    ).select(
        "n_groups",
        "closeness_t",
        "n_far_groups",
        "rows_at_risk",
        "n_rows",
        (
            F.col("rows_at_risk").cast("double") / F.col("n_rows").cast("double")
        ).alias("at_risk_share"),
    )


_TCLOSE_SQL = f"""
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
  FROM customer
),
gb AS (
  SELECT c_nationkey, c_mktsegment, band, CAST(COUNT(*) AS BIGINT) AS c
  FROM cust GROUP BY 1, 2, 3
),
gsz AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS gsz
  FROM cust GROUP BY 1, 2
),
gband AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS gc FROM cust GROUP BY 1),
nm AS (
  SELECT CAST(SUM(gc) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS m_bands
  FROM gband
),
grid AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.gsz, b.band, b.gc,
         COALESCE(x.c, 0) AS c
  FROM gsz g CROSS JOIN gband b
  LEFT JOIN gb x ON x.c_nationkey = g.c_nationkey
    AND x.c_mktsegment = g.c_mktsegment AND x.band = b.band
),
cums AS (
  SELECT c_nationkey, c_mktsegment, gsz,
    CAST(SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY band
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c,
    CAST(SUM(gc) OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY band
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_gc
  FROM grid
),
per_group AS (
  SELECT c_nationkey, c_mktsegment, gsz, n_total, m_bands,
         CAST(SUM(ABS(n_total * cum_c - gsz * cum_gc)) AS BIGINT) AS emd_num
  FROM cums CROSS JOIN nm
  GROUP BY 1, 2, 3, 4, 5
),
emds AS (
  SELECT *, CAST(emd_num AS DOUBLE)
           / CAST(gsz * n_total * (m_bands - 1) AS DOUBLE) AS emd
  FROM per_group
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_groups,
  MAX(emd) AS closeness_t,
  CAST(SUM(CASE WHEN emd > {_TCLOSE_T!r} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_far_groups,
  CAST(SUM(CASE WHEN emd > {_TCLOSE_T!r} THEN gsz ELSE 0 END) AS BIGINT)
    AS rows_at_risk,
  CAST(SUM(gsz) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN emd > {_TCLOSE_T!r} THEN gsz ELSE 0 END) AS DOUBLE)
    / CAST(SUM(gsz) AS DOUBLE) AS at_risk_share
FROM emds
"""

# ---------------------------------------------------------------------
# Differential-privacy release plumbing: Laplace-noised counts with
# epsilon accounting.  The noise is the exact inverse-CDF transform
# X = -b*sgn(u-1/2)*ln(1 - 2|u-1/2|) evaluated in FIXED POINT via the
# shared integer log2 (langid._l2fix_*, ln x = log2(x)*ln2), so the
# whole release is hash-checkable.  HONESTY NOTE (the multimodal-stub
# discipline): the uniform u here is a DETERMINISTIC public hash of
# the group key — that makes the gate verifiable but provides NO
# privacy; a production release swaps in a secret per-release seed
# (one constant), keeping every other expression identical.  The
# operator content is the transform, the integer plumbing and the
# epsilon/sensitivity accounting, not the seed.
# ---------------------------------------------------------------------

_DP_A, _DP_B = 48271, 2029  # Lehmer spread of the group-key hash
_DP_LN2_FIX = 45426         # round(ln 2 * 2^16)
_DP_EPS = 1.0               # release budget (b = sensitivity/eps = 1)


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type DP count release: exact count, the fixed-point
    Laplace noise (scale b = 1/eps, eps = 1, count sensitivity 1), the
    noised count, and the accounting columns.  |noise| is capped at
    b*ln P (~21.5) by the u -> 1/P guard — the tail a 31-bit uniform
    can express.  Output: (event_type, n, noise_fp32, noisy_n,
    epsilon, sensitivity)."""
    from trx_spark.queries.langid import _l2fix_spark
    from trx_spark.queries.textdata import _P, _tok_hash

    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    h = (_tok_hash(F.col("event_type")) * F.lit(_DP_A) + F.lit(_DP_B)) % F.lit(_P)
    per = per.withColumn("h", h)
    # v in [-P, P-2]; t = P - |v| in [0, P] clamped to >= 1 (the cap)
    per = per.withColumn("v", F.lit(2) * F.col("h") - F.lit(_P)).withColumn(
        "t", F.greatest(F.lit(_P) - F.abs(F.col("v")), F.lit(1)).cast("long")
    )
    # the literal must be BIGINT before the <<16 mantissa shift
    l2p = _l2fix_spark(f"CAST({_P} AS BIGINT)")
    l2t = _l2fix_spark("t")
    sgn = F.when(F.col("v") < 0, F.lit(-1)).otherwise(F.lit(1))
    # promote BEFORE the product: the l2fix expressions are INT-typed
    # and Spark's non-ANSI int multiply wraps silently at 2^31
    noise = (
        sgn.cast("long")
        * (F.expr(l2p) - F.expr(l2t)).cast("long")
        * F.lit(_DP_LN2_FIX).cast("long")
    )
    per = per.withColumn("noise_fp32", noise)
    # round-to-nearest via floor((x + 2^31) / 2^32) — double division of
    # |x| <= 9.3e13 is exact (< 2^53), identical in both engines
    noisy = F.col("n") + F.floor(
        (F.col("noise_fp32") + F.lit(2147483648)).cast("double")
        / F.lit(4294967296.0)
    ).cast("long")
    return per.select(
        "event_type",
        "n",
        "noise_fp32",
        noisy.alias("noisy_n"),
        F.lit(_DP_EPS).cast("double").alias("epsilon"),
        F.lit(1).cast("long").alias("sensitivity"),
    )


def _dp_sql() -> str:
    from trx_spark.queries.langid import _l2fix_duck
    from trx_spark.queries.textdata import _P, _tok_hash_sql

    hh = f"(({_tok_hash_sql('event_type')}) * {_DP_A} + {_DP_B}) % {_P}"
    l2p = _l2fix_duck(f"CAST({_P} AS BIGINT)")
    l2t = _l2fix_duck("t")
    return f"""
WITH per AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, {hh} AS h
  FROM events GROUP BY event_type
),
tv AS (
  SELECT *, 2 * h - {_P} AS v,
         CAST(GREATEST({_P} - ABS(2 * h - {_P}), 1) AS BIGINT) AS t
  FROM per
),
nz AS (
  SELECT *, CAST((CASE WHEN v < 0 THEN -1 ELSE 1 END)
                 * (({l2p}) - ({l2t})) * {_DP_LN2_FIX} AS BIGINT)
            AS noise_fp32
  FROM tv
)
SELECT event_type, n, noise_fp32,
       n + CAST(FLOOR(CAST(noise_fp32 + 2147483648 AS DOUBLE)
                      / 4294967296.0) AS BIGINT) AS noisy_n,
       CAST({_DP_EPS!r} AS DOUBLE) AS epsilon,
       CAST(1 AS BIGINT) AS sensitivity
FROM nz
"""



# ---------------------------------------------------------------------
# Second DP mechanism + the composition ledger (r12 verdict task 3).
#
# dp_heavy_hitters: the "noisy top-k" release — Laplace noise (the same
# exact fixed-point inverse-CDF transform as dp_noisy_counts, scale
# b = 1/eps = 2) added to the Misra–Gries kept counters, released only
# above a threshold (the stability-based release shape: the sketch
# bounds WHICH items can appear, the threshold suppresses small noisy
# counts).  A DIFFERENT Lehmer spread decorrelates this release's
# noise from dp_noisy_counts' on any shared key.  Same honesty note as
# dp_noisy_counts: the deterministic key-hash uniform makes the gate
# verifiable and provides no privacy; production swaps one secret seed.
#
# dp_epsilon_ledger: sequential composition across the releases — the
# running budget Σ eps_i, carried in MICRO-epsilon integers so the
# ledger is hash-checkable, next to each release's row count (how much
# left the building at what price).
# ---------------------------------------------------------------------

_DP_A2, _DP_B2 = 69621, 4787  # this release's own Lehmer spread
_DP_EPS_HH = 0.5              # heavy-hitter release budget (b = 1/eps = 2)
_DP_HH_SCALE = 2              # integer b: noise = b * sgn * ln(P/t)
_DP_HH_T = 10                 # suppress noisy counts at or below this


def dp_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP heavy-hitter release: fixed-point Laplace noise (scale
    b = 1/eps = 2, count sensitivity 1) on the Misra–Gries kept
    counters, with a suppression threshold.  Output per kept token:
    (token, mg_count, noise_fp32, noisy_n, released, threshold,
    epsilon, sensitivity)."""
    from trx_spark.queries.curation import _token_stream
    from trx_spark.queries.langid import _l2fix_spark
    from trx_spark.queries.mgsketch import mg_batch_partials, mg_fold
    from trx_spark.queries.textdata import _P, _tok_hash

    ts = _token_stream(spark, sf_dir)
    state, _d_total = mg_fold(mg_batch_partials(ts))
    per = spark.createDataFrame(
        sorted(state.items()), "token string, mg_count long"
    )
    h = (_tok_hash(F.col("token")) * F.lit(_DP_A2) + F.lit(_DP_B2)) % F.lit(_P)
    per = per.withColumn("h", h)
    per = per.withColumn("v", F.lit(2) * F.col("h") - F.lit(_P)).withColumn(
        "t", F.greatest(F.lit(_P) - F.abs(F.col("v")), F.lit(1)).cast("long")
    )
    l2p = _l2fix_spark(f"CAST({_P} AS BIGINT)")
    l2t = _l2fix_spark("t")
    sgn = F.when(F.col("v") < 0, F.lit(-1)).otherwise(F.lit(1))
    noise = (
        sgn.cast("long")
        * (F.expr(l2p) - F.expr(l2t)).cast("long")
        * F.lit(_DP_LN2_FIX).cast("long")
        * F.lit(_DP_HH_SCALE).cast("long")
    )
    per = per.withColumn("noise_fp32", noise)
    noisy = F.col("mg_count") + F.floor(
        (F.col("noise_fp32") + F.lit(2147483648)).cast("double")
        / F.lit(4294967296.0)
    ).cast("long")
    return per.select(
        "token",
        "mg_count",
        "noise_fp32",
        noisy.alias("noisy_n"),
        (noisy > F.lit(_DP_HH_T)).alias("released"),
        F.lit(_DP_HH_T).cast("long").alias("threshold"),
        F.lit(_DP_EPS_HH).cast("double").alias("epsilon"),
        F.lit(1).cast("long").alias("sensitivity"),
    )


def _dp_hh_core_sql() -> str:
    """The WITH-body (recursive MG core → noised kept counters) shared
    by the dp_heavy_hitters oracle and the ledger oracle."""
    from trx_spark.queries.langid import _l2fix_duck
    from trx_spark.queries.mgsketch import _mg_sql_core
    from trx_spark.queries.textdata import _P, _tok_hash_sql

    hh = f"(({_tok_hash_sql('token')}) * {_DP_A2} + {_DP_B2}) % {_P}"
    l2p = _l2fix_duck(f"CAST({_P} AS BIGINT)")
    l2t = _l2fix_duck("t")
    return f"""{_mg_sql_core()},
tv AS (
  SELECT token, mg_count, {hh} AS h,
         2 * ({hh}) - {_P} AS v,
         CAST(GREATEST({_P} - ABS(2 * ({hh}) - {_P}), 1) AS BIGINT) AS t
  FROM kept
),
nz AS (
  SELECT *, CAST((CASE WHEN v < 0 THEN -1 ELSE 1 END)
                 * (({l2p}) - ({l2t})) * {_DP_LN2_FIX} * {_DP_HH_SCALE}
                 AS BIGINT) AS noise_fp32
  FROM tv
),
hhrel AS (
  SELECT token, mg_count, noise_fp32,
         mg_count + CAST(FLOOR(CAST(noise_fp32 + 2147483648 AS DOUBLE)
                               / 4294967296.0) AS BIGINT) AS noisy_n
  FROM nz
)"""


def _dp_hh_sql() -> str:
    return f"""
WITH RECURSIVE {_dp_hh_core_sql()}
SELECT token, mg_count, noise_fp32, noisy_n,
       noisy_n > {_DP_HH_T} AS released,
       CAST({_DP_HH_T} AS BIGINT) AS threshold,
       CAST({_DP_EPS_HH!r} AS DOUBLE) AS epsilon,
       CAST(1 AS BIGINT) AS sensitivity
FROM hhrel
"""


# ---------------------------------------------------------------------
# Third DP mechanism: quantile release via the EXPONENTIAL MECHANISM
# over a fixed candidate grid, in exact integer arithmetic.  The trick
# that makes the release hash-checkable: run the mechanism at
# eps = 2·ln 2 per unit utility, so the un-normalized weight of a
# candidate at rank-distance d from the target is exp(eps·(−d)/2)
# = 2^(−d) — an EXACT power of two.  Scaled by 2^62 the weights are
# integers (utility floored at −62: candidates further than 62 rows
# from the target rank share the minimum weight 1, a bounded-utility
# variant that keeps the total strictly positive), the cumulative-sum
# inverse-CDF selection is exact integer comparison (Python bigints on
# the Spark side, HUGEINT in DuckDB), and the released value is
# bit-reproducible.  Same honesty note as the Laplace releases: the
# selection uniform is a deterministic public label hash; production
# swaps one secret seed.
#
# Scale shape: the only data-sized work is one partial-aggregatable
# groupBy (value cents → counts); the per-cent table is bounded by the
# VALUE DOMAIN's width in cents (a domain constant, ≤ the grid size
# for in-grid data), so the driver-side selection walks a bounded
# array — the bounded-collect discipline (epoch maxima, MG partials).
# ---------------------------------------------------------------------

_DPQ_GRID = 131072           # candidate grid: cents 0 .. 2^17-1
_DPQ_SHIFT = 62              # weight = 2^(SHIFT - min(d, SHIFT))
_DPQ_QN, _DPQ_QD = 1, 2      # released quantile: the median
_DPQ_EPS_MICRO = 1386294     # eps = 2·ln 2 (micro), the base-2 mechanism


def _py_tok_hash(s: str) -> int:
    """The engine's 31-multiplier string hash (textdata._tok_hash),
    evaluated in Python for module-scope constants."""
    from trx_spark.queries.textdata import _P

    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % _P
    return acc


def _dpq_uh() -> int:
    """The release's deterministic selection uniform (numerator over
    _P): the label hash through this family's own Lehmer spread."""
    from trx_spark.queries.textdata import _P

    return (
        _py_tok_hash("dp_quantile:events.value:q=1/2") * _DP_A2 + _DP_B2
    ) % _P


def _dpq_runs(
    pairs: list[tuple[int, int]], grid: int = _DPQ_GRID
) -> list[tuple[int, int, int]]:
    """Constant-cnt_below RUNS of grid cells [(g_start, g_end, nb)]
    covering [0, grid) from sorted (cent, count) pairs: cnt_below is a
    step function jumping only at observed cents, so the selection
    never needs to walk the grid cell-by-cell — driver cost is
    O(distinct cents), independent of the grid size."""
    runs: list[tuple[int, int, int]] = []
    start, cum = 0, 0
    for c, k in pairs:
        if c >= start and start <= grid - 1:
            runs.append((start, min(c, grid - 1), cum))
            start = c + 1
        cum += k
    if start <= grid - 1:
        runs.append((start, grid - 1, cum))
    return runs


def _dpq_select(
    pairs: list[tuple[int, int]],
    tgt: int,
    uh: int,
    *,
    grid: int = _DPQ_GRID,
    shift: int = _DPQ_SHIFT,
) -> tuple[int, int]:
    """Exact inverse-CDF selection over the base-2 weights: the
    smallest grid cell g with cumweight(g)·P > uh·totalweight —
    identical to the per-cell scan (the test replays that naive form)
    but resolved run-by-run in integer arithmetic."""
    from trx_spark.queries.textdata import _P

    runs = _dpq_runs(pairs, grid)

    def w(nb: int) -> int:
        return 1 << (shift - min(abs(nb - tgt), shift))

    total = sum((e - s + 1) * w(nb) for s, e, nb in runs)
    # cw·P > uh·total  ⇔  cw ≥ (uh·total)//P + 1   (integers, uh < P)
    need = (uh * total) // _P + 1
    base = 0
    for s, e, nb in runs:
        wt = w(nb)
        span = (e - s + 1) * wt
        if base + span >= need:
            m = -(-(need - base) // wt)  # ceil division
            return s + m - 1, abs(nb - tgt)
        base += span
    raise AssertionError("inverse-CDF crossing must exist (uh < P)")


def dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP median of ``events.value`` via the base-2 exponential
    mechanism on the fixed cents grid [0, _DPQ_GRID).  Output (one
    row): (q, n, released_cents, released_value, d_sel, epsilon_micro,
    mechanism)."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.select(F.floor(F.col("value") * 100).cast("long").alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    pairs = sorted((int(r["c"]), int(r["k"])) for r in per)
    n = sum(k for _, k in pairs)
    tgt = (n * _DPQ_QN) // _DPQ_QD
    sel, d_sel = _dpq_select(pairs, tgt, _dpq_uh())
    row = (
        _DPQ_QN / _DPQ_QD,
        n,
        sel,
        sel / 100.0,
        d_sel,
        _DPQ_EPS_MICRO,
        "exponential_base2",
    )
    return spark.createDataFrame(
        [row],
        "q double, n long, released_cents long, released_value double, "
        "d_sel long, epsilon_micro long, mechanism string",
    )


def _dpq_sql() -> str:
    from trx_spark.queries.textdata import _P

    return f"""
WITH cents AS (
  SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cents),
tgt AS (SELECT (n * {_DPQ_QN}) // {_DPQ_QD} AS t, n FROM tot),
per AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS k FROM cents GROUP BY c),
cum AS (SELECT c, SUM(k) OVER (ORDER BY c) AS cl FROM per),
grid AS (SELECT CAST(i AS BIGINT) AS g FROM range(0, {_DPQ_GRID}) t(i)),
below AS (
  SELECT grid.g, COALESCE(cum.cl, 0) AS nb
  FROM grid ASOF LEFT JOIN cum ON grid.g > cum.c
),
wts AS (
  SELECT g, nb,
         CAST(1 AS HUGEINT)
           << CAST({_DPQ_SHIFT} - LEAST(ABS(nb - (SELECT t FROM tgt)),
                                        {_DPQ_SHIFT}) AS INTEGER) AS w
  FROM below
),
cw AS (SELECT g, nb, w, SUM(w) OVER (ORDER BY g) AS cws FROM wts),
tw AS (SELECT SUM(w) AS tws FROM wts),
sel AS (
  SELECT MIN(g) AS g FROM cw, tw WHERE cws * {_P} > {_dpq_uh()} * tws
)
SELECT CAST({_DPQ_QN} AS DOUBLE) / {_DPQ_QD} AS q,
       (SELECT n FROM tot) AS n,
       s.g AS released_cents,
       CAST(s.g AS DOUBLE) / 100.0 AS released_value,
       CAST(ABS((SELECT nb FROM below WHERE below.g = s.g)
                - (SELECT t FROM tgt)) AS BIGINT) AS d_sel,
       CAST({_DPQ_EPS_MICRO} AS BIGINT) AS epsilon_micro,
       'exponential_base2' AS mechanism
FROM sel s
"""


# Grouped variant: one DP median PER event_type — the per-domain
# release shape, and the ledger's PARALLEL-composition teaching case:
# the groups partition the rows (disjoint), so the family's total
# budget is the per-group epsilon ONCE (max, not sum).  Each group
# draws its own deterministic uniform from a label+group hash so the
# selections are decorrelated across groups.

_DPQ_GRP_LABEL = "dp_group_quantile:events.value:q=1/2:"


def _dpq_grp_uh(event_type: str) -> int:
    from trx_spark.queries.textdata import _P

    return (
        _py_tok_hash(_DPQ_GRP_LABEL + event_type) * _DP_A2 + _DP_B2
    ) % _P


def dp_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type DP median (base-2 exponential mechanism, one
    release per group over disjoint rows).  Output per group:
    (event_type, q, n, released_cents, released_value, d_sel,
    epsilon_micro, mechanism)."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in per:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["c"]), int(r["k"]))
        )
    rows = []
    for et in sorted(by_type):
        pairs = sorted(by_type[et])
        n = sum(k for _, k in pairs)
        tgt = (n * _DPQ_QN) // _DPQ_QD
        sel, d_sel = _dpq_select(pairs, tgt, _dpq_grp_uh(et))
        rows.append(
            (
                et,
                _DPQ_QN / _DPQ_QD,
                n,
                sel,
                sel / 100.0,
                d_sel,
                _DPQ_EPS_MICRO,
                "exponential_base2",
            )
        )
    return spark.createDataFrame(
        rows,
        "event_type string, q double, n long, released_cents long, "
        "released_value double, d_sel long, epsilon_micro long, "
        "mechanism string",
    )


def _dpq_grp_sql() -> str:
    from trx_spark.queries.textdata import _P, _tok_hash_sql

    uh = (
        f"(({_tok_hash_sql(f'{_DPQ_GRP_LABEL!r} || event_type')})"
        f" * {_DP_A2} + {_DP_B2}) % {_P}"
    )
    return f"""
WITH cents AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events
),
tgt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         (CAST(COUNT(*) AS BIGINT) * {_DPQ_QN}) // {_DPQ_QD} AS t
  FROM cents GROUP BY 1
),
per AS (
  SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS k
  FROM cents GROUP BY 1, 2
),
cum AS (
  SELECT event_type, c,
         SUM(k) OVER (PARTITION BY event_type ORDER BY c) AS cl
  FROM per
),
grid AS (
  SELECT ty.event_type, CAST(i AS BIGINT) AS g
  FROM (SELECT DISTINCT event_type FROM cents) ty
  CROSS JOIN range(0, {_DPQ_GRID}) r(i)
),
below AS (
  SELECT grid.event_type, grid.g, COALESCE(cum.cl, 0) AS nb
  FROM grid ASOF LEFT JOIN cum
    ON grid.event_type = cum.event_type AND grid.g > cum.c
),
wts AS (
  SELECT b.event_type, b.g, b.nb,
         CAST(1 AS HUGEINT)
           << CAST({_DPQ_SHIFT} - LEAST(ABS(b.nb - t.t), {_DPQ_SHIFT})
                   AS INTEGER) AS w
  FROM below b JOIN tgt t USING (event_type)
),
cw AS (
  SELECT *, SUM(w) OVER (PARTITION BY event_type ORDER BY g) AS cws
  FROM wts
),
tw AS (SELECT event_type, SUM(w) AS tws FROM wts GROUP BY 1),
uhs AS (
  SELECT event_type, {uh} AS u
  FROM (SELECT DISTINCT event_type FROM cents)
),
sel AS (
  SELECT c.event_type, MIN(c.g) AS g
  FROM cw c JOIN tw USING (event_type) JOIN uhs USING (event_type)
  WHERE c.cws * {_P} > uhs.u * tw.tws
  GROUP BY 1
)
SELECT s.event_type,
       CAST({_DPQ_QN} AS DOUBLE) / {_DPQ_QD} AS q,
       t.n,
       s.g AS released_cents,
       CAST(s.g AS DOUBLE) / 100.0 AS released_value,
       CAST(ABS(b.nb - t.t) AS BIGINT) AS d_sel,
       CAST({_DPQ_EPS_MICRO} AS BIGINT) AS epsilon_micro,
       'exponential_base2' AS mechanism
FROM sel s
JOIN tgt t USING (event_type)
JOIN below b ON b.event_type = s.event_type AND b.g = s.g
"""


_DP_EPS_MICRO = int(round(_DP_EPS * 1e6))
_DP_EPS_HH_MICRO = int(round(_DP_EPS_HH * 1e6))


def dp_epsilon_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative privacy-budget ledger across the engine's DP
    releases (sequential composition: budgets add).  One row per
    release in release order: (release_ord, release, mechanism,
    n_released, epsilon_micro, cum_epsilon_micro, cum_epsilon) — the
    running budget is integer micro-epsilon, so the ledger itself is
    hash-checkable; cum_epsilon is the same value as a double
    (micro/1e6, exact in a double)."""
    # n_released is STRUCTURAL for the count and group-quantile
    # releases — both emit exactly one row per distinct event_type (the
    # noise perturbs values, never the row set), which is how the
    # oracle states them (COUNT(DISTINCT event_type)).  Computing the
    # distinct count once replaces two full child-release re-runs with
    # one column-pruned scan; only the thresholded heavy-hitter release
    # has a noise-dependent row count and still runs its pipeline
    # (riding the memoized MG partials).
    n_types = int(
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    n2 = dp_heavy_hitters(spark, sf_dir).filter(F.col("released")).count()
    releases = [
        ("noisy_counts", "laplace", n_types, _DP_EPS_MICRO),
        ("noisy_heavy_hitters", "laplace_threshold", int(n2), _DP_EPS_HH_MICRO),
        # the quantile releases exactly one scalar by construction
        ("dp_quantile", "exponential_base2", 1, _DPQ_EPS_MICRO),
        # disjoint groups: PARALLEL composition — the family charges
        # the per-group epsilon once (max), not |groups|·eps
        (
            "dp_group_quantiles",
            "exponential_base2_parallel",
            n_types,
            _DPQ_EPS_MICRO,
        ),
    ]
    out, cum = [], 0
    for i, (name, mech, n, em) in enumerate(releases, start=1):
        cum += em
        out.append((i, name, mech, n, em, cum, cum / 1e6))
    return spark.createDataFrame(
        out,
        "release_ord long, release string, mechanism string, "
        "n_released long, epsilon_micro long, cum_epsilon_micro long, "
        "cum_epsilon double",
    )


def _dp_ledger_sql() -> str:
    c1 = _DP_EPS_MICRO
    c2 = c1 + _DP_EPS_HH_MICRO
    c3 = c2 + _DPQ_EPS_MICRO
    c4 = c3 + _DPQ_EPS_MICRO
    return f"""
WITH RECURSIVE {_dp_hh_core_sql()}
SELECT CAST(1 AS BIGINT) AS release_ord, 'noisy_counts' AS release,
       'laplace' AS mechanism,
       (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events)
         AS n_released,
       CAST({_DP_EPS_MICRO} AS BIGINT) AS epsilon_micro,
       CAST({c1} AS BIGINT) AS cum_epsilon_micro,
       CAST({c1} AS DOUBLE) / 1e6 AS cum_epsilon
UNION ALL
SELECT CAST(2 AS BIGINT), 'noisy_heavy_hitters', 'laplace_threshold',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hhrel
        WHERE noisy_n > {_DP_HH_T}),
       CAST({_DP_EPS_HH_MICRO} AS BIGINT),
       CAST({c2} AS BIGINT),
       CAST({c2} AS DOUBLE) / 1e6
UNION ALL
SELECT CAST(3 AS BIGINT), 'dp_quantile', 'exponential_base2',
       CAST(1 AS BIGINT),
       CAST({_DPQ_EPS_MICRO} AS BIGINT),
       CAST({c3} AS BIGINT),
       CAST({c3} AS DOUBLE) / 1e6
UNION ALL
SELECT CAST(4 AS BIGINT), 'dp_group_quantiles', 'exponential_base2_parallel',
       (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events),
       CAST({_DPQ_EPS_MICRO} AS BIGINT),
       CAST({c4} AS BIGINT),
       CAST({c4} AS DOUBLE) / 1e6
"""


QUERIES = {
    "stratified_kfold_assign": stratified_kfold_assign,
    "unimax_language_sampling": unimax_language_sampling,
    "k_anonymity_audit": k_anonymity_audit,
    "l_diversity_audit": l_diversity_audit,
    "t_closeness_audit": t_closeness_audit,
    "dp_noisy_counts": dp_noisy_counts,
    "dp_heavy_hitters": dp_heavy_hitters,
    "dp_quantile": dp_quantile,
    "dp_group_quantiles": dp_group_quantiles,
    "dp_epsilon_ledger": dp_epsilon_ledger,
}

ORACLES = {
    "stratified_kfold_assign": _KFOLD_SQL,
    "unimax_language_sampling": _UNIMAX_SQL,
    "k_anonymity_audit": _KANON_SQL,
    "l_diversity_audit": _LDIV_SQL,
    "t_closeness_audit": _TCLOSE_SQL,
    "dp_noisy_counts": _dp_sql(),
    "dp_heavy_hitters": _dp_hh_sql(),
    "dp_quantile": _dpq_sql(),
    "dp_group_quantiles": _dpq_grp_sql(),
    "dp_epsilon_ledger": _dp_ledger_sql(),
}
