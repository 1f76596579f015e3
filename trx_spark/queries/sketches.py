"""Cardinality sketches for corpus statistics: HyperLogLog distinct
counts (Flajolet–Fuchs–Gandouet–Meunier 2007), built entirely from
deterministic integer arithmetic so the DuckDB oracle reproduces the
sketch bit-for-bit.

Why this exists at 100 TB: an exact per-source distinct-token count
(``COUNT(DISTINCT token)``) must shuffle every distinct token of the
corpus to its (source, token) reducer — the shuffle is proportional to
the vocabulary. The HLL register table is partially aggregatable: the
map side collapses each partition to at most ``m`` rows per source
(64 here) before anything crosses the wire, so the shuffle volume is
O(sources · m) no matter how many tokens feed it — the same shape as
the count-min sketch in :mod:`trx_spark.queries.curation`.

Reference anchor: the reference engine keeps per-run distinct counts of
scan points / delays driver-side (trx/dataReduction.py:120-140 builds
``np.unique`` tables in memory); this is the sketch that replaces that
pattern when the key space no longer fits one node.

Determinism notes (the oracle-parity contract):

- token → id is the shared char-fold hash (:func:`textdata._tok_hash`);
  the spread hash is one affine map mod the Mersenne prime — pure
  BIGINT math in both engines.
- the register index is the low 6 bits, the rank input the high 25;
  rank-of-first-set-bit is ``26 − bitlength(w)`` with bitlength taken
  as ``length(bin(w))`` — Spark's ``bin`` and DuckDB's ``bin`` both
  print minimal binary strings, asserted equal in tests.
- the harmonic denominator is accumulated as exact powers of two in a
  BIGINT (``2^(30−rho)``), so the only float op is the final constant
  division — one IEEE divide of exact integers, identical everywhere.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.exact import dlit
from trx_spark.queries.curation import _token_stream
from trx_spark.queries.textdata import _P, _TOKEN_RE, _tok_hash, _tok_hash_sql
from trx_spark.tables import load_table

# m = 2^6 = 64 registers: ±13 % standard error — the gate checks the
# CONSTRUCTION bit-exactly, production raises p for tighter error.
_HLL_P_BITS = 6
_HLL_M = 1 << _HLL_P_BITS          # 64
_HLL_WBITS = 31 - _HLL_P_BITS      # 25 rank-input bits (h < 2^31)
_HLL_A, _HLL_B = 48271, 11213      # spread hash (Lehmer multiplier)
_HLL_ALPHA = 0.709                 # alpha_64 from the HLL paper
# estimate = alpha·m² / Σ 2^-rho ; we accumulate Σ 2^(30-rho) exactly in
# a BIGINT, so the numerator carries the matching 2^30 scale. Single
# precomputed double literal → both engines parse the identical value.
_HLL_NUM = _HLL_ALPHA * float(_HLL_M * _HLL_M) * float(1 << 30)

# Small-range correction (the raw estimator reads ~2× high when
# n ≲ m): Flajolet's linear-counting branch E = m·ln(m/V) with V =
# number of zero registers. V is an integer in 1..m, so the ln — the
# one transcendental the parity gate cannot trust across libm
# implementations — is a 64-entry CONSTANT table precomputed in Python
# and embedded verbatim in both engines (repr round-trips doubles, so
# each engine indexes the bit-identical constant).
_LC_TABLE = [float(_HLL_M) * _math.log(_HLL_M / v) for v in range(1, _HLL_M + 1)]
_LC_THRESHOLD = 2.5 * _HLL_M  # use linear counting below this raw estimate

_LC_TABLE_SQL = "[" + ", ".join(dlit(v) for v in _LC_TABLE) + "]"


def hll_register_cols(token_col) -> tuple:
    """(reg, wv) columns for a token column — the single definition of
    the register construction, shared by the batch query and the
    streaming twin (streaming/sketch.py) so the two cannot drift."""
    tid = _tok_hash(token_col)
    h = (F.lit(_HLL_A) * tid + F.lit(_HLL_B)) % F.lit(_P)
    reg = F.floor(h % _HLL_M).cast("long")
    wv = F.floor(h / F.lit(float(_HLL_M))).cast("long")
    return reg, wv


def hll_rho(wv_col):
    """rank-of-first-set-bit from the 25-bit rank input column."""
    return F.when(wv_col == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(wv_col))
    )


def hll_rr_sql(extra_cols: str = "") -> str:
    """The hashed→(reg, wv) SQL fragment (DuckDB), textually parallel
    to :func:`hll_register_cols` — ``extra_cols`` like ``"source, "``
    threads grouping columns through. Expects a CTE named ``ts`` with
    a ``token`` column in scope."""
    return f"""hashed AS (
  SELECT {extra_cols}({_HLL_A} * {_tok_hash_sql('token')} + {_HLL_B}) % {_P} AS h
  FROM ts
),
rr AS (
  SELECT {extra_cols}CAST(FLOOR(h % {_HLL_M}) AS BIGINT) AS reg,
         CAST(FLOOR(h / {float(_HLL_M)!r}) AS BIGINT) AS wv
  FROM hashed
)"""


_HLL_RHO_SQL = (
    f"CASE WHEN wv = 0 THEN {_HLL_WBITS + 1} "
    f"ELSE {_HLL_WBITS + 1} - length(bin(wv)) END"
)


def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token cardinality: HLL estimate next to the
    exact count (the exact side exists to exhibit the sketch's error —
    a production pipeline keeps only the register aggregation).

    Output: (source, n_registers_hit, harmonic_denom, hll_raw,
    hll_estimate, exact_distinct).

    Plan shape: token stream → register/rank projection (map-side) →
    partial-aggregatable MAX per (source, register) — ≤ 64 rows per
    source per partition cross the shuffle — → per-source fold of the
    64 registers. The exact branch is the classic two-phase distinct
    (group on (source, token) then count), the very shuffle the sketch
    avoids."""
    ts = _token_stream(spark, sf_dir)  # (doc_id, source, token), memoized
    reg, wv = hll_register_cols(F.col("token"))
    regs = (
        ts.select("source", reg.alias("reg"), wv.alias("wv"))
        .withColumn("rho", hll_rho(F.col("wv")))
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("rmax"))
    )
    per_src = regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_registers_hit"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - rmax AS INT))")
        ).alias("s_hit"),
    )
    denom = (
        F.col("s_hit")
        + (F.lit(_HLL_M).cast("long") - F.col("n_registers_hit"))
        * F.lit(1 << 30).cast("long")
    ).alias("harmonic_denom")
    sk = (
        per_src.select(
            "source",
            F.col("n_registers_hit").cast("long").alias("n_registers_hit"),
            denom,
        )
        .withColumn("hll_raw", F.lit(_HLL_NUM) / F.col("harmonic_denom").cast("double"))
        .withColumn("n_zero", F.lit(_HLL_M).cast("long") - F.col("n_registers_hit"))
        .withColumn(
            "hll_estimate",
            F.when(
                (F.col("hll_raw") <= F.lit(_LC_THRESHOLD)) & (F.col("n_zero") > 0),
                F.element_at(
                    F.array(*[F.lit(v) for v in _LC_TABLE]),
                    F.col("n_zero").cast("int"),
                ),
            ).otherwise(F.col("hll_raw")),
        )
    )
    exact = ts.groupBy("source").agg(
        F.countDistinct("token").alias("exact_distinct")
    )
    return sk.join(exact, "source").select(
        "source",
        "n_registers_hit",
        "harmonic_denom",
        "hll_raw",
        "hll_estimate",
        "exact_distinct",
    )


_HLL_SQL = f"""
WITH ts AS (
  SELECT source, s.token
  FROM (SELECT source, regexp_extract_all(text, '{_TOKEN_RE}') AS toks FROM documents) t,
       UNNEST(toks) AS s(token)
),
{hll_rr_sql('source, ')},
regs AS (
  SELECT source, reg,
         MAX({_HLL_RHO_SQL}) AS rmax
  FROM rr GROUP BY source, reg
),
per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_registers_hit,
         CAST(CAST(SUM(CAST(1 AS BIGINT) << CAST(30 - rmax AS INTEGER)) AS BIGINT) AS BIGINT) AS s_hit
  FROM regs GROUP BY source
),
sk AS (
  SELECT source, n_registers_hit,
         s_hit + (CAST({_HLL_M} AS BIGINT) - n_registers_hit) * CAST({1 << 30} AS BIGINT)
           AS harmonic_denom
  FROM per_src
),
exact AS (
  SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS exact_distinct
  FROM ts GROUP BY source
),
est AS (
  SELECT source, n_registers_hit, harmonic_denom,
         CAST({dlit(_HLL_NUM)} AS DOUBLE) / CAST(harmonic_denom AS DOUBLE) AS hll_raw,
         CAST({_HLL_M} AS BIGINT) - n_registers_hit AS n_zero
  FROM sk
)
SELECT est.source, est.n_registers_hit, est.harmonic_denom, est.hll_raw,
       CASE WHEN est.hll_raw <= CAST({_LC_THRESHOLD!r} AS DOUBLE) AND est.n_zero > 0
            THEN list_extract({_LC_TABLE_SQL}, CAST(est.n_zero AS INTEGER))
            ELSE est.hll_raw END AS hll_estimate,
       exact.exact_distinct
FROM est JOIN exact USING (source)
"""


# ---------------------------------------------------------------------
# Histogram quantile sketch (per-source length distribution)
# ---------------------------------------------------------------------

# Fixed-width histogram: bin = min(floor(n_chars / W), CAP). The
# per-(source, bin) count is partially aggregatable with AT MOST
# CAP+1 rows per source per partition crossing the shuffle — the
# mergeable-summary shape (Greenwald–Khanna / t-digest territory, done
# here with the simplest deterministic member of the family). The
# EXACT percentile carried alongside funnels every value of a source
# through its reducer — the contrast is the query's point, as with the
# HLL above.
_HIST_W = 64
_HIST_CAP = 255          # bins ≥ CAP clamp: bounded state by construction
_QUANTILES = (0.5, 0.9, 0.99)


def doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quantiles: histogram-sketch estimate
    (upper bin edge — a ≤ W-char overestimate) next to the exact
    interpolated percentile.

    Output: (source, n_docs, p50_sketch, p50_exact, p90_sketch,
    p90_exact, p99_sketch, p99_exact)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    bins = (
        docs.select(
            "source",
            F.least(
                F.floor(F.col("n_chars") / F.lit(float(_HIST_W))).cast("long"),
                F.lit(_HIST_CAP).cast("long"),
            ).alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.withColumn("cum", F.sum("c").over(wcum))
    totals = bins.groupBy("source").agg(F.sum("c").alias("n_docs"))
    j = cum.join(totals, "source")
    edge = (F.col("bin") + 1) * _HIST_W
    sketch_aggs = []
    for p in _QUANTILES:
        k = F.ceil(F.lit(p) * F.col("n_docs").cast("double")).cast("long")
        tag = str(int(p * 100))
        sketch_aggs.append(
            F.min(F.when(F.col("cum") >= k, edge)).alias(f"p{tag}_sketch")
        )
    sk = j.groupBy("source", "n_docs").agg(*sketch_aggs)
    exact_aggs = [
        F.expr(f"percentile(n_chars, {p!r})").alias(f"p{int(p * 100)}_exact")
        for p in _QUANTILES
    ]
    exact = docs.groupBy("source").agg(*exact_aggs)
    cols = ["source", "n_docs"]
    for p in _QUANTILES:
        tag = str(int(p * 100))
        cols += [f"p{tag}_sketch", f"p{tag}_exact"]
    return sk.join(exact, "source").select(*cols)


def _q_sketch_sql(p: float) -> str:
    tag = str(int(p * 100))
    return (
        f"MIN(CASE WHEN cum >= CAST(CEIL(CAST({p!r} AS DOUBLE) * "
        f"CAST(n_docs AS DOUBLE)) AS BIGINT) "
        f"THEN (bin + 1) * {_HIST_W} END) AS p{tag}_sketch"
    )


_DOCLEN_SQL = f"""
WITH bins AS (
  SELECT source,
         LEAST(CAST(FLOOR(n_chars / {float(_HIST_W)!r}) AS BIGINT),
               CAST({_HIST_CAP} AS BIGINT)) AS bin,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
cum AS (
  SELECT source, bin, c,
         SUM(c) OVER (PARTITION BY source ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM bins
),
totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs FROM bins GROUP BY source),
sk AS (
  SELECT cum.source, totals.n_docs,
         {', '.join(_q_sketch_sql(p) for p in _QUANTILES)}
  FROM cum JOIN totals USING (source)
  GROUP BY cum.source, totals.n_docs
),
exact AS (
  SELECT source,
         {', '.join(f'quantile_cont(n_chars, CAST({p!r} AS DOUBLE)) AS p{int(p * 100)}_exact' for p in _QUANTILES)}
  FROM documents GROUP BY source
)
SELECT sk.source, sk.n_docs,
       {', '.join(f'sk.p{int(p * 100)}_sketch, exact.p{int(p * 100)}_exact' for p in _QUANTILES)}
FROM sk JOIN exact USING (source)
"""


# ---------------------------------------------------------------------
# KMV (k-minimum-values) theta sketches: distinct SET OPERATIONS
# (Bar-Yossef et al. 2002; Beyer et al., "On synopses for distinct-
# value estimation under multiset operations", SIGMOD 2007 — the
# Apache DataSketches theta family).  HLL answers "how many distinct",
# but cannot intersect two sketches without inclusion-exclusion error
# blow-up; a KMV sketch supports union, intersection and Jaccard
# directly: keep the K smallest distinct hash values per set, combine
# pairs by re-taking the K smallest of the union (theta = the K-th
# smallest), estimate |union| = (K-1)·P/theta and Jaccard = (members
# of both sketches among those K) / K.
#
# Scale shape: the per-source sketch build is the one vocabulary-sized
# stage (distinct (source, h) then the K smallest per source — the
# same shuffle the exact distinct pays; a production build replaces it
# with per-partition K-truncated merges, which need a custom JVM
# aggregator).  Everything pairwise then runs on O(sources · K) rows —
# the quadratic is in the number of SOURCES, each pair costing K, no
# matter how many tokens fed the sketches.  The exact columns exist to
# exhibit the estimator error (the hll_distinct_tokens pattern).
# ---------------------------------------------------------------------

_KMV_K = 128
_KMV_A, _KMV_B = 16807, 17  # Lehmer spread of the token id into [0, P)
_KMV_UNION_NUM = float((_KMV_K - 1) * _P)  # (K-1)·P, exact in a double

_BIGRAM_SRC_CACHE: dict = {}


def _source_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (source, bigram) table, memoized per (session, sf_dir):
    the only corpus-sized stage of the KMV query — ~sources·vocab rows
    after the distinct, so everything downstream is bounded."""
    key = (spark, sf_dir)
    if key not in _BIGRAM_SRC_CACHE:
        from trx_spark.queries.curation import _toks_base

        base = _toks_base(spark, sf_dir)
        n = F.size(F.col("toks"))
        # gated on n >= 2 — sequence(1, 0) descends in Spark (the
        # _shingled footgun); DuckDB's range(1, n) is empty there
        bigrams = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.array_join(F.slice(F.col("toks"), i, 2), " "),
            ),
        )
        _BIGRAM_SRC_CACHE[key] = (
            base.select("source", F.explode(bigrams).alias("token"))
            .distinct()
            .localCheckpoint()
        )
    return _BIGRAM_SRC_CACHE[key]


def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-BIGRAM overlap between document sources from
    K-minimum-values sketches, next to the exact overlap.  Bigrams
    rather than unigrams so the value space (~700 distinct per source
    here) actually fills the K=128 sketches and the estimator branch
    is exercised; the construction is value-space-agnostic.

    Output per source pair (src_a < src_b): k_used, theta, n_common
    (sketch members in both sets), union_est / jaccard_est / inter_est
    (the KMV estimators; exact when the combined sketch is not full),
    exact_union, exact_jaccard."""
    toks = _source_bigrams(spark, sf_dir)
    sh = toks.select(
        "source",
        ((_tok_hash(F.col("token")) * _KMV_A + _KMV_B) % _P).alias("h"),
    ).distinct()
    wk = Window.partitionBy("source").orderBy("h")
    sk = (
        sh.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KMV_K)
        .select("source", "h")
        .localCheckpoint()  # O(sources·K) rows feed every pair below
    )
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.alias("x")
        .join(srcs.alias("y"), F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
    )
    ra = pairs.join(
        sk.withColumnRenamed("source", "src_a"), "src_a"
    ).select("src_a", "src_b", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    rb = pairs.join(
        sk.withColumnRenamed("source", "src_b"), "src_b"
    ).select("src_a", "src_b", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    u = (
        ra.unionAll(rb)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    wp = Window.partitionBy("src_a", "src_b").orderBy("h")
    kept = u.withColumn("rn", F.row_number().over(wp)).filter(
        F.col("rn") <= _KMV_K
    )
    sp = kept.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("theta"),
        F.sum(
            F.when((F.col("ia") == 1) & (F.col("ib") == 1), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_common"),
    )
    union_est = F.when(
        F.col("k_used") == _KMV_K,
        F.lit(_KMV_UNION_NUM) / F.col("theta").cast("double"),
    ).otherwise(F.col("k_used").cast("double"))
    jac_est = F.col("n_common").cast("double") / F.col("k_used").cast("double")
    # exact side: per-source distinct counts + pairwise common tokens
    ecnt = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    ea, eb = toks.alias("ea"), toks.alias("eb")
    ecommon = (
        ea.join(
            eb,
            (F.col("ea.token") == F.col("eb.token"))
            & (F.col("ea.source") < F.col("eb.source")),
        )
        .groupBy(
            F.col("ea.source").alias("src_a"),
            F.col("eb.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common_exact"))
    )
    na = ecnt.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = ecnt.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    exact_union = F.col("n_a") + F.col("n_b") - F.col("nce")
    return (
        sp.withColumn("union_est", union_est)
        .withColumn("jaccard_est", jac_est)
        .withColumn("inter_est", F.col("jaccard_est") * F.col("union_est"))
        .join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .join(F.broadcast(ecommon), ["src_a", "src_b"], "left")
        .withColumn("nce", F.coalesce(F.col("n_common_exact"), F.lit(0)))
        .select(
            "src_a",
            "src_b",
            "k_used",
            "theta",
            "n_common",
            "union_est",
            "jaccard_est",
            "inter_est",
            exact_union.alias("exact_union"),
            (
                F.col("nce").cast("double") / exact_union.cast("double")
            ).alias("exact_jaccard"),
        )
    )


_KMV_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT DISTINCT source, b AS token FROM (
    SELECT source,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])) AS b
    FROM (SELECT source, regexp_extract_all(text, '{_TOKEN_RE}') AS t
          FROM documents)
  )
),
sh AS (
  SELECT DISTINCT source, ({_tok_hash_sql('token')} * {_KMV_A} + {_KMV_B})
         % {_P} AS h
  FROM toks
),
sk AS MATERIALIZED (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM sh
  ) WHERE rn <= {_KMV_K}
),
srcs AS (SELECT DISTINCT source FROM sk),
pairs AS (
  SELECT x.source AS src_a, y.source AS src_b
  FROM srcs x JOIN srcs y ON x.source < y.source
),
u AS (
  SELECT src_a, src_b, h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
    SELECT p.src_a, p.src_b, s.h, 1 AS ia, 0 AS ib
    FROM pairs p JOIN sk s ON s.source = p.src_a
    UNION ALL
    SELECT p.src_a, p.src_b, s.h, 0 AS ia, 1 AS ib
    FROM pairs p JOIN sk s ON s.source = p.src_b
  ) GROUP BY 1, 2, 3
),
kept AS (
  SELECT * FROM (
    SELECT u.*,
           ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= {_KMV_K}
),
sp AS (
  SELECT src_a, src_b,
         CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(MAX(h) AS BIGINT) AS theta,
         CAST(SUM(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_common
  FROM kept GROUP BY 1, 2
),
ecnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1),
ecommon AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_common_exact
  FROM toks a JOIN toks b
    ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sp.src_a, sp.src_b, sp.k_used, sp.theta, sp.n_common,
  CASE WHEN sp.k_used = {_KMV_K}
       THEN CAST({dlit(_KMV_UNION_NUM)} AS DOUBLE) / CAST(sp.theta AS DOUBLE)
       ELSE CAST(sp.k_used AS DOUBLE) END AS union_est,
  CAST(sp.n_common AS DOUBLE) / CAST(sp.k_used AS DOUBLE) AS jaccard_est,
  (CAST(sp.n_common AS DOUBLE) / CAST(sp.k_used AS DOUBLE))
    * (CASE WHEN sp.k_used = {_KMV_K}
            THEN CAST({dlit(_KMV_UNION_NUM)} AS DOUBLE)
                   / CAST(sp.theta AS DOUBLE)
            ELSE CAST(sp.k_used AS DOUBLE) END) AS inter_est,
  ca.n + cb.n - COALESCE(e.n_common_exact, 0) AS exact_union,
  CAST(COALESCE(e.n_common_exact, 0) AS DOUBLE)
    / CAST(ca.n + cb.n - COALESCE(e.n_common_exact, 0) AS DOUBLE)
    AS exact_jaccard
FROM sp
JOIN ecnt ca ON sp.src_a = ca.source
JOIN ecnt cb ON sp.src_b = cb.source
LEFT JOIN ecommon e ON sp.src_a = e.src_a AND sp.src_b = e.src_b
"""


QUERIES = {
    "hll_distinct_tokens": hll_distinct_tokens,
    "doclen_quantiles": doclen_quantiles,
    "kmv_source_overlap": kmv_source_overlap,
}

ORACLES = {
    "hll_distinct_tokens": _HLL_SQL,
    "doclen_quantiles": _DOCLEN_SQL,
    "kmv_source_overlap": _KMV_SQL,
}
