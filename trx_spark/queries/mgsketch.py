"""Misra–Gries heavy-hitters summary over the corpus token stream —
the deterministic top-k counter sketch that completes the mergeable
summary family (CMS = frequency estimates, HLL = cardinality, KMV =
set algebra, hash-level sampler = quantiles; MG = guaranteed heavy
hitters).  Reference parity: the reference engine has no sketch layer
(its corpora fit one node); this family is the 100 TB extension
surface the build brief names (corpus token/URL/domain monitoring).

Construction (the FFD-packer replay discipline, packing.py): the
token stream is split into B deterministic batches (``doc_id % B`` —
membership is a pure function of the row, so the whole fold is a pure
function of the input multiset).  Per batch, the exact counts are
CANONICALIZED to capacity K: subtract the (K+1)-th largest count
d_b (0 when ≤ K distinct), keep strictly-positive residuals — ≤ K
counters by construction.  The partials are then folded in batch
order: counter union (sum residuals) → canonicalize again with the
step decrement d_s.  ``d_total = Σ (d_b + d_s)`` is the summary's
total decrement.

Guarantees (classic MG, Misra & Gries 1982 / Agarwal et al.
"Mergeable Summaries" 2013): every decrement d is applied to ≥ K+1
counters each losing ≥ d mass, so ``d_total ≤ n / (K+1)``; each kept
count underestimates the true count by ≤ d_total; any token with true
frequency > n/(K+1) CANNOT be fully decremented away at the end of
the fold... the per-item guarantee exhibited by the gate is the
measured one: ``underestimate = exact − mg ≤ d_total`` on every kept
row (pinned by the bound test, with the exact side computed next to
the sketch — the hll_distinct_tokens error-exhibit pattern).

Scale shape: per-batch counts are one partial-aggregatable groupBy
(map-side combine shrinks each partition to its distinct tokens);
the per-batch top-(K+1) is a ``TakeOrderedAndProject`` — only K+1
rows per partition cross to the driver merge, never a global sort.
The fold itself is driver arithmetic on ≤ B·(K+1) collected rows
(the bounded-collect pattern: epoch maxima, FFD shard loads).  The
EXACT side joins the ≤ K kept tokens (broadcast) into the per-token
counts — the one per-token shuffle, paid deliberately as the error
exhibit.  B is a constant (4), so the fold is B chained bounded jobs
regardless of corpus size; the streaming twin
(streaming/sketch.py: ``run_mg_catchup``) stores one ≤ K+1-row
partial per micro-batch and folds the store with the SAME
:func:`mg_fold`, so streamed ≡ batch ≡ oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.tables import load_table  # noqa: F401  (re-export convention)

_MG_K = 8   # counter capacity: deterministic top-≤K summary
_MG_B = 4   # deterministic batch count (doc_id % _MG_B)


def mg_canon(counts: dict[str, int], k: int = _MG_K) -> tuple[dict[str, int], int]:
    """Canonicalize a counter map to capacity ``k``: subtract the
    (k+1)-th largest count (by VALUE, multiplicity included) and keep
    strictly-positive residuals.  Returns (residuals, decrement).
    A pure function of the counter multiset — ties need no tiebreak
    because the decrement is a value, not a row pick."""
    vals = sorted(counts.values(), reverse=True)
    d = vals[k] if len(vals) > k else 0
    if d == 0:
        return dict(counts), 0
    return {t: c - d for t, c in counts.items() if c > d}, d


def mg_fold(
    parts: list[tuple[int, dict[str, int], int]], k: int = _MG_K
) -> tuple[dict[str, int], int]:
    """Fold canonicalized per-batch partials ``(batch, residuals,
    d_part)`` in batch order: counter union then re-canonicalization.
    Returns (final residuals ≤ k entries, d_total).  THE single fold
    definition — the batch gate, the streaming merge and the tests all
    call this, so they cannot drift."""
    state: dict[str, int] = {}
    d_total = 0
    for _b, part, d_part in sorted(parts, key=lambda p: p[0]):
        d_total += d_part
        comb = dict(state)
        for t, c in part.items():
            comb[t] = comb.get(t, 0) + c
        state, d_s = mg_canon(comb, k)
        d_total += d_s
    return state, d_total


def mg_batch_partials(
    ts: DataFrame, b: int = _MG_B, k: int = _MG_K, lo: int = 0
) -> list[tuple[int, dict[str, int], int]]:
    """Per-batch canonicalized partials from a (doc_id, token) frame.
    ONE job for all batches: groupBy (batch, token) + a per-batch
    row_number window keeps each batch's top-(k+1), collecting
    ≤ (b−lo)·(k+1) rows — the canonical residuals are derivable from
    the top-(k+1) alone (everything below the (k+1)-th largest dies).
    Previously this looped one filter+TakeOrderedAndProject job per
    batch, i.e. ``b − lo`` full scans of the token stream; the window
    form is a single scan + single shuffle and the collected rows (and
    hence the fold) are identical because the window's
    (c DESC, token ASC) order matches the old per-batch ORDER BY.
    ``lo`` restricts to the batch-id window [lo, b) — the sliding
    window the windowed gate folds."""
    from pyspark.sql import Window

    batch = (F.col("doc_id") % b).alias("batch")
    base = ts.select(batch, "token")
    if lo > 0:
        base = base.filter(F.col("batch") >= lo)
    cnt = base.groupBy("batch", "token").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("batch").orderBy(F.desc("c"), F.asc("token"))
    top = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k + 1)
        .collect()
    )
    by_batch: dict[int, list] = {}
    for r in top:
        by_batch.setdefault(int(r["batch"]), []).append(r)
    parts = []
    for i in range(lo, b):
        rows = sorted(
            by_batch.get(i, []), key=lambda r: (-r["c"], r["token"])
        )
        d_b = rows[k]["c"] if len(rows) == k + 1 else 0
        part = {r["token"]: r["c"] - d_b for r in rows if r["c"] > d_b}
        parts.append((i, part, d_b))
    return parts


def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-token heavy hitters from the capacity-``_MG_K``
    Misra–Gries fold, next to the exact counts (the error exhibit).

    Output per kept token: (token, mg_count, exact_count,
    underestimate = exact − mg, d_total, n_total) — ``underestimate ≤
    d_total ≤ n_total / (K+1)`` by the MG guarantee, measured not
    asserted."""
    from trx_spark.queries.curation import _token_stream

    ts = _token_stream(spark, sf_dir)  # (doc_id, source, token), memoized
    state, d_total = mg_fold(mg_batch_partials(ts))
    n_total = ts.count()
    kept = spark.createDataFrame(
        sorted(state.items()), "token string, mg_count long"
    )
    exact = ts.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        exact.join(F.broadcast(kept), "token")
        .select(
            "token",
            "mg_count",
            "exact_count",
            (F.col("exact_count") - F.col("mg_count")).alias("underestimate"),
            F.lit(int(d_total)).cast("long").alias("d_total"),
            F.lit(int(n_total)).cast("long").alias("n_total"),
        )
    )


def _mg_sql_core(k: int = _MG_K, b: int = _MG_B, lo: int = 0) -> str:
    """Recursive-CTE replay of the identical fold (per-batch canon →
    batch-order counter-union + re-canon), the packing.py oracle
    discipline: every counter value and decrement is hash-checked.

    ``lo`` restricts the fold to the batch-id window [lo, b) — the
    windowed gate's oracle.  The ``grid`` CTE is the batch SPINE: every
    batch id in the window gets a (d_b = 0, empty-list) plists row even
    when no token lands in it, so the recursion always reaches step
    b-1 — without it a corpus with an empty ``doc_id % b`` residue
    class halts the fold early and the oracle returns zero rows while
    the Spark side (which handles empty batches) returns the correct
    summary (the r12 ADVICE false-mismatch).  ``wtoks`` is the
    window-restricted token stream, exposed for outer exact/total
    CTEs."""
    from trx_spark.queries.curation import _TOKEN_RE

    return f"""toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_TOKEN_RE}')) AS token
  FROM documents
),
wtoks AS (
  SELECT * FROM toks WHERE doc_id % {b} >= {lo}
),
bcnt AS (
  SELECT CAST(doc_id % {b} AS BIGINT) AS batch, token,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM wtoks GROUP BY 1, 2
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY batch ORDER BY c DESC, token)
         AS rn
  FROM bcnt
),
grid AS (
  SELECT CAST(i AS BIGINT) AS batch FROM range({lo}, {b}) t(i)
),
db AS (
  SELECT g.batch, COALESCE(MAX(CASE WHEN r.rn = {k + 1} THEN r.c END), 0)
         AS d_b
  FROM grid g LEFT JOIN rk r ON r.batch = g.batch
  GROUP BY g.batch
),
plists AS (
  SELECT d.batch,
         COALESCE(list(r.token ORDER BY r.token)
                  FILTER (r.token IS NOT NULL), []) AS ptoks,
         COALESCE(list(r.c - d.d_b ORDER BY r.token)
                  FILTER (r.token IS NOT NULL), []) AS pcnts,
         d.d_b
  FROM db d LEFT JOIN rk r ON r.batch = d.batch AND r.c > d.d_b
  GROUP BY d.batch, d.d_b
),
fold AS (
  SELECT CAST({lo - 1} AS BIGINT) AS step, CAST([] AS VARCHAR[]) AS ktoks,
         CAST([] AS BIGINT[]) AS kcnts, CAST(0 AS BIGINT) AS d_total
  UNION ALL
  SELECT f.step + 1, comb.kt2, comb.kc2, f.d_total + p.d_b + dd.d
  FROM fold f
  JOIN plists p ON p.batch = f.step + 1,
  LATERAL (SELECT list_sort(list_distinct(f.ktoks || p.ptoks)) AS allt) a,
  LATERAL (SELECT list_transform(a.allt,
             t -> COALESCE(f.kcnts[list_position(f.ktoks, t)], 0)
                + COALESCE(p.pcnts[list_position(p.ptoks, t)], 0)) AS allc) c,
  LATERAL (SELECT COALESCE(list_sort(c.allc, 'DESC')[{k + 1}], 0) AS d) dd,
  LATERAL (SELECT
     list_transform(list_filter(range(1, len(a.allt) + 1),
                                i -> c.allc[i] > dd.d), i -> a.allt[i]) AS kt2,
     list_transform(list_filter(range(1, len(a.allt) + 1),
                                i -> c.allc[i] > dd.d),
                    i -> c.allc[i] - dd.d) AS kc2
  ) comb
),
final AS (SELECT * FROM fold WHERE step = {b - 1}),
kept AS (
  SELECT unnest(ktoks) AS token, unnest(kcnts) AS mg_count, d_total
  FROM final
)"""


_MG_SQL = f"""
WITH RECURSIVE {_mg_sql_core()},
exact AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count FROM toks GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks)
SELECT k.token, k.mg_count, e.exact_count,
       e.exact_count - k.mg_count AS underestimate,
       k.d_total, t.n_total
FROM kept k JOIN exact e USING (token) CROSS JOIN tot t
"""


QUERIES = {"heavy_hitters_mg": heavy_hitters_mg}
ORACLES = {"heavy_hitters_mg": _MG_SQL}


# ---------------------------------------------------------------------
# Grouped variant: one MG summary PER SOURCE — the shape a per-domain
# token monitor needs at 100 TB (bounded counters per group, never a
# per-(group, token) result).  Same canon/fold as the global gate; the
# per-(source, batch) top-(K+1) is ONE window pass partitioned by
# (batch, source) — the engine's standard per-group top-k (the
# topk_orders_per_customer shape: parallel across groups, each
# partition sorting only its own distinct tokens — at corpus scale the
# map-side combine has already shrunk that to distinct-per-partition).
# The fold is driver arithmetic on ≤ |sources|·B·(K+1) collected rows.
# ---------------------------------------------------------------------


def heavy_hitters_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Misra–Gries heavy hitters with per-source error
    accounting.  Output: (source, token, mg_count, exact_count,
    underestimate, d_total, n_total) — the guarantee
    ``underestimate ≤ d_total ≤ n_total/(K+1)`` holds per source."""
    from pyspark.sql import Window

    from trx_spark.queries.curation import _token_stream

    ts = _token_stream(spark, sf_dir)
    cnt = ts.groupBy(
        "source", (F.col("doc_id") % _MG_B).alias("batch"), "token"
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("batch", "source").orderBy(
        F.desc("c"), F.asc("token")
    )
    top = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MG_K + 1)
        .collect()
    )
    by_sb: dict[tuple[str, int], dict[str, int]] = {}
    for r in top:
        by_sb.setdefault((r["source"], int(r["batch"])), {})[r["token"]] = int(
            r["c"]
        )
    out_rows = []
    d_totals: dict[str, int] = {}
    for source in sorted({s for s, _ in by_sb}):
        parts = []
        for b in range(_MG_B):
            counts = by_sb.get((source, b), {})
            part, d_b = mg_canon(counts, _MG_K)
            parts.append((b, part, d_b))
        state, d_total = mg_fold(parts)
        d_totals[source] = d_total
        out_rows.extend(
            (source, t, c) for t, c in sorted(state.items())
        )
    kept = spark.createDataFrame(
        out_rows, "source string, token string, mg_count long"
    )
    dt = spark.createDataFrame(
        sorted(d_totals.items()), "source string, d_total long"
    )
    exact = ts.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    totals = ts.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        exact.join(F.broadcast(kept), ["source", "token"])
        .join(F.broadcast(dt), "source")
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            "token",
            "mg_count",
            "exact_count",
            (F.col("exact_count") - F.col("mg_count")).alias("underestimate"),
            "d_total",
            "n_total",
        )
    )


def _mg_by_source_sql(k: int = _MG_K, b: int = _MG_B) -> str:
    """Per-source recursive fold: the state rows carry ``source`` and
    every step advances ALL sources at once (join on source AND
    step+1), so one recursion replays every group's fold."""
    from trx_spark.queries.curation import _TOKEN_RE

    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(text, '{_TOKEN_RE}')) AS token
  FROM documents
),
bcnt AS (
  SELECT source, CAST(doc_id % {b} AS BIGINT) AS batch, token,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2, 3
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source, batch
                               ORDER BY c DESC, token) AS rn
  FROM bcnt
),
grid AS (
  SELECT s.source, g.batch
  FROM (SELECT DISTINCT source FROM toks) s
  CROSS JOIN (SELECT CAST(i AS BIGINT) AS batch FROM range(0, {b}) t(i)) g
),
db AS (
  SELECT g.source, g.batch,
         COALESCE(MAX(CASE WHEN r.rn = {k + 1} THEN r.c END), 0) AS d_b
  FROM grid g
  LEFT JOIN rk r ON r.source = g.source AND r.batch = g.batch
  GROUP BY g.source, g.batch
),
plists AS (
  SELECT d.source, d.batch,
         COALESCE(list(r.token ORDER BY r.token)
                  FILTER (r.token IS NOT NULL), []) AS ptoks,
         COALESCE(list(r.c - d.d_b ORDER BY r.token)
                  FILTER (r.token IS NOT NULL), []) AS pcnts,
         d.d_b
  FROM db d
  LEFT JOIN rk r ON r.source = d.source AND r.batch = d.batch
                AND r.c > d.d_b
  GROUP BY d.source, d.batch, d.d_b
),
fold AS (
  SELECT source, CAST(-1 AS BIGINT) AS step, CAST([] AS VARCHAR[]) AS ktoks,
         CAST([] AS BIGINT[]) AS kcnts, CAST(0 AS BIGINT) AS d_total
  FROM (SELECT DISTINCT source FROM toks)
  UNION ALL
  SELECT f.source, f.step + 1, comb.kt2, comb.kc2, f.d_total + p.d_b + dd.d
  FROM fold f
  JOIN plists p ON p.source = f.source AND p.batch = f.step + 1,
  LATERAL (SELECT list_sort(list_distinct(f.ktoks || p.ptoks)) AS allt) a,
  LATERAL (SELECT list_transform(a.allt,
             t -> COALESCE(f.kcnts[list_position(f.ktoks, t)], 0)
                + COALESCE(p.pcnts[list_position(p.ptoks, t)], 0)) AS allc) c,
  LATERAL (SELECT COALESCE(list_sort(c.allc, 'DESC')[{k + 1}], 0) AS d) dd,
  LATERAL (SELECT
     list_transform(list_filter(range(1, len(a.allt) + 1),
                                i -> c.allc[i] > dd.d), i -> a.allt[i]) AS kt2,
     list_transform(list_filter(range(1, len(a.allt) + 1),
                                i -> c.allc[i] > dd.d),
                    i -> c.allc[i] - dd.d) AS kc2
  ) comb
),
final AS (SELECT * FROM fold WHERE step = {b - 1}),
kept AS (
  SELECT source AS ksource, unnest(ktoks) AS token,
         unnest(kcnts) AS mg_count, d_total
  FROM final
),
exact AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM toks GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total FROM toks GROUP BY 1
)
SELECT k.ksource AS source, k.token, k.mg_count, e.exact_count,
       e.exact_count - k.mg_count AS underestimate,
       k.d_total, t.n_total
FROM kept k
JOIN exact e ON e.source = k.ksource AND e.token = k.token
JOIN tot t ON t.source = k.ksource
"""


QUERIES["heavy_hitters_by_source"] = heavy_hitters_by_source
ORACLES["heavy_hitters_by_source"] = _mg_by_source_sql()


# ---------------------------------------------------------------------
# Sliding-window variant: heavy hitters over the LAST W deterministic
# batches only — the "top domains in the last N batches" shape a
# 100 TB ingest monitor needs (the full-stream summary never forgets;
# the window does).  Same canon + fold, restricted to the batch-id
# window [B-W, B): partials for evicted batches simply do not enter
# the fold, so windowed fold ≡ batch recompute on the window by
# construction (pinned against the streaming twin's eviction in
# tests/test_streaming_sketch.py).  The guarantee holds with the
# window's own mass: underestimate ≤ d_total ≤ n_window/(K+1).
# ---------------------------------------------------------------------

_MG_W = 2  # window: the last W of the B deterministic batches


def heavy_hitters_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over the batch-id window
    [B-W, B) next to the window-exact counts.  Output per kept token:
    (token, mg_count, exact_count, underestimate, d_total, n_total),
    every column computed on the window's token stream only."""
    from trx_spark.queries.curation import _token_stream

    lo = _MG_B - _MG_W
    ts = _token_stream(spark, sf_dir).filter((F.col("doc_id") % _MG_B) >= lo)
    state, d_total = mg_fold(mg_batch_partials(ts, lo=lo))
    n_total = ts.count()
    kept = spark.createDataFrame(
        sorted(state.items()), "token string, mg_count long"
    )
    exact = ts.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        exact.join(F.broadcast(kept), "token")
        .select(
            "token",
            "mg_count",
            "exact_count",
            (F.col("exact_count") - F.col("mg_count")).alias("underestimate"),
            F.lit(int(d_total)).cast("long").alias("d_total"),
            F.lit(int(n_total)).cast("long").alias("n_total"),
        )
    )


_MG_WINDOWED_SQL = f"""
WITH RECURSIVE {_mg_sql_core(lo=_MG_B - _MG_W)},
exact AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count FROM wtoks GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM wtoks)
SELECT k.token, k.mg_count, e.exact_count,
       e.exact_count - k.mg_count AS underestimate,
       k.d_total, t.n_total
FROM kept k JOIN exact e USING (token) CROSS JOIN tot t
"""

QUERIES["heavy_hitters_windowed"] = heavy_hitters_windowed
ORACLES["heavy_hitters_windowed"] = _MG_WINDOWED_SQL
