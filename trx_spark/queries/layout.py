"""Storage-layout operators: Z-order (Morton) multi-dimensional
clustering keys and the data-skipping index they buy.

At 100 TB the dominant cost of every selective query is the scan, and
the scan is only as cheap as the layout lets it be: parquet row-group
min/max pruning skips a file iff the filtered column is CLUSTERED in
that file. A sort by one column gives perfect skipping on that column
and none on any other; Z-ordering interleaves the bits of two (or
more) quantized columns so that ranges of the interleaved key map to
small rectangles in (x, y) space — every file then covers a narrow
min/max band on BOTH dimensions, and filters on either prune files.
This is the layout pass behind Delta/Iceberg ``OPTIMIZE ZORDER BY``
re-expressed as a plain engine operator.

Scale design notes (local[32] tests correctness; the plans target a
1000-executor cluster):

- ``zorder_layout_keys``: per-row column math (quantize + a fixed
  16-term bit-interleave expression, whole-stage codegen) after a
  single 1-row min/max scalar broadcast — zero data shuffles; the key
  assignment of a 100 TB table is one scan. A real rewrite then
  ``repartitionByRange(z_key)`` + write, which is the one unavoidable
  layout shuffle and is exactly the shuffle the operator exists to
  amortize across all future scans.
- ``zorder_skipping_stats``: the per-file min/max index the layout
  produces — one partial-aggregatable groupBy over the bucket key,
  output rows ∝ number of files, never data-sized. The ``*_span``
  columns ARE the data-skipping contract: narrow spans on both
  dimensions mean a predicate on either prunes most buckets.

All arithmetic is integer (fixed quantization grid, bit shifts), so
the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.tables import fan_out_small_scan, load_table

_ZBITS = 8  # bits per dimension -> 16-bit Morton key
_ZBUCKET_SHIFT = 10  # z_key DIV 2^10 -> 64 target files


def _interleave_expr(x: str, y: str) -> str:
    """SQL text of the 2-D Morton interleave of two ``_ZBITS``-bit
    ints: bit b of x lands at position 2b, bit b of y at 2b+1. The
    same string parses in Spark SQL and DuckDB (both support ``&`` and
    ``shiftright``-equivalent arithmetic via integer division)."""
    terms = []
    for b in range(_ZBITS):
        terms.append(f"(({x} // {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"(({y} // {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def _zbase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events rows with quantized (user_id, ts_ns) grid coordinates and
    the Morton key. Quantization is exact integer math against the
    1-row global min/max frame (broadcast scalar, the allowlisted
    pattern) — rank-free, so no global window anywhere."""
    ev = fan_out_small_scan(
        load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts_ns")
    )
    lims = ev.agg(
        F.min("user_id").alias("ux0"),
        F.max("user_id").alias("ux1"),
        F.min("ts_ns").alias("ty0"),
        F.max("ts_ns").alias("ty1"),
    )
    g = 1 << _ZBITS
    # Quantize by a precomputed step = ceil(span / g) — divide BEFORE
    # multiplying.  The naive (v - lo) * g DIV span form overflows
    # int64 once the time axis spans > ~2^63/g ns (~417 days at g=256)
    # and Spark (non-ANSI) would wrap silently while DuckDB errors; the
    # step form never exceeds the input magnitude.  When span < g the
    # occupied grid shrinks to [0, span-1] instead of stretching —
    # harmless for skipping (cells are still monotone in the source
    # value) and exact in both engines.
    q = ev.join(F.broadcast(lims)).select(
        "event_id",
        "user_id",
        "ts_ns",
        F.expr(f"CAST((user_id - ux0) DIV ((ux1 - ux0 + {g}) DIV {g}) AS BIGINT)").alias("xq"),
        F.expr(f"CAST((ts_ns - ty0) DIV ((ty1 - ty0 + {g}) DIV {g}) AS BIGINT)").alias("yq"),
    )
    # Spark's // is not integer division on longs; the interleave expr
    # uses DIV-via-floor semantics — rewrite // as DIV for Spark
    z = _interleave_expr("xq", "yq").replace("//", "DIV")
    return q.withColumn("z_key", F.expr(f"CAST({z} AS BIGINT)"))


def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton layout key and target-file bucket per event row.

    Output: (event_id, xq, yq, z_key, file_bucket) — ``file_bucket``
    is the contiguous z-range a layout writer assigns to one file
    (``repartitionByRange(z_key)`` at write time); consecutive buckets
    tile (user, time) space in 2^{_ZBUCKET_SHIFT}-key squares."""
    return _zbase(spark, sf_dir).select(
        "event_id",
        "xq",
        "yq",
        "z_key",
        F.expr(f"CAST(z_key DIV {1 << _ZBUCKET_SHIFT} AS BIGINT)").alias("file_bucket"),
    )


def zorder_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-skipping index of the Z-ordered layout: per file
    bucket, row count and the min/max envelope of BOTH source
    dimensions (quantized grid units). The span columns quantify the
    skipping power — under Z-order every bucket's x-span and y-span
    are ~sqrt(bucket_size) grid cells instead of the full axis, so a
    point filter on either dimension prunes ~all other buckets."""
    base = _zbase(spark, sf_dir).select(
        F.expr(f"CAST(z_key DIV {1 << _ZBUCKET_SHIFT} AS BIGINT)").alias("file_bucket"),
        "xq",
        "yq",
    )
    return base.groupBy("file_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xq").alias("x_min"),
        F.max("xq").alias("x_max"),
        F.min("yq").alias("y_min"),
        F.max("yq").alias("y_max"),
        (F.max("xq") - F.min("xq") + 1).alias("x_span"),
        (F.max("yq") - F.min("yq") + 1).alias("y_span"),
    )


# query rectangle for the scan-savings audit: an 8×32 window in
# (user, time) grid space.  The x range sits low because the
# divide-first quantization occupies only [0, user_span-1] cells when
# the user span is below the 256-cell grid (15 users at sf0.001) — a
# low window intersects occupied space at every SF.
_QX0, _QX1 = 4, 11
_QY0, _QY1 = 64, 95


def layout_scan_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout decision, MEASURED instead of argued: under the same
    rectangle predicate (user range × time range), how many files and
    rows does min/max pruning actually skip in (a) the Z-ordered
    layout vs (b) the conventional time-sorted layout (files = ranges
    of the time axis, the default layout every append-only events
    table already has)?

    A file is scanned iff its min/max envelope intersects the
    predicate on BOTH dimensions (exactly parquet row-group pruning).
    Output: one row per layout — files scanned / total, rows scanned /
    matching. The rows_scanned gap is the I/O the Z-order rewrite
    buys; time-sorted prunes the time axis perfectly but must read
    EVERY file whose time range matches regardless of user, so its
    x-envelope is the full axis.

    Plan shape: rides ``_zbase`` (scalar broadcast + column math),
    two ≤64-group aggregates, and a 2-row union — audit cost is one
    scan regardless of corpus size."""
    base = _zbase(spark, sf_dir).select(
        "xq",
        "yq",
        F.expr(f"CAST(z_key DIV {1 << _ZBUCKET_SHIFT} AS BIGINT)").alias("zbucket"),
        # the time-sorted layout: 64 files of 4 consecutive time-grid
        # cells each (same file count as the z layout, fair comparison)
        F.expr("CAST(yq DIV 4 AS BIGINT)").alias("tbucket"),
        (
            (F.col("xq") >= _QX0)
            & (F.col("xq") <= _QX1)
            & (F.col("yq") >= _QY0)
            & (F.col("yq") <= _QY1)
        ).alias("hit"),
    )

    def _audit(df: DataFrame, bucket: str, layout: str) -> DataFrame:
        per = df.groupBy(bucket).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("xq").alias("x0"),
            F.max("xq").alias("x1"),
            F.min("yq").alias("y0"),
            F.max("yq").alias("y1"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_hits"),
        )
        scanned = (
            (F.col("x1") >= _QX0)
            & (F.col("x0") <= _QX1)
            & (F.col("y1") >= _QY0)
            & (F.col("y0") <= _QY1)
        )
        return per.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(scanned.cast("long")).cast("long").alias("files_scanned"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_hits").cast("long").alias("rows_matching"),
        )

    return _audit(base, "zbucket", "zorder").unionByName(
        _audit(base, "tbucket", "time_sorted")
    )


_G = 1 << _ZBITS

def _zbase_sql(proj: str = "event_id,") -> str:
    """Quantized (xq, yq) base CTE; ``proj`` prepends extra projected
    columns (the _HSAVE_SQL variant drops event_id by passing "") —
    a parameter instead of string-replacing generated SQL, so
    rewording the projection cannot silently no-op downstream."""
    return f"""
  SELECT {proj}
    CAST((user_id - ux0) // ((ux1 - ux0 + {_G}) // {_G}) AS BIGINT) AS xq,
    CAST((epoch_ns(ts) - ty0) // ((ty1 - ty0 + {_G}) // {_G}) AS BIGINT) AS yq
  FROM events, (SELECT MIN(user_id) AS ux0, MAX(user_id) AS ux1,
                       MIN(epoch_ns(ts)) AS ty0, MAX(epoch_ns(ts)) AS ty1
                FROM events) lims
"""


_ZBASE_SQL = _zbase_sql()

_ZKEYS_SQL = f"""
WITH q AS ({_ZBASE_SQL}),
z AS (
  SELECT event_id, xq, yq,
         CAST({_interleave_expr("xq", "yq")} AS BIGINT) AS z_key
  FROM q
)
SELECT event_id, xq, yq, z_key,
       CAST(z_key // {1 << _ZBUCKET_SHIFT} AS BIGINT) AS file_bucket
FROM z
"""

_ZSTATS_SQL = f"""
WITH q AS ({_ZBASE_SQL}),
z AS (
  SELECT xq, yq,
         CAST(({_interleave_expr("xq", "yq")}) // {1 << _ZBUCKET_SHIFT} AS BIGINT)
           AS file_bucket
  FROM q
)
SELECT file_bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(xq) AS x_min, MAX(xq) AS x_max,
       MIN(yq) AS y_min, MAX(yq) AS y_max,
       MAX(xq) - MIN(xq) + 1 AS x_span,
       MAX(yq) - MIN(yq) + 1 AS y_span
FROM z GROUP BY file_bucket
"""

_SAVINGS_SQL = f"""
WITH q AS ({_ZBASE_SQL}),
z AS (
  SELECT xq, yq,
    CAST(({_interleave_expr("xq", "yq")}) // {1 << _ZBUCKET_SHIFT} AS BIGINT)
      AS zbucket,
    CAST(yq // 4 AS BIGINT) AS tbucket,
    (xq BETWEEN {_QX0} AND {_QX1} AND yq BETWEEN {_QY0} AND {_QY1}) AS hit
  FROM q
),
zf AS (
  SELECT zbucket, COUNT(*) AS n_rows, MIN(xq) AS x0, MAX(xq) AS x1,
         MIN(yq) AS y0, MAX(yq) AS y1,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hits
  FROM z GROUP BY zbucket
),
tf AS (
  SELECT tbucket, COUNT(*) AS n_rows, MIN(xq) AS x0, MAX(xq) AS x1,
         MIN(yq) AS y0, MAX(yq) AS y1,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hits
  FROM z GROUP BY tbucket
)
SELECT 'zorder' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
  CAST(SUM(CASE WHEN x1 >= {_QX0} AND x0 <= {_QX1}
                 AND y1 >= {_QY0} AND y0 <= {_QY1} THEN 1 ELSE 0 END) AS BIGINT)
    AS files_scanned,
  CAST(SUM(CASE WHEN x1 >= {_QX0} AND x0 <= {_QX1}
                 AND y1 >= {_QY0} AND y0 <= {_QY1} THEN n_rows ELSE 0 END) AS BIGINT)
    AS rows_scanned,
  CAST(SUM(n_hits) AS BIGINT) AS rows_matching
FROM zf
UNION ALL
SELECT 'time_sorted' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
  CAST(SUM(CASE WHEN x1 >= {_QX0} AND x0 <= {_QX1}
                 AND y1 >= {_QY0} AND y0 <= {_QY1} THEN 1 ELSE 0 END) AS BIGINT)
    AS files_scanned,
  CAST(SUM(CASE WHEN x1 >= {_QX0} AND x0 <= {_QX1}
                 AND y1 >= {_QY0} AND y0 <= {_QY1} THEN n_rows ELSE 0 END) AS BIGINT)
    AS rows_scanned,
  CAST(SUM(n_hits) AS BIGINT) AS rows_matching
FROM tf
"""

# ---------------------------------------------------------------------
# Hilbert-curve layout keys (Hilbert 1891; xy2d per the standard
# iterative rotate-and-accumulate form).  Morton interleave is cheap
# but has long diagonal jumps — consecutive z keys can be far apart in
# (x, y), so file envelopes near the jumps are wide.  The Hilbert
# curve is UNIT-STEP continuous (consecutive keys are always grid
# neighbors), which is why layout engines cluster on it when they can
# afford the extra per-row math; file min/max envelopes tighten and
# the same rectangle predicate scans fewer files.
#
# Exactness: each of the 8 scale steps is integer bit-test/negate/swap
# arithmetic (// , %, CASE) generated ONCE as SQL text shared by both
# engines (Spark consumes it with // rewritten to DIV, the _ZBASE
# pattern).  The per-step rotation carries (x, y) forward as chained
# columns — no lambda, no recursion, no struct fold, so neither
# engine's higher-order-function quirks are in play.
# ---------------------------------------------------------------------


def _hilbert_step_exprs(i: int) -> tuple[str, str, str]:
    """SQL text for step i (s = 2^(_ZBITS-1-i)) of the Hilbert xy2d
    walk: (d_expr, x_expr, y_expr) in terms of x{i}, y{i}, d{i}.
    (3·rx) XOR ry == 3·rx + ry − 2·rx·ry for bits (only bit 0
    collides), so the segment index needs no XOR builtin."""
    s = 1 << (_ZBITS - 1 - i)
    n1 = (1 << _ZBITS) - 1
    rx = f"((x{i} // {s}) % 2)"
    ry = f"((y{i} // {s}) % 2)"
    d = f"d{i} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    x = (
        f"CASE WHEN {ry} = 1 THEN x{i} "
        f"WHEN {rx} = 1 THEN {n1} - y{i} ELSE y{i} END"
    )
    y = (
        f"CASE WHEN {ry} = 1 THEN y{i} "
        f"WHEN {rx} = 1 THEN {n1} - x{i} ELSE x{i} END"
    )
    return d, x, y


def _hilbert_cols(df: DataFrame) -> DataFrame:
    """Append h_key to a frame with (xq, yq): the chained-column form
    of the 8-step walk, all whole-stage-codegen scalar math."""
    out = df.withColumn("x0", F.col("xq")).withColumn("y0", F.col("yq")).withColumn(
        "d0", F.lit(0).cast("bigint")
    )
    for i in range(_ZBITS):
        d, x, y = (e.replace("//", " DIV ") for e in _hilbert_step_exprs(i))
        out = (
            out.withColumn(f"d{i + 1}", F.expr(d))
            .withColumn(f"x{i + 1}", F.expr(x))
            .withColumn(f"y{i + 1}", F.expr(y))
        )
    keep = [c for c in df.columns]
    return out.select(*keep, F.expr(f"CAST(d{_ZBITS} AS BIGINT)").alias("h_key"))


def hilbert_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert layout key and target-file bucket per event row — the
    locality-tighter sibling of ``zorder_layout_keys`` on the same
    quantized grid.  Plan shape identical: 1-row min/max broadcast +
    per-row column math, zero data shuffles."""
    base = _zbase(spark, sf_dir).select("event_id", "xq", "yq")
    return _hilbert_cols(base).select(
        "event_id",
        "xq",
        "yq",
        "h_key",
        F.expr(f"CAST(h_key DIV {1 << _ZBUCKET_SHIFT} AS BIGINT)").alias(
            "file_bucket"
        ),
    )


_N_FILES = 64  # target file count of the layout writer


def _eqfreq_bucket_map(rows: DataFrame, key: str) -> DataFrame:
    """(key, bucket) map for equal-ROW file cuts — the
    ``repartitionByRange`` writer model: sort by the curve key, cut
    every N/_N_FILES rows.  Computed from the key HISTOGRAM (≤ 4^bits
    rows by construction — the grid size, never the data size): bucket
    of a key = (rows strictly before it) · _N_FILES DIV N.  The one
    unpartitioned window runs over that bounded histogram
    (allowlisted in tests/test_plan_invariants.py)."""
    hist = rows.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    w = (
        Window.orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "_cum", F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("bigint")
    )
    total = rows.agg(F.count(F.lit(1)).alias("_tot"))
    return cum.crossJoin(F.broadcast(total)).select(
        key,
        F.expr(f"CAST((_cum * {_N_FILES}) DIV _tot AS BIGINT)").alias(
            f"{key}_bucket"
        ),
    )


def hilbert_scan_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-way layout decision, measured on one scan: files/rows
    pruned by the SAME rectangle predicate under Hilbert, Z-order and
    time-sorted layouts.  The curve layouts use equal-ROW file cuts
    (the repartitionByRange writer model) — the regime where the curves
    actually differ: ALIGNED power-of-4 key blocks are perfect squares
    under both curves, but an arbitrary cut crosses a Morton diagonal
    jump and widens that file's envelope, while a Hilbert segment is
    unit-step continuous and stays tight.  At sf0.01 the measured gap
    is 2 files scanned (hilbert) vs 4 (zorder) vs 8 (time_sorted) —
    committed evidence for choosing the clustering curve.  (The
    ordering vs time_sorted is per-rectangle, not a theorem: a
    time-dominant window can favor the append-only layout, as it does
    at sf0.001; hilbert ≤ zorder on identical cuts is the robust
    claim and the one the tests pin.)"""
    keyed = _hilbert_cols(
        _zbase(spark, sf_dir).select("xq", "yq", "z_key")
    ).localCheckpoint()  # feeds two histogram maps + the row join
    hmap = _eqfreq_bucket_map(keyed, "h_key")
    zmap = _eqfreq_bucket_map(keyed, "z_key")
    base = (
        keyed.join(F.broadcast(hmap), "h_key")
        .join(F.broadcast(zmap), "z_key")
        .select(
            "xq",
            "yq",
            F.col("h_key_bucket").alias("hbucket"),
            F.col("z_key_bucket").alias("zbucket"),
            F.expr("CAST(yq DIV 4 AS BIGINT)").alias("tbucket"),
            (
                (F.col("xq") >= _QX0)
                & (F.col("xq") <= _QX1)
                & (F.col("yq") >= _QY0)
                & (F.col("yq") <= _QY1)
            ).alias("hit"),
        )
    )

    # ONE pass over the keyed rows: aggregate to the bounded
    # (hbucket, zbucket, tbucket) cube first (≤ grid-cell-count rows
    # by construction), then derive each layout's per-file envelope by
    # re-aggregating the cube — min/max/sum/count all re-aggregate
    # exactly, so the three audit legs stop re-executing the
    # broadcast-join chain once per layout (3 full scans → 1).
    cube = base.groupBy("hbucket", "zbucket", "tbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xq").alias("x0"),
        F.max("xq").alias("x1"),
        F.min("yq").alias("y0"),
        F.max("yq").alias("y1"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_hits"),
    ).localCheckpoint()

    def _audit(bucket: str, layout: str) -> DataFrame:
        per = cube.groupBy(bucket).agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("x0").alias("x0"),
            F.max("x1").alias("x1"),
            F.min("y0").alias("y0"),
            F.max("y1").alias("y1"),
            F.sum("n_hits").alias("n_hits"),
        )
        scanned = (
            (F.col("x1") >= _QX0)
            & (F.col("x0") <= _QX1)
            & (F.col("y1") >= _QY0)
            & (F.col("y0") <= _QY1)
        )
        return per.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(scanned.cast("long")).cast("long").alias("files_scanned"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_hits").cast("long").alias("rows_matching"),
        )

    return (
        _audit("hbucket", "hilbert")
        .unionByName(_audit("zbucket", "zorder"))
        .unionByName(_audit("tbucket", "time_sorted"))
    )


def _hilbert_steps_sql(src: str) -> str:
    """Chained CTEs h1..h{_ZBITS} applying the walk to ``src`` (which
    must expose xq, yq and any passthrough columns)."""
    ctes = [
        f"h0 AS (SELECT *, xq AS x0, yq AS y0, CAST(0 AS BIGINT) AS d0 FROM {src})"
    ]
    for i in range(_ZBITS):
        d, x, y = _hilbert_step_exprs(i)
        ctes.append(
            f"h{i + 1} AS (SELECT * EXCLUDE (x{i}, y{i}, d{i}),"
            f" {d} AS d{i + 1}, {x} AS x{i + 1}, {y} AS y{i + 1}"
            f" FROM h{i})"
        )
    return ",\n".join(ctes)


_HKEYS_SQL = f"""
WITH q AS ({_ZBASE_SQL}),
{_hilbert_steps_sql("q")}
SELECT event_id, xq, yq, CAST(d{_ZBITS} AS BIGINT) AS h_key,
       CAST(d{_ZBITS} // {1 << _ZBUCKET_SHIFT} AS BIGINT) AS file_bucket
FROM h{_ZBITS}
"""

_HSAVE_SQL = f"""
WITH q0 AS ({_zbase_sql(proj="")}),
q AS (
  SELECT xq, yq,
         CAST({_interleave_expr("xq", "yq")} AS BIGINT) AS z_key
  FROM q0
),
{_hilbert_steps_sql("q")},
k AS MATERIALIZED (
  SELECT xq, yq, z_key, CAST(d{_ZBITS} AS BIGINT) AS h_key FROM h{_ZBITS}
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS _tot FROM k),
hm AS (
  SELECT h_key,
    CAST((COALESCE(SUM(_n) OVER (ORDER BY h_key
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          * {_N_FILES}) // _tot AS BIGINT) AS hbucket
  FROM (SELECT h_key, CAST(COUNT(*) AS BIGINT) AS _n FROM k GROUP BY h_key)
  CROSS JOIN tot
),
zm AS (
  SELECT z_key,
    CAST((COALESCE(SUM(_n) OVER (ORDER BY z_key
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          * {_N_FILES}) // _tot AS BIGINT) AS zbucket
  FROM (SELECT z_key, CAST(COUNT(*) AS BIGINT) AS _n FROM k GROUP BY z_key)
  CROSS JOIN tot
),
b AS (
  SELECT k.xq, k.yq, hm.hbucket, zm.zbucket,
    CAST(k.yq // 4 AS BIGINT) AS tbucket,
    (k.xq BETWEEN {_QX0} AND {_QX1} AND k.yq BETWEEN {_QY0} AND {_QY1}) AS hit
  FROM k JOIN hm USING (h_key) JOIN zm USING (z_key)
),
hf AS (
  SELECT hbucket, COUNT(*) AS n_rows, MIN(xq) AS x0, MAX(xq) AS x1,
         MIN(yq) AS y0, MAX(yq) AS y1,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hits
  FROM b GROUP BY hbucket
),
zf AS (
  SELECT zbucket, COUNT(*) AS n_rows, MIN(xq) AS x0, MAX(xq) AS x1,
         MIN(yq) AS y0, MAX(yq) AS y1,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hits
  FROM b GROUP BY zbucket
),
tf AS (
  SELECT tbucket, COUNT(*) AS n_rows, MIN(xq) AS x0, MAX(xq) AS x1,
         MIN(yq) AS y0, MAX(yq) AS y1,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hits
  FROM b GROUP BY tbucket
),
layouts AS (
  SELECT 'hilbert' AS layout, * FROM hf
  UNION ALL SELECT 'zorder', * FROM zf
  UNION ALL SELECT 'time_sorted', * FROM tf
)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
  CAST(SUM(CASE WHEN x1 >= {_QX0} AND x0 <= {_QX1}
                 AND y1 >= {_QY0} AND y0 <= {_QY1} THEN 1 ELSE 0 END) AS BIGINT)
    AS files_scanned,
  CAST(SUM(CASE WHEN x1 >= {_QX0} AND x0 <= {_QX1}
                 AND y1 >= {_QY0} AND y0 <= {_QY1} THEN n_rows ELSE 0 END)
       AS BIGINT) AS rows_scanned,
  CAST(SUM(n_hits) AS BIGINT) AS rows_matching
FROM layouts GROUP BY layout
"""


QUERIES = {
    "zorder_layout_keys": zorder_layout_keys,
    "zorder_skipping_stats": zorder_skipping_stats,
    "layout_scan_savings": layout_scan_savings,
    "hilbert_layout_keys": hilbert_layout_keys,
    "hilbert_scan_savings": hilbert_scan_savings,
}

ORACLES = {
    "zorder_layout_keys": _ZKEYS_SQL,
    "zorder_skipping_stats": _ZSTATS_SQL,
    "layout_scan_savings": _SAVINGS_SQL,
    "hilbert_layout_keys": _HKEYS_SQL,
    "hilbert_scan_savings": _HSAVE_SQL,
}
