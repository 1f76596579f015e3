"""Incremental view maintenance: a streaming MATERIALIZED VIEW of the
flagship pricing aggregation, maintained as mergeable partial
aggregates.

Every distributive/algebraic aggregate (SUM, COUNT, MIN, MAX, and AVG
as SUM/COUNT) is a mergeable sketch in the same sense as the CMS/HLL
partials (`streaming/sketch.py`): each micro-batch contributes a
bounded partial (one row per group), the accumulated view is the
key-wise merge, and the result equals the batch aggregation of all
ingested rows EXACTLY — the fixed-point integer sums
(:mod:`trx_spark.exact`) make the equality bit-exact, so the streaming
view carries the SAME DuckDB oracle as the batch `pricing_summary`
query.

This is the Spark-first replacement for the reference's online loop
"recompute the reduction after each new file" (trx/id9.py:330):
instead of recomputing over the accumulated store, the view merges
per-epoch partials — per-epoch work is O(batch), merge work is
O(groups · epochs), and compaction (inherited from the sketch store)
folds history to O(groups).

Reuses the sketch harness verbatim: epoch-partitioned idempotent
writes, the compaction watermark, and the availableNow catch-up driver
— one mechanism, three state shapes (CMS cells / HLL registers /
aggregate partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from trx_spark.exact import SCALE, fint
from trx_spark.streaming.sketch import _run_catchup, compact_store

_KEYS = ["l_returnflag", "l_linestatus"]


def pricing_partials(batch: DataFrame) -> DataFrame:
    """One micro-batch's partial: per-group fixed-point sums + counts
    (everything needed to reconstruct the full pricing summary)."""
    from trx_spark.queries.relational import _CUTOFF_NS

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    dtypes = dict(batch.dtypes)
    if dtypes.get("l_shipdate") == "bigint":
        shipped = F.col("l_shipdate") <= F.lit(_CUTOFF_NS)
    else:
        shipped = F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast(
            dtypes["l_shipdate"]
        )
    return (
        batch.filter(shipped)
        .groupBy(*_KEYS)
        .agg(
            F.sum(fint(F.col("l_quantity"))).alias("fp_qty"),
            F.sum(fint(F.col("l_extendedprice"))).alias("fp_base"),
            F.sum(fint(disc_price)).alias("fp_disc_price"),
            F.sum(fint(charge)).alias("fp_charge"),
            F.sum(fint(F.col("l_discount"))).alias("fp_disc"),
            # per-column NON-NULL counts, so the finalized averages
            # divide exactly like the batch query's davg (= dsum /
            # count(col)) even on null-bearing measures
            F.count(F.col("l_quantity")).alias("n_qty"),
            F.count(F.col("l_extendedprice")).alias("n_price"),
            F.count(F.col("l_discount")).alias("n_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_PARTIAL_COLS = [
    "fp_qty", "fp_base", "fp_disc_price", "fp_charge", "fp_disc",
    "n_qty", "n_price", "n_disc", "n",
]


def _merge_partials(spark: SparkSession, view_dir: str) -> DataFrame:
    """Key-wise merge of the epoch partials — the ONE definition shared
    by the finalizing read and compaction, so a new partial column can
    never silently drop out of the folded store."""
    return (
        spark.read.parquet(view_dir)
        .groupBy(*_KEYS)
        .agg(*[F.sum(c).alias(c) for c in _PARTIAL_COLS])
    )


def merged_pricing_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """Merged partials finalized to the exact batch `pricing_summary`
    schema (the integer partial sums make the merge associative, and
    the final divisions — dsum/scale, dsum/count(col) — are the very
    expressions the batch query evaluates, so equality is bit-exact)."""
    m = _merge_partials(spark, view_dir)

    def d(col):  # fixed-point long → double, same op as exact.dsum
        return F.col(col).cast("double") / F.lit(SCALE)

    return m.select(
        *_KEYS,
        d("fp_qty").alias("sum_qty"),
        d("fp_base").alias("sum_base_price"),
        d("fp_disc_price").alias("sum_disc_price"),
        d("fp_charge").alias("sum_charge"),
        (d("fp_qty") / F.col("n_qty")).alias("avg_qty"),
        (d("fp_base") / F.col("n_price")).alias("avg_price"),
        (d("fp_disc") / F.col("n_disc")).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


def compact_pricing_view(spark: SparkSession, view_dir: str) -> None:
    """Fold epoch history to one partial per group (watermarked like
    the sketch stores). Folds the PARTIAL columns via the shared
    :func:`_merge_partials` — never the finalized view, whose averages
    are not associative."""
    compact_store(spark, view_dir, _merge_partials)


def run_pricing_matview_catchup(
    spark: SparkSession,
    *,
    landing_dir: str,
    schema: StructType | str,
    view_dir: str,
    checkpoint_dir: str,
    path_glob_filter: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the landing dir (availableNow) through the partial
    handler; return the finalized merged view."""
    return _run_catchup(
        spark,
        landing_dir=landing_dir,
        schema=schema,
        sketch_dir=view_dir,
        checkpoint_dir=checkpoint_dir,
        partial_fn=pricing_partials,
        merge_fn=merged_pricing_view,
        path_glob_filter=path_glob_filter,
        max_files_per_trigger=max_files_per_trigger,
    )
