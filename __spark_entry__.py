"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in :mod:`trx_spark.queries`; each Spark implementation
and its oracle use identical scalar expression trees and fixed-point
integer aggregation (:mod:`trx_spark.exact`), so values match
bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full time-resolved
    reduction pipeline (as-of reference interpolation → diff → per-scan-
    point averaging with chi2 statistics; SURVEY E2)."""
    from trx_spark.queries.trxdomain import scanpoint_stats

    return scanpoint_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from trx_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    from trx_spark.queries import ORACLES

    return dict(ORACLES)
