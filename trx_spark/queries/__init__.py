"""Correctness-gate queries: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB oracle SQL string.

Every Spark query and its oracle are written against the driver's
testdata tables; the scalar math uses identical expression trees and the
aggregates use fixed-point integer sums (see :mod:`trx_spark.exact`), so
the two engines produce bit-identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trx_spark.queries import (
    corpus,
    curation,
    packing,
    relational,
    similarity,
    streamingq,
    temporal,
    textdata,
    trxdomain,
    trxdomain2,
    trxdomain3,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (
    relational,
    trxdomain,
    trxdomain2,
    trxdomain3,
    textdata,
    similarity,
    corpus,
    curation,
    packing,
    temporal,
    streamingq,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
