"""Parquet schema evolution: the mergeSchema ingest contract.

A 100-TB corpus is never written in one generation — producers add
columns over time, and the lake ends up with parquet files of several
schemas side by side. Spark's answer is ``mergeSchema``: the scan
unions the file footers' schemas and fills missing columns with NULL
per file. This module stages a two-generation corpus (generation 1
without the ``lang`` column, generation 2 with it — written by the
engine itself, memoized per session×sf in a registered stage cache)
and gates the merged read: per-source row counts, NULL census of the
evolved column, and an exact sum that must survive both generations.

The oracle never reads the staged files: generation membership is the
deterministic ``doc_id % 2`` rule, so DuckDB recomputes the merged
view directly from the source table (``CASE WHEN doc_id % 2 = 0 THEN
NULL ELSE lang END``) — any row lost by the staged write, any
mis-filled NULL, or a column resolved by position instead of by name
breaks the hash.

Scale notes: the staged write is one repartition per generation (the
pay-once layout cost); the gate read is a single parquet scan whose
schema merge happens at planning time (footer union), not per row —
mergeSchema's runtime cost is in file listing/footers, which is why
production lakes checkpoint the merged schema in a catalog instead of
re-merging on every read (the documented production switch).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.tables import load_table

_EVO_CACHE: dict = {}


def _staged_generations(spark: SparkSession, sf_dir: str) -> str:
    """Write the two-generation corpus; returns the base directory."""
    key = (spark, sf_dir)
    if key in _EVO_CACHE:
        return _EVO_CACHE[key]
    base = tempfile.mkdtemp(prefix="trx_schema_evo_")
    docs = load_table(spark, sf_dir, "documents")
    gen1 = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source", "n_chars"
    )
    gen2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "n_chars", "lang"
    )
    gen1.repartition(4).write.mode("overwrite").parquet(f"{base}/gen=1")
    gen2.repartition(4).write.mode("overwrite").parquet(f"{base}/gen=2")
    _EVO_CACHE[key] = base
    return base


def schema_evolution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: per-source census of the mergeSchema read over the
    two-generation staged corpus — rows, NULLs in the evolved column,
    distinct langs seen, and the cross-generation exact char sum."""
    base = _staged_generations(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=1", f"{base}/gen=2"
    )
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("lang").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_null_lang"),
        F.count_distinct(F.col("lang")).alias("n_langs"),
        F.sum("n_chars").alias("sum_chars"),
    )


_EVO_SQL = """
WITH merged AS (
  SELECT doc_id, source, n_chars,
    CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang
  FROM documents
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_null_lang,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM merged GROUP BY source
"""

QUERIES = {"schema_evolution_stats": schema_evolution_stats}
ORACLES = {"schema_evolution_stats": _EVO_SQL}
