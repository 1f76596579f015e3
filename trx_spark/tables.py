"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# columns written as parquet TIMESTAMP(NANOS); with nanosAsLong they read
# as BIGINT nanoseconds — we keep a ``<col>_ns`` long (total-ordering key,
# exactly what DuckDB's TIMESTAMP_NS compares by) and derive a proper
# TimestampType column by integer-dividing to microseconds.
_NANOS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan → Catalyst gets pushdown
    and column pruning for free on every downstream query."""
    # settable at runtime; defensive for sessions we didn't build
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Spark 4 defaults to ANSI (divide-by-zero throws); the DuckDB oracle
    # and the reference's numpy (seterr ignore, azav.py:8) both yield
    # NULL/NaN — pin non-ANSI so edge groups (zero tokens, zero noise)
    # degrade identically instead of failing the whole query
    spark.conf.set("spark.sql.ansi.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_COLS.get(name, []):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            # integer DIV — double division would lose precision at 1e18 ns
            df = df.withColumnRenamed(col, f"{col}_ns").withColumn(
                col, F.timestamp_micros(F.expr(f"{col}_ns DIV 1000"))
            )
        elif dtype in ("timestamp", "timestamp_ntz"):
            # micros-precision file: synthesize the ns ordering key so
            # downstream code sees a uniform schema either way (NTZ values
            # are naive UTC — the session timezone is pinned to UTC, so the
            # cast is value-preserving)
            ts = F.col(col).cast("timestamp") if dtype == "timestamp_ntz" else F.col(col)
            df = df.withColumn(f"{col}_ns", F.unix_micros(ts) * F.lit(1000))
    return df


def fan_out_small_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition a SMALL scan before a compute-bound,
    shuffle-free projection (regex tokenize, MinHash/SimHash signature
    folds, PQ encode, per-vector scoring against a broadcast codebook).

    Why: a scan of one small parquet file yields ONE input split, so a
    heavy per-row projection — or anything downstream of a broadcast
    join, which preserves the probe side's partitioning — runs serially
    no matter how many cores the session has. Join/groupBy stages
    self-heal (the shuffle re-spreads to spark.sql.shuffle.partitions);
    map-only stages never do.

    At cluster scale the scan already yields >= defaultParallelism
    splits and this returns the frame untouched — the helper is a local
    small-file corrective, not a standing shuffle. Apply it AFTER any
    scan-pushable filter so pushdown is preserved.

    The split count needs physical planning + a DataFrame-to-RDD
    conversion (df.rdd.getNumPartitions), which is pure driver latency
    on hot unmemoized paths — so the count is memoized per
    (session, semanticHash, input-file-listing, target): the same
    logical frame (every rebuild of a shared base like the tokenized
    docs) pays planning once per session, while a path whose files
    change mid-session (append-then-requery) gets a fresh count from
    the changed listing (semanticHash alone is a LOGICAL key and would
    go stale). The listing is an analysis-time FileIndex lookup — far
    cheaper than the physical planning it replaces. The memo holds
    ints only, no data."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    try:
        key = (spark, df.semanticHash(), hash(tuple(df.inputFiles())), target)
    except Exception:  # pragma: no cover - semanticHash unavailable
        key = None
    n = _FAN_MEMO.get(key) if key is not None else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if key is not None:
            _FAN_MEMO[key] = n
    if n >= target:
        return df
    return df.repartition(target)


# (session, semanticHash, target) -> planned partition count; cleared
# with the stage caches so cold benchmarks re-pay planning honestly
_FAN_MEMO: dict = {}


def raw_dtype(spark: SparkSession, sf_dir: str, name: str, col: str) -> str | None:
    """dtype of ``col`` as stored in the parquet file itself (footer-only
    peek, no data read) — BEFORE load_table's ns/timestamp normalization.
    Lets queries put predicates on the physical column so they push down
    to the scan regardless of which precision the file was written at."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return dict(df.dtypes).get(col)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
