"""Streaming count-min sketch: mergeable token-frequency state for an
online corpus feed.

The batch engine's CMS (`queries/curation.cms_heavy_hitters`) is a
256-cell aggregate; its defining property is MERGEABILITY — cell-wise
SUM of two sketches equals the sketch of the concatenated streams. That
property is exactly what a streaming deployment needs: each micro-batch
contributes its own ≤ 256-row partial sketch, and the accumulated state
is the cell-wise sum. Per-epoch state is bounded BY CONSTRUCTION
(d·w = 256 cells regardless of batch size), the store grows only
O(epochs · 256) rows, and :func:`compact_cms_store` folds history back
to a single 256-row epoch at any time without changing the merged
sketch.

Write idempotency follows the engine's streaming convention
(`streaming/incremental.make_batch_handler`): each epoch lands in its
own ``_epoch`` partition with dynamic partition overwrite, so an
at-least-once replay rewrites its partition instead of double-counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from trx_spark.queries.curation import _cms_cells


def _batch_cells(batch: DataFrame) -> DataFrame:
    """(cell, c) partial sketch of one micro-batch's token stream."""
    from trx_spark.queries.textdata import _TOKEN_RE, _tok_hash

    toks = F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0)
    return (
        batch.select(F.explode(toks).alias("token"))
        .select(F.explode(_cms_cells(_tok_hash(F.col("token")))).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def make_cms_batch_handler(sketch_dir: str):
    """foreachBatch handler: write this epoch's ≤ 256-cell partial
    sketch into its own ``_epoch`` partition (idempotent under
    replay)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        (
            _batch_cells(batch)
            .withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(sketch_dir)
        )

    return handle


def merged_sketch(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """Cell-wise SUM across all epoch partials — by mergeability this
    equals the batch sketch of everything ingested so far."""
    return (
        spark.read.parquet(sketch_dir)
        .groupBy("cell")
        .agg(F.sum("c").alias("c"))
    )


def compact_cms_store(spark: SparkSession, sketch_dir: str) -> None:
    """Fold the epoch history into a single merged partial (epoch -1)
    so the store stays O(256) rows over an unbounded stream. Merge-sum
    is associative, so the merged sketch is unchanged."""
    merged = merged_sketch(spark, sketch_dir).withColumn("_epoch", F.lit(-1))
    merged.localCheckpoint().write.mode("overwrite").parquet(sketch_dir)


def _batch_hll_registers(batch: DataFrame) -> DataFrame:
    """(reg, rmax) partial HLL register table of one micro-batch —
    the same construction as queries/sketches.hll_distinct_tokens but
    corpus-global (no source key): 64 rows max."""
    from trx_spark.queries.sketches import _HLL_A, _HLL_B, _HLL_M, _HLL_WBITS
    from trx_spark.queries.textdata import _P, _TOKEN_RE, _tok_hash

    toks = F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0)
    tid = _tok_hash(F.col("token"))
    h = (F.lit(_HLL_A) * tid + F.lit(_HLL_B)) % F.lit(_P)
    return (
        batch.select(F.explode(toks).alias("token"))
        .select(
            F.floor(h % _HLL_M).cast("long").alias("reg"),
            F.floor(h / F.lit(float(_HLL_M))).cast("long").alias("wv"),
        )
        .withColumn(
            "rho",
            F.when(F.col("wv") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
                F.lit(_HLL_WBITS + 1) - F.length(F.bin(F.col("wv")))
            ),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("rmax"))
    )


def make_hll_batch_handler(sketch_dir: str):
    """foreachBatch handler for the HLL twin: ≤ 64-row register partial
    per epoch, idempotent dynamic-partition write. HLL merges by MAX
    (not SUM) — :func:`merged_hll_registers` applies it."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        (
            _batch_hll_registers(batch)
            .withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(sketch_dir)
        )

    return handle


def merged_hll_registers(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """Register-wise MAX across all epoch partials — by HLL
    mergeability this equals the batch register table of everything
    ingested so far (pinned by tests/test_round4b.py's merge property
    and tests/test_streaming_sketch.py's multi-wave equality)."""
    return (
        spark.read.parquet(sketch_dir)
        .groupBy("reg")
        .agg(F.max("rmax").alias("rmax"))
    )


def run_hll_catchup(
    spark: SparkSession,
    *,
    landing_dir: str,
    schema: StructType | str,
    sketch_dir: str,
    checkpoint_dir: str,
    path_glob_filter: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the landing dir through the HLL handler; return the merged
    (reg, rmax) register table."""
    reader = spark.readStream.schema(schema)
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    q = (
        stream.writeStream.foreachBatch(make_hll_batch_handler(sketch_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return merged_hll_registers(spark, sketch_dir)


def run_cms_catchup(
    spark: SparkSession,
    *,
    landing_dir: str,
    schema: StructType | str,
    sketch_dir: str,
    checkpoint_dir: str,
    path_glob_filter: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the landing dir (availableNow) through the sketch handler;
    return the merged (cell, c) sketch."""
    reader = spark.readStream.schema(schema)
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    q = (
        stream.writeStream.foreachBatch(make_cms_batch_handler(sketch_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return merged_sketch(spark, sketch_dir)
