"""Streaming deduplication with bounded state
(``dropDuplicatesWithinWatermark``) — the streaming face of the dedup
family (training-data brief): drop repeats of a key while its state is
live, expire state once the event-time watermark passes, so state is
O(keys within the watermark horizon), not O(history).

This is the operator a 100 TB ingest needs for at-least-once upstreams
(replayed files, retried producers): exact global dedup would keep
unbounded state; the watermark bound is the standard trade — repeats
separated by more than the horizon are re-emitted (downstream exact
dedup over the stored corpus catches those; ``queries/textdata.
dedup_exact`` is that batch pass).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MEM_NAMES = itertools.count()


def dedup_stream(
    stream: DataFrame, keys: list[str], ts: str, watermark: str
) -> DataFrame:
    """First occurrence per key while the key's state is within the
    watermark horizon. Works on a streaming DataFrame; plan-builder
    only (trigger/sink are the caller's)."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def run_dedup_catchup(
    spark: SparkSession,
    *,
    landing_dir: str,
    schema: StructType | str,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "10 minutes",
    path_glob_filter: str | None = None,
    prepare=None,
) -> DataFrame:
    """availableNow pass of :func:`dedup_stream` over a parquet folder,
    collected through a memory sink (append mode — dedup emits each
    surviving row exactly once)."""
    reader = spark.readStream.schema(schema)
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    stream = reader.parquet(landing_dir)
    if prepare is not None:
        stream = prepare(stream)
    out = dedup_stream(stream, keys, ts, watermark)
    name = f"trx_dedup_{next(_MEM_NAMES)}"
    from trx_spark.streaming.tuning import replay_state_width

    # dedup state width sized to state volume (see tuning.py)
    with replay_state_width(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from trx_spark.streaming.incremental import release_state_stores

    release_state_stores(spark)
    # materialize OFF the memory sink, then drop it: memory-sink tables
    # pin their result rows on the driver for the session's lifetime, so
    # a long-lived service leaks one table per replay (the state-store
    # provider leak's sibling).  localCheckpoint is eager, so the rows
    # move to executor blocks (freed by unpersist/GC) before the drop.
    out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    return out
