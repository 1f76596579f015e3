"""Watermarked stream-stream interval join (streaming extension per
the build brief): join two UNBOUNDED streams on a key within an
event-time window — e.g. click attribution onto impressions — with
both sides watermarked so the join state expires: each side buffers
only rows younger than (watermark − window), giving O(window · rate)
state instead of O(history). The batch twin of this shape is
``operators/rangejoin.interval_point_join``; in streaming the state
store plays the role of the bucketed hash side.

Semantics pinned by tests: half-open window (r_ts in [l_ts, l_ts +
window)), inner join; over a single availableNow replay of static
input the result EQUALS the batch join (watermarks drop nothing when
everything arrives in order); across checkpointed replays a row older
than the advanced watermark is dropped — the bounded-state contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    l_ts: str,
    r_ts: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner-join ``right`` rows onto ``left`` rows with the same
    ``on`` key and ``r_ts`` in ``[l_ts, l_ts + window)``. Works on
    streaming or batch frames (withWatermark is a batch no-op).
    ``l_ts``/``r_ts`` must be distinct timestamp column names."""
    lw = left.withWatermark(l_ts, watermark)
    rw = right.withWatermark(r_ts, watermark)
    key_l, key_r = f"l.{on}", f"r.{on}"
    cond = (
        (F.col(key_l) == F.col(key_r))
        & (F.col(r_ts) >= F.col(l_ts))
        & (F.col(r_ts) < F.col(l_ts) + F.expr(f"INTERVAL {window}"))
    )
    return (
        lw.alias("l")
        .join(rw.alias("r"), cond, "inner")
        .drop(F.col(key_r))
    )


_MEM_NAMES = __import__("itertools").count()


def run_interval_join_catchup(
    spark,
    *,
    landing_dir: str,
    schema,
    path_glob_filter: str | None = None,
    prepare_left=None,
    prepare_right=None,
    on: str,
    l_ts: str,
    r_ts: str,
    window: str = "6 hours",
    watermark: str = "12 hours",
):
    """availableNow replay of :func:`interval_stream_join` over two
    file-source streams of the same parquet folder, collected through a
    memory sink (append mode — inner stream-stream joins emit rows as
    both sides arrive; nothing waits on the watermark). Over static
    input this equals the batch inequality join, so the gate query
    carries a full oracle."""

    def _stream():
        reader = spark.readStream.schema(schema)
        if path_glob_filter is not None:
            reader = reader.option("pathGlobFilter", path_glob_filter)
        return reader.parquet(landing_dir)

    left, right = _stream(), _stream()
    if prepare_left is not None:
        left = prepare_left(left)
    if prepare_right is not None:
        right = prepare_right(right)
    joined = interval_stream_join(
        left, right, on=on, l_ts=l_ts, r_ts=r_ts, window=window, watermark=watermark
    )
    name = f"trx_ivjoin_{next(_MEM_NAMES)}"
    from trx_spark.streaming.tuning import replay_state_width

    # a stream-stream join builds FOUR state stores per shuffle
    # partition; width sized to state volume, not batch compute width
    # (see tuning.py — 15.7 s → 3.1 s on the identical replay)
    with replay_state_width(spark):
        q = (
            joined.writeStream.format("memory")
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
