"""Watermark semantics: in append mode a window is emitted once the
watermark passes its end, and rows arriving LATER than the watermark
are dropped — the bounded-state contract that makes event-time
aggregation feasible at 100 TB (state is O(open windows))."""

from __future__ import annotations

import datetime

import pandas as pd

from trx_spark.streaming.windowed import windowed_counts

SCHEMA = "k string, ts timestamp"
T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _wave(spark, landing, n, rows):
    pdf = pd.DataFrame({"k": [r[0] for r in rows], "ts": [T0 + datetime.timedelta(minutes=r[1]) for r in rows]})
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
        f"{landing}/w{n}"
    )


def _run(spark, landing, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    agg = windowed_counts(stream, ts="ts", keys=["k"], window="10 minutes", watermark="5 minutes")

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(str(out))

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import os

    if not os.path.exists(out):
        return {}
    pdf = spark.read.parquet(str(out)).toPandas()
    t0_us = int(
        T0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )
    return {
        (int((r["window_start_us"] - t0_us) // 60_000_000), r["k"]): int(r["n"])
        for _, r in pdf.iterrows()
    }


def test_watermark_emits_closed_windows_and_drops_late_rows(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"

    # wave 1: events at t=0m and t=60m → watermark advances to 55m,
    # closing window [0, 10) — appended; [60, 70) stays open
    _wave(spark, landing, 1, [("a", 0), ("a", 60)])
    got1 = _run(spark, landing, ckpt, out)
    assert got1 == {(0, "a"): 1}

    # wave 2: a LATE row at t=2m (behind the 55m watermark → dropped)
    # plus t=120m (watermark → 115m, closing [60, 70))
    _wave(spark, landing, 2, [("a", 2), ("a", 120)])
    got2 = _run(spark, landing, ckpt, out)
    assert got2 == {(0, "a"): 1, (60, "a"): 1}, (
        "late row must not reopen the closed [0,10) window"
    )
