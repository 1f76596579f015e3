"""dropDuplicatesWithinWatermark semantics: repeats inside the
watermark horizon are dropped, state expires once the watermark passes,
and a repeat AFTER expiry is re-emitted — the bounded-state contract
(state is O(live keys), not O(history))."""

from __future__ import annotations

import datetime

import pandas as pd

from trx_spark.streaming.dedup import dedup_stream

SCHEMA = "k string, ts timestamp"
T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _wave(spark, landing, n, rows):
    pdf = pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "ts": [T0 + datetime.timedelta(minutes=r[1]) for r in rows],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
        f"{landing}/w{n}"
    )


def _run(spark, landing, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    deduped = dedup_stream(stream, keys=["k"], ts="ts", watermark="10 minutes")

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(str(out))

    q = (
        deduped.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dedup_within_horizon_and_reemit_after_expiry(spark, tmp_path):
    landing = tmp_path / "landing"
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    landing.mkdir()

    # wave 1: A twice (1 min apart) + B -> one A, one B survive
    _wave(spark, landing, 1, [("A", 0), ("A", 1), ("B", 2)])
    _run(spark, landing, ckpt, out)
    got = {
        (r.k, r.ts)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert sorted(k for k, _ in got) == ["A", "B"]

    # wave 2: A again at t=2 (state live: watermark after wave 1 is
    # ~2min - 10min < A's ts) -> dropped; C at t=60 advances the
    # watermark far past A's state
    _wave(spark, landing, 2, [("A", 2), ("C", 60)])
    _run(spark, landing, ckpt, out)
    counts = (
        spark.read.parquet(str(out)).groupBy("k").count().collect()
    )
    assert {r.k: r["count"] for r in counts} == {"A": 1, "B": 1, "C": 1}

    # wave 3: A at t=120 — its state expired (watermark ~50 min >
    # 1 min + 10 min), so this repeat is re-emitted
    _wave(spark, landing, 3, [("A", 120)])
    _run(spark, landing, ckpt, out)
    counts = (
        spark.read.parquet(str(out)).groupBy("k").count().collect()
    )
    assert {r.k: r["count"] for r in counts} == {"A": 2, "B": 1, "C": 1}
