"""Stream-stream interval join: batch-equivalence over one availableNow
replay, the half-open window boundary, and late-row dropping once the
checkpointed watermark has advanced (bounded join state)."""

from __future__ import annotations

import datetime

import pandas as pd

from trx_spark.streaming.joins import interval_stream_join

L_SCHEMA = "user string, imp_ts timestamp"
R_SCHEMA = "user string, click_ts timestamp"
T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _pdf(rows, ts_name):
    return pd.DataFrame(
        {
            "user": [r[0] for r in rows],
            ts_name: [T0 + datetime.timedelta(minutes=r[1]) for r in rows],
        }
    )


def _pairs(df):
    return sorted(
        (r["user"], r["imp_ts"].minute + r["imp_ts"].hour * 60,
         r["click_ts"].minute + r["click_ts"].hour * 60)
        for r in df.collect()
    )


def test_batch_semantics_half_open_window(spark):
    imps = spark.createDataFrame(
        _pdf([("u1", 0), ("u1", 30), ("u2", 5)], "imp_ts"), L_SCHEMA
    )
    clicks = spark.createDataFrame(
        _pdf([("u1", 4), ("u1", 10), ("u1", 31), ("u2", 15), ("u3", 2)], "click_ts"),
        R_SCHEMA,
    )
    out = interval_stream_join(
        imps, clicks, on="user", l_ts="imp_ts", r_ts="click_ts", window="10 minutes"
    )
    # u1@0 catches clicks at 4 (10 is EXCLUDED: half-open); u1@30 catches
    # 31; u2@5 catches 15? no — 15 >= 5+10 excluded; u3 has no impression
    assert _pairs(out) == [("u1", 0, 4), ("u1", 30, 31)]


def _run_stream(spark, l_dir, r_dir, ckpt, out_dir):
    l = spark.readStream.schema(L_SCHEMA).parquet(l_dir)
    r = spark.readStream.schema(R_SCHEMA).parquet(r_dir)
    joined = interval_stream_join(
        l, r, on="user", l_ts="imp_ts", r_ts="click_ts",
        window="10 minutes", watermark="20 minutes",
    )

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(out_dir)

    q = (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_equals_batch_then_drops_late(spark, tmp_path):
    l_dir, r_dir = str(tmp_path / "imps"), str(tmp_path / "clicks")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    wave_imps = [("u1", 100), ("u2", 100), ("u1", 160)]
    wave_clicks = [("u1", 105), ("u2", 109), ("u1", 165)]
    spark.createDataFrame(_pdf(wave_imps, "imp_ts"), L_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(l_dir)
    spark.createDataFrame(_pdf(wave_clicks, "click_ts"), R_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(r_dir)
    _run_stream(spark, l_dir, r_dir, ckpt, out)

    got = _pairs(spark.read.parquet(out))
    assert got == [("u1", 100, 105), ("u1", 160, 165), ("u2", 100, 109)]

    # wave 2: a click at minute 104 for u2@100 — VALID by time window,
    # but the watermark advanced to 165-20=145 after wave 1, so the
    # impression-side state for t=100 is gone and the late click joins
    # nothing (bounded state: this is the contract, not a bug)
    spark.createDataFrame(_pdf([("u2", 104)], "click_ts"), R_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(r_dir)
    _run_stream(spark, l_dir, r_dir, ckpt, out)
    assert _pairs(spark.read.parquet(out)) == got  # nothing new emitted
