"""ST1/ST2 incremental semantics (FIXTURES.md B8): dropping waves of
files and running availableNow catch-ups must equal a batch run over
all waves — the streaming checkpoint replaces the reference's
processed-files list (trx/azav.py:300-362)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from trx_spark.streaming.incremental import run_catchup

SCHEMA = "file string, delay double, q double, i double"


def _wave(tmp_path, wave_id, n_files=3):
    rng = np.random.default_rng(wave_id)
    frames = []
    for k in range(n_files):
        q = np.linspace(0.1, 1.0, 8)
        frames.append(
            pd.DataFrame(
                {
                    "file": f"w{wave_id}_f{k}",
                    "delay": float(rng.choice([-10.0, 1e-10, 1e-9])),
                    "q": q,
                    "i": np.round(rng.uniform(1, 10, 8), 3),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def _reduce(df):
    return df.groupBy("delay", "q").agg(
        F.avg("i").alias("i_mean"), F.count(F.lit(1)).alias("n")
    )


def test_incremental_equals_batch(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    reduced = str(tmp_path / "reduced")
    ckpt = str(tmp_path / "ckpt")

    all_waves = []
    for wave_id in range(3):
        pdf = _wave(tmp_path, wave_id)
        all_waves.append(pdf)
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            str(landing / f"wave{wave_id}")
        )
        run_catchup(
            spark,
            landing_dir=str(landing) + "/*",
            schema=SCHEMA,
            store_dir=store,
            checkpoint_dir=ckpt,
            reduce_fn=_reduce,
            reduced_dir=reduced,
        )
        # incremental result after wave N == batch over waves 0..N
        batch = _reduce(spark.createDataFrame(pd.concat(all_waves)))
        inc = spark.read.parquet(reduced)
        b = {(r["delay"], round(r["q"], 9)): (r["n"], round(r["i_mean"], 9)) for r in batch.collect()}
        i = {(r["delay"], round(r["q"], 9)): (r["n"], round(r["i_mean"], 9)) for r in inc.collect()}
        assert b == i, f"wave {wave_id}: incremental != batch"

    # re-running with no new files must be a no-op (P5 anti-join semantics)
    before = spark.read.parquet(store).count()
    run_catchup(
        spark,
        landing_dir=str(landing) + "/*",
        schema=SCHEMA,
        store_dir=store,
        checkpoint_dir=ckpt,
        reduce_fn=_reduce,
        reduced_dir=reduced,
    )
    assert spark.read.parquet(store).count() == before


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering the SAME epoch (the
    crash-replay case) must overwrite its partition, not append."""
    from trx_spark.streaming.incremental import make_batch_handler

    store = str(tmp_path / "store")
    reduced = str(tmp_path / "reduced")
    handler = make_batch_handler(store, reduce_fn=_reduce, reduced_dir=reduced)

    w0 = spark.createDataFrame(_wave(tmp_path, 0))
    w1 = spark.createDataFrame(_wave(tmp_path, 1))
    handler(w0, 0)
    handler(w1, 1)
    before = spark.read.parquet(store).count()
    handler(w1, 1)  # replay of epoch 1 after a simulated crash
    assert spark.read.parquet(store).count() == before
    inc = spark.read.parquet(reduced)
    batch = _reduce(w0.unionByName(w1))
    b = {(r["delay"], round(r["q"], 9)): (r["n"], round(r["i_mean"], 9)) for r in batch.collect()}
    i = {(r["delay"], round(r["q"], 9)): (r["n"], round(r["i_mean"], 9)) for r in inc.collect()}
    assert b == i, "replayed store must reduce to the batch result"


def test_ts_prepare_handles_both_parquet_layouts(spark, tmp_path):
    """The streaming gate queries' layout shim (streamingq._make_ts_prepare)
    must produce the same ts_t for a TIMESTAMP_NTZ file and a
    TIMESTAMP(NANOS)-as-bigint file of the same instants."""
    import pandas as pd

    from trx_spark.queries.streamingq import _make_ts_prepare

    micros = [1_700_000_000_000_000 + k * 1_000_000 for k in range(5)]
    # bigint-nanos layout
    spark.createDataFrame(
        pd.DataFrame({"event_id": range(5), "ts": [m * 1000 for m in micros]})
    ).write.mode("overwrite").parquet(str(tmp_path / "long"))
    # timestamp layout
    spark.createDataFrame(
        pd.DataFrame(
            {"event_id": range(5), "ts": pd.to_datetime(micros, unit="us")}
        )
    ).write.mode("overwrite").parquet(str(tmp_path / "tstamp"))

    outs = []
    for sub in ("long", "tstamp"):
        df = spark.read.parquet(str(tmp_path / sub))
        prepared = _make_ts_prepare(df.schema)(df)
        outs.append(
            {r["event_id"]: r["ts_t"] for r in prepared.select("event_id", "ts_t").collect()}
        )
    assert outs[0] == outs[1]
    assert len(outs[0]) == 5
