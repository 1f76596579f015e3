"""Custom stateful operator (applyInPandasWithState): per-key running
stats must accumulate ACROSS micro-batches through the state store —
wave 2's output reflects wave 1's rows without re-reading them."""

from __future__ import annotations

import pandas as pd

from trx_spark.streaming.stateful import running_key_stats

SCHEMA = "k string, v double"


def _run_wave(spark, landing, ckpt, out_dir, batches_seen):
    """One availableNow pass; update rows land in parquet via
    foreachBatch (the memory sink cannot recover from a checkpoint).
    Returns only the rows of the NEW batches of this wave."""
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(str(out_dir))
        batches_seen.append(int(epoch_id))

    q = (
        running_key_stats(stream, key="k", value="v")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(str(out_dir)).toPandas()
    # update mode emits one row per (key, batch); the running value is
    # the one with the largest n per key
    return {
        r["k"]: (int(r["n"]), float(r["total"]), float(r["vmin"]), float(r["vmax"]))
        for _, r in out.sort_values("n").iterrows()
    }


def test_stateful_custom_key_name(spark, tmp_path):
    """Regression: the output column must carry the CONFIGURED key name
    (round-2 review: it was hardcoded to 'k')."""
    landing = tmp_path / "landing"
    landing.mkdir()
    pdf = pd.DataFrame({"event_type": ["x", "x", "y"], "v": [1.0, 2.0, 3.0]})
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
        str(landing / "w1")
    )
    stream = spark.readStream.schema("event_type string, v double").parquet(
        str(landing) + "/*"
    )
    out = tmp_path / "updates"

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(str(out))

    q = (
        running_key_stats(stream, key="event_type", value="v")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_type"]: (int(r["n"]), float(r["total"]))
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {"x": (2, 3.0), "y": (1, 3.0)}


def test_state_accumulates_across_batches(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "updates"
    batches = []

    wave1 = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 3.0, 10.0]})
    spark.createDataFrame(wave1).coalesce(1).write.mode("append").parquet(
        str(landing / "w1")
    )
    got1 = _run_wave(spark, str(landing) + "/*", ckpt, out, batches)
    assert got1["a"] == (2, 4.0, 1.0, 3.0)
    assert got1["b"] == (1, 10.0, 10.0, 10.0)

    wave2 = pd.DataFrame({"k": ["a", "c"], "v": [5.0, -2.0]})
    spark.createDataFrame(wave2).coalesce(1).write.mode("append").parquet(
        str(landing / "w2")
    )
    got2 = _run_wave(spark, str(landing) + "/*", ckpt, out, batches)
    assert len(batches) >= 2, "wave 2 must run as a separate micro-batch"
    # key 'a' carries wave-1 state through the state store: n=3 overall
    assert got2["a"] == (3, 9.0, 1.0, 5.0)
    assert got2["c"] == (1, -2.0, -2.0, -2.0)
    # key 'b' was untouched in wave 2 → its running stats are unchanged
    assert got2["b"] == (1, 10.0, 10.0, 10.0)


def test_stateful_nulls_and_bigint_key(spark, tmp_path):
    """NULL values are excluded from n/total/min/max (SQL count-non-null
    semantics), and a bigint key keeps its dtype in the output."""
    import pandas as pd

    landing = tmp_path / "landing"
    landing.mkdir()
    pdf = pd.DataFrame({"k": [7, 7, 7, 8], "v": [1.0, None, 3.0, None]})
    spark.createDataFrame(pdf, "k long, v double").coalesce(1).write.mode(
        "append"
    ).parquet(str(landing / "w1"))
    stream = spark.readStream.schema("k long, v double").parquet(
        str(landing) + "/*"
    )
    out = tmp_path / "updates"

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(str(out))

    q = (
        running_key_stats(stream, key="k", value="v")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(str(out))
    assert dict(back.dtypes)["k"] == "bigint"
    rows = {r["k"]: r for r in back.collect()}
    assert rows[7]["n"] == 2  # the NULL is NOT counted
    assert rows[7]["total"] == 4.0 and rows[7]["mean"] == 2.0
    assert rows[7]["vmin"] == 1.0 and rows[7]["vmax"] == 3.0
    # an all-null key emits its unchanged (empty) state, never NaN mins
    assert rows[8]["n"] == 0 and rows[8]["vmin"] is None
