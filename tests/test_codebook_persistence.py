"""The production quantizer workflow: train the codebook ONCE, persist
it with a config hash (F7 store), then encode later ingest batches by
loading the stored codebook — training cost is per-corpus, not
per-batch. Encoding a batch with the reloaded codebook must equal
encoding with the in-memory one (the parquet round-trip preserves the
centroid doubles bit-exactly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trx_spark.operators.kmeans import argmax_cell, lloyd_centroids, score_cells
from trx_spark.sources.sinks import is_result_current, load_result, save_with_config
from trx_spark.tables import load_table

_CFG = {"quantizer": "ivf", "k": 8, "updates": 1}


def _assignments(emb, cents):
    return {
        r["vec_id"]: (r["cid"], r["dot"])
        for r in argmax_cell(score_cells(emb, cents)).collect()
    }


def test_train_persist_reload_encode(spark, sf_dir, tmp_path):
    store = str(tmp_path / "codebook")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = lloyd_centroids(emb, k=_CFG["k"], updates=_CFG["updates"])

    save_with_config(cents, store, _CFG)
    assert is_result_current(store, _CFG)
    assert not is_result_current(store, {**_CFG, "k": 16})  # stale on change

    reloaded = load_result(spark, store)
    # a "later ingest batch": different ids, same vector space
    batch = emb.limit(100).withColumn("vec_id", F.col("vec_id") + 10_000)
    assert _assignments(batch, reloaded) == _assignments(batch, cents)
