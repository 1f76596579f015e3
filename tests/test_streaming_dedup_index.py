"""Online LSH dedup index: pairs found incrementally across waves equal
the batch LSH pair set over the same corpus (the streaming/batch
equivalence the module docstring pins)."""

from __future__ import annotations

from trx_spark.streaming.dedup_index import run_lsh_dedup_catchup
from trx_spark.tables import load_table


def _batch_pairs_uncapped(spark, docs):
    # reference implementation: the batch banding self-join with no cap
    from pyspark.sql import functions as F

    from trx_spark.streaming.dedup_index import band_keys

    b = band_keys(docs).localCheckpoint()
    a = b.alias("a")
    c = b.alias("c")
    return {
        (r["doc_a"], r["doc_b"])
        for r in (
            a.join(c, ["band", "hx", "hy"])
            .filter(F.col("a.doc_id") < F.col("c.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b"))
            .distinct()
            .collect()
        )
    }


def test_streaming_lsh_pairs_equal_batch(spark, sf_dir, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # two arrival waves -> two micro-batches (maxFilesPerTrigger=1);
    # plain files (not directories) so the file source discovers them
    waves = tmp_path / "landing"
    waves.mkdir()
    for k, pred in enumerate(("doc_id % 2 = 0", "doc_id % 2 = 1")):
        pdf = docs.filter(pred).toPandas()
        pq.write_table(pa.Table.from_pandas(pdf), waves / f"w{k}.parquet")
    got = run_lsh_dedup_catchup(
        spark,
        landing_dir=str(waves),
        schema=docs.schema,
        band_store=str(tmp_path / "bands"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        path_glob_filter="*.parquet",
        max_files_per_trigger=1,
    )
    streaming_pairs = {(r["doc_a"], r["doc_b"]) for r in got.collect()}
    assert streaming_pairs == _batch_pairs_uncapped(spark, docs)
    assert len(streaming_pairs) > 0
