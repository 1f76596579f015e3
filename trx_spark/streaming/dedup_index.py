"""Online near-duplicate detection: a streaming MinHash-LSH index.

The batch near-dup path (queries/textdata.py minhash_lsh_pairs) needs
the whole corpus; an INGEST pipeline wants the pairs as documents
arrive. Each micro-batch is MinHash-banded (the same 8-permutation /
4-band scheme as the batch query) and joined against the accumulated
band-key store — all previously-seen documents — and against itself,
emitting candidate pairs (doc_a < doc_b) incrementally; the batch's
band keys are then appended to the store.

Scale shape: the per-batch work is O(batch) banding + one equi-join on
(band, hx, hy) against the store (bucket-pruned by the join key — at
cluster scale the store is bucketed by band key so the join is
co-located); state is the band-key store itself (4 rows per doc),
checkpointed file tracking replaces any bookkeeping. Both writes are
epoch-partitioned with dynamic overwrite, so an at-least-once replay
of a batch rewrites its own partition instead of duplicating rows
(same idempotence contract as streaming/incremental.py).

Equivalence (pinned by tests/test_streaming_dedup_index.py): after the
backlog drains, the distinct emitted pair set EQUALS the batch LSH
pair set over the same documents (with no bucket cap; the cap is a
batch-side scale guard whose streaming twin is a per-key state bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def band_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, band, hx, hy) for each document — the same signature
    scheme as the batch query (textdata.minhash_signatures + banding),
    as a column-level transform usable inside foreachBatch."""
    from trx_spark.queries.textdata import _MINHASH_COEF, _P, _TOKEN_RE, _tok_hash

    toks = F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0)
    tids = F.transform(F.array_distinct(toks), _tok_hash)
    d = docs.filter(F.size(toks) > 0).withColumn("ids", tids)
    def affine(a, b):
        return lambda x: (F.lit(a) * x + F.lit(b)) % _P

    aggs = [
        F.array_min(F.transform(F.col("ids"), affine(a, b))).alias(f"mh{j}")
        for j, (a, b) in enumerate(_MINHASH_COEF)
    ]
    sig = d.select("doc_id", *aggs)
    return sig.selectExpr(
        "doc_id",
        "stack(4, 0, mh0, mh1, 1, mh2, mh3, 2, mh4, mh5, 3, mh6, mh7) AS (band, hx, hy)",
    )


def make_lsh_batch_handler(band_store: str, pairs_dir: str):
    """foreachBatch handler: band the batch, pair it against the store
    and itself, append pairs and band keys (both epoch-idempotent)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        new = band_keys(batch).localCheckpoint()
        on = ["band", "hx", "hy"]
        try:
            seen = spark.read.parquet(band_store).drop("_epoch")
        except Exception:
            seen = None
        a = new.alias("a")
        cross = (
            a.join(seen.alias("b"), on).filter(F.col("a.doc_id") != F.col("b.doc_id"))
            if seen is not None
            else None
        )
        within = new.alias("b2").join(a, on).filter(F.col("a.doc_id") < F.col("b2.doc_id"))
        pairs = within.select(
            F.col("a.doc_id").alias("doc_a"), F.col("b2.doc_id").alias("doc_b")
        )
        if cross is not None:
            pairs = pairs.unionByName(
                cross.select(
                    F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                    F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
                )
            )
        (
            pairs.distinct()
            .withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(pairs_dir)
        )
        (
            new.withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(band_store)
        )

    return handle


def run_lsh_dedup_catchup(
    spark: SparkSession,
    *,
    landing_dir: str,
    schema: StructType | str,
    band_store: str,
    pairs_dir: str,
    checkpoint_dir: str,
    path_glob_filter: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the landing dir (availableNow) through the streaming LSH
    index; returns the distinct accumulated pair set. Set
    ``max_files_per_trigger=1`` to force one micro-batch per file (the
    multi-wave arrival the equivalence test exercises)."""
    reader = spark.readStream.schema(schema)
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    q = (
        stream.writeStream.foreachBatch(make_lsh_batch_handler(band_store, pairs_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(pairs_dir).select("doc_a", "doc_b").distinct()
