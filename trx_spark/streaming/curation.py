"""Online corpus curation: first-seen-wins keep verdicts as documents
arrive (the streaming twin of queries/corpus.corpus_keep_list).

Batch curation sees the whole corpus and picks cluster canonicals;
an INGEST pipeline must decide per document as it lands. The standard
online semantics is FIRST-SEEN-WINS: a document is kept iff

  quality          — the Gopher-style signal gate (map-side, stateless)
∧ exact-first      — its exact text hash was never seen before
                     (nor on a smaller doc_id in the same micro-batch)
∧ no near-dup      — none of its MinHash band keys match any
                     previously seen document (nor a smaller-id doc in
                     the same batch) — same banding as the batch LSH

Scale shape mirrors streaming/dedup_index.py exactly:
* both stores (exact hashes, band keys) are hash-bucket partitioned
  and each batch reads only its touched buckets (partition pruning);
* the hash store holds ONE row per distinct text hash (only first-seen
  hashes are appended), so exact-dup floods — 10k copies of one
  boilerplate page — cost one stored row, not 10k;
* the batch side is broadcast into every store join — the accumulated
  state never shuffles;
* per-band-key state is bounded by the same cap (a saturated key stops
  matching AND stops growing: drop-and-log, the batch bucket-cap
  semantics) so a boilerplate-heavy stream degrades gracefully;
* all writes are epoch-partitioned with dynamic overwrite —
  at-least-once replays rewrite their own partition (idempotent);
* each store append is gated on that store's OWN compaction watermark
  (stores fold independently — a replay after a single-store
  compaction re-runs only the missing leg, never the folded one).

Equivalence: tests/test_streaming_curation.py drains doc_id-ordered
waves one micro-batch each and pins the verdict set against a pure-
Python first-seen-wins reference implementing the identical rules;
the gate query ``streaming_curation_keep`` (queries/streamingq.py)
additionally pins a single replay against the SQL form of the rules
under the driver's DuckDB oracle.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from trx_spark.streaming.dedup_index import (
    _STORE_PARTITIONS,
    _STREAM_KEY_CAP,
    _read_band_store,
    band_keys,
    band_z_cell,
    drop_saturated_keys,
    zc_probe,
)


def make_curation_batch_handler(
    hash_store: str,
    band_store: str,
    verdict_dir: str,
    *,
    key_cap: int = _STREAM_KEY_CAP,
    store_partitions: int = _STORE_PARTITIONS,
):
    """foreachBatch handler producing (doc_id, quality_keep,
    exact_first, near_dup, keep) per document, appending the FIRST-SEEN
    exact hashes and the band keys of every non-saturated document."""

    on = ["band", "hx", "hy"]
    kb = F.pmod(F.xxhash64("band", "hx", "hy"), F.lit(store_partitions))
    hb = F.pmod(F.xxhash64("h"), F.lit(store_partitions))

    def handle(batch: DataFrame, epoch_id: int) -> None:
        from trx_spark.queries.corpus import quality_signals
        from trx_spark.sources.sinks import compacted_through

        e = int(epoch_id)
        # Per-store replay gates: each store folds (compacts)
        # independently, so each append is gated on ITS OWN
        # _compacted_through watermark. A crash between the two appends
        # followed by compacting only the hash store used to advance a
        # shared max() watermark past the epoch and skip the replay
        # outright — permanently losing the epoch's band keys from the
        # near-dup index. Now the replay still runs the band leg and
        # appends the missing band rows.
        do_hash = e > compacted_through(hash_store)
        do_band = e > compacted_through(band_store)
        if not do_hash and not do_band:
            # fully folded into both stores: verdicts and state rows
            # are all in place; re-running would double-count the
            # epoch's own rows into the saturation totals
            return
        # The verdict is written BEFORE either append, so if either
        # store already folded this epoch the verdict partition exists
        # — and recomputing it would be wrong anyway: the folded rows
        # sit at _epoch=-1 where the own-epoch exclusion filter cannot
        # see them, so a replayed leg would read the epoch's own state
        # as "previously seen".
        do_verdict = do_hash and do_band
        spark = batch.sparkSession
        docs = batch.localCheckpoint()

        # ---- exact-dup leg (first occurrence of the text hash wins)
        def _hash_leg():
            # ONE pass fuses the former hash-materialize +
            # first-in-batch jobs: groupBy(h) keeps exactly the distinct
            # hash set, so the touched-bucket probe (= buckets of the
            # batch's distinct hashes) and the anti-join candidates both
            # read this one checkpoint (guide §2.1 — same rows, same
            # store gating, one fewer full-batch materialization).
            cand = (
                docs.select(
                    "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
                )
                .groupBy("h")
                .agg(F.min("doc_id").alias("doc_id"))
                .select("doc_id", "h")
                .withColumn("_hb", hb)
                .localCheckpoint()
            )
            touched_hb = [
                r["_hb"] for r in cand.select("_hb").distinct().collect()
            ]
            hstore = _read_band_store(spark, hash_store)
            prev_h = (
                hstore.filter(
                    F.col("_hb").isin(touched_hb) & (F.col("_epoch") != e)
                ).select("h").distinct()
                if hstore is not None
                else None
            )
            if prev_h is None:
                return cand
            # checkpointed: feeds BOTH the verdict flag and the store append
            return cand.join(prev_h, "h", "left_anti").localCheckpoint()

        # ---- near-dup leg (same band scheme + key cap as dedup_index)
        def _band_leg():
            new = (
                band_keys(docs)
                .withColumn("_kb", kb)
                .withColumn("_zc", band_z_cell())
                .localCheckpoint()
            )
            trows = new.select("_kb", "_zc").distinct().collect()
            touched_kb = sorted({r["_kb"] for r in trows})
            touched_zc = sorted({r["_zc"] for r in trows})
            bstore = _read_band_store(spark, band_store)
            seen = (
                zc_probe(
                    bstore.filter(
                        F.col("_kb").isin(touched_kb) & (F.col("_epoch") != e)
                    ),
                    touched_zc,
                ).drop("_epoch", "_kb", "_zc")
                if bstore is not None
                else None
            )
            ok = drop_saturated_keys(
                new, seen, on=on, key_cap=key_cap, epoch_id=epoch_id,
                what="curation",
            )
            return ok, seen

        # The two legs are independent until the verdict joins their
        # results, so overlap them (guide §2.6): each leg's jobs
        # back-fill executor slots the other leg's tail leaves idle.
        # Frames, gating and writes are exactly the sequential ones —
        # only the submission order changed.
        first_new = None
        ok = None
        seen = None
        if do_hash and do_band:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_hash = pool.submit(_hash_leg)
                f_band = pool.submit(_band_leg)
                first_new = f_hash.result()
                ok, seen = f_band.result()
        elif do_hash:
            first_new = _hash_leg()
        elif do_band:
            ok, seen = _band_leg()

        if do_verdict:
            q = quality_signals(docs).select(
                "doc_id", F.col("keep").alias("quality_keep")
            )
            exact_first = first_new.select(
                "doc_id", F.lit(True).alias("exact_first")
            )
            near_prev = (
                F.broadcast(ok.alias("n"))
                .join(seen.alias("s"), on)
                .select(F.col("n.doc_id").alias("doc_id"))
                .distinct()
                if seen is not None
                else None
            )
            a = ok.alias("a")
            near_in_batch = (
                F.broadcast(ok.alias("b")).join(a, on)
                .filter(F.col("b.doc_id") < F.col("a.doc_id"))
                .select(F.col("a.doc_id").alias("doc_id"))
                .distinct()
            )
            near = near_in_batch
            if near_prev is not None:
                near = near.unionByName(near_prev).distinct()
            near = near.select("doc_id", F.lit(True).alias("near_dup"))

            verdict = (
                docs.select("doc_id")
                .join(q, "doc_id", "left")
                .join(exact_first, "doc_id", "left")
                .join(near, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("quality_keep", F.lit(False)).alias("quality_keep"),
                    F.coalesce("exact_first", F.lit(False)).alias("exact_first"),
                    F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
                )
                .withColumn(
                    "keep",
                    F.col("quality_keep") & F.col("exact_first") & ~F.col("near_dup"),
                )
            )
            (
                verdict.withColumn("_epoch", F.lit(e))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_epoch")
                .parquet(verdict_dir)
            )
        # state appends: FIRST-SEEN hashes only (one stored row per
        # distinct hash is sufficient for the first-seen-wins anti-join
        # and bounds the store by distinct-hash count — appending every
        # doc's hash would grow per-hash state linearly with duplicate
        # volume, the exact flood the band-key cap guards against);
        # every non-saturated band row.  The two appends target
        # DIFFERENT stores with independent watermarks, so they too
        # overlap (§2.6) — the verdict write above stays strictly
        # first, preserving the crash-replay ordering invariant.
        def _append_hashes():
            (
                first_new.withColumn("_epoch", F.lit(e))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_epoch", "_hb")
                .parquet(hash_store)
            )

        def _append_bands():
            (
                ok.withColumn("_epoch", F.lit(e))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_epoch", "_kb")
                .parquet(band_store)
            )

        if do_hash and do_band:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                fh = pool.submit(_append_hashes)
                fb = pool.submit(_append_bands)
                fh.result()
                fb.result()
        elif do_hash:
            _append_hashes()
        elif do_band:
            _append_bands()

    return handle


def run_curation_catchup(
    spark: SparkSession,
    *,
    landing_dir: str,
    schema: StructType | str,
    hash_store: str,
    band_store: str,
    verdict_dir: str,
    checkpoint_dir: str,
    path_glob_filter: str | None = None,
    max_files_per_trigger: int | None = None,
    key_cap: int = _STREAM_KEY_CAP,
) -> DataFrame:
    """Drain the landing dir (availableNow) through the curation
    handler; returns the accumulated per-doc verdicts."""
    reader = spark.readStream.schema(schema)
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    from trx_spark.streaming.tuning import replay_state_width

    # replay width: right-sizes the handlers' store writes (tuning.py)
    with replay_state_width(spark):
        q = (
            stream.writeStream.foreachBatch(
                make_curation_batch_handler(
                    hash_store, band_store, verdict_dir, key_cap=key_cap
                )
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from trx_spark.streaming.incremental import release_state_stores

    release_state_stores(spark)
    try:
        return spark.read.parquet(verdict_dir).select(
            "doc_id", "quality_keep", "exact_first", "near_dup", "keep"
        )
    except AnalysisException as exc:
        msg = str(exc)
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            # nothing ever landed (empty glob / pre-arrival catch-up):
            # an explicitly-typed empty verdict set, like
            # run_lsh_dedup_catchup's empty-pairs guard
            return spark.createDataFrame(
                [],
                "doc_id BIGINT, quality_keep BOOLEAN, exact_first BOOLEAN, "
                "near_dup BOOLEAN, keep BOOLEAN",
            )
        raise
