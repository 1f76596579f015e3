"""Capstone: the complete training-data-curation journey on this
engine — documents arriving in waves → streaming incremental ingest
(file-source checkpoint) → composed quality filter → exact dedup →
balanced shard export with manifest. Planted truth at every stage: a
too-short doc, a repetitive doc, a non-English doc, and a cross-wave
exact duplicate."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from trx_spark.queries.corpus import quality_signals
from trx_spark.sources.sinks import export_shards
from trx_spark.streaming.incremental import run_catchup

_GOOD = (
    "the fast key order sort table scan merge part window small hash "
    "scan join order batch group stream spark window merge the value "
    "data query plan index column vector batch probe build side left "
) * 2  # ~150 tokens, english markers, diverse

_SCHEMA = "doc_id long, text string"


def _write_wave(spark, path, rows):
    spark.createDataFrame(pd.DataFrame(rows), _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_waves_to_sharded_clean_corpus(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "export")

    wave1 = [
        {"doc_id": 1, "text": _GOOD + "alpha beta gamma delta"},
        {"doc_id": 2, "text": _GOOD + "epsilon zeta eta theta"},
        {"doc_id": 3, "text": "too short"},  # reject: bit 1
        {"doc_id": 4, "text": "spam " * 60},  # reject: repetitive/diversity
        {"doc_id": 5, "text": "der die und das " * 40},  # reject: non-english
    ]
    _write_wave(spark, landing, wave1)
    run_catchup(
        spark, landing_dir=landing, schema=_SCHEMA, store_dir=store,
        checkpoint_dir=ckpt,
    )

    wave2 = [
        {"doc_id": 6, "text": _GOOD + "iota kappa lambda mu"},
        {"doc_id": 7, "text": _GOOD + "alpha beta gamma delta"},  # dup of 1
    ]
    _write_wave(spark, landing, wave2)
    run_catchup(
        spark, landing_dir=landing, schema=_SCHEMA, store_dir=store,
        checkpoint_dir=ckpt,
    )

    # the checkpoint processed each wave exactly once
    docs = spark.read.parquet(store).select("doc_id", "text")
    assert docs.count() == 7

    # --- quality filter ---
    sig = quality_signals(docs)
    verdicts = {r["doc_id"]: r for r in sig.collect()}
    assert verdicts[1]["keep"] and verdicts[2]["keep"] and verdicts[6]["keep"]
    assert verdicts[3]["reject_reasons"] & 1  # too short
    assert not verdicts[4]["keep"]  # repetitive spam
    assert verdicts[5]["reject_reasons"] & 16  # non-english
    kept = docs.join(
        sig.where("keep").select("doc_id"), "doc_id", "left_semi"
    )

    # --- exact dedup: keep the smallest doc_id per content hash ---
    keeper = (
        kept.withColumn("h", F.md5(F.col("text").cast("binary")))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    clean = kept.join(keeper.select("doc_id"), "doc_id", "left_semi")
    clean_ids = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert clean_ids == [1, 2, 6]  # 7 deduped away as a copy of 1

    # --- balanced deterministic export ---
    manifest = export_shards(clean, out, shard_key=["doc_id"], n_shards=2)
    assert manifest["total_rows"] == 3
    back = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in back.collect()) == [1, 2, 6]


def test_assembly_tail_planted_truths(spark, tmp_path):
    """The training-set assembly tail (scrub → pack → chunk → shuffle)
    driven through the REAL query entry points on a planted mini
    corpus: token counts are engineered so every sequence span, chunk
    schedule, and redaction count is known in closed form."""
    from trx_spark.queries.packing import (
        _CHUNK_STRIDE,
        _N_EPOCHS,
        _SEQ_BUDGET,
        QUERIES as PQ,
    )

    sfdir = str(tmp_path / "sf")
    # doc_ids 0, 8, 16 share pack shard 0 (mod 8); doc 9 lands alone.
    # Token counts 100/200/300/50 give a closed-form packing schedule.
    rows = [
        {"doc_id": 0, "text": " ".join(["tok"] * 100)},
        {"doc_id": 8, "text": " ".join(["tok"] * 200)},
        {"doc_id": 16, "text": " ".join(["tok"] * 300)},
        {"doc_id": 9, "text": " ".join(["tok"] * 50)},
    ]
    spark.createDataFrame(pd.DataFrame(rows), _SCHEMA).write.parquet(
        sfdir + "/documents.parquet"
    )

    # --- PII scrub: counts follow the doc_id synthesis arithmetic ---
    scrub = {r["doc_id"]: r for r in PQ["pii_scrub"](spark, sfdir).collect()}
    assert scrub[0]["n_emails"] == 0 and scrub[0]["n_phones"] == 0
    assert scrub[8]["n_emails"] == 2 and scrub[8]["n_phones"] == 0
    assert scrub[16]["n_emails"] == 1 and scrub[16]["n_phones"] == 0
    assert scrub[9]["n_emails"] == 0 and scrub[9]["n_phones"] == 1
    # redaction happened: the scrubbed text carries no raw address
    assert all(r["clean_len"] > 0 for r in scrub.values())

    # --- packing: cumsum within shard 0 is 100, 300, 600 ---
    assert _SEQ_BUDGET == 256  # the closed-form schedule below assumes it
    pack = {r["doc_id"]: r for r in PQ["pack_sequences"](spark, sfdir).collect()}
    assert (pack[0]["seq_id"], pack[0]["n_seqs_spanned"]) == (0, 1)
    assert (pack[8]["seq_id"], pack[8]["n_seqs_spanned"]) == (0, 2)  # 100→299
    assert (pack[16]["seq_id"], pack[16]["n_seqs_spanned"]) == (1, 2)  # 300→599
    assert pack[16]["seq_offset"] == 300 - 256
    assert (pack[9]["seq_id"], pack[9]["seq_offset"]) == (0, 0)  # own shard

    # --- chunking: stride schedule over the 100-token doc ---
    chunks = sorted(
        (r["start_tok"], r["chunk_len"])
        for r in PQ["doc_chunks"](spark, sfdir).where("doc_id = 0").collect()
    )
    starts = list(range(0, 100, _CHUNK_STRIDE))
    assert [s for s, _ in chunks] == starts
    assert chunks[-1][1] == 100 - starts[-1]  # tail chunk is the remainder

    # --- epoch shuffle: per-epoch permutation of the full corpus ---
    shuf = PQ["epoch_shuffle"](spark, sfdir).collect()
    assert len(shuf) == 4 * _N_EPOCHS
    for ep in range(_N_EPOCHS):
        ids = sorted(r["doc_id"] for r in shuf if r["epoch"] == ep)
        assert ids == [0, 8, 9, 16]  # a permutation: every doc exactly once
    # ranks are contiguous from 1 within every (epoch, shard)
    from collections import defaultdict

    by_part = defaultdict(list)
    for r in shuf:
        by_part[(r["epoch"], r["shard"])].append(r["pos"])
    for poss in by_part.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_cms_one_sided_error(spark, sf_dir):
    """Count-min guarantee: the sketch never underestimates (every
    cell count includes all of the token's own occurrences)."""
    from trx_spark.queries.curation import cms_heavy_hitters

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_estimate"] >= r["true_count"] for r in rows)


def test_normalize_text_canonicalizes(spark):
    from trx_spark.queries.curation import normalize_text_col

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["  Hello\t\tWorld\n\nfoo\x00bar  ", "hello world foobar"],
        }
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", normalize_text_col(F.col("text")).alias("n")
        ).collect()
    }
    # control char stripped, whitespace collapsed, case folded:
    # both documents reach the same canonical form → dedup hashes equal
    assert out[1] == out[2] == "hello world foobar"
