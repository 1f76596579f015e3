"""compression_ratio has no SQL oracle (real zlib); pin it against
direct zlib calls byte-for-byte, and its plan against scan-only
shape. Run from a vanilla perspective: the kernel must be
closure-self-contained (no repo imports on workers)."""

from __future__ import annotations

import zlib

import pyarrow.parquet as pq

from trx_spark.queries.corpus import _CR_LEVEL, _CR_LOW, compression_ratio


def test_matches_direct_zlib(spark, sf_dir):
    got = {
        r["doc_id"]: r
        for r in compression_ratio(spark, sf_dir).collect()
    }
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, _CR_LEVEL))
        row = got[doc_id]
        assert row["n_bytes"] == len(raw)
        assert row["n_compressed"] == comp
        if len(raw):
            ratio = comp / len(raw)
            assert row["compression_ratio"] == ratio
            assert row["flagged_low_entropy"] == (ratio < _CR_LOW)


def test_flags_repetitive_text(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cr")
    docs = [
        (1, "spam " * 500, "s", "en", 2500),  # templated -> compresses hard
        (2, "the quick brown fox jumps over the lazy dog and then "
            "wanders far away to see what lies beyond the green hill",
         "s", "en", 110),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    rows = {r["doc_id"]: r for r in compression_ratio(spark, str(d)).collect()}
    assert rows[1]["flagged_low_entropy"]
    assert not rows[2]["flagged_low_entropy"]
