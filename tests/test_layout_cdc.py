"""Properties of the round-7 layout/chunking pair.

- cdc_chunks: the LBFS anchoring property — boundaries depend only on
  the last _CDC_W tokens, so prepending text to a document preserves
  every chunk after the first cut (fixed-stride chunking, by contrast,
  shifts ALL of them). This is the whole reason CDC exists.
- zorder: the bucket tiling guarantee — with an 8-bit grid and a
  2^10-key bucket, every file bucket is a 32×32 rectangle in
  (user, time) space, so BOTH dimensions carry narrow min/max spans
  (the data-skipping contract a 1-D sort cannot give).
"""

from __future__ import annotations

from trx_spark.queries.layout import zorder_skipping_stats
from trx_spark.queries.packing import cdc_chunks


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _words(n, seed=1):
    vocab = [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
    ]
    out, s = [], seed
    for _ in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        out.append(vocab[s % len(vocab)])
    return out


def test_cdc_chunks_survive_prefix_insertion(spark, tmp_path):
    body = " ".join(_words(200))
    edited = "inserted new tokens here " + body
    _write_docs(
        spark,
        str(tmp_path),
        [
            (1, body, "s", "en", len(body)),
            (2, edited, "s", "en", len(edited)),
        ],
    )
    rows = cdc_chunks(spark, str(tmp_path)).collect()
    a = sorted(
        ((r["chunk_idx"], r["chunk_hash"]) for r in rows if r["doc_id"] == 1)
    )
    b_hashes = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    assert len(a) >= 3, "fixture must produce several chunks"
    # every chunk after the first cut is anchored: identical content,
    # identical hash, despite the shifted positions
    tail = [h for i, h in a if i >= 1]
    assert tail and all(h in b_hashes for h in tail)


def test_cdc_chunks_partition_tokens_exactly(spark, sf_dir):
    """Chunks tile each document: contiguous starts, lengths sum to the
    token count, no gaps or overlaps."""
    rows = cdc_chunks(spark, sf_dir).collect()
    by_doc = {}
    by_doc_setdefault = by_doc.setdefault
    for r in rows:
        by_doc_setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
        pos = 0
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["start_tok"] == pos
            assert c["n_tokens"] >= 1
            pos += c["n_tokens"]


def test_zorder_scan_savings_dominate(spark, sf_dir):
    """Both layouts return the same matching rows, and the Z-order
    layout never reads more than the time-sorted one under the
    rectangle predicate (on this data it reads strictly less)."""
    from trx_spark.queries.layout import layout_scan_savings

    rows = {r["layout"]: r for r in layout_scan_savings(spark, sf_dir).collect()}
    z, t = rows["zorder"], rows["time_sorted"]
    assert z["rows_matching"] == t["rows_matching"]
    assert z["rows_scanned"] >= z["rows_matching"]
    assert z["rows_scanned"] <= t["rows_scanned"]
    assert z["files_scanned"] <= t["files_scanned"]


def test_length_bucketing_dominates_shuffled(spark, sf_dir):
    """Both strategies batch the same corpus (equal real_tokens and
    batch counts); length bucketing never pads more than hash-shuffled
    order (on this data it pads strictly less)."""
    from trx_spark.queries.packing import padding_waste_audit

    rows = {r["strategy"]: r for r in padding_waste_audit(spark, sf_dir).collect()}
    s, b = rows["shuffled"], rows["length_bucketed"]
    assert s["real_tokens"] == b["real_tokens"]
    assert s["n_batches"] == b["n_batches"]
    assert b["padded_tokens"] <= s["padded_tokens"]
    assert b["padded_tokens"] >= b["real_tokens"]


def test_zorder_buckets_are_bounded_tiles(spark, sf_dir):
    stats = zorder_skipping_stats(spark, sf_dir).collect()
    assert len(stats) > 1
    # 2^10 z-keys per bucket = a 32x32 (xq, yq) tile: both dimensions'
    # per-file spans are bounded by 32 grid cells out of 256
    for r in stats:
        assert 1 <= r["x_span"] <= 32, r
        assert 1 <= r["y_span"] <= 32, r
