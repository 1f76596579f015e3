"""JSONL/CSV interchange tests: lossless roundtrip, corrupt-line
quarantine, and a regression pin on the column-pruning parser trap
(sources/textio.py `_ingest_stats` note)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trx_spark.sources.textio import (
    _CORRUPT_CSV,
    _CORRUPT_JSONL,
    _CORRUPT_XML,
    _staged,
    read_csv,
    read_jsonl,
    read_orc,
    read_xml,
    write_csv,
    write_jsonl,
    write_orc,
    write_xml,
)
from trx_spark.tables import load_table


def _docs_rows(df):
    return sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    )


def test_jsonl_roundtrip_lossless(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, n_shards=3)
    # checkpoint: Spark refuses corrupt-column-only queries on raw files
    back = read_jsonl(spark, path).localCheckpoint()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    assert _docs_rows(back.drop("_corrupt_record")) == _docs_rows(docs)


def test_csv_roundtrip_lossless(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_csv")
    write_csv(docs, path, n_shards=3)
    back = read_csv(spark, path).localCheckpoint()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    assert _docs_rows(back.drop("_corrupt_record")) == _docs_rows(docs)


def test_xml_and_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    for fmt, writer, reader in (
        ("xml", write_xml, read_xml),
        ("orc", write_orc, read_orc),
    ):
        path = str(tmp_path / f"docs_{fmt}")
        writer(docs, path, n_shards=3)
        back = reader(spark, path).localCheckpoint()
        assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
        assert _docs_rows(back.drop("_corrupt_record")) == _docs_rows(docs)


def test_corrupt_lines_quarantined_not_dropped(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    for fmt, writer, reader, corrupt, fname in (
        ("jsonl", write_jsonl, read_jsonl, _CORRUPT_JSONL, "part-corrupt.txt"),
        ("csv", write_csv, read_csv, _CORRUPT_CSV, "part-corrupt.txt"),
        ("xml", write_xml, read_xml, _CORRUPT_XML, "part-corrupt.xml"),
    ):
        path = str(tmp_path / f"q_{fmt}")
        writer(docs, path, n_shards=2)
        with open(os.path.join(path, fname), "w") as fh:
            fh.write(corrupt)
        back = reader(spark, path).localCheckpoint()
        assert back.count() == n + 1
        bad = back.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert bad.first()["source"] is None


def test_column_pruning_parser_trap_is_pinned(spark, sf_dir):
    """Spark validates only the columns a query reads; the staged CSV's
    corrupt line is malformed in doc_id, so a projection WITHOUT doc_id
    sees zero corrupt rows while the full-row read sees one. The gate
    query references every column precisely because of this — if Spark
    ever changes the semantics, this pin fails and the note in
    _ingest_stats should be revisited."""
    path = _staged(spark, sf_dir, "csv")
    df = read_csv(spark, path)
    pruned = df.groupBy("source").agg(
        F.sum(F.col("_corrupt_record").isNotNull().cast("long")).alias("nc")
    )
    assert pruned.agg(F.sum("nc")).first()[0] == 0
    full = df.localCheckpoint()
    assert (
        full.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    )


def test_ingest_stats_quarantine_survives_downstream_pruning(spark, sf_dir):
    """Regression: a consumer that aggregates ONLY n_corrupt from the
    ingest stats (like ops_health_report) must still see the corrupt
    row — the checkpoint barrier inside the gate queries makes the
    quarantine projection-independent. Without it, Catalyst prunes
    doc_id out of the CSV/XML parse and the malformed line passes."""
    from trx_spark.sources.textio import (
        csv_ingest_stats,
        jsonl_ingest_stats,
        xml_ingest_stats,
    )

    for fn in (jsonl_ingest_stats, csv_ingest_stats, xml_ingest_stats):
        total = fn(spark, sf_dir).agg(F.sum("n_corrupt")).first()[0]
        assert total == 1, fn.__name__
