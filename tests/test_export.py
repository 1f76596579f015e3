"""export_shards: the balanced deterministic training-data sink.

The property under test is the one a resumable 100 TB export needs:
shard assignment is a pure function of the row (hash of the shard key),
so re-running the export — with ANY incoming partitioning — produces
byte-identical shard membership.
"""

from __future__ import annotations

import json
import os

import pytest

from trx_spark.sources.sinks import export_shards
from trx_spark.tables import load_table


@pytest.fixture()
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _shard_membership(spark, path):
    df = spark.read.parquet(path)
    out: dict[int, list[int]] = {}
    for r in df.select("_shard", "doc_id").collect():
        out.setdefault(int(r["_shard"]), []).append(int(r["doc_id"]))
    return {k: sorted(v) for k, v in out.items()}


def test_manifest_counts_match_data(spark, docs, tmp_path):
    path = str(tmp_path / "export")
    manifest = export_shards(docs, path, shard_key=["doc_id"], n_shards=4)
    assert manifest["n_shards"] == 4
    assert manifest["total_rows"] == docs.count()
    assert sum(manifest["rows_per_shard"].values()) == manifest["total_rows"]
    # manifest is on disk next to the shards
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        assert json.load(f) == manifest
    # shards are reasonably balanced (hash of a dense key): no shard
    # holds more than 2x its fair share
    fair = manifest["total_rows"] / 4
    assert max(manifest["rows_per_shard"].values()) < 2 * fair


def test_shard_assignment_deterministic_under_repartition(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    m1 = export_shards(docs, p1, shard_key=["doc_id"], n_shards=5)
    m2 = export_shards(docs.repartition(13), p2, shard_key=["doc_id"], n_shards=5)
    assert m1["rows_per_shard"] == m2["rows_per_shard"]
    assert _shard_membership(spark, p1) == _shard_membership(spark, p2)


def test_roundtrip_preserves_rows(spark, docs, tmp_path):
    path = str(tmp_path / "export")
    export_shards(docs, path, shard_key=["doc_id"], n_shards=3)
    back = spark.read.parquet(path).drop("_shard")
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )


def test_auto_shard_count_from_bytes(spark, docs, tmp_path):
    path = str(tmp_path / "export")
    # tiny target forces the byte estimator through the multi-shard path
    manifest = export_shards(
        docs, path, shard_key=["doc_id"], target_file_mb=1, sample_rows=100
    )
    assert manifest["n_shards"] >= 1
    assert manifest["total_rows"] == docs.count()


def test_partitioned_store_read_is_partition_pruned(spark, sf_dir, tmp_path):
    """The day-partitioned store (save_per_delay layout) must serve a
    single-day query by scanning ONLY that day's partition — the
    PartitionFilters line in the scan, not a post-scan filter. At
    100 TB this is the difference between reading one day and reading
    the table."""
    from pyspark.sql import functions as F

    from trx_spark.sources.sinks import save_per_delay

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_id", "user_id", "value", "(ts_ns DIV 86400000000000) AS day"
    )
    out = str(tmp_path / "by_day")
    save_per_delay(ev, out, delay="day")

    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    if len(days) < 2:
        pytest.skip("events span a single day; pruning is unobservable")
    pick = days[len(days) // 2]
    rd = spark.read.parquet(out).filter(F.col("day") == pick)
    n = rd.count()
    assert n == ev.filter(F.col("day") == pick).count()

    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the day predicate must live in PartitionFilters (metadata-only),
    # and the scanned files must be the single day's directory
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    # the equality predicate on the picked day sits IN the partition
    # filter list — metadata-only pruning, no data-filter fallback
    assert "day" in pf_line and str(pick) in pf_line, pf_line
