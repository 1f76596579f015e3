"""Incremental training-set manifest ≡ rollup of the accumulated
first-seen-wins verdicts, across waves, replays, and compaction. The
reference rollup is computed from the SAME first-seen reference the
curation tests pin (quality ∧ exact-first ∧ no earlier band match),
so the two streaming layers cannot drift apart."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from test_streaming_curation import _SCHEMA, _docs, _reference
from trx_spark.queries.curation import _BPE_RE
from trx_spark.queries.packing import _N_PACK_SHARDS, _SEQ_BUDGET
from trx_spark.streaming.matview import (
    compact_manifest_view,
    merged_manifest,
    run_manifest_catchup,
)


def _expected_manifest(spark, waves):
    """Shard rollup over the docs the first-seen reference keeps."""
    keep = {d for d, v in _reference(spark, waves).items() if v[3]}
    rows = [r for w in waves for r in w if r[0] in keep]
    if not rows:
        return {}
    df = spark.createDataFrame(
        [(d, t, s, l, len(t)) for d, t, s, l in rows], _SCHEMA
    )
    toks = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
            ).alias("n"),
        ).collect()
    }
    out: dict[int, list[int]] = {}
    for d in keep:
        s = d % _N_PACK_SHARDS
        agg = out.setdefault(s, [0, 0])
        agg[0] += 1
        agg[1] += toks[d]
    return {
        s: (n, t, math.ceil(t / _SEQ_BUDGET)) for s, (n, t) in out.items()
    }


def _land(spark, landing, waves):
    for i, w in enumerate(waves):
        spark.createDataFrame(
            [(d, t, s, l, len(t)) for d, t, s, l in w], _SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"wave{i}")
        )


def _kw(tmp_path, landing):
    return dict(
        landing_dir=str(landing / "wave*"),
        schema=_SCHEMA,
        hash_store=str(tmp_path / "hashes"),
        band_store=str(tmp_path / "bands"),
        verdict_dir=str(tmp_path / "verdicts"),
        manifest_dir=str(tmp_path / "manifest"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )


def _as_map(df):
    return {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["n_seqs"])
        for r in df.collect()
    }


def test_manifest_multiwave_equals_reference_rollup(spark, tmp_path):
    waves = _docs()
    landing = tmp_path / "landing"
    landing.mkdir()
    _land(spark, landing, waves[:2])
    got1 = _as_map(run_manifest_catchup(spark, **_kw(tmp_path, landing)))
    assert got1 == _expected_manifest(spark, waves[:2])
    # wave 3 lands later: the manifest ACCUMULATES (verdicts are final,
    # partials merge) and still equals the reference over all waves
    _land(spark, landing, waves)
    got2 = _as_map(run_manifest_catchup(spark, **_kw(tmp_path, landing)))
    assert got2 == _expected_manifest(spark, waves)
    # the fixture exercises both outcomes: something accrued in wave 3
    assert sum(n for n, _, _ in got2.values()) > sum(
        n for n, _, _ in got1.values()
    )


def test_manifest_replay_is_idempotent(spark, tmp_path):
    """Re-draining the same landing through a FRESH checkpoint replays
    every epoch; the epoch-partitioned dynamic overwrites must leave
    the merged manifest unchanged (the at-least-once contract)."""
    import shutil

    waves = _docs()
    landing = tmp_path / "landing"
    landing.mkdir()
    _land(spark, landing, waves)
    kw = _kw(tmp_path, landing)
    first = _as_map(run_manifest_catchup(spark, **kw))
    shutil.rmtree(kw["checkpoint_dir"])  # lose the offsets → full replay
    again = _as_map(run_manifest_catchup(spark, **kw))
    assert again == first == _expected_manifest(spark, waves)


def test_manifest_compaction_preserves_view_and_continues(spark, tmp_path):
    waves = _docs()
    landing = tmp_path / "landing"
    landing.mkdir()
    _land(spark, landing, waves[:2])
    kw = _kw(tmp_path, landing)
    before = _as_map(run_manifest_catchup(spark, **kw))
    compact_manifest_view(spark, kw["manifest_dir"])
    assert _as_map(merged_manifest(spark, kw["manifest_dir"])) == before
    # folded store keeps accumulating when the stream continues
    _land(spark, landing, waves)
    after = _as_map(run_manifest_catchup(spark, **kw))
    assert after == _expected_manifest(spark, waves)
