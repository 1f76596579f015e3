"""Multimodal plumbing: binary asset manifest, mapInPandas decode stub
(deterministic fake), frame-sample schedule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trx_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    read_binary_assets,
)


@pytest.fixture()
def assets(spark, tmp_path):
    for k in range(2):
        (tmp_path / f"img_{k}.bin").write_bytes(bytes([k]) * 64)
    return read_binary_assets(spark, str(tmp_path / "*.bin"), "image")


def test_manifest(assets):
    rows = assets.collect()
    assert len(rows) == 2
    assert all(r["modality"] == "image" and r["n_bytes"] == 64 for r in rows)
    assert len({r["content_sha256"] for r in rows}) == 2


def test_decode_fake_is_deterministic(assets):
    px = decode_image(assets, shape=(8, 8))
    agg = px.groupBy("file").agg(
        F.count(F.lit(1)).alias("n"), F.sum("intensity").alias("s")
    )
    rows1 = {r["file"]: (r["n"], r["s"]) for r in agg.collect()}
    rows2 = {r["file"]: (r["n"], r["s"]) for r in agg.collect()}
    assert rows1 == rows2  # content-hash seeded → stable
    assert all(n == 64 for n, _ in rows1.values())  # 1 file → H·W rows


def test_decode_real_codec_raises(assets):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_image(assets, shape=(4, 4), real_codec=True).collect()


def test_frame_sample_schedule(assets):
    rows = frame_sample(assets, every_n=5, max_frames=4).collect()
    per_file = {}
    for r in rows:
        per_file.setdefault(r["file"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 5, 10, 15] for v in per_file.values())
