"""Capstone for the migration façade (r9-verdict task 5): the full
reference-user journey on REAL detector files — a mixed folder (plain
EDF, gzip-wrapped EDF, a multi-frame EDF stack, plus a non-image junk
file the reference glob never touches) → ``compat.doFolder`` with a
``poni=`` dict and the one-image detector-shape probe (azav, E1) →
``compat.doFolder_dataRed`` (datared, E2) → ``compat.saveTxt`` golden
text family, asserted BIT-FOR-BIT against the relational pipeline's
own parquet sink (``sinks.save_per_delay``) under the same ``%+10.5e``
formatting.  Closed-form physics invariant: flat images with a
delay-coded boost give diff_plus_ref / ref = (50 + boost) / 50 in
every q bin regardless of the poni solid-angle/polarization
corrections (they cancel in the ratio)."""

from __future__ import annotations

import gzip

import numpy as np
import pandas as pd
import pytest

from trx_spark import compat
from trx_spark.operators.multimodal import (
    decode_image,
    encode_edf,
    encode_edf_stack,
)
from trx_spark.sources import sinks

NY = NX = 16
DELAYS = [-10.0, 1e-10, -10.0, 3e-10, -10.0, 1e-9]
FMT = "%+10.5e"


def _boost(d: float) -> float:
    return 0.0 if d == -10.0 else 100.0 * d / 1e-9


def test_compat_journey_real_files_golden_vs_parquet(spark, tmp_path):
    folder = tmp_path / "sample" / "run3"
    folder.mkdir(parents=True)
    logs = []
    for i, d in enumerate(DELAYS):
        img = np.full((NY, NX), 50.0 + _boost(d), dtype="f8")
        if i == 1:
            # gzip-wrapped EDF: the reference's '*.edf*' glob matches
            # and fabio decompresses transparently — so do we
            name = f"img_{i:04d}.edf.gz"
            (folder / name).write_bytes(gzip.compress(encode_edf(img), mtime=0))
        elif i == 2:
            # a 2-frame stack with IDENTICAL frames: exercises the
            # multi-frame decode fan-out end-to-end while keeping the
            # per-file curve closed-form (mean over 2x pixels is the
            # same mean)
            name = f"img_{i:04d}.edf"
            (folder / name).write_bytes(encode_edf_stack([img, img]))
        else:
            name = f"img_{i:04d}.edf"
            (folder / name).write_bytes(encode_edf(img))
        logs.append({"file": name, "delay": d, "currentmA": 190.0})
    # a non-image file in the folder: the reference glob never reads it
    (folder / "notes.dat").write_bytes(b"\x00\x01 operator scribbles \xff")
    log = spark.createDataFrame(pd.DataFrame(logs))

    # --- E1 via the façade: poni dict + detector-shape probe ---
    curves = compat.doFolder(
        spark,
        str(folder),
        files="*.edf*",
        nQ=5,
        qlims=(0.0, 0.2),
        poni=dict(dist=0.05, pixel=200e-6, xcen=NX / 2, ycen=NY / 2, E=10.0),
    )
    files_seen = {r["file"] for r in curves.select("file").distinct().collect()}
    assert files_seen == {r["file"] for r in logs}  # junk .dat excluded

    # --- E2 ---
    res = compat.doFolder_dataRed(curves, log, reference="min")
    scan = res["scan"].toPandas()
    for d, grp in scan.groupby("delay"):
        ratio = grp["diff_plus_ref"] / (grp["diff_plus_ref"] - grp["mean_diff"])
        np.testing.assert_allclose(ratio, (50.0 + _boost(d)) / 50.0, rtol=1e-9)

    # --- S10 golden text family vs S11 parquet, bit-for-bit ---
    out = folder / "reduced"
    written = compat.saveTxt(res, str(out), curves=curves)
    pq = str(tmp_path / "per_delay_pq")
    sinks.save_per_delay(res["scan"], pq)
    back = spark.read.parquet(pq).toPandas()
    delays_sorted = sorted(back["delay"].unique())
    qmap = (
        curves.select("q_bin", "q").distinct().toPandas().sort_values("q_bin")
    )
    for stem, col in (
        ("diff_av_matrix", "mean_diff"),
        ("diff_plus_ref_av_matrix", "diff_plus_ref"),
        ("diff_av_matrix_err", "err_of_mean"),
    ):
        path = [p for p in written if p.endswith(f"{stem}.txt")]
        assert len(path) == 1, (stem, written)
        lines = (out / path[0].split("/")[-1]).read_text().splitlines()
        piv = (
            back.pivot(index="q_bin", columns="delay", values=col)
            .sort_index()
        )
        data = lines[2:]
        assert len(data) == len(piv)
        for row_i, line in enumerate(data):
            cells = line.split()
            want_q = FMT % qmap.iloc[row_i]["q"]
            want_vals = [
                FMT % piv.iloc[row_i][d] for d in delays_sorted
            ]
            assert cells == [want_q, *want_vals], (stem, row_i)

    # the junk file is still there, untouched
    assert (folder / "notes.dat").read_bytes().startswith(b"\x00\x01")


def test_compat_journey_corrupt_image_fails_fast(spark, tmp_path):
    """A corrupt file MATCHING the glob fails fast with a clear decode
    error (the reference's fabio behavior) — quarantine-style
    tolerance is image_census's contract, not doFolder's."""
    (tmp_path / "ok.edf").write_bytes(
        encode_edf(np.full((4, 4), 7.0, dtype="f8"))
    )
    blob = encode_edf(np.full((4, 4), 7.0, dtype="f8"))
    (tmp_path / "broken.edf").write_bytes(blob[: len(blob) // 3])
    from trx_spark.operators.multimodal import read_binary_assets

    assets = read_binary_assets(spark, str(tmp_path / "*.edf"), "image")
    with pytest.raises(Exception) as ei:
        decode_image(assets, codec="auto").collect()
    assert "EDF" in str(ei.value) or "edf" in str(ei.value) or "truncated" in str(
        ei.value
    )
