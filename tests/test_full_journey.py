"""Capstone: the complete reference-user journey on this engine —
EDF detector images on disk → binary scan → REAL decode → geometry
join → azimuthal integration (E1) → log join → reference pick → as-of
interpolation → per-delay reduction with diff_plus_ref (E2) → golden
text sink (S10) + per-delay parquet sink (S11). Closed-form truth at
every stage (flat images with a delay-dependent boost)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from trx_spark.operators.multimodal import (
    decode_image,
    encode_edf,
    read_binary_assets,
)
from trx_spark.pipeline import (
    IntegrationConfig,
    ReductionConfig,
    data_reduction,
    integrate_folder,
)
from trx_spark.sources import sinks

NY = NX = 16
DELAYS = [-10.0, 1e-10, -10.0, 3e-10, -10.0, 1e-9]


def test_edf_to_golden_txt(spark, tmp_path):
    # --- S1: write EDF images (flat; boost encodes the delay) ---
    logs = []
    for i, d in enumerate(DELAYS):
        boost = 0.0 if d == -10.0 else 100.0 * d / 1e-9
        img = np.full((NY, NX), 50.0 + boost, dtype="f8")
        fname = f"img_{i:04d}.edf"
        (tmp_path / fname).write_bytes(encode_edf(img))
        logs.append({"file": fname, "delay": d, "currentmA": 190.0})
    log = spark.createDataFrame(pd.DataFrame(logs))

    # --- E1: decode + integrate ---
    assets = read_binary_assets(spark, str(tmp_path / "*.edf"), "image")
    pixels = decode_image(assets, codec="edf")
    # pixel 'file' is the full path — reduce to the basename to match the log
    from pyspark.sql import functions as F

    pixels = pixels.withColumn(
        "file", F.element_at(F.split(F.col("file"), "/"), -1)
    )
    yy, xx = np.mgrid[0:NY, 0:NX]
    r = np.hypot(xx - NX / 2, yy - NY / 2)
    geom = spark.createDataFrame(
        pd.DataFrame(
            {
                "y": yy.ravel(), "x": xx.ravel(),
                "q": (r / r.max() * 2.0).ravel(),
                "chi": np.zeros(NY * NX), "solid_angle": np.ones(NY * NX),
                "pol_corr": np.ones(NY * NX),
            }
        )
    )
    curves = integrate_folder(
        pixels, geom, IntegrationConfig(q_min=0.0, q_max=2.0, n_bins=4)
    )

    # --- E2: reduction ---
    res = data_reduction(curves, log, ReductionConfig(reference="min", chi2_threshold=None))
    scan = res["scan"].toPandas()
    for d, grp in scan.groupby("delay"):
        expect = 0.0 if d == -10.0 else 100.0 * d / 1e-9
        np.testing.assert_allclose(grp["mean_diff"], expect, atol=1e-9)
        np.testing.assert_allclose(grp["diff_plus_ref"], 50.0 + expect, rtol=1e-12)

    # --- S11: per-delay sink carries the reference's three matrices ---
    out_dir = str(tmp_path / "per_delay")
    sinks.save_per_delay(res["scan"], out_dir)
    back = spark.read.parquet(out_dir)
    assert {"mean_diff", "err_of_mean", "diff_plus_ref"} <= set(back.columns)

    # --- S10: golden text for one delay, fixed %+10.5e formatting ---
    one = res["scan"].filter(F.col("delay") == 1e-9).withColumn(
        "q", F.col("q_bin").cast("double")
    )
    txt = tmp_path / "diff_av_1ns.txt"
    sinks.save_txt(
        one, str(txt), x="q", columns=["mean_diff", "diff_plus_ref"],
        info={"delay": "1ns"},
    )
    lines = txt.read_text().splitlines()
    assert lines[0] == "# delay : 1ns"
    assert lines[1].split() == ["#", "q", "mean_diff", "diff_plus_ref"]
    first = lines[2].split()
    assert first[1] == "%+10.5e" % 100.0 and first[2] == "%+10.5e" % 150.0
