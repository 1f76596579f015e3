"""U-kernel tests with synthetic ground truth: circle/ellipse fits,
peak fit, SNIP background, ring histogram, liquid-peak center finding."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trx_spark.operators import fits


def test_fit_circles_exact_ring(spark):
    rng = np.random.default_rng(5)
    frames = []
    truth = {"r0": (120.0, 130.0, 40.0), "r1": (64.0, 60.0, 25.0)}
    for g, (cx, cy, r) in truth.items():
        th = rng.uniform(0, 2 * np.pi, 200)
        frames.append(
            pd.DataFrame(
                {"group": g, "x": cx + r * np.cos(th), "y": cy + r * np.sin(th)}
            )
        )
    df = spark.createDataFrame(pd.concat(frames))
    got = {r["group"]: r for r in fits.fit_circles(df).collect()}
    for g, (cx, cy, r) in truth.items():
        np.testing.assert_allclose(
            [got[g]["cx"], got[g]["cy"], got[g]["r"]], [cx, cy, r], rtol=1e-9
        )
        assert got[g]["rmse"] < 1e-9


def test_fit_circles_noisy(spark):
    rng = np.random.default_rng(6)
    th = rng.uniform(0, 2 * np.pi, 500)
    x = 100 + 50 * np.cos(th) + rng.normal(0, 0.5, 500)
    y = 90 + 50 * np.sin(th) + rng.normal(0, 0.5, 500)
    df = spark.createDataFrame(pd.DataFrame({"group": "n", "x": x, "y": y}))
    got = fits.fit_circles(df).first()
    np.testing.assert_allclose([got["cx"], got["cy"], got["r"]], [100, 90, 50], atol=0.2)


def test_fit_ellipses(spark):
    rng = np.random.default_rng(7)
    th = rng.uniform(0, 2 * np.pi, 400)
    a, b, cx, cy, tilt = 60.0, 30.0, 10.0, -5.0, 0.3
    xe = a * np.cos(th)
    ye = b * np.sin(th)
    x = cx + xe * np.cos(tilt) - ye * np.sin(tilt)
    y = cy + xe * np.sin(tilt) + ye * np.cos(tilt)
    df = spark.createDataFrame(pd.DataFrame({"group": "e", "x": x, "y": y}))
    got = fits.fit_ellipses(df).first()
    np.testing.assert_allclose([got["cx"], got["cy"]], [cx, cy], atol=1e-6)
    np.testing.assert_allclose([got["a"], got["b"]], [a, b], rtol=1e-6)
    np.testing.assert_allclose(got["tilt"] % np.pi, tilt, atol=1e-6)


def test_fit_peaks_gaussian(spark):
    x = np.linspace(0, 10, 400)
    center, sigma, amp, bg = 4.2, 0.6, 100.0, 5.0
    y = bg + amp * np.exp(-((x - center) ** 2) / (2 * sigma**2))
    df = spark.createDataFrame(pd.DataFrame({"group": "p", "x": x, "y": y}))
    got = fits.fit_peaks(df).first()
    np.testing.assert_allclose(got["center"], center, atol=1e-3)
    np.testing.assert_allclose(got["fwhm"], 2.3548200450309493 * sigma, rtol=0.01)
    np.testing.assert_allclose(got["amplitude"], amp, rtol=0.01)
    np.testing.assert_allclose(got["background"], bg, atol=0.1)


def test_remove_background_recovers_peak(spark):
    x = np.linspace(0, 20, 300)
    baseline = 50.0 + 2.0 * x
    peak = 80.0 * np.exp(-((x - 10) ** 2) / (2 * 0.3**2))
    df = spark.createDataFrame(
        pd.DataFrame({"group": "c", "x": x, "y": baseline + peak})
    )
    out = fits.remove_background(df).orderBy("x").toPandas()
    # the clipped baseline must sit near the true baseline AWAY from the
    # peak, and the corrected curve must retain most of the peak height
    away = (np.abs(out["x"] - 10) > 3).to_numpy()
    resid = (out["y_corrected"].to_numpy())[away]
    assert np.abs(resid).mean() < 6.0
    assert out["y_corrected"].max() > 60.0


def test_ring_histogram_finds_radius(spark):
    rng = np.random.default_rng(9)
    th = rng.uniform(0, 2 * np.pi, 3000)
    r = rng.normal(70.0, 1.0, 3000)
    pdf = pd.DataFrame({"x": 100 + r * np.cos(th), "y": 100 + r * np.sin(th)})
    df = spark.createDataFrame(pdf)
    hist = fits.ring_histogram(df, cx=100.0, cy=100.0, bin_width=2.0).toPandas()
    best = hist.loc[hist["n_smooth"].idxmax(), "radius"]
    assert abs(best - 70.0) <= 4.0


def test_find_center_from_ring(spark):
    rng = np.random.default_rng(10)
    ny = nx = 128
    yy, xx = np.mgrid[0:ny, 0:nx]
    cx, cy, r0 = 70.0, 58.0, 30.0
    dist = np.hypot(xx - cx, yy - cy)
    img = 10.0 + 200.0 * np.exp(-((dist - r0) ** 2) / (2 * 1.5**2))
    img += rng.normal(0, 1.0, img.shape)
    pdf = pd.DataFrame(
        {
            "file": "img0",
            "x": xx.ravel().astype(float),
            "y": yy.ravel().astype(float),
            "intensity": img.ravel(),
        }
    )
    got = fits.find_center_from_ring(spark.createDataFrame(pdf)).first()
    assert abs(got["cx"] - cx) < 1.0
    assert abs(got["cy"] - cy) < 1.0
    assert abs(got["r"] - r0) < 2.0


def test_find_center_using_rings_converges(spark):
    """Deliberately offset starting center must converge to truth within
    a few iterations (the reference iterates with sanity checks,
    center.py:213-469)."""
    rng = np.random.default_rng(12)
    ny = nx = 128
    yy, xx = np.mgrid[0:ny, 0:nx]
    cx, cy, r0 = 66.0, 61.0, 34.0
    dist = np.hypot(xx - cx, yy - cy)
    img = 8.0 + 180.0 * np.exp(-((dist - r0) ** 2) / (2 * 1.5**2))
    img += rng.normal(0, 1.0, img.shape)
    pdf = pd.DataFrame(
        {"x": xx.ravel().astype(float), "y": yy.ravel().astype(float),
         "intensity": img.ravel()}
    )
    res = fits.find_center_using_rings(
        spark.createDataFrame(pdf), cx0=58.0, cy0=70.0, n_iter=3
    )
    assert abs(res["cx"] - cx) < 1.0 and abs(res["cy"] - cy) < 1.0
    assert len(res["trace"]) >= 1
    assert abs(res["trace"][-1]["r"] - r0) < 2.0


def test_fit_peaks_pseudovoigt(spark):
    """Planted PseudoVoigt (η=0.6) recovered: center/fwhm/height/η/bg.
    Matches the reference's lmfit PseudoVoigt parameterization
    (trx/peaks.py:14-40): both components share FWHM = 2σ."""
    x = np.linspace(0, 10, 800)
    center, hwhm, amp, bg, eta = 4.2, 0.7, 100.0, 5.0, 0.6
    sg = hwhm / np.sqrt(2 * np.log(2))
    u = x - center
    y = bg + amp * (
        (1 - eta) * np.exp(-(u**2) / (2 * sg**2)) + eta * hwhm**2 / (u**2 + hwhm**2)
    )
    df = spark.createDataFrame(pd.DataFrame({"group": "pv", "x": x, "y": y}))
    got = fits.fit_peaks(df).first()
    np.testing.assert_allclose(got["center"], center, atol=1e-6)
    np.testing.assert_allclose(got["fwhm"], 2 * hwhm, rtol=1e-6)
    np.testing.assert_allclose(got["amplitude"], amp, rtol=1e-6)
    np.testing.assert_allclose(got["fraction"], eta, atol=1e-6)
    np.testing.assert_allclose(got["background"], bg, atol=1e-6)


def test_fit_peaks_pure_lorentzian(spark):
    x = np.linspace(-8, 8, 600)
    hwhm, amp, bg = 0.9, 40.0, 2.0
    y = bg + amp * hwhm**2 / (x**2 + hwhm**2)
    df = spark.createDataFrame(pd.DataFrame({"group": "lor", "x": x, "y": y}))
    got = fits.fit_peaks(df).first()
    np.testing.assert_allclose(got["center"], 0.0, atol=1e-6)
    np.testing.assert_allclose(got["fwhm"], 2 * hwhm, rtol=1e-5)
    np.testing.assert_allclose(got["fraction"], 1.0, atol=1e-5)


def test_remove_background_wavelet_pinned_regions(spark):
    """The wavelet (default) baseline follows a slow varying background
    under a sharp peak, and background_regions pin the baseline to the
    data exactly (trx/utils/numeric.py:75-80 semantics)."""
    x = np.linspace(0, 20, 400)
    baseline = 30.0 + 10.0 * np.sin(x / 8.0)
    peak = 120.0 * np.exp(-((x - 11) ** 2) / (2 * 0.25**2))
    df = spark.createDataFrame(
        pd.DataFrame({"group": "w", "x": x, "y": baseline + peak})
    )
    out = fits.remove_background(
        df, background_regions=[(0.0, 4.0), (17.0, 20.0)]
    ).orderBy("x").toPandas()
    inside = (out.x >= 0) & (out.x <= 4)
    np.testing.assert_allclose(
        out.loc[inside, "baseline"], out.loc[inside, "y"], atol=1e-9
    )
    away = (out.x > 5) & (out.x < 9)
    assert np.max(np.abs(out.loc[away, "baseline"] - (30.0 + 10.0 * np.sin(out.loc[away, "x"] / 8.0)))) < 4.0
    at_peak = np.abs(out.x - 11) < 0.3
    assert out.loc[at_peak, "y_corrected"].max() > 80.0
