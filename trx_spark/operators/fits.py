"""Non-relational kernels (SURVEY §2.10 U2-U7) as Arrow-batched
``applyInPandas`` stages: circle/ellipse fits for beam-center finding,
peak fitting, baseline removal, ring histograms.

The reference uses scipy.leastsq / lmfit / dualtree wavelets
(trx/center.py:59-105, trx/peaks.py:14-40, trx/utils/numeric.py:66-82);
none of those libraries are in this environment, so the kernels are
pure-numpy equivalents chosen for determinism:

- circle: Kåsa algebraic least squares (linear lstsq — same minimum as
  scipy.leastsq on the algebraic residual of center.py:49-57),
- ellipse: Fitzgibbon algebraic fit via the generalized eigenproblem
  (the same scatter-matrix eigenvector method as center.py:71-105),
- peak: a REAL PseudoVoigt fit (Caruana log-parabola seed + pure-numpy
  Levenberg–Marquardt, lmfit-matching fraction blend) for peaks.py:14-40,
- background: the reference's iterative wavelet-baseline scheme (its
  ``dualtree`` dependency implements de Cotret & Siwick 2017) with the
  à-trous stationary B3-spline approximation replacing the absent
  DTCWT, incl. pinned background regions; SNIP kept as ``method="snip"``
  (utils/numeric.py:66-82).

Each kernel is a per-group pandas function: one detector image / ring /
scan point per group → the fit parallelizes across groups and never
pulls pixel data to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CIRCLE_SCHEMA = "group string, cx double, cy double, r double, rmse double, n_points long"
ELLIPSE_SCHEMA = (
    "group string, cx double, cy double, a double, b double, tilt double, n_points long"
)
PEAK_SCHEMA = (
    "group string, center double, fwhm double, amplitude double, fraction double, "
    "background double, n_points long"
)


def fit_circles(points: DataFrame, *, group: str = "group", x: str = "x", y: str = "y") -> DataFrame:
    """U2 ``leastsq_circle`` (trx/center.py:59-68): one circle per group.

    The Kåsa helper lives INSIDE the kernel closure so cloudpickle ships
    it by value — workers need no importable trx_spark on sys.path (the
    driver may run from any cwd)."""

    def _kasa_circle(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float, float, float]:
        A = np.column_stack([2 * xs, 2 * ys, np.ones_like(xs)])
        b = xs * xs + ys * ys
        (cx, cy, c), *_ = np.linalg.lstsq(A, b, rcond=None)
        r = float(np.sqrt(c + cx * cx + cy * cy))
        rmse = float(np.sqrt(np.mean((np.hypot(xs - cx, ys - cy) - r) ** 2)))
        return float(cx), float(cy), r, rmse

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        cx, cy, r, rmse = _kasa_circle(
            pdf[x].to_numpy(dtype=float), pdf[y].to_numpy(dtype=float)
        )
        return pd.DataFrame(
            {
                "group": [pdf[group].iloc[0]],
                "cx": [cx],
                "cy": [cy],
                "r": [r],
                "rmse": [rmse],
                "n_points": [len(pdf)],
            }
        )

    return points.groupBy(group).applyInPandas(kernel, schema=CIRCLE_SCHEMA)


def fit_ellipses(points: DataFrame, *, group: str = "group", x: str = "x", y: str = "y") -> DataFrame:
    """U3 ``fit_ellipse`` (trx/center.py:71-105): algebraic conic fit via
    the constrained eigenproblem; returns center, semi-axes, tilt."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf[x].to_numpy(dtype=float)
        ys = pdf[y].to_numpy(dtype=float)
        xm, ym = xs.mean(), ys.mean()
        xs, ys = xs - xm, ys - ym
        D = np.column_stack([xs * xs, xs * ys, ys * ys, xs, ys, np.ones_like(xs)])
        S = D.T @ D
        C = np.zeros((6, 6))
        C[0, 2] = C[2, 0] = 2.0
        C[1, 1] = -1.0
        try:
            w, v = np.linalg.eig(np.linalg.solve(S, C))
            # the ellipse solution is the eigenvector satisfying the
            # conic constraint 4ac − b² > 0 (Fitzgibbon); eigenvalue
            # sign conventions vary with the generalized-eig formulation
            cons = 4 * v[0].real * v[2].real - v[1].real ** 2
            valid = np.isfinite(cons) & (cons > 1e-12)
            if not valid.any():
                raise np.linalg.LinAlgError
            k = int(np.flatnonzero(valid)[np.argmax(cons[valid])])
            a_, b_, c_, d_, e_, f_ = v[:, k].real
        except np.linalg.LinAlgError:
            a_ = b_ = c_ = d_ = e_ = f_ = np.nan
        den = b_ * b_ - 4 * a_ * c_
        cx = (2 * c_ * d_ - b_ * e_) / den + xm
        cy = (2 * a_ * e_ - b_ * d_) / den + ym
        # semi-axes via the standard conic invariants
        num = 2 * (a_ * e_**2 + c_ * d_**2 + f_ * b_**2 - b_ * d_ * e_) - 8 * a_ * c_ * f_
        t1 = a_ + c_
        t2 = np.sqrt((a_ - c_) ** 2 + b_ * b_)
        with np.errstate(all="ignore"):
            ax1 = np.sqrt(num / (den * (t2 - t1)))
            ax2 = np.sqrt(num / (den * (-t2 - t1)))
        # 0.5·atan2 gives the ax1 principal direction; report the MAJOR
        # axis orientation (mod π) regardless of which root is larger
        tilt = 0.5 * np.arctan2(b_, a_ - c_)
        if ax1 >= ax2:
            tilt += np.pi / 2
        tilt = tilt % np.pi
        return pd.DataFrame(
            {
                "group": [pdf[group].iloc[0]],
                "cx": [float(cx)],
                "cy": [float(cy)],
                "a": [float(max(ax1, ax2))],
                "b": [float(min(ax1, ax2))],
                "tilt": [float(tilt)],
                "n_points": [len(pdf)],
            }
        )

    return points.groupBy(group).applyInPandas(kernel, schema=ELLIPSE_SCHEMA)


def fit_peaks(
    curves: DataFrame, *, group: str = "group", x: str = "x", y: str = "y", err: str | None = None
) -> DataFrame:
    """U6 ``fitPeak`` (trx/peaks.py:14-40): per-group PseudoVoigt fit
    with auto-range around the FWHM, matching the reference's lmfit
    PseudoVoigtModel semantics in pure numpy.

    Model (height parameterization; both components share FWHM = 2σ as
    in lmfit's fraction-blended PseudoVoigt):

        y = bg + h·[(1−η)·exp(−(x−c)²/(2σ_g²)) + η·σ²/((x−c)²+σ²)],
        σ_g = σ/√(2 ln 2),  η ∈ [0, 1].

    Seeded by Caruana's log-parabola (the round-2 Gaussian stand-in),
    refined by a small Levenberg–Marquardt loop (numeric Jacobian)
    with optional 1/err weighting — the same objective lmfit minimizes
    (peaks.py:33-37 weights by 1/err)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        def _one(res: dict) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "group": [pdf[group].iloc[0]],
                    "center": [res.get("center", float("nan"))],
                    "fwhm": [res.get("fwhm", float("nan"))],
                    "amplitude": [res.get("amp", float("nan"))],
                    "fraction": [res.get("frac", float("nan"))],
                    "background": [res.get("bg", float("nan"))],
                    "n_points": [len(pdf)],
                }
            )

        pdf = pdf.sort_values(x)
        if len(pdf) < 5:
            # under-determined: report NaNs rather than a spurious fit
            return _one({})
        xs = pdf[x].to_numpy(dtype=float)
        ys = pdf[y].to_numpy(dtype=float)
        if not np.isfinite(ys).any():
            # a fully masked/NaN group must report NaNs like the
            # under-determined path — nanargmax on an all-NaN slice
            # raises and would abort EVERY group's fit with it
            return _one({})
        wts = None
        if err is not None and err in pdf:
            e = pdf[err].to_numpy(dtype=float)
            wts = np.where(np.isfinite(e) & (e > 0), 1.0 / e, 0.0)
        bg = float(np.nanmin(ys))
        yc = ys - bg
        k = int(np.nanargmax(yc))
        half = yc[k] / 2
        above = np.where(yc >= half)[0]
        lo, hi = above.min(), above.max()
        # widen a touch (the reference enlarges the fit range around the
        # FWHM, peaks.py:27-31)
        lo = max(0, lo - 2)
        hi = min(len(xs) - 1, hi + 2)
        w = slice(lo, hi + 1)
        with np.errstate(all="ignore"):
            ly = np.log(np.clip(yc[w], 1e-300, None))
            coef = np.polyfit(xs[w], ly, 2)
        if coef[0] >= 0 or not np.isfinite(coef).all():
            return _one(
                {
                    "center": float(xs[k]),
                    "fwhm": float(xs[min(hi, len(xs) - 1)] - xs[lo]),
                    "amp": float(yc[k]),
                    "bg": bg,
                }
            )
        center = float(-coef[1] / (2 * coef[0]))
        sigma_g2 = -1.0 / (2 * coef[0])
        s = 1.1774100225154747  # √(2 ln 2): HWHM of a unit-σ Gaussian
        amp = float(np.exp(coef[2] - coef[1] ** 2 / (4 * coef[0])))

        def model(p, xv):
            h, c, sg, eta, b = p
            sg = max(sg, 1e-12)
            u = xv - c
            gauss = np.exp(-(u * u) / (2.0 * (sg / s) ** 2))
            lor = sg * sg / (u * u + sg * sg)
            return b + h * ((1.0 - eta) * gauss + eta * lor)

        def resid(p):
            r = ys - model(p, xs)
            return r * wts if wts is not None else r

        # LM refine over (height, center, hwhm σ, fraction η, bg)
        p = np.array([amp, center, s * np.sqrt(sigma_g2), 0.3, bg])
        lam = 1e-3
        cost = float(np.sum(resid(p) ** 2))
        for _ in range(60):
            j = np.empty((len(xs), 5))
            step = np.maximum(np.abs(p), 1e-8) * 1e-6
            for m in range(5):
                dp = np.zeros(5)
                dp[m] = step[m]
                j[:, m] = (resid(p + dp) - resid(p - dp)) / (2 * step[m])
            r = resid(p)
            g = j.T @ r
            a_mat = j.T @ j
            try:
                delta = np.linalg.solve(a_mat + lam * np.diag(np.diag(a_mat)), -g)
            except np.linalg.LinAlgError:
                break
            cand = p + delta
            cand[2] = abs(cand[2])
            cand[3] = min(max(cand[3], 0.0), 1.0)
            new_cost = float(np.sum(resid(cand) ** 2))
            if not np.isfinite(new_cost) or new_cost >= cost:
                lam *= 10.0
                if lam > 1e8:
                    break
                continue
            rel = abs(cost - new_cost) / max(cost, 1e-300)
            p, cost, lam = cand, new_cost, max(lam / 10.0, 1e-12)
            if rel < 1e-12:
                break
        return _one(
            {
                "center": float(p[1]),
                "fwhm": float(2.0 * p[2]),
                "amp": float(p[0]),
                "frac": float(p[3]),
                "bg": float(p[4]),
            }
        )

    return curves.groupBy(group).applyInPandas(kernel, schema=PEAK_SCHEMA)


def remove_background(
    curves: DataFrame,
    *,
    group: str = "group",
    x: str = "x",
    y: str = "y",
    iterations: int = 24,
    method: str = "wavelet",
    max_iter: int = 100,
    levels: int = 4,
    background_regions: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """U7 ``removeBackground`` (trx/utils/numeric.py:66-82, wrapper
    azav.py:463-480): per-curve baseline estimation and subtraction.

    ``method="wavelet"`` (default) runs the reference's iterative
    wavelet-baseline scheme (the ``dualtree`` package it imports
    implements de Cotret & Siwick 2017): repeat { smooth by the wavelet
    approximation; clip the running baseline to its minimum with the
    smooth; pin ``background_regions`` (x-ranges, as in the reference)
    back to the data } until converged or ``max_iter`` (reference
    default 100). The absent DTCWT is replaced by the à-trous
    stationary B3-spline approximation (the classic starlet baseline)
    — pure numpy, same iteration, same contract.

    ``method="snip"`` keeps the round-1 SNIP clipper (``iterations``
    controls the max clip half-width)."""
    if method not in ("wavelet", "snip"):
        raise ValueError(f"unknown method {method!r}")
    regions = [tuple(map(float, r)) for r in (background_regions or [])]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # closure-self-contained (workers may not import trx_spark)
        import numpy as _np

        pdf = pdf.sort_values(x).reset_index(drop=True)
        v = pdf[y].to_numpy(dtype=float).copy()
        xs = pdf[x].to_numpy(dtype=float)
        n = len(v)
        if method == "snip":
            base = _np.log1p(_np.log1p(_np.sqrt(_np.clip(v, 0, None))))
            for m in range(1, min(iterations, n // 2) + 1):
                left = _np.roll(base, m)
                right = _np.roll(base, -m)
                avg = (left + right) / 2
                avg[:m] = base[:m]
                avg[n - m :] = base[n - m :]
                base = _np.minimum(base, avg)
            baseline = (_np.expm1(_np.expm1(base))) ** 2
        else:
            h = _np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
            pin = _np.zeros(n, dtype=bool)
            for lo, hi in regions:
                pin |= (xs >= lo) & (xs <= hi)

            def approx(a):
                out = a
                for j in range(levels):
                    step = 2**j
                    if 2 * step >= len(out):
                        break
                    padded = _np.pad(out, 2 * step, mode="reflect")
                    acc = _np.zeros_like(out)
                    for t, c in zip(range(-2, 3), h):
                        s = 2 * step + t * step
                        acc += c * padded[s : s + len(out)]
                    out = acc
                return out

            baseline = v.copy()
            for _ in range(max_iter):
                clipped = _np.minimum(baseline, approx(baseline))
                clipped[pin] = v[pin]
                if _np.max(_np.abs(clipped - baseline)) <= 1e-12:
                    baseline = clipped
                    break
                baseline = clipped
        out = pdf.copy()
        out["baseline"] = baseline
        out["y_corrected"] = pdf[y].to_numpy(dtype=float) - baseline
        return out

    schema = ", ".join(
        [f"{c} {t}" for c, t in curves.dtypes] + ["baseline double", "y_corrected double"]
    )
    return curves.groupBy(group).applyInPandas(kernel, schema=schema)


def ring_histogram(
    pixels: DataFrame,
    *,
    cx: float,
    cy: float,
    x: str = "x",
    y: str = "y",
    bin_width: float = 1.0,
    smooth_halfwidth: int = 2,
) -> DataFrame:
    """A16 (trx/center.py:343-357 + utils/numeric.py:85-104): histogram
    of pixel distances from a trial center with triangular-kernel
    smoothing — fully relational (groupBy bucket + weighted window avg),
    used by the ring-based center search to locate radii."""
    from pyspark.sql import Window

    dist = F.sqrt(
        (F.col(x) - F.lit(cx)) * (F.col(x) - F.lit(cx))
        + (F.col(y) - F.lit(cy)) * (F.col(y) - F.lit(cy))
    )
    binned = pixels.withColumn("_bin", F.floor(dist / F.lit(bin_width)).cast("long"))
    hist = binned.groupBy("_bin").agg(F.count(F.lit(1)).alias("n"))
    # DENSIFY before smoothing: the reference convolves a dense
    # np.histogram where empty bins are explicit zeros — over sparse
    # ROWS the window would span non-adjacent radii, so an isolated hot
    # bin escapes the damping of its (empty) neighbors and the ring
    # search can lock onto a spurious radius
    bounds = hist.agg(F.max("_bin").alias("_mx"))
    bins = bounds.select(
        F.explode(F.sequence(F.lit(0), F.col("_mx"))).alias("_bin")
    )
    dense = bins.join(hist, "_bin", "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    # true triangular kernel (weights h+1−|j|, zero-padded edges like
    # np.convolve mode='same'; the normalization constant differs from
    # the reference's kernel/(N²/4) scalar — peak LOCATIONS, which is
    # what the center search consumes, are scale-invariant)
    w = Window.orderBy("_bin")
    h = int(smooth_halfwidth)
    terms = []
    total_w = 0
    for j in range(-h, h + 1):
        wt = h + 1 - abs(j)
        total_w += wt
        if j < 0:
            c = F.lag("n", -j).over(w)
        elif j > 0:
            c = F.lead("n", j).over(w)
        else:
            c = F.col("n")
        terms.append(F.coalesce(c, F.lit(0)) * F.lit(wt))
    n_smooth = sum(terms[1:], terms[0]).cast("double") / F.lit(float(total_w))
    smoothed = dense.withColumn("n_smooth", n_smooth)
    return smoothed.withColumn("radius", (F.col("_bin") + 0.5) * F.lit(bin_width)).select(
        F.col("_bin").alias("bin"), "radius", "n", "n_smooth"
    )


def find_center_from_ring(
    pixels: DataFrame,
    *,
    image: str = "file",
    x: str = "x",
    y: str = "y",
    intensity: str = "intensity",
    percentile_band: tuple[float, float] = (0.97, 0.995),
) -> DataFrame:
    """U4 ``find_center_liquid_peak`` (trx/center.py:107-166): select the
    pixels in a brightness percentile band (the strong liquid ring) per
    image, then circle-fit them. Composition: A15 percentile filter →
    U2 circle fit — the whole thing is two distributed stages."""
    from pyspark.sql import Window

    w = Window.partitionBy(image)
    lo = F.expr(f"percentile({intensity}, {percentile_band[0]})").over(w)
    hi = F.expr(f"percentile({intensity}, {percentile_band[1]})").over(w)
    band = (
        pixels.withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .filter((F.col(intensity) >= F.col("_lo")) & (F.col(intensity) <= F.col("_hi")))
    )
    return fit_circles(band.withColumnRenamed(image, "group"), group="group", x=x, y=y)


def find_center_using_rings(
    pixels: DataFrame,
    *,
    cx0: float,
    cy0: float,
    x: str = "x",
    y: str = "y",
    intensity: str = "intensity",
    n_iter: int = 3,
    bin_width: float = 2.0,
    ring_halfwidth: float = 4.0,
    intensity_percentile: float = 0.9,
    exact_percentile: bool = False,
) -> dict:
    """U5 ``find_center_using_rings`` (trx/center.py:213-469, the
    reference's largest function) as a driver-orchestrated loop of
    distributed stages — no pixel data ever reaches the driver, only the
    per-iteration (cx, cy, r) scalars:

      repeat n_iter times:
        1. distance histogram from the current trial center with
           triangular smoothing (A16) → dominant ring radius,
        2. select bright pixels (above a per-image intensity percentile)
           within ±ring_halfwidth of that radius,
        3. Kåsa circle fit (U2) → updated center.

    The reference's canny edge detection (center.py:305-307, skimage not
    in this env) is replaced by the percentile brightness gate — same
    role: keep ring pixels, drop background. Returns the final fit plus
    the per-iteration trace (for the sanity checks the reference does by
    eye).

    The brightness threshold is a distributed ``percentile_approx``
    AGGREGATE by default (map-side partial sketch — no single-partition
    window over a 4 Mpixel image); the loop already moves scalars to the
    driver, so the threshold crosses as one more scalar.
    ``exact_percentile=True`` keeps the exact sort-based percentile for
    reproducibility studies."""
    cx, cy = float(cx0), float(cy0)
    # brightness gate FIRST (the canny-edge stand-in): histogramming all
    # pixels would be dominated by background geometry (pixel count at
    # distance d grows like 2πd); the reference histograms edge pixels
    # only (center.py:305-343)
    pct = "percentile" if exact_percentile else "percentile_approx"
    thr_row = pixels.agg(
        F.expr(f"{pct}({intensity}, {intensity_percentile})").alias("_thr")
    ).first()
    if thr_row is None or thr_row["_thr"] is None:
        return dict(cx=cx, cy=cy, trace=[])
    bright = pixels.filter(
        F.col(intensity) >= F.lit(float(thr_row["_thr"]))
    ).localCheckpoint()
    trace = []
    for _ in range(n_iter):
        hist = ring_histogram(bright, cx=cx, cy=cy, x=x, y=y, bin_width=bin_width)
        best = hist.orderBy(F.desc("n_smooth"), F.asc("bin")).select("radius").first()
        if best is None:
            break
        r_est = float(best["radius"])
        dist = F.sqrt(
            (F.col(x) - F.lit(cx)) * (F.col(x) - F.lit(cx))
            + (F.col(y) - F.lit(cy)) * (F.col(y) - F.lit(cy))
        )
        ring = (
            bright.withColumn("_dist", dist)
            .filter(F.abs(F.col("_dist") - F.lit(r_est)) <= F.lit(ring_halfwidth))
            .withColumn("group", F.lit("ring"))
        )
        fit = fit_circles(ring, group="group", x=x, y=y).first()
        if fit is None or fit["n_points"] < 8:
            break
        cx, cy = float(fit["cx"]), float(fit["cy"])
        trace.append(
            dict(cx=cx, cy=cy, r=float(fit["r"]), rmse=float(fit["rmse"]),
                 n_points=int(fit["n_points"]), r_histogram=r_est)
        )
    return dict(cx=cx, cy=cy, trace=trace)
