"""Scalar function library + mask algebra golden tests (SURVEY §2.2/2.7)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from trx_spark.functions.strings import (
    basename,
    delay_to_num,
    get_delay_from_string,
    str_to_time,
    time_to_str,
)
from trx_spark.functions.scattering import deg_to_q, q_to_two_theta, rad_to_q
from trx_spark.functions.absorption import beer_lambert_transmission, phosphor_correction
from trx_spark.operators import masks


@pytest.mark.parametrize(
    "s,expected",
    [
        ("100ps", 1e-10),
        ("-5us", -5e-6),
        ("1ns", 1e-9),
        ("3.5ms", 3.5e-3),
        ("2s", 2.0),
        ("7", 7.0),  # no unit → seconds (dict .get default, string.py:24)
        ("42fs", 4.2e-14),
    ],
)
def test_str_to_time(spark, s, expected):
    got = spark.range(1).select(str_to_time(F.lit(s)).alias("v")).first()["v"]
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_delay_to_num_off(spark):
    assert spark.range(1).select(delay_to_num(F.lit("off")).alias("v")).first()["v"] == -10.0


@pytest.mark.parametrize(
    "v,expected",
    [
        (1e-10, "+100ps"),
        (-5e-6, "-5us"),
        (1e-9, "+1ns"),
        (2.0, "+2s"),
        (0.25, "+250ms"),
        (-10.0, "-10s"),
    ],
)
def test_time_to_str(spark, v, expected):
    got = spark.range(1).select(time_to_str(F.lit(v)).alias("s")).first()["s"]
    assert got == expected


def test_roundtrip_ladder(spark):
    """codec round-trip over the FIXTURES B4 delay ladder."""
    ladder = ["-5us", "100ps", "300ps", "1ns", "10ns"]
    df = spark.createDataFrame([(s,) for s in ladder], "s string")
    out = df.select("s", time_to_str(str_to_time(F.col("s"))).alias("rt")).collect()
    for r in out:
        assert r["rt"].lstrip("+") == r["s"].lstrip("+"), r


def test_filename_helpers(spark):
    df = spark.createDataFrame([("/data/run3/img_100ps_0001.edf.gz",)], "p string")
    r = df.select(
        basename("p").alias("b"), get_delay_from_string(F.col("p")).alias("d")
    ).first()
    assert r["b"] == "img_100ps_0001"
    assert r["d"] == "100ps"


def test_scattering_math(spark):
    lam = 1.0
    theta = 0.1
    got = spark.range(1).select(
        rad_to_q(F.lit(theta), wavelength=lam).alias("q"),
        deg_to_q(F.lit(math.degrees(theta)), wavelength=lam).alias("qd"),
    ).first()
    expected = 4 * math.pi / lam * math.sin(theta / 2)
    np.testing.assert_allclose(got["q"], expected, rtol=1e-12)
    np.testing.assert_allclose(got["qd"], expected, rtol=1e-12)
    # q → 2θ inverse
    back = (
        spark.range(1)
        .select(q_to_two_theta(F.lit(expected), wavelength=lam).alias("tt"))
        .first()["tt"]
    )
    np.testing.assert_allclose(back, theta, rtol=1e-12)


def test_absorption_math(spark):
    t, al = 100e-6, 50e-6
    got = spark.range(1).select(
        beer_lambert_transmission(t, al).alias("T"),
        beer_lambert_transmission(t, al, angle_deg=F.lit(60.0)).alias("Ta"),
        phosphor_correction(F.lit(0.0001), mu=17700.0, thickness=40e-6).alias("pc"),
    ).first()
    np.testing.assert_allclose(got["T"], math.exp(-2.0), rtol=1e-12)
    np.testing.assert_allclose(got["Ta"], math.exp(-4.0), rtol=1e-9)
    np.testing.assert_allclose(
        got["pc"], 1.0 / (1 - math.exp(-17700.0 * 40e-6)), rtol=1e-6
    )


@pytest.fixture(scope="module")
def pixel_grid(spark):
    ny, nx = 16, 16
    yy, xx = np.mgrid[0:ny, 0:nx]
    pdf = pd.DataFrame({"y": yy.ravel(), "x": xx.ravel()})
    return spark.createDataFrame(pdf), ny, nx


def test_mask_dsl_and_geometry(pixel_grid):
    df, ny, nx = pixel_grid
    n_masked = df.filter(masks.mask_from_string("x>10")).count()
    assert n_masked == ny * 5  # x in 11..15

    border = df.filter(masks.mask_border((ny, nx), 2)).count()
    assert border == ny * nx - 12 * 12

    circle = df.filter(masks.mask_circle(8, 8, 3)).count()
    # |{(x,y): (x−8)²+(y−8)² ≤ 9}| on the integer grid
    expected = sum(
        1 for y in range(ny) for x in range(nx) if (x - 8) ** 2 + (y - 8) ** 2 <= 9
    )
    assert circle == expected


def test_combine_masks_last_writer_wins(pixel_grid):
    """add/subtract ordering (trx/mask.py:128-135): a later subtract
    re-opens pixels an earlier add masked."""
    df, ny, nx = pixel_grid
    combined = masks.combine_masks(
        [
            ("add", masks.mask_from_string("x>4")),
            ("subtract", masks.mask_rectangle(6, 8, 0, 15)),
            ("add", masks.mask_rectangle(7, 7, 7, 7)),
        ]
    )
    got = {(r["x"], r["y"]) for r in df.filter(combined).collect()}
    expected = set()
    for y in range(ny):
        for x in range(nx):
            m = False
            if x > 4:
                m = True
            if 6 <= x <= 8:
                m = False
            if x == 7 and y == 7:
                m = True
            if m:
                expected.add((x, y))
    assert got == expected


def _ray_cast_numpy(vertices, px, py):
    """Independent even-odd ray cast (the rule Path.contains_points
    implements for a closed polygon, radius=0)."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        if y1 == y2:
            continue
        crosses = ((y1 > py) != (y2 > py)) & (
            px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
        )
        inside ^= crosses
    return inside


@pytest.mark.parametrize(
    "vertices",
    [
        pytest.param([(3, 3), (12, 3), (12, 12), (3, 12)], id="square"),
        pytest.param([(2, 2), (13, 2), (13, 13), (8, 13), (8, 7), (2, 7)], id="L_concave"),
        pytest.param([(8, 1), (14, 14), (8, 9), (2, 14)], id="star_concave"),
        pytest.param([(1.5, 2.5), (14.5, 5.5), (6.5, 14.5)], id="triangle_frac"),
    ],
)
def test_mask_polygon_matches_ray_cast(pixel_grid, vertices):
    df, ny, nx = pixel_grid
    got = {(r["x"], r["y"]) for r in df.filter(masks.mask_polygon(vertices)).collect()}
    yy, xx = np.mgrid[0:ny, 0:nx]
    inside = _ray_cast_numpy(
        vertices, xx.ravel().astype(float), yy.ravel().astype(float)
    )
    expected = {(int(x), int(y)) for x, y, m in zip(xx.ravel(), yy.ravel(), inside) if m}
    assert got == expected
    # sanity-pin a few semantic points on the square case
    if vertices[0] == (3, 3):
        assert (8, 8) in got and (0, 0) not in got and (13, 8) not in got


def test_mask_polygon_in_combine(pixel_grid):
    """Polygon components compose through the ordered add/subtract chain
    like every other geometry (trx/mask.py:104-105, :128-135)."""
    df, ny, nx = pixel_grid
    outer = [(1, 1), (14, 1), (14, 14), (1, 14)]
    hole = [(5, 5), (10, 5), (10, 10), (5, 10)]
    combined = masks.combine_masks(
        [("add", masks.mask_polygon(outer)), ("subtract", masks.mask_polygon(hole))]
    )
    got = {(r["x"], r["y"]) for r in df.filter(combined).collect()}
    assert (3, 3) in got and (7, 7) not in got and (0, 0) not in got


def test_interpret_mask_union(pixel_grid):
    df, ny, nx = pixel_grid
    pred = masks.interpret_mask(["x>13", masks.mask_from_string("y<2")])
    assert df.filter(pred).count() == ny * 2 + 2 * nx - 4


def test_saxs_math(spark):
    from trx_spark.functions.scattering import molecular_mass_from_i0, volume_fraction

    got = spark.range(1).select(
        volume_fraction(1.0, mol_weight_kda=17.0, density=1.347).alias("vf"),
        molecular_mass_from_i0(F.lit(0.02), 0.005, density=1.347).alias("mm"),
    ).first()
    np.testing.assert_allclose(got["vf"], 1.0 * 17.0 / 1.347 / 1e3, rtol=1e-12)
    np.testing.assert_allclose(
        got["mm"], 0.02 * 6e23 / (0.005 * (2.67e10 / 1.347) ** 2), rtol=1e-12
    )


def test_mask_string_composite_clauses(spark):
    """The reference-style composite DSL ('x>400;y<100') masks the
    UNION of its clauses — the exact input compat._as_mask documents
    and forwards."""
    import pytest

    from trx_spark.operators.masks import mask_from_string

    df = spark.range(10).selectExpr("id as x", "CAST(9 - id AS BIGINT) as y")
    # x>7 masks x in {8,9}; y<1 masks y=0 i.e. x=9 → union {8,9}
    got = sorted(
        r["x"] for r in df.filter(mask_from_string("x>7;y<1")).collect()
    )
    assert got == [8, 9]
    with pytest.raises(ValueError, match="cannot parse"):
        mask_from_string("x>>4")
    with pytest.raises(ValueError, match="cannot parse"):
        mask_from_string(";;")
