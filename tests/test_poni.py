"""poni-file geometry (SURVEY U8; trx/azav.py:173-228 getAI): parse the
public pyFAI ASCII format (v1 + v2), resolve with getAI's search order,
and generate the per-pixel geometry table whose rot=0 closed form is
2theta = arctan(r/dist), q = 4*pi*sin(theta)/lambda."""

from __future__ import annotations

import math

import numpy as np
import pytest

from trx_spark.sources.poni import (
    PoniGeometry,
    apply_overrides,
    find_poni,
    load_poni,
    parse_poni,
    poni_geometry_table,
)

_V2 = """\
# Nota: C-Order, 1 refers to the Y axis, 2 to the X axis
poni_version: 2
Detector: Pilatus1M
Detector_config: {"pixel1": 172e-6, "pixel2": 172e-6, "max_shape": [1043, 981]}
Distance: 0.25
Poni1: 0.0845
Poni2: 0.0906
Rot1: 0.0
Rot2: 0.0
Rot3: 0.0
Wavelength: 1.0332e-10
"""

_V1 = """\
PixelSize1: 1.72e-4
PixelSize2: 1.72e-4
Distance: 0.25
Poni1: 0.0845
Poni2: 0.0906
Rot1: 0
Rot2: 0
Rot3: 0
Wavelength: 1.0332e-10
"""


def test_parse_poni_v1_v2_equivalent():
    g1, g2 = parse_poni(_V1), parse_poni(_V2)
    assert g2.detector == "Pilatus1M"
    for f in ("dist", "poni1", "poni2", "rot1", "rot2", "rot3",
              "pixel1", "pixel2", "wavelength"):
        assert getattr(g1, f) == getattr(g2, f), f
    assert g1.dist == 0.25 and g1.pixel1 == 1.72e-4
    assert g1.wavelength == 1.0332e-10
    with pytest.raises(ValueError, match="Distance"):
        parse_poni("Poni1: 0.1\n")


def test_find_poni_search_order(tmp_path, monkeypatch):
    """getAI: existing path wins; else folder, its parents, cwd, home
    (trx/azav.py:190-212)."""
    parent = tmp_path / "exp"
    sub = parent / "run1" / "data"
    sub.mkdir(parents=True)
    (parent / "det.poni").write_text(_V2)
    # found by walking up from the data folder
    assert find_poni("det.poni", folder=str(sub)) == str(parent / "det.poni")
    # a direct existing path wins
    direct = tmp_path / "other.poni"
    direct.write_text(_V1)
    assert find_poni(str(direct), folder=str(sub)) == str(direct)
    # cwd fallback (isfile on the bare name already hits in cwd)
    monkeypatch.chdir(parent)
    assert os.path.samefile(find_poni("det.poni"), parent / "det.poni")
    with pytest.raises(FileNotFoundError):
        find_poni("missing.poni", folder=str(sub))


import os  # noqa: E402  (used above after monkeypatch.chdir)


def test_apply_overrides_getai_kwargs():
    """E->wavelength, pixel->both axes, xcen/ycen->poni2/poni1 AFTER
    pixel (trx/azav.py:213-226)."""
    g = apply_overrides(parse_poni(_V2), E=10.0, pixel=100e-6, xcen=50, ycen=20)
    assert g.wavelength == pytest.approx(12.398e-10 / 10.0)
    assert g.pixel1 == g.pixel2 == 100e-6
    assert g.poni2 == pytest.approx(50 * 100e-6)
    assert g.poni1 == pytest.approx(20 * 100e-6)


def test_geometry_table_rot0_closed_form(spark):
    """rot=0: 2theta = arctan(r/L) pixel-center math, q in 1/Angstrom,
    chi = atan2(t1, t2) degrees, solid angle = A cos^3(2theta)/L^2."""
    geom = PoniGeometry(
        dist=0.1, poni1=8 * 1e-4, poni2=8 * 1e-4,
        pixel1=1e-4, pixel2=1e-4, wavelength=1e-10,
    )
    rows = poni_geometry_table(spark, geom, (16, 16)).collect()
    assert len(rows) == 16 * 16
    got = {(r["y"], r["x"]): r for r in rows}
    for (y, x) in [(0, 0), (7, 7), (15, 3), (4, 12)]:
        p1 = (y + 0.5) * 1e-4 - 8e-4
        p2 = (x + 0.5) * 1e-4 - 8e-4
        r = math.hypot(p1, p2)
        tth = math.atan2(r, 0.1)
        q_ref = 4.0 * math.pi / (1e-10 * 1e10) * math.sin(tth / 2.0)
        g = got[(y, x)]
        assert g["q"] == pytest.approx(q_ref, rel=1e-12)
        assert g["chi"] == pytest.approx(math.degrees(math.atan2(p1, p2)), rel=1e-12)
        assert g["solid_angle"] == pytest.approx(
            1e-8 / 0.01 * math.cos(tth) ** 3, rel=1e-12
        )
        assert g["pol_corr"] == 1.0


def test_geometry_table_rot_tilts_move_beam_center(spark):
    """A pure rot2 tilt (rotation ABOUT axis 2) swings the direct beam
    along axis 1, sign per the pyFAI convention; rot1 swings it along
    axis 2. With no tilt the minimum-2theta pixel straddles the poni."""
    base = dict(dist=0.1, poni1=8e-4, poni2=8e-4,
                pixel1=1e-4, pixel2=1e-4, wavelength=1e-10)

    def argmin_q(g):
        rows = poni_geometry_table(spark, g, (16, 16)).collect()
        return min(rows, key=lambda r: r["q"])

    r0 = argmin_q(PoniGeometry(**base))
    # poni = 8e-4 m sits on the 7/8 pixel boundary (p = 0 at idx 7.5)
    assert r0["y"] in (7, 8) and r0["x"] in (7, 8)
    up = argmin_q(PoniGeometry(**base, rot2=0.004))
    dn = argmin_q(PoniGeometry(**base, rot2=-0.004))
    assert up["y"] > 8 and dn["y"] < 7          # walked along axis 1
    assert up["x"] in (7, 8) and dn["x"] in (7, 8)
    side = argmin_q(PoniGeometry(**base, rot1=0.004))
    assert side["x"] not in (7, 8) and side["y"] in (7, 8)  # axis 2


def test_dofolder_poni_end_to_end(spark, tmp_path):
    """compat.doFolder(poni='det.poni') == doFolder with the
    equivalently-generated geometry table (golden E1 equivalence);
    detector shape probed from the first image."""
    from trx_spark import compat
    from trx_spark.operators.multimodal import encode_edf

    (tmp_path / "det.poni").write_text(
        "Distance: 0.1\nPoni1: 8e-4\nPoni2: 8e-4\n"
        "PixelSize1: 1e-4\nPixelSize2: 1e-4\nWavelength: 1e-10\n"
    )
    rng = np.random.default_rng(7)
    img = rng.uniform(10.0, 60.0, size=(16, 16))
    (tmp_path / "a.edf").write_bytes(encode_edf(img))

    via_poni = compat.doFolder(
        spark, str(tmp_path), poni="det.poni", nQ=8, qlims=(0.0, 0.2)
    ).toPandas().sort_values("q_bin").reset_index(drop=True)
    geom = poni_geometry_table(
        spark, parse_poni((tmp_path / "det.poni").read_text()), (16, 16)
    )
    via_table = compat.doFolder(
        spark, str(tmp_path), geom, nQ=8, qlims=(0.0, 0.2)
    ).toPandas().sort_values("q_bin").reset_index(drop=True)
    assert via_poni.equals(via_table)
    assert len(via_poni) > 0

    with pytest.raises(ValueError, match="geometry DataFrame or poni"):
        compat.doFolder(spark, str(tmp_path), nQ=8)
