"""Scattering-geometry math (trx/utils/scattering.py) as Column math."""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# h*c/e * 1e7 with scipy.constants values → keV·Å conversion constant
_HC_KEV_ANG = 12.398419843320026


def _wavelength(energy: float | None, wavelength: float | None) -> float:
    assert (energy is None) != (wavelength is None), "need exactly one of E / wavelength"
    # the reference uses the rounded 12.398 in radToQ (trx/utils/scattering.py:55)
    return wavelength if wavelength is not None else 12.398 / energy


def rad_to_q(theta: Column | str, *, energy: float | None = None, wavelength: float | None = None) -> Column:
    """q = 4π/λ·sin(θ/2), θ in rad (trx/utils/scattering.py:45-56)."""
    t = F.col(theta) if isinstance(theta, str) else theta
    lam = _wavelength(energy, wavelength)
    return F.lit(4 * math.pi / lam) * F.sin(t / 2)


def deg_to_q(theta: Column | str, **kw) -> Column:
    """Degrees flavor (trx/utils/scattering.py:58-60)."""
    t = F.col(theta) if isinstance(theta, str) else theta
    return rad_to_q(F.radians(t), **kw)


def q_to_two_theta(q: Column | str, *, as_deg: bool = False, energy: float | None = None, wavelength: float | None = None) -> Column:
    """2θ = 2·asin(qλ/4π) (trx/utils/scattering.py:63-74)."""
    qc = F.col(q) if isinstance(q, str) else q
    lam = _wavelength(energy, wavelength)
    theta = 2 * F.asin(qc * F.lit(lam / (4 * math.pi)))
    return F.degrees(theta) if as_deg else theta


def xray_wavelength(energy: Column | str) -> Column:
    """keV → Å (trx/utils/scattering.py:76-78)."""
    e = F.col(energy) if isinstance(energy, str) else energy
    return F.lit(_HC_KEV_ANG) / e


def xray_energy(wavelength: Column | str) -> Column:
    """Å → keV (trx/utils/scattering.py:80-82)."""
    w = F.col(wavelength) if isinstance(wavelength, str) else wavelength
    return F.lit(_HC_KEV_ANG) / w


def volume_fraction(
    concentration_mm: Column | str | float, *, mol_weight_kda: float = 17.0, density: float = 1.347
) -> Column:
    """SAXS volume fraction from concentration (mM), molecular weight
    (kDa) and density (g/ml) — trx/utils/scattering.py:12-19."""
    c = (
        F.lit(float(concentration_mm))
        if isinstance(concentration_mm, (int, float))
        else (F.col(concentration_mm) if isinstance(concentration_mm, str) else concentration_mm)
    )
    return c * F.lit(mol_weight_kda) / F.lit(density) / F.lit(1e3)


def molecular_mass_from_i0(
    i0: Column | str, c_g_ml: Column | str | float, *, density: float = 1.347
) -> Column:
    """Molecular mass (Da) from the extrapolated I(0) — Orthaber et al.
    (2000), trx/utils/scattering.py:21-42."""
    i = F.col(i0) if isinstance(i0, str) else i0
    c = (
        F.lit(float(c_g_ml))
        if isinstance(c_g_ml, (int, float))
        else (F.col(c_g_ml) if isinstance(c_g_ml, str) else c_g_ml)
    )
    delta_rho_m = 2.67e10 / density
    navo = 6e23
    return i * F.lit(navo) / (c * F.lit(delta_rho_m**2))
