"""Scalar function library — pure Column expressions, no UDFs.

Everything here stays inside whole-stage codegen; nothing crosses the
JVM/Python boundary at execution time.
"""

from trx_spark.functions.strings import (  # noqa: F401
    basename,
    delay_to_num,
    get_delay_from_string,
    remove_ext,
    str_to_time,
    time_to_str,
)
from trx_spark.functions.scattering import (  # noqa: F401
    deg_to_q,
    q_to_two_theta,
    rad_to_q,
    xray_energy,
    xray_wavelength,
)
from trx_spark.functions.absorption import (  # noqa: F401
    beer_lambert_transmission,
    charge_to_photon,
    phosphor_correction,
)
