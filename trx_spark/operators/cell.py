"""Crystallographic reflection lists as a generated-table query
(trx/cell.py:8-61 re-expressed as range → cross-join → filter → groupBy).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Triclinic:
    """Precomputed s-coefficients of the triclinic metric
    (trx/cell.py:8-41). Pure driver-side scalars — they parameterize the
    generated query; the hkl enumeration itself is distributed."""

    def __init__(self, a=1.0, b=1.0, c=1.0, alpha=90.0, beta=90.0, gamma=90.0):
        al, be, ga = (math.radians(v) for v in (alpha, beta, gamma))
        self.s11 = b**2 * c**2 * math.sin(al) ** 2
        self.s22 = a**2 * c**2 * math.sin(be) ** 2
        self.s33 = a**2 * b**2 * math.sin(ga) ** 2
        self.s12 = a * b * c**2 * (math.cos(al) * math.cos(be) - math.cos(ga))
        self.s23 = a**2 * b * c * (math.cos(be) * math.cos(ga) - math.cos(al))
        self.s13 = a * b**2 * c * (math.cos(ga) * math.cos(al) - math.cos(be))
        self.V = (a * b * c) * math.sqrt(
            1
            - math.cos(al) ** 2
            - math.cos(be) ** 2
            - math.cos(ga) ** 2
            + 2 * math.cos(al) * math.cos(be) * math.cos(ga)
        )


def cubic(a: float) -> Triclinic:
    return Triclinic(a=a, b=a, c=a)


def reflection_list_cubic(
    spark: SparkSession, *, a: float, max_q: float = 3.0, lim: int = 10
) -> DataFrame:
    """Cubic-cell reflection list grouped by the integer s = h²+k²+l²
    (bijective with q = 2π·√s/a, so no float group key is needed —
    trx/cell.py:43-61 groups by q rounded to 12 dp instead; identical
    multiplicities for a cubic cell, e.g. Si at cell.py:106)."""
    r = spark.range(-lim, lim + 1)
    hkl = r.toDF("h").crossJoin(r.toDF("k")).crossJoin(r.toDF("l"))
    s = F.col("h") * F.col("h") + F.col("k") * F.col("k") + F.col("l") * F.col("l")
    q = F.lit(2 * math.pi) * F.sqrt(F.col("s")) / F.lit(a)
    return (
        hkl.withColumn("s", s)
        .withColumn("q", q)
        .filter(F.col("q") < max_q)
        .groupBy("s", "q")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


def reflection_list(
    spark: SparkSession,
    cell: Triclinic,
    *,
    max_q: float = 3.0,
    lim: int = 10,
    round_q: bool = True,
) -> DataFrame:
    """Enumerate Miller indices in [-lim, lim]³, compute q = 2π/d via the
    triclinic metric, keep q < max_q, and aggregate multiplicities per
    distinct q (rounded to 12 dp to make the float a groupable key —
    trx/cell.py:43-61 ``reflection_list``, same rounding at :55).

    J4 in SURVEY §2.3: spark.range × 3 cross-join. (2·lim+1)³ rows are
    generated distributed — no driver-side itertools.product.
    """
    r = spark.range(-lim, lim + 1)
    hkl = (
        r.toDF("h")
        .crossJoin(r.toDF("k"))
        .crossJoin(r.toDF("l"))
    )
    # coefficient · (integer product) with pre-doubled cross terms: the
    # exact association is mirrored in the oracle SQL so q is bit-equal
    temp = (
        F.lit(cell.s11) * (F.col("h") * F.col("h"))
        + F.lit(cell.s22) * (F.col("k") * F.col("k"))
        + F.lit(cell.s33) * (F.col("l") * F.col("l"))
        + F.lit(2 * cell.s12) * (F.col("h") * F.col("k"))
        + F.lit(2 * cell.s23) * (F.col("k") * F.col("l"))
        + F.lit(2 * cell.s13) * (F.col("h") * F.col("l"))
    )
    # q = 2π/d with d = V/sqrt(temp); fold to q = 2π·sqrt(temp)/V so the
    # (0,0,0) reflection yields q = 0 without an IEEE ∞ intermediate
    # (numpy reaches the same value via V/sqrt(0) → inf → q = 0).
    q = F.lit(2 * math.pi) * F.sqrt(temp) / F.lit(cell.V)
    # round-to-12dp makes q a groupable key like the reference
    # (cell.py:55); round_q=False groups by the raw double instead —
    # equivalent classes whenever symmetry-equal reflections produce
    # bit-equal q (true for identical expression trees), and exactly
    # reproducible on the DuckDB oracle (decimal rounding of doubles is
    # engine-dependent; raw doubles are not).
    qcol = F.round(q, 12) if round_q else q
    return (
        hkl.withColumn("q", qcol)
        .filter(F.col("q") < max_q)
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .orderBy("q")
    )
