"""Order-independent, engine-independent ("exact") aggregation helpers.

Floating-point sums depend on accumulation order, so a Spark partial-agg
tree and the single-threaded DuckDB oracle disagree in the last ulps —
and (measured) the two engines even cast DOUBLE→DECIMAL differently
(Spark goes through the shortest decimal representation, DuckDB through
the exact binary expansion). What IS bit-identical across engines is
plain IEEE-754 double arithmetic on identical expression trees, and
64-bit integer arithmetic.

So "exact" aggregation here means **fixed-point integer sums**:

    sum(x)  ≜  CAST(SUM(CAST(FLOOR(x · S) AS BIGINT)) AS DOUBLE) / S

``x · S`` and ``FLOOR`` are deterministic IEEE ops, the integer sum is
exact in any order, and BIGINT→DOUBLE is correctly rounded everywhere.
The truncation bias (≤ 1/S per addend) is identical on both engines, so
the correctness gate compares bit-equal values; production paths use
native double aggregation (faster) — ``exact`` is a per-operator flag.

Scale choice: S=1e6 handles |x| ≤ ~1e12 with ≤ 9e18/1e6-row headroom;
use S=1e12 for small-magnitude data (embeddings) needing more digits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000.0


def fint(col: Column, scale: float = SCALE) -> Column:
    """The fixed-point addend: FLOOR(x·S) as BIGINT (null-preserving)."""
    return F.floor(col * F.lit(scale)).cast("long")


def dsum(col: Column, scale: float = SCALE) -> Column:
    """Order/engine-independent SUM, returned as double."""
    return F.sum(fint(col, scale)).cast("double") / F.lit(scale)


def davg(col: Column, scale: float = SCALE) -> Column:
    """Order/engine-independent AVG = exact sum / count of non-nulls."""
    return dsum(col, scale) / F.count(col)


def dstddev_pop(col: Column, scale: float = SCALE, sq_scale: float | None = None) -> Column:
    """Population std-dev via exact sums: sqrt((Σx² − (Σx)²/n)/n).

    Matches numpy ``nanstd`` ddof=0 (trx uses it at dataReduction.py:175)
    up to fixed-point truncation — identically on Spark and the oracle.
    Clamped at 0 against round-off. ``sq_scale`` defaults to ``scale``
    (lower it when x² would overflow the 64-bit accumulator).
    """
    n = F.count(col)
    s1 = dsum(col, scale)
    s2 = dsum(col * col, sq_scale if sq_scale is not None else scale)
    var = (s2 - s1 * s1 / n) / n
    return F.sqrt(F.greatest(var, F.lit(0.0)))


# --- SQL fragment builders for the DuckDB oracle side -----------------
# These must stay textually parallel to the Column builders above: the
# whole parity argument rests on identical expression trees.

def dlit(v: float) -> str:
    """A DuckDB literal guaranteed to parse as DOUBLE: an exponent
    forces the approximate-literal path. Plain decimals go through
    DECIMAL first, and for > 15 significant digits the scaled mantissa
    can exceed 2^53, where DECIMAL→DOUBLE conversion is not guaranteed
    correctly rounded — an ulp off vs Spark's strtod literal breaks the
    bit-exact parity gate. repr() round-trips doubles, so the exponent
    form parses back to the identical bits on both engines."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r) else r + "e0"


def sql_fint(expr: str, scale: float = SCALE) -> str:
    return f"CAST(FLOOR(({expr}) * {scale!r}) AS BIGINT)"


def sql_dsum(expr: str, scale: float = SCALE) -> str:
    # DuckDB sums BIGINT into HUGEINT; squeeze back through BIGINT (exact
    # for our magnitudes) so the →DOUBLE conversion is the same correctly
    # rounded int64→double as Spark's.
    return f"(CAST(CAST(SUM({sql_fint(expr, scale)}) AS BIGINT) AS DOUBLE) / {scale!r})"


def sql_davg(expr: str, scale: float = SCALE) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"


def sql_dstddev_pop(expr: str, scale: float = SCALE, sq_scale: float | None = None) -> str:
    n = f"COUNT({expr})"
    s1 = sql_dsum(expr, scale)
    s2 = sql_dsum(f"({expr}) * ({expr})", sq_scale if sq_scale is not None else scale)
    return f"SQRT(GREATEST((({s2}) - ({s1}) * ({s1}) / {n}) / {n}, 0.0))"
