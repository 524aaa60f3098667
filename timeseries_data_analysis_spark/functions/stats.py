"""Normal-distribution tails as pure column expressions.

Spark has no erf/erfc built-in, and a Python UDF would put a
per-row Python hop in an otherwise codegen'd plan — so the standard
Abramowitz & Stegun 7.1.26 rational approximation (|error| < 1.5e-7,
far below the 6-dp rounding every p-value here carries) is expanded
as literal column arithmetic. The coefficients live HERE as module
constants so the SQL oracle regenerates the identical doubles via
``repr`` (the ``spectral.OMEGAS_DAILY`` shared-literal pattern) and
both engines run the same Horner chain; the only cross-engine
surface is one ``exp`` call (JVM vs libm, ≤1 ulp), absorbed by the
6-dp round every consumer applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Abramowitz & Stegun 7.1.26 erf coefficients
AS_P = 0.3275911
AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027,
        1.061405429)
SQRT2 = 2 ** 0.5


def erfc_pos(x: Column) -> Column:
    """erfc(x) for x ≥ 0 via A&S 7.1.26: t = 1/(1+p·x), erfc =
    (a₁t + a₂t² + … + a₅t⁵)·e^(−x²) — written as the Horner chain
    ``t·(a₁ + t·(a₂ + …))`` so an SQL twin spelled the same way runs
    the identical operation sequence."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(AS_P) * x)
    a1, a2, a3, a4, a5 = (F.lit(c) for c in AS_A)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return poly * F.exp(-x * x)


def two_sided_p(z: Column) -> Column:
    """Two-sided normal p-value for a z statistic:
    p = 2(1 − Φ(|z|)) = erfc(|z|/√2)."""
    return erfc_pos(F.abs(z) / F.lit(SQRT2))


def erfc_pos_sql(x_expr: str) -> str:
    """The DuckDB spelling of :func:`erfc_pos` over the SQL expression
    ``x_expr`` (which must be ≥ 0), with coefficients injected via
    ``repr`` so both engines see bit-identical literals."""
    p = repr(AS_P)
    a1, a2, a3, a4, a5 = (repr(c) for c in AS_A)
    t = f"(1.0::DOUBLE / (1.0::DOUBLE + {p} * ({x_expr})))"
    poly = (f"({t} * ({a1} + {t} * ({a2} + {t} * ({a3} + {t} "
            f"* ({a4} + {t} * {a5})))))")
    return f"({poly} * exp(-({x_expr}) * ({x_expr})))"


def two_sided_p_sql(z_expr: str) -> str:
    """DuckDB spelling of :func:`two_sided_p`."""
    return erfc_pos_sql(f"abs({z_expr}) / {repr(SQRT2)}")


def half_up(x: float, digits: int = 6) -> float:
    """Python twin of ``F.round(x + 1e-9, digits)`` — HALF_UP away from
    zero after the repo's standard +1e-9 nudge. THE single rounding
    law: every Python-side lane that must land on the same decimal
    grid as a Spark/DuckDB ``round`` (streaming monitors, recursive
    operators, test references) imports this instead of re-deriving
    it — a drifted copy silently diverges an engine twin."""
    import math

    y = (x + 1e-9) * 10 ** digits
    return (math.floor(y + 0.5) if y >= 0
            else math.ceil(y - 0.5)) / 10 ** digits
