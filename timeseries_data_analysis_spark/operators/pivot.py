"""Pivot (long→wide) and melt (wide→long) (SURVEY.md §2.4 A2, §1.4).

Reference: ``pivot_table(index=DATE, columns=FAN, values=..., aggfunc=
'mean')`` + multi-index flatten (``pre_processing.py:110-157``), and the
wide 500-column feature frame. The engine's core layout decision is the
*opposite* direction: keep data long ``(ts, series, value)`` through the
window-heavy stages (one window pass covers all series), pivot wide only
at the ML/serving boundary.

Scale notes:
- ``pivot_wide`` REQUIRES an explicit ``values=[...]`` list at scale —
  without it Spark runs an extra distinct() job over the pivot column.
- ``melt`` uses the built-in ``unpivot`` (Spark ≥3.4) — a generator
  expression, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(df: DataFrame, index: list[str], pivot_col: str,
               value_col: str, values: list[str] | None = None,
               agg: str = "avg", prefix: str = "") -> DataFrame:
    """Long → wide: one column per pivot key, aggregated by ``agg``.

    Reference ``pivot_table`` with name flattening ``f'{FAN}_{metric}'``
    (``pre_processing.py:110-117``): pass ``prefix`` to reproduce the
    flattened names.
    """
    fn = getattr(F, agg)
    p = df.groupBy(*index).pivot(pivot_col, values)
    out = p.agg(fn(value_col))
    if prefix:
        renames = {c: f"{prefix}{c}" for c in out.columns if c not in index}
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
    return out


def melt(df: DataFrame, id_cols: list[str], value_cols: list[str] | None = None,
         key_name: str = "series", value_name: str = "value") -> DataFrame:
    """Wide → long: the engine's preferred layout for window stages.

    E.g. ``zone_temperature(DATETIME, ZONE_0..ZONE_10)`` →
    ``(DATETIME, series, value)`` so W1-W12 run as ONE window over
    ``partitionBy(series)`` instead of 11 (or 500) separate specs
    (SURVEY.md §4 point 3 — this is the physical-plan optimization).
    """
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in id_cols]
    return df.unpivot(id_cols, value_cols, key_name, value_name)
