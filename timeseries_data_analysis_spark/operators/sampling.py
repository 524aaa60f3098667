"""Deterministic hash-based sampling / splitting for training pipelines.

Not in the reference (single-node, one dataset); first-class for a
100 TB training-data engine. ``rand()``-based sampling is
non-reproducible across retries and engines, so every operator here
derives its decision from a portable md5 bucket of a stable row id:

- the same row lands in the same split on every run, every engine, and
  every cluster size (md5 is engine-portable — the DuckDB oracles replay
  the identical arithmetic);
- adding data never reshuffles old rows between splits (the
  leakage-safety property hash splits are chosen for);
- the filter is a pure projection — no shuffle, full codegen, and
  Parquet row-group statistics still apply to surviving predicates.

``train_test_split``'s time-ordered cousin lives in ``ml.pipeline``
(temporal leakage control); these are the i.i.d.-sampling counterparts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(col: Column | str, buckets: int = BUCKETS) -> Column:
    """Portable uniform bucket in [0, buckets): md5 8-hex prefix of the
    stringified id → bigint → mod. Stable across engines and runs."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("bigint") % F.lit(buckets))


def hash_split(df: DataFrame, id_col: str,
               splits: list[tuple[str, float]],
               out_col: str = "split") -> DataFrame:
    """Assign every row to a named split by cumulative hash-bucket range.

    ``splits``: [("train", 0.9), ("val", 0.05), ("test", 0.05)] — weights
    must sum to 1. Deterministic in ``id_col``; rows never migrate when
    the table grows.
    """
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(id_col)
    expr = None
    acc = 0.0
    for name, w in splits:
        acc += w
        hi = int(round(acc * BUCKETS))
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise(splits[-1][0]))


def stratified_hash_sample(df: DataFrame, strata_col: str, id_col: str,
                           fractions: dict[str, float],
                           default: float = 0.0) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    The training-data rebalancing primitive (downsample over-represented
    sources/languages): stratum s keeps rows whose bucket falls below
    ``fractions[s] * BUCKETS``. Pure filter — the per-stratum thresholds
    compile to one CASE expression; no shuffle, no sampleBy
    non-determinism, exact reproducibility for data lineage audits.
    """
    b = hash_bucket(id_col)
    thr = None
    for s, frac in sorted(fractions.items()):
        hi = F.lit(int(round(frac * BUCKETS)))
        thr = (F.when(F.col(strata_col) == s, hi) if thr is None
               else thr.when(F.col(strata_col) == s, hi))
    thr = thr.otherwise(F.lit(int(round(default * BUCKETS)))) if thr is not None \
        else F.lit(int(round(default * BUCKETS)))
    return df.filter(b < thr)
