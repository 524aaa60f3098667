"""Change-data-capture operators: snapshot diffing and slowly-changing
dimension (SCD type-2) history construction.

The warehouse-maintenance counterpart of the reference's batch re-train
loop (``train_models_simple.py`` re-reads the full feature store each
run): at 100 TB you cannot re-read the world, you diff it. These two
operators cover the read side of that contract:

- :func:`snapshot_diff` — given two keyed snapshots of the same logical
  table, classify every key as insert / delete / update / unchanged.
  The incremental-ingest primitive (what changed since the last run?).
- :func:`scd2_from_changelog` — given an event-granularity changelog,
  build the type-2 dimension (one validity interval per state run, with
  ``valid_from`` / ``valid_to`` / ``is_current``) that point-in-time
  joins (:func:`~timeseries_data_analysis_spark.operators.intervals
  .asof_join`'s dimension-side twin) consume.

Both are pure DataFrame compositions — one full-outer join, one pair of
key-partitioned windows — so Catalyst owns the physical strategy: the
snapshot join shuffles both sides on the key hash (broadcast if one
snapshot is a small delta), and the SCD build is one exchange + one sort
per key partition shared by both window functions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Row-level diff of two keyed snapshots.

    Returns one row per key present in either snapshot with
    ``change_type`` ∈ {'insert', 'delete', 'update', 'unchanged'} plus
    ``<col>_old`` / ``<col>_new`` for every compare column. Comparison
    is NULL-safe (``eqNullSafe``): NULL -> NULL is unchanged, NULL ->
    value is an update — the CDC contract a naive ``=`` silently breaks.

    Keys must be unique per snapshot (it IS a snapshot); duplicate keys
    fan out through the join and misclassify, so enforce upstream.
    Scale shape: one shuffle per side on the key hash, no window, no
    driver state; AQE broadcasts the smaller side when the delta is
    small — the common CDC case.
    """
    o = old.select(
        *keys, F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"{c}_old") for c in compare_cols])
    n = new.select(
        *keys, F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"{c}_new") for c in compare_cols])
    j = o.join(n, on=keys, how="full_outer")
    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
         for c in compare_cols])
    change = (F.when(F.col("_in_old").isNull(), F.lit("insert"))
              .when(F.col("_in_new").isNull(), F.lit("delete"))
              .when(same, F.lit("unchanged"))
              .otherwise(F.lit("update")))
    return j.select(*keys, change.alias("change_type"),
                    *[f"{c}_old" for c in compare_cols],
                    *[f"{c}_new" for c in compare_cols])


def scd2_from_changelog(df: DataFrame, key: str, state_cols: list[str],
                        ts_col: str = "ts",
                        order_by: list[str] | None = None) -> DataFrame:
    """Type-2 dimension from an event changelog.

    Collapses consecutive rows with identical ``state_cols`` into one
    validity interval per state run: ``(key, state..., valid_from,
    valid_to, is_current)`` where ``valid_to`` is the NEXT run's start
    (exclusive; NULL on the current run) and ``is_current`` is 0/1.

    ``order_by`` must be a deterministic total order within the key
    (default ``[ts_col]`` — pass a unique tiebreak like ``[ts, id]``
    when timestamps can collide, same contract as every window operator
    in this package). State comparison is NULL-safe, and the first row
    per key always opens an interval (``row_number == 1`` guard — a
    bare ``IS DISTINCT FROM lag`` drops a leading all-NULL state).

    Both windows partition on ``key`` with the same order, so the plan
    is ONE exchange + one sort feeding both the run-boundary filter and
    the ``lead`` — no second shuffle for ``valid_to``.
    """
    ob = order_by or [ts_col]
    w = Window.partitionBy(key).orderBy(*ob)
    prev_same: Column = reduce(
        lambda a, b: a & b,
        [F.lag(c).over(w).eqNullSafe(F.col(c)) for c in state_cols])
    boundary = (F.row_number().over(w) == 1) | ~prev_same
    carry = [key, ts_col] + [c for c in ob if c not in (key, ts_col)]
    carry += [c for c in state_cols if c not in carry]
    runs = (df.select(*carry, boundary.alias("_open"))
            .filter(F.col("_open")))
    w2 = Window.partitionBy(key).orderBy(*ob)
    return (runs.select(
        key, *state_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.when(F.lead(ts_col).over(w2).isNull(), F.lit(1))
        .otherwise(F.lit(0)).alias("is_current")))
