"""Skew-mitigation operators: salted two-stage aggregation and salted
broadcast-replicated joins.

The reference runs single-node pandas and never meets key skew; at 100 TB
a handful of heavy-hitter keys (boilerplate documents, a hot user, one
over-represented event type) turn one reducer into the job's critical
path. These helpers implement the classic mitigations with IDENTICAL
results to the unsalted plan, so they oracle-check against plain SQL:

- ``salted_agg``: stage 1 aggregates on (key, salt) — the heavy key's
  rows split across ``n_salt`` reducers; stage 2 combines the (small)
  per-salt partials on the bare key. Works for any algebraic aggregate
  (sum/count/min/max, and avg = sum/count at the end).
- ``salted_broadcast_join``: replicate the small side ``n_salt``× with an
  explicit salt column and join on (key, salt) so a skewed fact key
  spreads across tasks. (AQE skew-join handles most cases now; this is
  the explicit form for when it cannot — e.g. pre-partitioned writes.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Uniform deterministic-per-row salt in [0, n_salt).

    Derived from a hash of all columns rather than ``rand()`` so replays
    are stable (monotonically_increasing_id would break on retry).
    """
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salt)))


def salted_agg(df: DataFrame, keys: list[str], value: str,
               n_salt: int = 16) -> DataFrame:
    """Two-stage skew-safe aggregate of ``value`` by ``keys``.

    Returns (keys..., n, sum_v, min_v, max_v, avg_v) — bit-identical
    semantics to the single-stage groupBy (sums re-associate, which is
    float-order noise only; counts/min/max are exact).

    Scale: stage 1's map-side combine already bounds the shuffle at
    (#distinct keys × n_salt) rows per partition; stage 2 shuffles that
    tiny partial table. A key owning 30% of 100 TB stops mattering.
    """
    salted = with_salt(df.select(*keys, value), n_salt)
    partial = (salted.groupBy(*keys, "_salt")
               .agg(F.count(F.lit(1)).alias("_n"),
                    F.sum(value).alias("_sum"),
                    F.min(value).alias("_min"),
                    F.max(value).alias("_max")))
    return (partial.groupBy(*keys)
            .agg(F.sum("_n").alias("n"),
                 F.sum("_sum").alias("sum_v"),
                 F.min("_min").alias("min_v"),
                 F.max("_max").alias("max_v"),
                 (F.sum("_sum") / F.sum("_n")).alias("avg_v")))


def salted_broadcast_join(fact: DataFrame, dim: DataFrame, key: str,
                          n_salt: int = 8, how: str = "inner") -> DataFrame:
    """Join a skew-keyed fact to a small dim by replicating the dim rows
    ``n_salt``× and joining on (key, salt): every fact partition of a hot
    key matches a local dim replica instead of funneling into one task.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(F.col(key), F.lit(0x5bd1)), F.lit(n_salt)))
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    out = salted_fact.join(F.broadcast(replicated), on=[key, "_salt"], how=how)
    return out.drop("_salt")
