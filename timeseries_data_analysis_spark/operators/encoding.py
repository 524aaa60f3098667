"""Categorical encoding operators (SURVEY.md §2.7 encoding family).

Reference: ``astype('category').cat.codes`` (``simple_pre_processing.py:592``),
``get_dummies`` limited to the top-10 values + implicit 'other'
(``simple_pre_processing.py:608-621``), and the zone↔sequential-index bimap
(``pre_processing.py:1540-1560``).

Scale design: the code table (distinct values) is tiny by definition of
"categorical" — build it once with a groupBy (map-side combined) and
broadcast-join it back. Never ``collect()`` the column to the driver to
enumerate values; the dummies' value list IS driver-side (it parameterizes
the schema — column names must be known at plan time), so it comes from a
bounded top-N query, not a full distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def category_codes(df: DataFrame, col: str, code_col: str | None = None,
                   max_vocab: int | None = None) -> DataFrame:
    """Append an integer code per distinct value (0-based, lexicographic;
    NULL → -1, matching pandas ``cat.codes`` where NaN categories code
    as -1 — reference ``simple_pre_processing.py:592``).

    The code table derives from the NON-NULL distinct values (groupBy +
    ``dense_rank``), then broadcast-joins back: the fact table is scanned
    once, no global sort on the fact side; NULL rows miss the join and
    coalesce to -1.

    CONTRACT — bounded vocabulary. The design assumes the distinct-value
    set fits one executor twice over: the ``dense_rank`` window ranks the
    (already-aggregated) distinct frame on ONE partition, and the code
    table is BROADCAST back. Both are right for categorical columns (the
    reference's pandas semantics — its categoricals are zone names,
    grades, priorities: tens of values); for a high-cardinality key the
    broadcast, not the rank, breaks first, and the right operator is a
    join against a precomputed dimension, not per-query encoding. Pass
    ``max_vocab`` to enforce the bound (one bounded count on the distinct
    frame, raises when exceeded) when the column's cardinality is not
    known by construction.
    """
    code_col = code_col or f"{col}_code"
    distinct = (df.filter(F.col(col).isNotNull())
                .groupBy(col).agg(F.count(F.lit(1)).alias("_n")))
    if max_vocab is not None:
        n = distinct.limit(max_vocab + 1).count()
        if n > max_vocab:
            raise ValueError(
                f"category_codes: column {col!r} has more than "
                f"{max_vocab} distinct values — the bounded-vocabulary "
                "contract does not hold; use a dimension-table join")
    codes = distinct.select(col, (F.dense_rank().over(
        Window.orderBy(col)) - 1).alias(code_col))
    return (df.join(F.broadcast(codes), on=col, how="left")
            .withColumn(code_col, F.coalesce(F.col(code_col), F.lit(-1))))


def top_n_values(df: DataFrame, col: str, n: int = 10) -> list[str]:
    """The top-N most frequent values (ties break lexicographically).

    Driver-side by necessity: the result parameterizes dummy COLUMN NAMES,
    which Spark needs at plan time. The query underneath is a bounded
    top-N (TakeOrderedAndProject), safe at any scale.
    """
    rows = (df.filter(F.col(col).isNotNull())
            .groupBy(col).agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.col("_n").desc(), F.col(col)).limit(n).collect())
    return [r[0] for r in rows]


def dummies(df: DataFrame, col: str, values: list[str],
            other: bool = True, prefix: str | None = None) -> DataFrame:
    """One-hot 0/1 flags for an explicit value list (+ 'other' bucket).

    Reference ``get_dummies`` on the top-10 values with everything else in
    'other' (``simple_pre_processing.py:608-621``). Pure ``when()``
    projection — no shuffle, stays in whole-stage codegen.
    """
    prefix = prefix if prefix is not None else col
    out = [F.when(F.col(col) == v, 1).otherwise(0).alias(f"{prefix}_{v}")
           for v in values]
    if other:
        out.append(
            F.when(F.col(col).isin(values) | F.col(col).isNull(), 0)
            .otherwise(1).alias(f"{prefix}_other"))
    return df.select("*", *out)
