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

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    the table grows. NULL ids hash to NULL buckets and fall through the
    when-chain into the LAST named split (deterministic, but treat a
    NULL id as a data-quality error upstream); in
    ``stratified_hash_sample`` a NULL id is dropped by the filter.
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


def weighted_hash_sample(df: DataFrame, weight: Column,
                         id_col: str) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    ``weight`` (a per-row [0,1] Column, e.g. a quality score) — the
    data-mixing primitive behind quality-weighted corpus construction.

    Same design contract as the other samplers: the accept decision is
    ``hash_bucket(id) < round(weight·BUCKETS)`` — a pure filter (no
    shuffle, no rand() nondeterminism), reproducible across engines,
    retries, and cluster sizes, and stable under table growth. The
    realized kept-fraction converges to E[weight] by uniformity of the
    md5 bucket.

    NULL / out-of-range weights (same style as ``hash_split``'s NULL-id
    note): a NULL weight makes the predicate NULL, so the row is DROPPED
    — i.e. NULL means "never sample", which is the safe default for a
    quality score that failed to compute. Weights are clamped to [0, 1]
    before thresholding, so a weight > 1 keeps (not over-keeps) and a
    negative weight drops — the documented probability contract holds
    for any finite input.
    """
    # NOTE: Spark's least/greatest SKIP nulls, so a bare clamp would
    # turn a NULL weight into 1.0 (always-keep); the isNotNull guard
    # keeps NULL → NULL threshold → row dropped.
    clamped = F.when(weight.isNotNull(),
                     F.greatest(F.lit(0.0), F.least(weight, F.lit(1.0))))
    thr = F.round(clamped * F.lit(float(BUCKETS)), 0).cast("bigint")
    return df.filter(hash_bucket(id_col) < thr)


def pack_next_fit(df: DataFrame, id_col: str, token_col: str,
                  budget: int, n_buckets: int = 32) -> DataFrame:
    """Sequence packing: group documents into packs of ≤ ``budget`` total
    tokens — the training-efficiency primitive that turns ragged
    documents into dense fixed-budget training sequences.

    Packing is inherently order-dependent, so the operator makes the
    order DETERMINISTIC and parallel: docs are bucketed by
    ``id % n_buckets`` (portable arithmetic), and within each bucket the
    next-fit rule runs over ascending ids — a new pack starts whenever
    adding the next doc would exceed the budget (an oversized doc gets a
    pack of its own). Buckets pack independently: one ``applyInPandas``
    stage, parallelism = ``n_buckets`` (set it to O(cluster cores); pack
    quality is unaffected since packs never span buckets).

    Output: (bucket, pack_idx, ``id_col``, ``token_col``) — one row per
    doc with its pack assignment. Precondition: non-null ids and token
    counts (token counts from ``size()`` are always >= 0); ENFORCED —
    a NULL id or token count raises at execution rather than silently
    packing the whole NULL bucket as one pandas group (which would
    diverge from any id-ordered replay). Deterministic in the input
    set, so an external engine replays it exactly (recursive-CTE
    oracle).
    """
    base = df.select(
        (F.col(id_col) % n_buckets).cast("bigint").alias("bucket"),
        F.col(id_col).alias("_id"),
        F.col(token_col).cast("bigint").alias("_tok"))
    schema = T.StructType([
        T.StructField("bucket", T.LongType()),
        T.StructField("pack_idx", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField(token_col, T.LongType()),
    ])
    bud = budget

    def pack(key, pdf):
        if pdf["_id"].isna().any() or pdf["_tok"].isna().any():
            raise ValueError(
                "pack_next_fit: NULL id or token count in input — the "
                "deterministic id-ordered packing contract requires "
                "non-null keys; filter them upstream")
        pdf = pdf.sort_values("_id")
        packs, acc, cur = [], 0, 0
        for tok in pdf["_tok"]:
            if packs and acc + tok <= bud:
                acc += tok
            else:
                cur += 1 if packs else 0
                acc = tok
            packs.append(cur)
        return pd.DataFrame({
            "bucket": pdf["bucket"].values, "pack_idx": packs,
            id_col: pdf["_id"].values, token_col: pdf["_tok"].values})

    return base.groupBy("bucket").applyInPandas(pack, schema)


def weighted_reservoir(df: DataFrame, weight: Column, id_col: str,
                       k: int = 200, digits: int = 6) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    (2006) exponential keys — the principled fixed-size companion to
    :func:`weighted_hash_sample`'s Bernoulli keep/drop: every row draws
    key = ln(u)/w (u the deterministic md5 60-bit uniform of its id,
    w its weight) and the top-``k`` keys ARE a weighted without-
    replacement sample. Deterministic end to end — no rand(), so the
    SAMPLE MEMBERSHIP itself replays in any engine with md5 + ln.

    The ranking key is ROUNDED to ``digits`` dp with an ``id_col``
    tiebreak before the top-k cut (the `ppl_buckets` ordering contract:
    cross-engine libm ulps cannot flip a boundary). Weights must be
    > 0; NULL or non-positive weights drop the row (documented, like
    `weighted_hash_sample`'s NULL contract).

    Scale shape: one projection + one global top-k (TakeOrdered — never
    a full sort); the reservoir semantics need no state because the
    key is a pure function of (id, weight).

    Returns the sampled rows with their ``es_key`` (rounded).
    """
    from timeseries_data_analysis_spark.operators.sketch import hash_frac

    u = hash_frac(F.col(id_col).cast("string"))
    # + 0.0 normalizes the -0.0 a near-1 u would round to (hash-fidelity)
    key = F.round(F.log(u) / weight + F.lit(1e-9), digits) + F.lit(0.0)
    scored = (df.withColumn("_w", weight)
              .filter(F.col("_w").isNotNull() & (F.col("_w") > 0))
              .withColumn("es_key", key))
    return (scored.orderBy(F.col("es_key").desc(), F.col(id_col))
            .limit(k).drop("_w"))
