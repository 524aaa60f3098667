"""Deterministic distinct-count sketches (KMV / bottom-k).

The classic k-minimum-values estimator (Bar-Yossef et al. 2002 /
Beyer et al. 2007 "distinct sampling"): hash every distinct item to a
uniform fraction in [0, 1); keep only the k smallest hashes per group.
If a group holds at least k distinct items, the k-th smallest hash
``h_k`` estimates the cardinality as ``(k - 1) / h_k``; groups with
fewer than k distinct items are counted exactly (their bottom-k set IS
the distinct set).

Why this and not ``approx_count_distinct``: Spark's HLL++ sketch is
engine-internal state — its estimate cannot be replayed by an external
SQL engine, so it can never carry a cross-engine value oracle. KMV with
an md5-derived hash is engine-portable: the same ``(k-1)/h_k``
arithmetic over the same 60-bit hash fractions reproduces bit-identical
estimates anywhere md5 exists, which is exactly the property every
operator in this repo is held to.

Scale shape: the map side reduces to DISTINCT (group, item) — shuffled
as hashes, map-side combined — then a per-group bottom-k window over the
group key (key-partitioned, never a global sort). The sketch state per
group is k doubles, independent of group cardinality; merging partial
sketches = union + re-take bottom-k, which is what the groupBy already
does. At 100 TB the shuffle carries one row per distinct (group, item)
pair at most — the same cost as exact countDistinct — but the ESTIMATE
path exists so downstream consumers (mergeable profiles, incremental
rollups under plans/incremental.py's algebraic-partial contract) can
keep k rows per group instead of the full distinct set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^15 = 2^60: the md5-prefix integer below is uniform on [0, 2^60).
_KMV_DENOM = float(1 << 60)


def hash_frac(col: Column) -> Column:
    """Deterministic uniform fraction in [0, 1): the first 15 hex digits
    of md5 as a 60-bit integer over 2^60. Portable: DuckDB replays it as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT / 2^60``."""
    return (F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
            / F.lit(_KMV_DENOM))


def kmv_distinct(df: DataFrame, group_col: str, item_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns ``(group_col, n_kept, kth_frac, est)`` where ``est`` is the
    bottom-k estimate ``(k-1)/h_k`` when the group has ≥ k distinct
    items, else the exact distinct count. ``n_kept`` (= min(k, distinct))
    and ``kth_frac`` are exposed so audits can see the sketch state.

    NULL items are ignored (they hash to NULL and drop out of the
    bottom-k window), matching countDistinct's NULL semantics.
    """
    pairs = (df.select(F.col(group_col), F.col(item_col).alias("_item"))
             .filter(F.col("_item").isNotNull())
             .distinct()
             .select(group_col, hash_frac(F.col("_item")).alias("_f")))
    w = Window.partitionBy(group_col).orderBy("_f")
    bottom = (pairs.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= k))
    agg = bottom.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_f").alias("kth_frac"))
    return agg.select(
        group_col, "n_kept", "kth_frac",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("kth_frac")).alias("est"))


def heavy_hitters(df: DataFrame, item_col: str, threshold_inv: int = 500,
                  k: int | None = None) -> DataFrame:
    """Exact frequent items above support 1/``threshold_inv`` via a
    two-pass Misra-Gries sketch: items with count > N/threshold_inv,
    with EXACT counts — without ever shuffling the long tail.

    Pass 1 (``mapInPandas``): each partition folds its items through a
    mergeable Misra-Gries summary of size ``k`` (default
    4 × threshold_inv) — per Arrow batch, add exact batch counts into
    the running summary, then compress by subtracting the (k+1)-largest
    weight and dropping non-positives (the mergeable-summaries MERGE of
    Agarwal et al., PODS'12, which preserves the N_p/(k+1) error bound).
    Pass 2: the candidate union is inner-joined back (broadcast — at
    most k rows per partition survive) and ONLY candidate items are
    exactly recounted and thresholded.

    Output is DETERMINISTIC despite the partition-dependent sketch:
    pigeonhole gives every item with global count > N/(k+1) a partition
    where its local count exceeds N_p/(k+1), so with k+1 > threshold_inv
    the candidate set is a superset of every qualifying item under ANY
    partitioning; the exact recount then keeps precisely the qualifiers.

    Why not plain groupBy-count: correctness-equal, but the full
    aggregation shuffles one row per DISTINCT item (billions for web
    tokens). Here the shuffle carries ≤ k rows per partition (candidates)
    plus the map-side-combined counts of candidate items only — the
    sketch prunes the tail before the exchange, which is the entire
    point at 100 TB.

    Returns ``(item, cnt, share)`` with share = cnt/N rounded to 6.
    """
    import pandas as pd

    if k is None:
        k = 4 * threshold_inv
    if k + 1 <= threshold_inv:
        raise ValueError(
            f"k ({k}) must be >= threshold_inv ({threshold_inv}) for the "
            "superset guarantee — candidates would miss true heavy hitters")

    items = df.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull())

    def mg_partition(batches):
        summary: dict = {}
        for pdf in batches:
            vc = pdf["item"].value_counts()
            for it, c in vc.items():
                summary[it] = summary.get(it, 0) + int(c)
            if len(summary) > k:
                # mergeable compress: subtract the (k+1)-largest weight
                cut = sorted(summary.values(), reverse=True)[k]
                summary = {i: c - cut for i, c in summary.items() if c > cut}
        if summary:
            yield pd.DataFrame({"item": list(summary.keys())})

    candidates = (items.mapInPandas(mg_partition, "item string")
                  .distinct())
    total = items.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    exact = (items.join(F.broadcast(candidates), on="item")
             .groupBy("item").agg(F.count(F.lit(1)).alias("cnt")))
    return (exact.join(F.broadcast(total))
            .filter(F.col("cnt") * F.lit(threshold_inv) > F.col("_n"))
            .select("item", "cnt",
                    F.round(F.col("cnt") / F.col("_n") + F.lit(1e-9), 6)
                    .alias("share")))
