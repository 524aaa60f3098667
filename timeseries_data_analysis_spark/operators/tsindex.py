"""Time-series indexing & similarity primitives: PAA, SAX, z-normalized
series distance.

The data-series literature (Lin et al., "Experiencing SAX", DMKD'07;
iSAX-family indexes as surveyed in Odyssey, VLDB'23) builds everything on
two reductions our engine expresses natively:

- **PAA** (Piecewise Aggregate Approximation): split a z-normalized
  series into ``w`` equal segments and keep each segment's mean — an
  orthogonal projection that lower-bounds Euclidean distance.
- **SAX**: quantize PAA means against standard-normal breakpoints into a
  small alphabet → a short symbol word per series; equal words ⇒ likely-
  similar series, so the word doubles as an LSH-style bucket key for
  candidate pruning at corpus scale (the iSAX root split).

Spark-first: both are one groupBy after a window rank — no UDFs; the
pairwise z-normalized distance is an aligned self-join on the time bucket
(shuffles (key, bucket, z) triples, never raw series).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Standard-normal quantile breakpoints per alphabet size (public constants
# from the SAX papers; a=4 splits N(0,1) mass into quarters).
SAX_BREAKPOINTS = {
    3: [-0.4307273, 0.4307273],
    4: [-0.6744898, 0.0, 0.6744898],
    5: [-0.8416212, -0.2533471, 0.2533471, 0.8416212],
}


def znorm(value: Column, over: Window) -> Column:
    """Population z-normalization over a window (σ=0 guard → 0)."""
    mu = F.avg(value).over(over)
    sd = F.stddev_pop(value).over(over)
    return F.when(sd > 0, (value - mu) / sd).otherwise(F.lit(0.0))


def paa(df: DataFrame, key: str, order_cols: list[str], value_col: str,
        n_segments: int = 8) -> DataFrame:
    """PAA over the z-normalized per-key series.

    Returns (key, segment, paa double) with ``segment`` ∈ [0, n_segments).
    Segment assignment is rank-based (floor(rank·w/len)) so uneven series
    lengths still yield exactly ``w`` segments — one window pass for
    (rank, len, z), one groupBy for the means.
    """
    wk = Window.partitionBy(key)
    wo = wk.orderBy(*order_cols)
    ranked = df.select(
        F.col(key),
        znorm(F.col(value_col), wk).alias("_z"),
        (F.row_number().over(wo) - 1).alias("_rn"),
        F.count(F.lit(1)).over(wk).alias("_len"))
    seg = F.floor(F.col("_rn") * n_segments / F.col("_len")).cast("bigint")
    return (ranked.groupBy(F.col(key), seg.alias("segment"))
            .agg(F.avg("_z").alias("paa")))


def sax_words(paa_df: DataFrame, key: str, alphabet: int = 4,
              round_dp: int = 6) -> DataFrame:
    """SAX word per key from its PAA segments: code each (rounded) segment
    mean against the normal breakpoints, concat in segment order.

    Rounding before coding keeps the symbol stable across engines — a
    mean sitting within float noise of a breakpoint must not flip.
    """
    bps = SAX_BREAKPOINTS[alphabet]
    val = F.round(F.col("paa") + F.lit(1e-9), round_dp)
    code = F.lit(0)
    for bp in bps:
        code = code + F.when(val > F.lit(bp), 1).otherwise(0)
    letter = F.element_at(F.split(F.lit("a,b,c,d,e,f,g,h,i,j"), ","),
                          (code + 1).cast("int"))
    # array_sort on (segment, letter) structs orders by segment; the
    # letters then concat in segment order — no second window needed
    return (paa_df
            .withColumn("_letter", letter)
            .groupBy(key)
            .agg(F.concat_ws("", F.array_sort(F.collect_list(
                F.struct("segment", "_letter"))).getField("_letter"))
                .alias("sax_word")))


def znorm_distance_pairs(df: DataFrame, key: str, bucket_col: str,
                         value_col: str) -> DataFrame:
    """Pairwise z-normalized Euclidean distance between per-key series
    aligned on ``bucket_col``: self-join on the bucket, one agg per pair.

    Σ(za−zb)² over shared buckets; missing buckets simply don't
    contribute (standard practice for gappy telemetry). Returns
    (key_a, key_b, n_common, dist).
    """
    wk = Window.partitionBy(key)
    z = df.select(F.col(key), F.col(bucket_col).alias("_b"),
                  znorm(F.col(value_col), wk).alias("_z"))
    a = z.select(F.col(key).alias("key_a"), "_b", F.col("_z").alias("_za"))
    b = z.select(F.col(key).alias("key_b"), "_b", F.col("_z").alias("_zb"))
    d = F.col("_za") - F.col("_zb")
    return (a.join(b, on="_b")
            .filter(F.col("key_a") < F.col("key_b"))
            .groupBy("key_a", "key_b")
            .agg(F.count(F.lit(1)).alias("n_common"),
                 F.sqrt(F.sum(d * d)).alias("dist")))


def dtw_pairs(profiles: DataFrame, key_col: str, vec_col: str,
              band: int | None = None, max_keys: int = 1000,
              bucket_col: str | None = None) -> DataFrame:
    """All-pairs Dynamic Time Warping distance between per-key profile
    vectors — the elastic-alignment similarity the z-normalized
    Euclidean join cannot express (phase-shifted series score as
    distant under lock-step alignment; DTW warps time to match shapes;
    Sakoe & Chiba 1978, and the standard baseline of the UCR suite).

    ``profiles`` has one row per key with an ``array<double>`` profile
    (align/densify upstream — e.g. an hour-of-day or day-of-week
    aggregate profile, which is how a 100 TB series corpus becomes one
    bounded vector per series BEFORE any pairwise work). The self-join
    is ``key_l < key_r`` over that bounded profile table — quadratic in
    SERIES COUNT, never in observation count; ``max_keys`` enforces the
    bound (the same stated-bound contract as ``category_codes``). For
    corpus-scale series sets, bucket first (SAX word equality via
    :func:`sax_words`) and run DTW only within buckets: pass
    ``bucket_col`` and the self-join becomes an EQUI-join on the bucket
    (key-partitioned shuffle, no cross product), with ``max_keys``
    re-scoped to the LARGEST BUCKET — the quadratic is then per-bucket
    and the bucket width (SAX alphabet × segments) is the sizing knob,
    exactly the `bits ≈ log₂(N/occupancy)` rule the dedup family uses.

    The DP itself is genuinely sequential (each cell needs three
    neighbors) — a real Pandas-UDF case, not a convenience one. Cells
    are computed in FLAT row-major order with a fixed operand order, so
    the result is bit-identical to any engine replaying the same order
    (the oracle replays it as a single-list recursive CTE).
    ``band`` (Sakoe-Chiba half-width) prunes cells with |i-j| > band to
    +inf, cutting O(n·m) to O(n·band) per pair at scale; ``None`` runs
    the exact full matrix.

    Returns ``(key_l, key_r, dtw, n_steps)`` where ``n_steps`` is the
    warping-path length of the DP (matrix size actually computed).
    """
    import numpy as np
    import pandas as pd

    if bucket_col is None:
        n_keys = profiles.count()
        if n_keys > max_keys:
            raise ValueError(
                f"dtw_pairs got {n_keys} keys > max_keys={max_keys}: the "
                "all-pairs join is quadratic in keys — bucket upstream "
                "(sax_words or bucket_col=) or raise the bound deliberately")
        a = profiles.select(F.col(key_col).alias("key_l"),
                            F.col(vec_col).alias("_va"))
        b = profiles.select(F.col(key_col).alias("key_r"),
                            F.col(vec_col).alias("_vb"))
        pairs = a.join(b, F.col("key_l") < F.col("key_r"))
    else:
        biggest = (profiles.groupBy(bucket_col)
                   .agg(F.count(F.lit(1)).alias("_bn"))
                   .agg(F.max("_bn")).collect()[0][0]) or 0
        if biggest > max_keys:
            raise ValueError(
                f"dtw_pairs largest bucket holds {biggest} keys > "
                f"max_keys={max_keys}: widen the bucketing (more SAX "
                "segments / larger alphabet) or raise the bound "
                "deliberately")
        a = profiles.select(F.col(bucket_col).alias("_bkt"),
                            F.col(key_col).alias("key_l"),
                            F.col(vec_col).alias("_va"))
        b = profiles.select(F.col(bucket_col).alias("_bkt"),
                            F.col(key_col).alias("key_r"),
                            F.col(vec_col).alias("_vb"))
        pairs = (a.join(b, on="_bkt")
                 .filter(F.col("key_l") < F.col("key_r"))
                 .drop("_bkt"))

    def _dtw(va, vb):
        n, m = len(va), len(vb)
        acc = np.empty(n * m)
        for f in range(n * m):
            i, j = divmod(f, m)
            d = abs(va[i] - vb[j])
            # Band check FIRST (only (0,0) is unconditionally kept) so
            # row-0 / column-0 cells outside |i−j| ≤ band cannot route
            # the warp path along the matrix edges.
            if band is not None and abs(i - j) > band and not (i == 0 and j == 0):
                acc[f] = np.inf
            elif i == 0 and j == 0:
                acc[f] = d
            elif i == 0:
                acc[f] = d + acc[f - 1]
            elif j == 0:
                acc[f] = d + acc[f - m]
            else:
                # operand order fixed: min(left, up, diag)
                acc[f] = d + min(acc[f - 1], acc[f - m], acc[f - m - 1])
        return float(acc[-1]), n * m

    def compute(batches):
        for pdf in batches:
            out = [(_dtw(va, vb)) for va, vb in zip(pdf["_va"], pdf["_vb"])]
            yield pd.DataFrame({
                "key_l": pdf["key_l"], "key_r": pdf["key_r"],
                "dtw": [o[0] for o in out],
                "n_steps": [o[1] for o in out]})

    return pairs.mapInPandas(
        compute, "key_l string, key_r string, dtw double, n_steps long")
