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
