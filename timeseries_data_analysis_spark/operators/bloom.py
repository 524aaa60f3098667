"""Broadcast Bloom-filter semi-join prefilter.

The runtime-filter pattern every 100 TB join plan wants: when the probe
side is huge and the build side is selective, ship a few-KB bitset to
every scan task and drop non-matching rows BEFORE the shuffle, then let
the exact join finish the job. False positives only cost a little extra
shuffle; the final result is exactly the plain join's (which is what the
DuckDB oracle checks — the filter is a superset-pass, never a semantics
change). Spark's own runtime bloom (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) does this opaquely for equi-joins it can see
through; this operator makes the pattern explicit, portable, and usable
on derived keys the optimizer cannot infer.

Engine-portable hashing: position_i = md5(key || ':' || i) taken as a
60-bit integer mod m (same rule as `operators/sketch.py`'s KMV/HLL
family), so the bitset a test builds is replayable anywhere md5 exists.

Scale shape: the build side collapses to m/64 (word, or-mask) rows via
map-side `bit_or` partial aggregation — the only shuffle is ≤ m/64
rows regardless of build cardinality — then ONE bounded collect packs
the map (a few KB for m=16384; the same bounded-driver-state contract
as the sketch family) and a literal map broadcasts with the probe-side
filter, which is pure whole-stage-codegen column math (no UDF, no join,
no exchange added to the probe side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, k: int, m: int) -> list[Column]:
    """k engine-portable bit positions in [0, m) for a key column."""
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(col.cast("string"),
                                           F.lit(f":{i}"))), 1, 15),
                16, 10).cast("bigint"),
            F.lit(m))
        for i in range(k)
    ]


def bloom_build(df: DataFrame, key_col: str, m: int = 16384,
                k: int = 3) -> dict[int, int]:
    """Build the bitset for ``df[key_col]`` as a {word_index: or_mask}
    dict (word = 64 bits). Distributed until the final ≤ m/64-row
    collect; the shuffle moves at most m/64 rows however large df is."""
    pos = F.explode(F.array(*_positions(F.col(key_col), k, m))).alias("_p")
    words = (df.select(pos)
             .select((F.col("_p") / 64).cast("bigint").alias("_w"),
                     # SQL shiftleft accepts a column bit count (the
                     # Python API binding requires a literal int)
                     F.expr("shiftleft(1L, cast(pmod(_p, 64) as int))")
                     .alias("_m"))
             .groupBy("_w").agg(F.bit_or("_m").alias("_mask")))
    return {int(r["_w"]): int(r["_mask"]) for r in words.collect()}


def bloom_filter(df: DataFrame, key_col: str, bits: dict[int, int],
                 m: int = 16384, k: int = 3) -> DataFrame:
    """Keep rows whose key MIGHT be in the set (superset pass: all true
    members survive; false positives ≈ (1-e^{-kn/m})^k leak through and
    must be finished by an exact join). The bitset rides into the plan
    as a literal map — no extra exchange, no UDF; each probe row does
    k map lookups + bitwise ANDs inside whole-stage codegen."""
    if not bits:
        return df.filter(F.lit(False))
    entries = [x for w, msk in sorted(bits.items()) for x in (F.lit(w), F.lit(msk))]
    bmap = F.create_map(*entries)
    d = df
    cond = F.lit(True)
    tmp = [f"_bf_p{i}" for i in range(k)]
    for name, p in zip(tmp, _positions(F.col(key_col), k, m)):
        d = d.withColumn(name, p)
        word = (F.col(name) / 64).cast("bigint")
        mask = F.expr(f"shiftleft(1L, cast(pmod({name}, 64) as int))")
        cond = cond & (F.coalesce(bmap.getItem(word), F.lit(0))
                       .bitwiseAND(mask) != 0)
    return d.filter(cond).drop(*tmp)


def bloom_semi_join(big: DataFrame, small: DataFrame, big_key: str,
                    small_key: str, m: int = 16384, k: int = 3) -> DataFrame:
    """Exact left-semi join accelerated by the bloom prefilter: filter
    ``big`` through the bitset of ``small[small_key]`` first (drops the
    bulk before any exchange), then close with the exact broadcast semi
    join so false positives cannot reach the result."""
    bits = bloom_build(small, small_key, m=m, k=k)
    pre = bloom_filter(big, big_key, bits, m=m, k=k)
    keys = (small.select(F.col(small_key).alias("_bf_key")).distinct())
    return pre.join(F.broadcast(keys),
                    pre[big_key] == keys["_bf_key"], "left_semi")
