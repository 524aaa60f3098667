"""Generate a deterministic Nx scale-up of the corpus tables.

Usage: python tools/make_scale_corpus.py <src_sf_dir> <out_dir> [factor]

Replicates documents/embeddings/events ``factor``x with content
transforms chosen so the statistical structure of the workload is
preserved rather than degenerate:

- **documents**: replica k > 0 keeps the original token MULTISET
  (token/char/quality statistics unchanged) but pseudo-shuffles token
  ORDER with a per-(doc, replica) keyed sort — n-gram sets become
  essentially disjoint across replicas, so the dedup family sees 10x
  genuinely-distinct documents instead of an artificial 10-clique of
  near-dups per original (which would blow pair output up ~45x/doc and
  measure the DATA artifact, not the operator). Exact replication would
  be even worse: identical digests collapse in exact dedup and explode
  in LSH.
- **embeddings**: replica k > 0 adds deterministic hash-derived noise
  (±0.1/dim) so vectors spread instead of stacking; the ANN query set
  (vec_id < 10) and the deterministic centroid/codebook seeds
  (lowest ids with vec_id % 31 == 0) keep their original members, so
  sf0.1 -> Nx measures the same search against an Nx corpus.
- **events**: replica k > 0 offsets user/event ids (new users, same
  temporal shape) — per-user windows get Nx the partitions, not Nx
  longer series.
- **orders**: replica k > 0 offsets custkey/orderkey (new customers,
  same order-date shape) — the CDC snapshot family sees Nx keys with
  the original per-key order history, not Nx-longer histories.
- **lineitem / customer / supplier / part**: replica offsets MATCH the
  referencing columns (l_orderkey ↔ o_orderkey at OFF*100; l_custkey-
  via-orders, l_suppkey, l_partkey ↔ their dims at OFF), so each
  replica is a self-consistent disjoint sub-database and every TPC-H
  join shape (Q3/Q5/Q10/Q15/Q16/Q17/Q19/Q22) runs at Nx fact AND Nx
  dim volume with the original selectivities. nation/region stay
  fixed (dims grow, nations don't) — c_nationkey/s_nationkey are
  copied unchanged so the broadcast dims keep their fan-out.

An optional trailing ``table[,table...]`` arg rebuilds a subset (the
transforms are deterministic, so partial rebuilds stay consistent).

All transforms are hash-deterministic per (row, replica): two runs of
the same builder produce identical table CONTENTS (file layout follows
the pinned repartitioning, which Spark's round-robin keeps
deterministic via its pre-shuffle local sort). Everything runs as
Spark jobs; nothing collects to the driver.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

OFF = 10_000_000


def scale_documents(df, factor: int):
    k = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("k")
    rep = df.select("*", k)
    shuffled = F.expr(
        "array_join(transform(array_sort(transform(split(text, ' '), "
        "t -> struct(md5(concat(t, '|', cast(doc_id as string), '|', "
        "cast(k as string))) as h, t as t))), s -> s.t), ' ')")
    text = F.when(F.col("k") == 0, F.col("text")).otherwise(shuffled)
    return rep.select(
        # bigint like scale_events: k * OFF overflows int32 at
        # factor >= 215 (measured at the 1000x build)
        (F.col("doc_id").cast("bigint")
         + F.col("k").cast("bigint") * OFF).alias("doc_id"),
        text.alias("text"), "lang", "source",
        F.length(text).cast("int").alias("n_chars"))


def scale_embeddings(df, factor: int):
    k = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("k")
    rep = df.select("*", k)
    noisy = F.expr(
        "transform(embedding, (x, i) -> cast(x + "
        "(pmod(hash(vec_id, i, k), 1000) - 500) / 5000.0 as float))")
    emb = F.when(F.col("k") == 0, F.col("embedding")).otherwise(noisy)
    return rep.select(
        (F.col("vec_id").cast("bigint")
         + F.col("k").cast("bigint") * OFF).alias("vec_id"),
        emb.alias("embedding"), "label")


def scale_events(df, factor: int):
    k = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("k")
    return (df.select("*", k)
            .select((F.col("event_id").cast("bigint")
                     + F.col("k").cast("bigint") * (OFF * 100)).alias("event_id"),
                    "ts",
                    (F.col("user_id").cast("bigint")
                     + F.col("k").cast("bigint") * OFF).alias("user_id"),
                    "event_type", "value", "props"))


def scale_orders(df, factor: int):
    k = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("k")
    return (df.select("*", k)
            .select((F.col("o_orderkey").cast("bigint")
                     + F.col("k").cast("bigint") * (OFF * 100)).alias("o_orderkey"),
                    (F.col("o_custkey").cast("bigint")
                     + F.col("k").cast("bigint") * OFF).alias("o_custkey"),
                    *[c for c in df.columns
                      if c not in ("o_orderkey", "o_custkey")]))


def _offset_keys(df, factor: int, offsets: dict[str, int]):
    """Replicate ``factor``x, adding ``k * step`` to each key column —
    the shared builder for the relational tables: offsets are chosen
    per-column so foreign keys stay consistent across tables."""
    k = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("k")
    rep = df.select("*", k)
    cols = []
    for c in df.columns:
        if c in offsets:
            cols.append((F.col(c).cast("bigint")
                         + F.col("k").cast("bigint") * offsets[c]).alias(c))
        else:
            cols.append(F.col(c))
    return rep.select(*cols)


def scale_lineitem(df, factor: int):
    return _offset_keys(df, factor, {"l_orderkey": OFF * 100,
                                     "l_suppkey": OFF,
                                     "l_partkey": OFF})


def scale_customer(df, factor: int):
    # c_nationkey copied unchanged: nations are a fixed broadcast dim
    return _offset_keys(df, factor, {"c_custkey": OFF})


def scale_supplier(df, factor: int):
    return _offset_keys(df, factor, {"s_suppkey": OFF})


def scale_part(df, factor: int):
    # brand/type/size attribute distributions replicate untouched, so
    # Q16/Q17/Q19 predicate selectivities are preserved at Nx
    return _offset_keys(df, factor, {"p_partkey": OFF})


def copy_table(df, factor: int):  # nation / region: fixed dims
    return df


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.showConsoleProgress", "false")
             # local mode: the driver IS the executor — parquet writers
             # buffer whole row groups, so a 100x lineitem (60M rows)
             # OOMs the 1g default heap
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    builders = {"documents": scale_documents, "embeddings": scale_embeddings,
                "events": scale_events, "orders": scale_orders,
                "lineitem": scale_lineitem, "customer": scale_customer,
                "supplier": scale_supplier, "part": scale_part,
                "nation": copy_table, "region": copy_table}
    tables = [t for t in builders if only is None or t in only]
    for t in tables:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        # spread the INPUT before the factor-x explode: a small source
        # parquet arrives as 1 scan partition, which serializes the
        # entire per-replica transform (documents: 5e8 md5+sort ops at
        # factor 1000, measured single-threaded for ~20+ min) onto one
        # task. Row content is hash-deterministic per (row, k), so the
        # pre-spread changes only parallelism, never the output set.
        if t not in ("nation", "region"):
            df = df.repartition(32)
        built = builders[t](df, factor)
        # output partitions scale with the factor so per-writer row
        # counts stay bounded (8 was tuned at 10x; 100x lineitem needs
        # ~8x more writers, capped at the core count)
        parts = 1 if t in ("nation", "region") \
            else min(32, max(8, (factor * 8) // 10))
        built.repartition(parts) \
            .write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in tables:
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())


if __name__ == "__main__":
    main()
