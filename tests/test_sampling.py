"""Hash sampling/splitting (operators/sampling.py) and benchmark
decontamination (operators/dedup.py ngram_contamination)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from timeseries_data_analysis_spark.operators import dedup as DD
from timeseries_data_analysis_spark.operators import sampling as SMP


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "rid")


def test_hash_split_partitions_and_proportions(ids):
    out = SMP.hash_split(ids, "rid",
                         [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 5000          # a partition, no loss
    assert abs(counts["train"] / 5000 - 0.8) < 0.02
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_hash_split_stable_under_growth(spark):
    """Rows keep their split when the table grows — the leakage-safety
    property that motivates hash splits over rand() splits."""
    small = SMP.hash_split(spark.range(0, 1000).withColumnRenamed("id", "rid"),
                           "rid", [("train", 0.9), ("test", 0.1)])
    big = SMP.hash_split(spark.range(0, 5000).withColumnRenamed("id", "rid"),
                         "rid", [("train", 0.9), ("test", 0.1)])
    joined = (small.alias("s")
              .join(big.alias("b"), F.col("s.rid") == F.col("b.rid"))
              .filter(F.col("s.split") != F.col("b.split")))
    assert joined.count() == 0


def test_hash_split_weights_must_sum_to_one(ids):
    with pytest.raises(ValueError, match="sum to 1"):
        SMP.hash_split(ids, "rid", [("a", 0.5), ("b", 0.2)])


def test_stratified_sample_fractions_and_determinism(spark):
    df = (spark.range(0, 6000).withColumnRenamed("id", "rid")
          .withColumn("grp", F.when(F.col("rid") % 3 == 0, "a")
                      .when(F.col("rid") % 3 == 1, "b").otherwise("c")))
    kept = SMP.stratified_hash_sample(df, "grp", "rid",
                                      {"a": 0.5, "b": 1.0}, default=0.0)
    counts = {r["grp"]: r["n"] for r in
              kept.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "c" not in counts                      # default=0 drops stratum
    assert counts["b"] == 2000                    # fraction 1.0 keeps all
    assert abs(counts["a"] / 2000 - 0.5) < 0.05
    # determinism: second run keeps the identical row set
    again = SMP.stratified_hash_sample(df, "grp", "rid",
                                       {"a": 0.5, "b": 1.0}, default=0.0)
    assert kept.exceptAll(again).count() == 0
    assert again.exceptAll(kept).count() == 0


def test_contamination_flags_copied_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id: long, text: string")
    corpus = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog tonight"),  # copy
        (2, "completely different words about spark query engines here"),
        (3, "partial overlap the quick brown fox appears then diverges "
            "into novel content entirely unrelated to benchmarks"),
    ], "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in
           DD.ngram_contamination(corpus, bench, n=3,
                                  flag_threshold=0.2).collect()}
    assert out[1]["contamination_rate"] == 1.0 and out[1]["flagged"] == 1
    assert out[2]["n_contaminated"] == 0 and out[2]["flagged"] == 0
    assert 0.0 < out[3]["contamination_rate"] < 1.0


def test_contamination_benchmark_broadcast_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = DD.ngram_contamination(docs.filter("doc_id % 50 != 0"),
                                 docs.filter("doc_id % 50 = 0"), n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan            # bench side broadcast
    assert out.count() > 0


def test_pack_next_fit_respects_budget(spark):
    rows = [(i, t) for i, t in enumerate([100, 100, 100, 50, 300, 10, 10])]
    df = spark.createDataFrame(rows, "doc_id: long, n_tokens: long")
    out = (SMP.pack_next_fit(df, "doc_id", "n_tokens",
                             budget=256, n_buckets=1)
           .toPandas().sort_values("doc_id"))
    by_pack = out.groupby("pack_idx")["n_tokens"].sum()
    # every multi-doc pack fits the budget; only a single oversized doc
    # (300 > 256) may exceed it, alone in its own pack
    for pack_idx, total in by_pack.items():
        docs = out[out["pack_idx"] == pack_idx]
        assert total <= 256 or len(docs) == 1
    # next-fit over ids 0..6: [100+100]=200, [100+50]=150, [300], [10+10]
    assert out["pack_idx"].tolist() == [0, 0, 1, 1, 2, 3, 3]


def test_pack_next_fit_rejects_null_ids(spark):
    """The non-null precondition is enforced, not just documented: a
    NULL id (or token count) raises at execution instead of silently
    packing the whole NULL bucket as one group (which diverges from any
    id-ordered external replay)."""
    df = spark.createDataFrame(
        [(1, 100), (None, 100), (3, 100)], "doc_id: long, n_tokens: long")
    with pytest.raises(Exception, match="NULL id or token count"):
        SMP.pack_next_fit(df, "doc_id", "n_tokens",
                          budget=256, n_buckets=2).collect()
    df2 = spark.createDataFrame(
        [(1, 100), (2, None)], "doc_id: long, n_tokens: long")
    with pytest.raises(Exception, match="NULL id or token count"):
        SMP.pack_next_fit(df2, "doc_id", "n_tokens",
                          budget=256, n_buckets=2).collect()


def test_pack_next_fit_buckets_are_independent(spark):
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.lit(90).alias("n_tokens"))
    out = SMP.pack_next_fit(df, "doc_id", "n_tokens",
                            budget=200, n_buckets=4).toPandas()
    assert len(out) == 200
    assert set(out["bucket"]) == {0, 1, 2, 3}
    # 50 docs/bucket, 2 per pack -> 25 packs per bucket
    per = out.groupby(["bucket", "pack_idx"]).size()
    assert (per == 2).all()


def test_weighted_hash_sample_converges_and_is_deterministic(spark):
    """Keep-rate tracks the per-row weight (importance-sampling contract)
    and the accept set is identical across runs — no rand() anywhere."""
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        # weight alternates 0.2 / 0.8 by parity -> E[kept] = 0.5
        F.when(F.col("id") % 2 == 0, 0.2).otherwise(0.8).alias("w"))
    kept1 = SMP.weighted_hash_sample(df, F.col("w"), "doc_id").toPandas()
    kept2 = SMP.weighted_hash_sample(df, F.col("w"), "doc_id").toPandas()
    assert kept1["doc_id"].tolist() == kept2["doc_id"].tolist()
    lo = kept1[kept1.doc_id % 2 == 0]
    hi = kept1[kept1.doc_id % 2 == 1]
    assert abs(len(lo) / 2000 - 0.2) < 0.03
    assert abs(len(hi) / 2000 - 0.8) < 0.03
    # weight 0 keeps nothing, weight 1 keeps everything
    all_or_none = df.select("doc_id", F.lit(1.0).alias("w"))
    assert SMP.weighted_hash_sample(all_or_none, F.col("w"), "doc_id").count() == 4000
    zero = df.select("doc_id", F.lit(0.0).alias("w"))
    assert SMP.weighted_hash_sample(zero, F.col("w"), "doc_id").count() == 0


def test_weighted_hash_sample_null_drops_and_clamps(spark):
    """NULL weight -> row dropped (never sampled); out-of-range weights
    clamp to [0, 1] instead of corrupting the threshold (ADVICE round 4)."""
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    nulls = df.select("doc_id", F.lit(None).cast("double").alias("w"))
    assert SMP.weighted_hash_sample(nulls, F.col("w"), "doc_id").count() == 0
    over = df.select("doc_id", F.lit(7.5).alias("w"))
    assert SMP.weighted_hash_sample(over, F.col("w"), "doc_id").count() == 1000
    neg = df.select("doc_id", F.lit(-3.0).alias("w"))
    assert SMP.weighted_hash_sample(neg, F.col("w"), "doc_id").count() == 0


def test_heavy_hitters_partition_invariant_and_exact(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F
    from timeseries_data_analysis_spark.operators import sketch as SK
    # zipf-ish: token t_i appears ~1000//(i+1) times; N ≈ 1000*H(60)
    rows = [(f"t{i}",) for i in range(60) for _ in range(1000 // (i + 1))]
    expected = None
    for n_part in (1, 3, 16):
        df = (spark.createDataFrame(rows, "item string")
              .repartition(n_part))
        got = {(r["item"], r["cnt"])
               for r in SK.heavy_hitters(df, "item", threshold_inv=50,
                                         k=64).collect()}
        if expected is None:
            n = len(rows)
            from collections import Counter
            cnt = Counter(r[0] for r in rows)
            expected = {(t, c) for t, c in cnt.items() if c * 50 > n}
        # exact counts AND exact membership, regardless of partitioning
        assert got == expected
    # the superset guarantee requires k >= threshold_inv
    with _pytest.raises(ValueError):
        SK.heavy_hitters(df, "item", threshold_inv=100, k=50)


def test_weighted_reservoir_determinism_and_weight_monotonicity(spark):
    """Efraimidis-Spirakis keys: deterministic under repartition, size
    = min(k, eligible), non-positive/NULL weights drop, and for a FIXED
    id (fixed uniform u) the key is strictly increasing in weight —
    the property that makes heavier items likelier to survive the cut."""
    from pyspark.sql import functions as F
    from timeseries_data_analysis_spark.operators import sampling as SMP

    rows = [(i, float((i % 7) + 1)) for i in range(60)]
    rows += [(100, 0.0), (101, -2.0), (102, None)]   # dropped
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = SMP.weighted_reservoir(df, F.col("w"), "doc_id", k=20).collect()
    b = SMP.weighted_reservoir(df.repartition(7), F.col("w"),
                               "doc_id", k=20).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert len(a) == 20
    assert not {100, 101, 102} & {r["doc_id"] for r in a}
    small = SMP.weighted_reservoir(df.filter("doc_id < 5"), F.col("w"),
                                  "doc_id", k=20).collect()
    assert len(small) == 5

    # same id (same u), growing weight -> strictly larger key
    one = spark.createDataFrame([(7, 1.0), (7, 2.0), (7, 8.0)],
                                "doc_id long, w double")
    keys = [r["es_key"] for r in
            SMP.weighted_reservoir(one, F.col("w"), "doc_id", k=3)
            .orderBy("w").collect()]
    assert keys == sorted(keys) and len(set(keys)) == 3
