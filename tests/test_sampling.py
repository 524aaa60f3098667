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
