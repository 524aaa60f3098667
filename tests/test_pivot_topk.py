"""Pivot/melt round-trip and top-k operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_data_analysis_spark.operators import pivot as PV, topk as TK


def test_pivot_then_melt_round_trip(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)],
        "ts long, k string, value double")
    wide = PV.pivot_wide(df, ["ts"], "k", "value", values=["a", "b"])
    assert set(wide.columns) == {"ts", "a", "b"}
    long = PV.melt(wide, ["ts"], key_name="k", value_name="value")
    back = {(r["ts"], r["k"]): r["value"] for r in long.collect()}
    assert back[(1, "a")] == 10.0 and back[(1, "b")] == 20.0
    assert back[(2, "a")] == 30.0 and back[(2, "b")] is None


def test_pivot_prefix_flatten(spark):
    df = spark.createDataFrame([(1, "SAF02", 5.0)], "ts long, FAN string, AIR_FLOW double")
    wide = PV.pivot_wide(df, ["ts"], "FAN", "AIR_FLOW", values=["SAF02"], prefix="air_")
    assert "air_SAF02" in wide.columns


def test_top_k_per_group_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("x", 1, 5.0), ("x", 2, 5.0), ("x", 3, 1.0), ("y", 4, 9.0)],
        "g string, id int, v double")
    out = TK.top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 2)
    got = sorted((r["g"], r["id"], r["rk"]) for r in out.collect())
    assert got == [("x", 1, 1), ("x", 2, 2), ("y", 4, 1)]


def test_stride_sample(spark):
    df = spark.createDataFrame([("a", i) for i in range(10)], "k string, ts long")
    out = TK.stride_sample(df, [F.col("ts")], 3, partition_by=["k"])
    assert [r["ts"] for r in out.orderBy("ts").collect()] == [0, 3, 6, 9]


def test_value_counts_top_n(spark):
    df = spark.createDataFrame([(c,) for c in "aaabbc"], "v string")
    out = TK.value_counts_top_n(df, "v", 2)
    got = [(r["v"], r["n"]) for r in out.collect()]
    assert got == [("a", 3), ("b", 2)]
