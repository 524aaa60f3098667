"""Incremental rollup maintenance: merge-of-partials must equal full
recompute, and dynamic partition overwrite must leave untouched days."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_analysis_spark.plans import incremental as INC


@pytest.fixture()
def events(spark):
    base = pd.Timestamp("2024-06-01")
    rows = []
    for d in range(4):
        for h in (1, 5, 9):
            for k in ("a", "b"):
                rows.append((base + pd.Timedelta(days=d, hours=h), k,
                             float(d * 10 + h)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "key", "value"]))


def _as_dict(df):
    return {(str(r["day"]), r["key"]):
            (r["n"], r["sum_v"], r["min_v"], r["max_v"])
            for r in df.collect()}


def test_merge_equals_full_recompute(spark, events):
    first = events.filter(F.col("ts") < "2024-06-03")
    late = events.filter(F.col("ts") >= "2024-06-03")
    merged = INC.merge_partials(
        INC.rollup_partials(first, ["key"]),
        INC.rollup_partials(late, ["key"]), ["key"])
    full = INC.rollup_partials(events, ["key"])
    assert _as_dict(merged) == _as_dict(full)
    fin = INC.finalize(full)
    r = fin.filter((F.col("key") == "a") & (F.col("day") == "2024-06-01")).first()
    assert abs(r["avg_v"] - (1 + 5 + 9) / 3) < 1e-9


def test_incremental_refresh_only_touches_delta_days(spark, events, tmp_path):
    path = str(tmp_path / "rollup")
    INC.incremental_refresh(spark, path, events.filter(F.col("ts") < "2024-06-03"),
                            ["key"])
    stored1 = spark.read.parquet(path)
    files_day1 = {r[0] for r in stored1.withColumn(
        "f", F.input_file_name()).filter(F.col("day") == "2024-06-01")
        .select("f").distinct().collect()}
    # second cycle: late rows for day 3-4 only
    INC.incremental_refresh(spark, path, events.filter(F.col("ts") >= "2024-06-03"),
                            ["key"])
    stored2 = spark.read.parquet(path)
    # day-1 partition files untouched by the second refresh
    files_day1_after = {r[0] for r in stored2.withColumn(
        "f", F.input_file_name()).filter(F.col("day") == "2024-06-01")
        .select("f").distinct().collect()}
    assert files_day1 == files_day1_after
    # and the merged store equals a full recompute
    assert _as_dict(stored2) == _as_dict(INC.rollup_partials(events, ["key"]))


def test_refresh_merges_overlapping_day(spark, events, tmp_path):
    path = str(tmp_path / "rollup2")
    # split WITHIN day 2: both halves touch 2024-06-02
    INC.incremental_refresh(spark, path,
                            events.filter(F.col("ts") < "2024-06-02 06:00:00"),
                            ["key"])
    INC.incremental_refresh(spark, path,
                            events.filter(F.col("ts") >= "2024-06-02 06:00:00"),
                            ["key"])
    got = _as_dict(spark.read.parquet(path))
    assert got == _as_dict(INC.rollup_partials(events, ["key"]))


def test_kmv_partials_merge_equals_direct_sketch(spark):
    """Period distinct estimate derived from stored per-day KMV states
    must equal the sketch computed directly over the raw union — the
    merge law that makes distinct counts incrementally maintainable."""
    import pandas as pd
    from timeseries_data_analysis_spark.operators import sketch as SK
    from datetime import datetime, timedelta
    rows = []
    base = datetime(2024, 6, 1)
    # 3 days, overlapping item sets, two keys
    for d in range(3):
        for i in range(d * 300, d * 300 + 500):
            rows.append((base + timedelta(days=d, minutes=i % 60),
                         "a", f"item{i}"))
        for i in range(d * 50, d * 50 + 80):
            rows.append((base + timedelta(days=d, minutes=i % 60),
                         "b", f"thing{i}"))
    df = spark.createDataFrame(rows, "ts timestamp, key string, item string")

    partials = INC.kmv_day_partials(df, ["key"], "item", k=64)
    assert partials.count() == 6  # 3 days × 2 keys
    # every stored state is ≤ k doubles, sorted
    for r in partials.collect():
        assert len(r["kmv"]) <= 64
        assert r["kmv"] == sorted(r["kmv"])

    merged = {r["key"]: r["est"]
              for r in INC.kmv_merge_estimate(partials, ["key"]).collect()}
    direct = {r["key"]: r["est"]
              for r in SK.kmv_distinct(df, "key", "item", k=64).collect()}
    assert merged.keys() == direct.keys()
    for key in merged:
        assert abs(merged[key] - direct[key]) < 1e-9, key
    # key b has < 64 distinct per union? (3 days × 80 overlapping →
    # 180 distinct > 64) — both paths must agree they are in sketch
    # regime; key sanity: estimates within the 1/sqrt(64) band of truth
    assert abs(merged["a"] - 1100) / 1100 < 0.30
    assert abs(merged["b"] - 180) / 180 < 0.30


def test_sample_partials_merge_equals_direct_sample(spark, sf_dir):
    from pyspark.sql import functions as F
    from timeseries_data_analysis_spark.operators.sketch import hash_frac
    from timeseries_data_analysis_spark.plans import incremental as INC
    from timeseries_data_analysis_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    parts = INC.sample_day_partials(ev, ["event_type"], "value", k=64)
    merged = INC.sample_merge_quantiles(parts, ["event_type"], k=64)

    # direct bottom-k over the whole period, no day stage
    from pyspark.sql import Window
    direct_rows = (ev.filter(F.col("value").isNotNull())
                   .select("event_type",
                           hash_frac(F.col("event_id").cast("string"))
                           .alias("_h"),
                           F.col("value").alias("_v")))
    w = Window.partitionBy("event_type").orderBy("_h", "_v")
    direct = (direct_rows.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= 64)
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n_sample"),
                   F.percentile("_v", F.lit(0.5)).alias("q_05"),
                   F.percentile("_v", F.lit(0.95)).alias("q_095")))
    got = {r["event_type"]: (r["n_sample"], r["q_05"], r["q_095"])
           for r in merged.collect()}
    want = {r["event_type"]: (r["n_sample"], r["q_05"], r["q_095"])
            for r in direct.collect()}
    # bottom-k of the union of day bottom-ks == bottom-k of the union:
    # identical sample membership, hence identical quantiles
    assert got == want


def test_kll_sketch_rank_error_bound_and_invariance(spark):
    """Deterministic quantile sketch: (1) the canonical state is a pure
    function of the sorted multiset — identical under any repartition;
    (2) every estimate's TRUE rank deviates from its target by at most
    the documented 2^h bound."""
    import numpy as np

    from timeseries_data_analysis_spark.operators import sketch as SK

    rng = np.random.RandomState(11)
    vals = np.concatenate([rng.lognormal(0, 1, 700),
                           rng.normal(50, 5, 300)])
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "key string, value double")
    k = 16
    s1 = SK.quantile_sketch_state(df, ["key"], "value", k=k)
    s2 = SK.quantile_sketch_state(df.repartition(13), ["key"], "value", k=k)
    rows1 = sorted((r["j"], r["value"], r["n"], r["h"])
                   for r in s1.collect())
    rows2 = sorted((r["j"], r["value"], r["n"], r["h"])
                   for r in s2.collect())
    assert rows1 == rows2 and 0 < len(rows1) <= k

    probs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    est = {r["p"]: (r["est"], r["n"], r["h"])
           for r in SK.sketch_quantile_estimates(
               s1, ["key"], probs=probs).collect()}
    sv = np.sort(vals)
    for p, (e, n, h) in est.items():
        target = max(1, int(np.ceil(p * n)))
        true_rank = np.searchsorted(sv, e, side="right")  # rank of est
        assert abs(true_rank - target) <= 2 ** h, (p, true_rank, target, h)


def test_kll_day_partials_roundtrip_and_merge_bound(spark, tmp_path):
    """Day sketch states survive a parquet round-trip, and the merged
    period estimate's true rank is within the additive Σ_day 2^h_day
    bound of its target — the merge law the rollup rides on."""
    import numpy as np
    import pandas as pd

    from timeseries_data_analysis_spark.plans import incremental as INC

    rng = np.random.RandomState(5)
    base = pd.Timestamp("2024-06-01")
    rows = []
    for d in range(6):
        for v in rng.gamma(2.0, 10.0, 200 + 40 * d):
            rows.append((base + pd.Timedelta(days=d, hours=int(v) % 24),
                         "a", float(v)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "key", "value"]))

    parts = INC.kll_day_partials(df, ["key"], "value", k=32)
    path = str(tmp_path / "kll")
    parts.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    for r in stored.collect():
        assert len(r["qsk"]) <= 32 and r["qsk"] == sorted(r["qsk"])

    probs = (0.25, 0.5, 0.9)
    got = {r["p"]: (r["est"], r["w_total"])
           for r in INC.kll_merge_quantiles(
               stored, ["key"], probs=probs).collect()}
    budget = sum(2 ** r["h"] for r in stored.collect())
    vals = np.sort(np.array([r[2] for r in rows]))
    for p, (e, w) in got.items():
        target = max(1, int(np.ceil(p * w)))
        true_rank = np.searchsorted(vals, e, side="right")
        assert abs(true_rank - target) <= budget, (p, true_rank, target)
    # and the error budget is actually small relative to N
    assert budget <= 2 * len(rows) / 32 * 2
