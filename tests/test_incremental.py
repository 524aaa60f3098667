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
