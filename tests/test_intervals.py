"""Interval/as-of join semantics (SURVEY.md J3/J4 boundary traps)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseries_data_analysis_spark.operators import intervals as IV


def d(day, h=0):
    return dt.datetime(2024, 1, day, h)


def make_spine(spark, days=10):
    return spark.createDataFrame([(d(i + 1),) for i in range(days)], "ts timestamp")


def test_interval_join_boundaries(spark):
    # [start, end) inclusivity: start row matches, end row does not
    spine = make_spine(spark, 5)
    events = spark.createDataFrame([(d(2), d(4))], "start timestamp, end timestamp")
    out = IV.interval_join(spine, events, how="inner")
    got = sorted(r["ts"] for r in out.collect())
    assert got == [d(2), d(3)]


def test_interval_join_binned_matches_naive(spark):
    spine = make_spine(spark, 20)
    events = spark.createDataFrame(
        [(d(2), d(5)), (d(4), d(9)), (d(15), d(16))],
        "start timestamp, end timestamp")
    naive = IV.interval_join(spine, events, how="inner")
    binned = IV.interval_join_binned(spine, events)
    assert (sorted(map(tuple, naive.collect()))
            == sorted(map(tuple, binned.select(*naive.columns).collect())))


def test_label_events_forming_critical(spark):
    spine = make_spine(spark, 10)
    events = spark.createDataFrame(
        [(1, d(3), d(6), 4)],
        "EVENT_ID int, START_DATE timestamp, CRITICAL_DATE timestamp, ZONE int")
    out = IV.label_events(spine, events, pre_windows_h=(24,))
    rows = {r["ts"]: r for r in out.collect()}
    # before start: all zero
    assert rows[d(2)]["accretion_forming"] == 0 and rows[d(2)]["accretion_critical"] == 0
    # forming in [start, critical)
    assert rows[d(3)]["accretion_forming"] == 1
    assert rows[d(5)]["accretion_forming"] == 1
    assert rows[d(6)]["accretion_forming"] == 0
    # critical from critical onward
    assert rows[d(6)]["accretion_critical"] == 1
    assert rows[d(9)]["accretion_critical"] == 1
    # days_to_critical while forming
    assert rows[d(3)]["days_to_critical"] == 3.0
    assert rows[d(5)]["days_to_critical"] == 1.0
    assert rows[d(2)]["days_to_critical"] is None
    # zone carried, 0 elsewhere
    assert rows[d(4)]["accretion_zone"] == 4
    assert rows[d(1)]["accretion_zone"] == 0
    # 24h pre-critical window = [critical-24h, critical)
    assert rows[d(5)]["pre_critical_24h"] == 1
    assert rows[d(4)]["pre_critical_24h"] == 0
    assert rows[d(6)]["pre_critical_24h"] == 0


def test_label_events_overlap_any_active(spark):
    spine = make_spine(spark, 8)
    events = spark.createDataFrame(
        [(1, d(1), d(3), 2), (2, d(2), d(7), 5)],
        "EVENT_ID int, START_DATE timestamp, CRITICAL_DATE timestamp, ZONE int")
    out = IV.label_events(spine, events, pre_windows_h=())
    rows = {r["ts"]: r for r in out.collect()}
    # overlap: forming while ANY event is forming
    assert rows[d(2)]["accretion_forming"] == 1
    assert rows[d(4)]["accretion_forming"] == 1  # event2 still forming
    assert rows[d(4)]["accretion_critical"] == 1  # event1 already critical


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, d(5), "a"), (2, d(2), "a"), (3, d(5), "b"), (4, d(1), "b")],
        "id int, ts timestamp, k string")
    right = spark.createDataFrame(
        [(d(1), "a", 10.0), (d(4), "a", 40.0), (d(6), "a", 60.0), (d(2), "b", 20.0)],
        "ts timestamp, k string, v double")
    out = IV.asof_join(left, right, "ts", "ts", by=("k", "k"), value_cols=["v"])
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: 40.0, 2: 10.0, 3: 20.0, 4: None}


def test_asof_join_tie_takes_right(spark):
    left = spark.createDataFrame([(1, d(3), "a")], "id int, ts timestamp, k string")
    right = spark.createDataFrame([(d(3), "a", 33.0)], "ts timestamp, k string, v double")
    out = IV.asof_join(left, right, "ts", "ts", by=("k", "k"), value_cols=["v"])
    assert out.collect()[0]["v"] == 33.0


def test_latest_rows(spark):
    df = spark.createDataFrame(
        [("a", d(1), 1), ("a", d(3), 2), ("b", d(2), 3)],
        "k string, ts timestamp, id int")
    out = IV.latest_rows(df, ["k"], "ts", tiebreak="id")
    got = {r["k"]: r["id"] for r in out.collect()}
    assert got == {"a": 2, "b": 3}


def test_asof_join_forward_and_nearest_match_pandas(spark):
    """All three directions reproduce pandas merge_asof row for row on
    keyed data with out-of-range edges (left rows before the first /
    after the last right row)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    left = pd.DataFrame({
        "k": np.repeat(["a", "b"], 25),
        "lts": np.concatenate([np.sort(rng.integers(0, 1000, 25)),
                               np.sort(rng.integers(0, 1000, 25))]),
    })
    right = pd.DataFrame({
        "k": np.repeat(["a", "b"], 10),
        "rts": np.concatenate([np.sort(rng.choice(1000, 10, replace=False)),
                               np.sort(rng.choice(1000, 10, replace=False))]),
        "val": rng.standard_normal(20).round(3),
    })
    ldf = spark.createDataFrame(left.assign(
        lts=pd.to_datetime(left["lts"], unit="s")))
    rdf = spark.createDataFrame(right.assign(
        rts=pd.to_datetime(right["rts"], unit="s")))

    for direction in ("backward", "forward", "nearest"):
        got = (IV.asof_join(ldf, rdf, "lts", "rts", by=("k", "k"),
                            value_cols=["val"], direction=direction)
               .toPandas().sort_values(["k", "lts"]).reset_index(drop=True))
        want = pd.merge_asof(
            left.assign(lts=pd.to_datetime(left["lts"], unit="s"))
            .sort_values("lts"),
            right.assign(rts=pd.to_datetime(right["rts"], unit="s"))
            .sort_values("rts"),
            left_on="lts", right_on="rts", by="k",
            direction=direction).sort_values(["k", "lts"]) \
            .reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["val"], want["val"], check_dtype=False,
            obj=f"asof {direction}")


def test_asof_join_rejects_bad_direction(spark):
    df = spark.createDataFrame([(1,)], "x: long")
    with pytest.raises(ValueError, match="backward/forward/nearest"):
        IV.asof_join(df, df, "x", "x", direction="sideways")


def test_asof_join_keyless_warns_and_still_correct(spark):
    """by=None is a bounded-input contract: the single-partition global
    scan must WARN (so a keyless call inside a big pipeline is visible)
    while producing correct backward semantics."""
    import warnings

    ldf = spark.createDataFrame([(10,), (25,)], "lts: long")
    rdf = spark.createDataFrame([(5, 1.0), (20, 2.0)], "rts: long, val: double")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = IV.asof_join(ldf, rdf, "lts", "rts", value_cols=["val"])
        rows = {r["lts"]: r["val"] for r in out.collect()}
    assert rows == {10: 1.0, 25: 2.0}
    assert any("single-partition" in str(w.message) for w in rec)
