"""Unit tests for operators/cdc.py: snapshot diff + SCD type-2 build."""

from __future__ import annotations

import datetime as dt

from timeseries_data_analysis_spark.operators import cdc as CDC


def test_snapshot_diff_classifies_all_four_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", None)],
        "k long, s string, p double")
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "X", 30.0), (4, "d", None), (5, "e", 50.0)],
        "k long, s string, p double")
    got = {r["k"]: r["change_type"]
           for r in CDC.snapshot_diff(old, new, ["k"], ["s", "p"]).collect()}
    assert got == {1: "delete", 2: "unchanged", 3: "update",
                   4: "unchanged",  # NULL == NULL is unchanged (eqNullSafe)
                   5: "insert"}


def test_snapshot_diff_null_to_value_is_update(spark):
    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "now-set")], "k long, s string")
    rows = CDC.snapshot_diff(old, new, ["k"], ["s"]).collect()
    assert rows[0]["change_type"] == "update"
    assert rows[0]["s_old"] is None and rows[0]["s_new"] == "now-set"


def test_scd2_collapses_runs_and_closes_intervals(spark):
    t = [dt.datetime(2024, 1, 1, h) for h in range(6)]
    # user 1: a a b b a  -> runs a[0,2) b[2,4) a[4,-)
    # user 2: single row -> one open run
    rows = [(1, t[0], 0, "a"), (1, t[1], 1, "a"), (1, t[2], 2, "b"),
            (1, t[3], 3, "b"), (1, t[4], 4, "a"), (2, t[5], 5, "z")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, state string")
    hist = CDC.scd2_from_changelog(
        df, "user_id", ["state"], ts_col="ts",
        order_by=["ts", "event_id"]).collect()
    u1 = sorted([(r["state"], r["valid_from"], r["valid_to"], r["is_current"])
                 for r in hist if r["user_id"] == 1], key=lambda x: x[1])
    assert u1 == [("a", t[0], t[2], 0), ("b", t[2], t[4], 0),
                  ("a", t[4], None, 1)]
    u2 = [r for r in hist if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] == 1


def test_scd2_leading_null_state_still_opens_interval(spark):
    t = [dt.datetime(2024, 1, 1, h) for h in range(3)]
    df = spark.createDataFrame(
        [(1, t[0], 0, None), (1, t[1], 1, None), (1, t[2], 2, "a")],
        "user_id long, ts timestamp, event_id long, state string")
    hist = sorted(
        CDC.scd2_from_changelog(df, "user_id", ["state"], "ts",
                                ["ts", "event_id"]).collect(),
        key=lambda r: r["valid_from"])
    # the rn==1 guard: a NULL-state leading run is an interval, not a drop
    assert len(hist) == 2
    assert hist[0]["state"] is None and hist[0]["valid_to"] == t[2]
    assert hist[1]["state"] == "a" and hist[1]["is_current"] == 1
