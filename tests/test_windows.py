"""Window feature engine semantics (SURVEY.md §2.5, §7.4 traps).

Differential tests against hand-built pandas references on tiny frames —
specifically the reference's semantic traps: full-window emission,
ddof-0 vs ddof-1 std, and the anomaly window excluding the current row.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_analysis_spark.operators import windows as WIN


def make_series(spark, values, key="a"):
    rows = [(key, i, float(v) if v is not None else None)
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, ts long, value double")


def collect_col(df, col):
    return [r[col] for r in df.orderBy("ts").collect()]


def test_lag(spark):
    df = make_series(spark, [1, 2, 3, 4])
    w = WIN.series_window("k", ["ts"])
    out = df.select("ts", *[v.alias(n) for n, v in WIN.lag_features("value", w, [1, 2]).items()])
    assert collect_col(out, "value_lag_1") == [None, 1.0, 2.0, 3.0]
    assert collect_col(out, "value_lag_2") == [None, None, 1.0, 2.0]


def test_rolling_mean_full_window_emission(spark):
    # numba kernel semantics: emit only once the frame holds `window` rows
    df = make_series(spark, [1, 2, 3, 4, 5])
    w = WIN.series_window("k", ["ts"])
    out = df.select("ts", WIN.rolling_mean("value", w, 3, full_window=True).alias("m"))
    assert collect_col(out, "m") == [None, None, 2.0, 3.0, 4.0]


def test_rolling_mean_min_periods(spark):
    df = make_series(spark, [1, 2, 3, 4])
    w = WIN.series_window("k", ["ts"])
    out = df.select("ts", WIN.rolling_mean("value", w, 3, min_periods=2).alias("m"))
    assert collect_col(out, "m") == [None, 1.5, 2.0, 3.0]


def test_rolling_mean_null_aware(spark):
    # nulls inside the frame are skipped (pandas/numba null-aware divide)
    df = make_series(spark, [3, None, 6, 9])
    w = WIN.series_window("k", ["ts"])
    out = df.select("ts", WIN.rolling_mean("value", w, 3, min_periods=1).alias("m"))
    assert collect_col(out, "m") == [3.0, 3.0, 4.5, 7.5]


def test_rolling_std_ddof(spark):
    vals = [2.0, 4.0, 6.0, 8.0]
    df = make_series(spark, vals)
    w = WIN.series_window("k", ["ts"])
    out = df.select(
        "ts",
        WIN.rolling_std("value", w, 3, full_window=True).alias("pop"),
        WIN.rolling_std("value", w, 3, full_window=True, sample=True).alias("samp"),
    )
    pops = collect_col(out, "pop")
    samps = collect_col(out, "samp")
    s = pd.Series(vals)
    exp_pop = s.rolling(3).std(ddof=0).tolist()
    exp_samp = s.rolling(3).std(ddof=1).tolist()
    for got, exp in [(pops, exp_pop), (samps, exp_samp)]:
        for g, e in zip(got, exp):
            if g is None:
                assert math.isnan(e)
            else:
                assert g == pytest.approx(e)


def test_anomaly_excludes_current_row(spark):
    # 24 stable rows then a huge spike: the spike row's baseline must be
    # the PRECEDING window only (pre_processing.py:1010 values[i-w:i]),
    # so sigma=0 and the spike is flagged +1; including the current row
    # would inflate sigma and miss it.
    vals = [10.0] * 24 + [1000.0]
    df = make_series(spark, vals)
    w = WIN.series_window("k", ["ts"])
    feats = WIN.anomaly_features("value", w, window=24)
    out = df.select("ts", feats["value_anomaly_flag"].alias("flag"),
                    feats["value_baseline_mean"].alias("mu"))
    rows = out.orderBy("ts").collect()
    assert rows[-1]["flag"] == 1
    assert rows[-1]["mu"] == 10.0
    # all warm-up rows (frame not yet full) must be 0, not null
    assert all(r["flag"] == 0 for r in rows[:-1])


def test_anomaly_drop_magnitude(spark):
    vals = [100.0] * 24 + [50.0]
    df = make_series(spark, vals)
    w = WIN.series_window("k", ["ts"])
    feats = WIN.anomaly_features("value", w, window=24)
    out = df.select("ts", feats["value_anomaly_flag"].alias("flag"),
                    feats["value_drop_magnitude"].alias("mag"))
    last = out.orderBy("ts").collect()[-1]
    assert last["flag"] == -1
    assert last["mag"] == pytest.approx(50.0)


def test_anomaly_min_valid_frac(spark):
    # >half the trailing window null → stats invalid → flag 0
    vals = [None] * 16 + [10.0] * 8 + [1000.0]
    df = make_series(spark, vals)
    w = WIN.series_window("k", ["ts"])
    feats = WIN.anomaly_features("value", w, window=24)
    out = df.select("ts", feats["value_anomaly_flag"].alias("flag"))
    assert collect_col(out, "flag")[-1] == 0


def test_diff_and_pct_change(spark):
    df = make_series(spark, [10, 20, 10])
    w = WIN.series_window("k", ["ts"])
    out = df.select("ts", WIN.diff("value", w).alias("d"),
                    WIN.pct_change("value", w, 1).alias("p"))
    assert collect_col(out, "d") == [None, 10.0, -10.0]
    assert collect_col(out, "p") == [None, 100.0, -50.0]


def test_consecutive_run_flag(spark):
    df = make_series(spark, [5, 4, 3, 2, 3, 2])
    w = WIN.series_window("k", ["ts"])
    out = df.select("ts", WIN.consecutive_run_flag("value", w, run=3).alias("c"))
    # drops at idx1,2,3 → first full 3-run at idx3; idx4 rises (resets)
    assert collect_col(out, "c") == [0, 0, 0, 1, 0, 0]


def test_trailing_sequence_padding(spark):
    df = make_series(spark, [1, 2, 3])
    w = WIN.series_window("k", ["ts"])
    out = df.select("ts", WIN.trailing_sequence("value", w, seq_len=3).alias("s"))
    seqs = collect_col(out, "s")
    assert seqs[0] == [0.0, 0.0, 1.0]
    assert seqs[1] == [0.0, 1.0, 2.0]
    assert seqs[2] == [1.0, 2.0, 3.0]


def test_baseline_ratio(spark):
    df = make_series(spark, [1.0] * 10)
    w = WIN.series_window("k", ["ts"])
    out = df.select("ts", WIN.baseline_ratio("value", w, short=2, long=4,
                                             long_min_periods=1).alias("r"))
    assert all(v == pytest.approx(0.0) for v in collect_col(out, "r"))


def test_funnel_conversion_window(spark):
    import pandas as pd
    import __spark_entry__ as E
    from pyspark.sql import functions as F
    base = pd.Timestamp("2024-06-01 10:00:00")
    rows = [
        # user 1: signup then purchase 30 min later (converts), then a
        # purchase 2 h after the signup (does not convert)
        (1, 1, base, "signup", 1.0),
        (2, 1, base + pd.Timedelta(minutes=30), "purchase", 5.0),
        (3, 1, base + pd.Timedelta(hours=2, minutes=1), "purchase", 7.0),
        # user 2: purchase with no signup ever (no conversion)
        (4, 2, base, "purchase", 3.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                      "event_type", "value"])
    import tempfile, shutil, os
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tempfile.mkdtemp(prefix="funnel_")
    try:
        # pyarrow write mimics the driver corpus layout (ts = INT64 ns),
        # which load_table's schema expects — Spark writes INT96
        pq.write_table(pa.Table.from_pandas(pdf),
                       os.path.join(d, "events.parquet"))
        out = {r["user_id"]: r for r in E.q_funnel(spark, d).collect()}
        assert out[1]["n_purchases"] == 2 and out[1]["n_converted"] == 1
        assert out[2]["n_purchases"] == 1 and out[2]["n_converted"] == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ewma_constant_series_is_identity(spark):
    import pandas as pd
    import __spark_entry__ as E
    import tempfile, shutil, os
    import pyarrow as pa
    import pyarrow.parquet as pq
    base = pd.Timestamp("2024-06-01")
    pdf = pd.DataFrame(
        [(i, 1, base + pd.Timedelta(hours=i), "view", 42.0)
         for i in range(20)],
        columns=["event_id", "user_id", "ts", "event_type", "value"])
    d = tempfile.mkdtemp(prefix="ewma_")
    try:
        pq.write_table(pa.Table.from_pandas(pdf),
                       os.path.join(d, "events.parquet"))
        out = E.q_ewma(spark, d).collect()
        # weighted average of a constant is the constant, at every row
        assert all(abs(r["ewma"] - 42.0) < 1e-6 for r in out)
    finally:
        shutil.rmtree(d, ignore_errors=True)
