"""Resample/align/fill operators (SURVEY.md §2.6) semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseries_data_analysis_spark.operators import timeseries as TS


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_spine_inclusive_bounds(spark):
    df = spark.createDataFrame([(ts(0, 30),), (ts(5, 10),)], "ts timestamp")
    spine = TS.spine_for(df, "ts")
    got = [r["ts"] for r in spine.orderBy("ts").collect()]
    assert got[0] == ts(0) and got[-1] == ts(5) and len(got) == 6


def test_spine_with_keys_cross_join(spark):
    df = spark.createDataFrame([(ts(0), "a"), (ts(2), "b")], "ts timestamp, k string")
    spine = TS.spine_for(df, "ts", keys=["k"])
    assert spine.count() == 3 * 2


def test_collapse_duplicates(spark):
    df = spark.createDataFrame(
        [(ts(0), 1.0), (ts(0), 3.0), (ts(1), 5.0)], "ts timestamp, value double")
    out = TS.collapse_duplicates(df, ["ts"])
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got[ts(0)] == 2.0 and got[ts(1)] == 5.0


def test_downsample_hourly_mean(spark):
    df = spark.createDataFrame(
        [(ts(0, 10), 1.0), (ts(0, 50), 3.0), (ts(1, 0), 10.0)],
        "ts timestamp, value double")
    out = TS.downsample(df, "ts", "hour")
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got[ts(0)] == 2.0 and got[ts(1)] == 10.0


def test_ffill_bfill_chain(spark):
    df = spark.createDataFrame(
        [("a", 0, None), ("a", 1, 5.0), ("a", 2, None), ("a", 3, None), ("a", 4, 9.0)],
        "k string, ts long, value double")
    out = df.select(
        "ts",
        TS.ffill("value", ["k"], ["ts"]).alias("f"),
        TS.bfill("value", ["k"], ["ts"]).alias("b"),
        TS.fill_chain("value", ["k"], ["ts"], default=-1.0).alias("c"),
    ).orderBy("ts").collect()
    assert [r["f"] for r in out] == [None, 5.0, 5.0, 5.0, 9.0]
    assert [r["b"] for r in out] == [5.0, 5.0, 9.0, 9.0, 9.0]
    assert [r["c"] for r in out] == [5.0, 5.0, 5.0, 5.0, 9.0]


def test_fill_chain_all_null_default(spark):
    df = spark.createDataFrame([("a", 0, None), ("a", 1, None)],
                               "k string, ts long, value double")
    out = df.select(TS.fill_chain("value", ["k"], ["ts"], default=0.0).alias("c"))
    assert [r["c"] for r in out.collect()] == [0.0, 0.0]


def test_interpolate_linear_time_weighted(spark):
    # gap from t=0h (v=0) to t=4h (v=8): interior hours lerp on time axis
    rows = [("a", ts(0), 0.0), ("a", ts(1), None), ("a", ts(2), None),
            ("a", ts(3), None), ("a", ts(4), 8.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = df.select("ts", TS.interpolate_linear("value", "ts", ["k"]).alias("v"))
    got = [r["v"] for r in out.orderBy("ts").collect()]
    assert got == [0.0, 2.0, 4.0, 6.0, 8.0]


def test_interpolate_edges_stay_null(spark):
    rows = [("a", ts(0), None), ("a", ts(1), 4.0), ("a", ts(2), None)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = df.select("ts", TS.interpolate_linear("value", "ts", ["k"]).alias("v"))
    got = [r["v"] for r in out.orderBy("ts").collect()]
    assert got == [None, 4.0, None]


def test_align_to_spine_ffill(spark):
    spine = spark.createDataFrame([(ts(h), "a") for h in range(4)], "ts timestamp, k string")
    src = spark.createDataFrame([(ts(1), "a", 7.0)], "ts timestamp, k string, value double")
    out = TS.align_to_spine(spine, src, on=["ts", "k"], fill="ffill")
    got = [r["value"] for r in out.orderBy("ts").collect()]
    assert got == [None, 7.0, 7.0, 7.0]


def test_ffill_idempotent(spark):
    # property: applying ffill twice == once (SURVEY.md §5.2 property checks)
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, None), ("a", 2, None)],
        "k string, ts long, value double")
    once = df.select("k", "ts", TS.ffill("value", ["k"], ["ts"]).alias("value"))
    twice = once.select("k", "ts", TS.ffill("value", ["k"], ["ts"]).alias("value"))
    assert once.collect() == twice.collect()


# -- R6: cubic spline ---------------------------------------------------------

def test_cubic_interp_passes_through_knots(spark):
    rows = [("a", float(i), float(v)) for i, v in
            enumerate([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0])]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    # num chosen so the query grid lands exactly on every integer knot
    out = TS.cubic_interpolate(df, ["k"], "x", "y", num=13, out_col="s")
    got = {round(r["x"], 6): r["s"] for r in out.collect()}
    for i, v in enumerate([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]):
        assert abs(got[float(i)] - v) < 1e-9


def test_cubic_interp_exact_on_linear_data(spark):
    rows = [("a", float(i), 2.0 * i + 1.0) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = TS.cubic_interpolate(df, ["k"], "x", "y", num=29, out_col="s")
    for r in out.collect():
        assert abs(r["s"] - (2.0 * r["x"] + 1.0)) < 1e-9


def test_cubic_interp_small_groups_fall_back(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("a", 2.0, 4.0), ("b", 1.0, 7.0)],
        "k string, x double, y double")
    out = TS.cubic_interpolate(df, ["k"], "x", "y", num=5, out_col="s")
    got = {(r["k"], round(r["x"], 6)): r["s"] for r in out.collect()}
    assert abs(got[("a", 1.0)] - 2.0) < 1e-9   # 2 knots -> linear
    assert all(abs(v - 7.0) < 1e-9 for (k, _), v in got.items() if k == "b")


def test_sessionize_gap_numbering(spark):
    rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
            (1, "2024-01-01 01:00:00"),  # 50 min gap → new session
            (1, "2024-01-01 01:20:00"),
            (2, "2024-01-01 00:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"))
    out = TS.sessionize(df, "user_id", "ts", gap_s=1800)
    got = {(r["user_id"], str(r["ts"])): r["session_id"] for r in out.collect()}
    assert got[(1, "2024-01-01 00:00:00")] == 0
    assert got[(1, "2024-01-01 00:10:00")] == 0
    assert got[(1, "2024-01-01 01:00:00")] == 1
    assert got[(1, "2024-01-01 01:20:00")] == 1
    assert got[(2, "2024-01-01 00:00:00")] == 0


def test_paa_sax_shapes_and_coding(spark):
    import pandas as pd
    from timeseries_data_analysis_spark.operators import tsindex as TSI
    # two series: one rising ramp, one constant
    base = pd.Timestamp("2024-06-01")
    rows = []
    for i in range(32):
        rows.append((1, base + pd.Timedelta(hours=i), float(i)))
        rows.append((2, base + pd.Timedelta(hours=i), 5.0))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "hr", "v"]))
    p = TSI.paa(df, "k", ["hr"], "v", n_segments=8)
    assert p.count() == 16  # 2 keys x 8 segments
    words = {r["k"]: r["sax_word"]
             for r in TSI.sax_words(p, "k", alphabet=4).collect()}
    # ramp: monotone non-decreasing letters a..d; constant: all same letter
    assert words[1] == "".join(sorted(words[1])) and words[1][0] == "a" \
        and words[1][-1] == "d"
    assert len(set(words[2])) == 1
    # znorm distance: identical series -> 0
    d = TSI.znorm_distance_pairs(
        df, "k", "hr", "v").collect()
    assert len(d) == 1 and d[0]["n_common"] == 32


def test_even_minute_filter(spark):
    """R7 (reference data_generator.py:960): keep rows on even minutes
    after reindex — a pure built-in filter; covered so every SURVEY
    §2.6 row has a test."""
    df = spark.createDataFrame([(i,) for i in range(10)], "i: long").select(
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,i,0)")
        .alias("ts"))
    out = df.filter(F.minute("ts") % 2 == 0).collect()
    assert len(out) == 5
    assert all(r["ts"].minute % 2 == 0 for r in out)


def test_dtw_pairs_matches_2d_reference_and_warps(spark):
    import numpy as np
    import pytest as _pytest
    from timeseries_data_analysis_spark.operators import tsindex as TSI

    def dtw_ref(a, b):
        # independent textbook implementation: full 2D matrix
        n, m = len(a), len(b)
        D = np.full((n + 1, m + 1), np.inf)
        D[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                    D[i, j - 1], D[i - 1, j], D[i - 1, j - 1])
        return D[n, m]

    va = [0.0, 0.0, 1.0, 2.0, 1.0, 0.0]
    vb = [0.0, 1.0, 2.0, 1.0, 0.0, 0.0]   # same shape, shifted by one
    vc = [5.0, 5.0, 5.0, 5.0, 5.0, 5.0]
    prof = spark.createDataFrame(
        [("a", va), ("b", vb), ("c", vc)], "k string, p array<double>")
    got = {(r["key_l"], r["key_r"]): (r["dtw"], r["n_steps"])
           for r in TSI.dtw_pairs(prof, "k", "p").collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (l, r), (d, steps) in got.items():
        vecs = {"a": va, "b": vb, "c": vc}
        assert d == dtw_ref(vecs[l], vecs[r])
        assert steps == 36
    # elastic alignment: the shifted twin is much closer under DTW than
    # under lock-step euclidean-style alignment
    lockstep = sum(abs(x - y) for x, y in zip(va, vb))
    assert got[("a", "b")][0] < lockstep
    # identical-shape pair distance is tiny vs the flat-line pair
    assert got[("a", "b")][0] < got[("a", "c")][0]
    # quadratic-pairs guard
    with _pytest.raises(ValueError):
        TSI.dtw_pairs(prof, "k", "p", max_keys=2)


def test_dtw_band_constrains_matrix_edges(spark):
    """Sakoe-Chiba band applies to row-0/column-0 cells too (only (0,0)
    is unconditionally kept): a warp path may NOT route along the matrix
    edges outside |i−j| ≤ band."""
    import numpy as np
    from timeseries_data_analysis_spark.operators import tsindex as TSI

    def dtw_band_ref(a, b, band):
        n, m = len(a), len(b)
        D = np.full((n + 1, m + 1), np.inf)
        D[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                if abs((i - 1) - (j - 1)) > band:
                    continue
                D[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                    D[i, j - 1], D[i - 1, j], D[i - 1, j - 1])
        return D[n, m]

    # pair engineered so the cheapest unconstrained path hugs an edge:
    # va is a spike early, vb a spike late — full warp wants the borders
    va = [9.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    vb = [0.0, 0.0, 0.0, 0.0, 0.0, 9.0]
    prof = spark.createDataFrame(
        [("a", va), ("b", vb)], "k string, p array<double>")
    for band in (1, 2, 3):
        got = TSI.dtw_pairs(prof, "k", "p", band=band).collect()[0]["dtw"]
        assert got == dtw_band_ref(va, vb, band), band
        # tighter band must never be cheaper
    d1 = TSI.dtw_pairs(prof, "k", "p", band=1).collect()[0]["dtw"]
    d5 = TSI.dtw_pairs(prof, "k", "p", band=5).collect()[0]["dtw"]
    assert d1 >= d5


def test_holt_linear_tracks_linear_series_exactly(spark):
    import datetime as dt
    import pytest as _pytest
    from timeseries_data_analysis_spark.operators import timeseries as TS
    days = [dt.datetime(2024, 1, 1) + dt.timedelta(days=i) for i in range(30)]
    rows = ([("lin", d, 2.0 + 3.0 * i) for i, d in enumerate(days)]
            + [("flat", d, 5.0) for d in days[:10]])
    df = spark.createDataFrame(rows, "k string, d timestamp, y double")
    got = {r["k"]: r for r in
           TS.holt_linear(df, "k", "d", "y", alpha=0.3, beta=0.1,
                          horizon=7).collect()}
    # exact-linear input: one-step predictions are exact, state rides the line
    lin = got["lin"]
    assert lin["n_periods"] == 30
    assert abs(lin["mae"]) < 1e-9
    assert abs(lin["trend"] - 3.0) < 1e-9
    assert abs(lin["level"] - (2.0 + 3.0 * 29)) < 1e-9
    assert abs(lin["forecast_h"] - (2.0 + 3.0 * 36)) < 1e-9
    flat = got["flat"]
    assert abs(flat["trend"]) < 1e-9 and abs(flat["forecast_h"] - 5.0) < 1e-9
    # contract: a 1-period key raises
    one = spark.createDataFrame([("x", days[0], 1.0)],
                                "k string, d timestamp, y double")
    with _pytest.raises(Exception):
        TS.holt_linear(one, "k", "d", "y").collect()


def test_ewma_recursive_matches_pandas_and_bounds_fir_tail(spark):
    """`ewma_recursive` is the exact adjust=False EWMA (vs pandas), and
    the 12-tap FIR approximation (`q_ewma`'s form) deviates from the
    exact ADJUSTED EWMA by no more than the truncated tail weight
    (1−α)^12 ≈ 1.4 % of the value range — the documented claim."""
    import datetime as dt

    import numpy as np
    import pandas as pd
    from timeseries_data_analysis_spark.operators import timeseries as TS

    rng = np.random.RandomState(7)
    n, alpha, taps = 120, 0.3, 12
    ys = np.cumsum(rng.randn(n)) + 10.0
    days = [dt.datetime(2024, 1, 1) + dt.timedelta(days=i) for i in range(n)]
    df = spark.createDataFrame(
        [("a", d, float(y)) for d, y in zip(days, ys)],
        "k string, d timestamp, y double")

    got = (TS.ewma_recursive(df, "k", "d", "y", alpha=alpha)
           .orderBy("d").toPandas())
    want = pd.Series(ys).ewm(alpha=alpha, adjust=False).mean().values
    assert np.allclose(got["ewma"].values, want, rtol=0, atol=1e-12)

    # FIR (adjusted, truncated at 12 taps — q_ewma's closed form)
    w = np.array([alpha * (1 - alpha) ** j for j in range(taps)])
    fir = np.array([
        np.dot(w[: i + 1], ys[i::-1][: taps]) / w[: min(i + 1, taps)].sum()
        for i in range(n)])
    exact_adj = pd.Series(ys).ewm(alpha=alpha, adjust=True).mean().values
    tail_share = (1 - alpha) ** taps           # ≈ 0.0138
    bound = tail_share * (ys.max() - ys.min()) + 1e-9
    assert np.max(np.abs(fir - exact_adj)) <= bound
    # and the tail really is the error driver: rows < taps are exact
    assert np.allclose(fir[:taps], exact_adj[:taps], atol=1e-12)


def test_dtw_pairs_bucketed_equals_within_bucket_allpairs(spark):
    """bucket_col= turns the quadratic all-pairs into per-bucket
    equi-joined quadratics: results must equal the all-pairs run
    restricted to same-bucket pairs, and the max_keys guard re-scopes
    to the largest bucket."""
    import pytest as _pytest
    from timeseries_data_analysis_spark.operators import tsindex as TSI

    prof = spark.createDataFrame(
        [("a", "X", [0.0, 1.0, 2.0]), ("b", "X", [0.0, 2.0, 4.0]),
         ("c", "Y", [5.0, 5.0, 5.0]), ("d", "Y", [5.0, 6.0, 5.0]),
         ("e", "Y", [4.0, 5.0, 6.0])],
        "k string, w string, p array<double>")
    got = {(r["key_l"], r["key_r"]): r["dtw"]
           for r in TSI.dtw_pairs(prof, "k", "p",
                                  bucket_col="w").collect()}
    full = {(r["key_l"], r["key_r"]): r["dtw"]
            for r in TSI.dtw_pairs(prof, "k", "p").collect()}
    bucket_of = {"a": "X", "b": "X", "c": "Y", "d": "Y", "e": "Y"}
    want = {p: d for p, d in full.items()
            if bucket_of[p[0]] == bucket_of[p[1]]}
    assert got == want and len(got) == 4  # 1 X-pair + 3 Y-pairs
    with _pytest.raises(ValueError):
        TSI.dtw_pairs(prof, "k", "p", bucket_col="w", max_keys=2)


def test_holt_winters_exact_on_pure_seasonal_series(spark):
    """A flat level + zero-sum weekly pattern is a fixed point of the
    additive recursion under simple init: level stays exact, trend 0,
    seasonal state reproduces the pattern, MAE 0, and every h-step
    forecast lands exactly on the pattern's continuation."""
    import datetime as dt
    import pytest as _pytest
    from timeseries_data_analysis_spark.operators import timeseries as TS

    s = [3.0, -1.0, 2.0, -4.0, 1.0, 0.5, -1.5]   # sums to 0
    days = [dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
            for i in range(28)]
    rows = [("w", d, 10.0 + s[i % 7]) for i, d in enumerate(days)]
    df = spark.createDataFrame(rows, "k string, d timestamp, y double")
    out = {r["h"]: r for r in
           TS.holt_winters_additive(df, "k", "d", "y", season=7,
                                    horizon=7).collect()}
    assert len(out) == 7
    for h, r in out.items():
        assert abs(r["level"] - 10.0) < 1e-9
        assert abs(r["trend"]) < 1e-9
        assert abs(r["mae"]) < 1e-9
        assert abs(r["forecast"] - (10.0 + s[(28 - 1 + h) % 7])) < 1e-9
    # contract: needs >= 2 seasons
    short = spark.createDataFrame(rows[:10], "k string, d timestamp, y double")
    with _pytest.raises(Exception):
        TS.holt_winters_additive(short, "k", "d", "y",
                                 season=7).collect()


def test_kalman_local_level_matches_reference_recursion(spark):
    """Filter state must equal an independent scalar replay, the gain
    must converge toward the steady-state Riccati fixed point, and a
    constant series must be tracked with zero steady-state error."""
    import datetime
    import math

    import pytest as _pytest

    ys = [5.0, 6.0, 4.5, 7.0, 6.2, 5.8, 6.6, 6.1, 5.9, 6.3]
    base = datetime.datetime(2024, 1, 1)
    rows = [("a", base + datetime.timedelta(days=i), y)
            for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, d timestamp, y double")
    got = TS.kalman_local_level(df, "k", "d", "y", q=0.01, r=1.0).collect()[0]

    x, p = ys[0], 1.0
    esum = k = 0.0
    for z in ys[1:]:
        pp = p + 0.01
        k = pp / (pp + 1.0)
        esum += abs(z - x)
        x = x + k * (z - x)
        p = (1.0 - k) * pp
    assert got["n_periods"] == len(ys)
    assert got["level"] == x and got["gain"] == k and got["p_var"] == p
    assert got["mae"] == esum / (len(ys) - 1)

    # steady-state gain: k* solves k = (p+q)/(p+q+r) with p = (1-k)(p+q)
    q_, r_ = 0.01, 1.0
    pss = (q_ + math.sqrt(q_ * q_ + 4 * q_ * r_)) / 2
    kss = pss / (pss + r_)
    const = [("c", base + datetime.timedelta(days=i), 3.25)
             for i in range(60)]
    g2 = TS.kalman_local_level(
        spark.createDataFrame(const, "k string, d timestamp, y double"),
        "k", "d", "y", q=q_, r=r_).collect()[0]
    assert abs(g2["gain"] - kss) < 1e-5      # Riccati fixed point
    assert abs(g2["level"] - 3.25) < 1e-12   # constant series tracked

    with _pytest.raises(Exception):
        TS.kalman_local_level(
            spark.createDataFrame(const[:1],
                                  "k string, d timestamp, y double"),
            "k", "d", "y").collect()


def test_recursions_preserve_nonstring_key_type(spark):
    """holt_linear / ewma_recursive / holt_winters_additive /
    kalman_local_level must derive the grouping key's output type from
    the input schema: a bigint series id must come back bigint (the old
    hard-coded `{key} string` schema coerced it, breaking downstream
    joins on the key)."""
    import datetime as dt
    from timeseries_data_analysis_spark.operators import timeseries as TS

    days = [dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
            for i in range(28)]
    rows = [(k, d, float(k) + 0.5 * i)
            for k in (10, 20) for i, d in enumerate(days)]
    df = spark.createDataFrame(rows, "k long, d timestamp, y double")

    for out in (TS.holt_linear(df, "k", "d", "y"),
                TS.ewma_recursive(df, "k", "d", "y"),
                TS.holt_winters_additive(df, "k", "d", "y", season=7),
                TS.kalman_local_level(df, "k", "d", "y")):
        assert out.schema["k"].dataType.simpleString() == "bigint"
        # key survives an equi-join back against the source (the
        # downstream-use contract a string-coerced key would break)
        keys = {r["k"] for r in
                out.join(df.select("k").distinct(), "k").select("k")
                   .distinct().collect()}
        assert keys == {10, 20}


def test_garch_filter_tracks_volatility_clusters(spark):
    """On a volatility-clustered series the persistent GARCH(1,1)
    filter must (a) forecast higher variance right after the noisy
    regime than the calm one, and (b) beat the constant-variance
    model (alpha=beta=0) on in-sample likelihood; on iid-ish noise
    the constant model wins (persistence costs fit)."""
    import datetime as dt
    import math

    from timeseries_data_analysis_spark.operators import timeseries as TS

    def mk(name, vals):
        return [(name, dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
                 float(v)) for i, v in enumerate(vals)]

    def noise(i, s):
        return s * (math.sin(i * 12.9898 + 0.5) * 43758.5453 % 2.0 - 1.0)

    calm_then_wild = [10.0]
    for i in range(40):
        s = 0.2 if i < 30 else 8.0
        calm_then_wild.append(calm_then_wild[-1] + noise(i, s))
    iid = [10.0]
    for i in range(40):
        iid.append(iid[-1] + noise(i + 77, 1.0))
    df = spark.createDataFrame(
        mk("clustered", calm_then_wild) + mk("iid", iid),
        "event_type string, d timestamp, v double")

    g = {r["event_type"]: r for r in TS.garch_filter(
        df, "event_type", "d", "v", alpha=0.1, beta=0.85).collect()}
    flat = {r["event_type"]: r for r in TS.garch_filter(
        df, "event_type", "d", "v", alpha=0.0, beta=0.0).collect()}
    # (a) after the wild tail, forecast vol far above the calm sample
    assert g["clustered"]["h_next"] > 2.0 * g["clustered"]["v0"]
    # (b) likelihood ordering flips with the data shape
    assert g["clustered"]["log_lik"] > flat["clustered"]["log_lik"]
    assert g["iid"]["log_lik"] < flat["iid"]["log_lik"]
    # short series are excluded, not crashed
    short = spark.createDataFrame(mk("s", [1, 2, 3]),
                                  "event_type string, d timestamp, v double")
    assert TS.garch_filter(short, "event_type", "d", "v").count() == 0


def test_holt_damped_phi1_identity_and_damping(spark):
    """φ = 1.0 must reproduce the classic Holt recursion BIT-FOR-BIT
    (the backward-compatibility contract `holt_forecast`'s oracle
    relies on); φ < 1 must pull a positive-trend long-horizon forecast
    strictly below the undamped one and above the bare level."""
    import datetime as dt

    from timeseries_data_analysis_spark.operators import timeseries as TS

    rows = [("s", dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
             10.0 + 0.9 * i + (0.4 if i % 2 == 0 else -0.4))
            for i in range(30)]
    df = spark.createDataFrame(rows,
                               "event_type string, d timestamp, v double")
    base = TS.holt_linear(df, "event_type", "d", "v").collect()[0]
    phi1 = TS.holt_linear(df, "event_type", "d", "v",
                          phi=1.0).collect()[0]
    for c in ("level", "trend", "forecast_h", "mae"):
        assert base[c] == phi1[c], c
    damp = TS.holt_linear(df, "event_type", "d", "v",
                          phi=0.85).collect()[0]
    assert damp["trend"] > 0
    assert damp["level"] < damp["forecast_h"] < base["forecast_h"]
    with pytest.raises(ValueError):
        TS.holt_linear(df, "event_type", "d", "v", phi=0.0)


def test_hp_filter_matches_dense_solve(spark):
    """The banded pentadiagonal LU must agree with a DENSE numpy solve
    of (I+λDᵀD)τ = y to float tolerance — an independent check of the
    boundary coefficient rows (the easiest place to get the banded
    algebra silently wrong)."""
    import datetime as dt
    import math

    import numpy as np

    from timeseries_data_analysis_spark.operators import timeseries as TS

    n, lam = 23, 1600.0
    ys = [10.0 + 0.3 * i + 2.0 * math.sin(i * 1.7) for i in range(n)]
    rows = [("s", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), v)
            for i, v in enumerate(ys)]
    df = spark.createDataFrame(rows,
                               "event_type string, d timestamp, v double")
    got = {r["d"].day + 31 * (r["d"].month - 1): r["trend"]
           for r in TS.hp_filter(df, "event_type", "d", "v",
                                 lam=lam).collect()}
    D = np.zeros((n - 2, n))
    for i in range(n - 2):
        D[i, i], D[i, i + 1], D[i, i + 2] = 1.0, -2.0, 1.0
    A = np.eye(n) + lam * (D.T @ D)
    tau = np.linalg.solve(A, np.array(ys))
    got_sorted = [got[k] for k in sorted(got)]
    assert np.allclose(got_sorted, tau, atol=1e-8, rtol=0)


def test_croston_constant_intermittent_series(spark):
    """On a perfectly regular intermittent series (size 10 every 5
    periods) both smoothers are at their fixed points: ẑ = 10, p̂ = 5,
    forecast = 2.0 exactly — and the per-period naive mean ẑ/p̂ matches
    the true demand rate, which plain SES on the dense series (zeros
    included) underestimates right after each demand."""
    from timeseries_data_analysis_spark.operators import timeseries as TS

    rows = [("a", 5 * k, 10.0) for k in range(12)]
    rows += [("b", 7, 3.0)]  # single demand → excluded
    df = spark.createDataFrame(rows, "k string, t long, z double")
    out = {r["k"]: r for r in TS.croston_forecast(
        df, "k", "t", "z", alpha=0.1).collect()}
    assert set(out) == {"a"}
    r = out["a"]
    assert r["n_demands"] == 12 and r["span_periods"] == 55
    assert r["z_hat"] == 10.0 and r["p_hat"] == 5.0
    assert r["forecast"] == 2.0
    with pytest.raises(ValueError):
        TS.croston_forecast(df, "k", "t", "z", alpha=1.0)


def test_hp_filter_properties(spark):
    """HP-filter invariants from the first-order conditions
    (I+λDᵀD)τ = y: (a) a perfectly linear series is a FIXED POINT
    (D″ of a line is 0 ⇒ τ = y); (b) cycles sum to zero (rows of DᵀD
    sum to 0); (c) the trend's roughness Σ(Δ²τ)² is far below the
    input's on a noisy series; (d) short series are excluded."""
    import datetime as dt
    import math

    from timeseries_data_analysis_spark.operators import timeseries as TS

    def mk(name, vals):
        return [(name, dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
                 float(v)) for i, v in enumerate(vals)]

    lin = [3.0 + 0.7 * i for i in range(40)]
    noisy = [10.0 + 0.2 * i
             + 5.0 * math.sin(i * 12.9898) for i in range(40)]
    df = spark.createDataFrame(
        mk("lin", lin) + mk("noisy", noisy),
        "event_type string, d timestamp, v double")
    out = TS.hp_filter(df, "event_type", "d", "v", lam=1600.0)
    rows = sorted(out.collect(), key=lambda r: (r["event_type"], r["d"]))
    by = {}
    for r in rows:
        by.setdefault(r["event_type"], []).append((r["y"], r["trend"]))
    # (a) linear fixed point
    for y, t in by["lin"]:
        assert abs(y - t) < 1e-6, (y, t)
    # (b) cycles sum to ~0 on both series
    for k in ("lin", "noisy"):
        assert abs(sum(y - t for y, t in by[k])) < 1e-6, k
    # (c) smoothness: trend roughness << input roughness

    def rough(xs):
        return sum((xs[i + 1] - 2 * xs[i] + xs[i - 1]) ** 2
                   for i in range(1, len(xs) - 1))

    ys = [y for y, _ in by["noisy"]]
    ts_ = [t for _, t in by["noisy"]]
    assert rough(ts_) < 0.01 * rough(ys)
    # (d) < 5 points → excluded, not crashed
    short = spark.createDataFrame(mk("s", [1, 2, 3, 4]),
                                  "event_type string, d timestamp, v double")
    assert TS.hp_filter(short, "event_type", "d", "v").count() == 0
    with pytest.raises(ValueError):
        TS.hp_filter(df, "event_type", "d", "v", lam=0.0)


def test_garch_sweep_recovers_generating_regime(spark):
    """`garch_sweep` model selection: on a series SIMULATED from a
    GARCH(1,1) with (α=0.3, β=0.65), that candidate must beat the
    near-homoskedastic ones on in-sample log-likelihood (the
    `garch_select` contract); each sweep row must equal a standalone
    `garch_filter` run bit-for-bit (shared `_garch_core`); and invalid
    candidates are rejected up front."""
    import datetime as dt
    import math
    import random

    from timeseries_data_analysis_spark.operators import timeseries as TS

    rng = random.Random(42)
    # strongly shock-driven regime: candidates differing only in how
    # they SPLIT the same persistence are not identifiable from a few
    # hundred points (measured here first — the r9 ALS
    # capacity-vs-generalization lesson again), so the generator and
    # the alternatives differ in persistence itself
    a_true, b_true = 0.45, 0.3
    v_uncond = 1.0
    w = (1.0 - a_true - b_true) * v_uncond
    h, vals = v_uncond, [100.0]
    for _ in range(600):
        r = math.sqrt(h) * rng.gauss(0.0, 1.0)
        vals.append(vals[-1] + r)
        h = w + a_true * r * r + b_true * h
    rows = [("sim", dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
             float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type string, d timestamp, v double")

    cands = [(0.05, 0.9), (0.1, 0.85), (0.45, 0.3)]
    sw = {(r["alpha"], r["beta"]): r
          for r in TS.garch_sweep(df, "event_type", "d", "v",
                                  cands).collect()}
    assert len(sw) == 3
    true_ll = sw[(a_true, b_true)]["log_lik"]
    for a, b in cands[:2]:  # the misspecified candidates
        assert true_ll > sw[(a, b)]["log_lik"], (a, b)
    # sweep row == standalone filter run, bit-for-bit
    lone = TS.garch_filter(df, "event_type", "d", "v",
                           alpha=0.1, beta=0.85).collect()[0]
    row = sw[(0.1, 0.85)]
    for c in ("n_diffs", "v0", "h_next", "vol_next", "max_shock",
              "log_lik"):
        assert row[c] == lone[c], c
    # candidate validation: alpha + beta >= 1 breaks variance targeting
    with pytest.raises(ValueError):
        TS.garch_sweep(df, "event_type", "d", "v", [(0.5, 0.5)])
    with pytest.raises(ValueError):
        TS.garch_sweep(df, "event_type", "d", "v", [])


def test_wilder_rsi_closed_forms(spark):
    """Fixed-point checks for the pinned Wilder fold: a strictly
    increasing series has avg_loss == 0.0 exactly → RSI = 100.0; a
    strictly decreasing one has avg_gain == 0.0 → RSI = 0.0; an
    alternating ±1 sawtooth has avg_gain == avg_loss at every step of
    the Python reference fold → replay equality. Series shorter than
    period+1 are excluded."""
    from timeseries_data_analysis_spark.operators import timeseries as TS

    rows = [("up", t, 10.0 + 2.0 * t) for t in range(20)]
    rows += [("down", t, 100.0 - 3.0 * t) for t in range(20)]
    rows += [("saw", t, 5.0 + (1.0 if t % 2 else 0.0)) for t in range(20)]
    rows += [("short", t, float(t)) for t in range(14)]  # 14 < 15
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["k"]: r for r in TS.wilder_rsi(
        df, "k", "t", "v", period=14).collect()}
    assert set(out) == {"up", "down", "saw"}
    assert out["up"]["avg_loss"] == 0.0 and out["up"]["rsi"] == 100.0
    assert out["up"]["avg_gain"] == 2.0  # constant gains: fold exact
    assert out["down"]["avg_gain"] == 0.0 and out["down"]["rsi"] == 0.0
    assert out["down"]["avg_loss"] == 3.0

    # replay the pinned fold for the sawtooth
    xs = [5.0 + (1.0 if t % 2 else 0.0) for t in range(20)]
    ag = al = 0.0
    for k in range(1, 20):
        d = xs[k] - xs[k - 1]
        g = d if d > 0 else 0.0
        lo = -d if d < 0 else 0.0
        if k <= 14:
            ag, al = ag + g, al + lo
            if k == 14:
                ag, al = ag / 14, al / 14
        else:
            ag = (ag * 13 + g) / 14
            al = (al * 13 + lo) / 14
    assert out["saw"]["avg_gain"] == ag
    assert out["saw"]["avg_loss"] == al
    assert out["saw"]["rsi"] == 100.0 - 100.0 / (1.0 + ag / al)

    with pytest.raises(ValueError):
        TS.wilder_rsi(df, "k", "t", "v", period=0)
