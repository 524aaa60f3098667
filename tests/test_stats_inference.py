"""Round-8 inference operators: the A&S normal tail against
math.erfc, the log-rank statistic against a hand-unrolled reference,
and PAV's minimax form against the classic pooling algorithm."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timeseries_data_analysis_spark.functions import stats as ST
from timeseries_data_analysis_spark.operators import survival as SURV


def test_erfc_matches_math_erfc(spark):
    zs = [0.0, 0.1, 0.5, 1.0, 1.644854, 1.959964, 2.575829, 4.0]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {r["z"]: r["p"] for r in
           df.select("z", ST.two_sided_p(F.col("z")).alias("p")).collect()}
    for z in zs:
        exact = math.erfc(abs(z) / math.sqrt(2.0))
        # A&S 7.1.26 guarantees |err| < 1.5e-7 on erf, i.e. on p too
        assert abs(got[z] - exact) < 1.5e-7, (z, got[z], exact)


def test_two_sided_p_sql_twin_matches_spark(spark):
    import duckdb

    zs = [0.0, 0.37, 1.2, 2.8]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    spark_p = {r["z"]: r["p"] for r in
               df.select("z", F.round(ST.two_sided_p(F.col("z"))
                                      + F.lit(1e-9), 6).alias("p"))
               .collect()}
    expr = ST.two_sided_p_sql("z")
    for z in zs:
        duck_p = duckdb.sql(
            f"SELECT (round({expr} + 1e-9, 6) + 0.0) AS p "
            f"FROM (SELECT {z!r}::DOUBLE AS z)").fetchone()[0]
        assert spark_p[z] == duck_p, (z, spark_p[z], duck_p)


def _logrank_reference(subjects):
    """Textbook per-event-time unrolling of the Mantel-Cox statistic."""
    times = sorted({t for _, t, o in subjects if o == 1})
    s_ome, s_var = 0.0, 0.0
    for t in times:
        n = sum(1 for _, d, _ in subjects if d >= t)
        n0 = sum(1 for a, d, _ in subjects if d >= t and a == 0)
        d_t = sum(1 for _, d, o in subjects if d == t and o == 1)
        d0 = sum(1 for a, d, o in subjects if d == t and o == 1 and a == 0)
        if n <= 1 or d_t == 0:
            continue
        e0 = d_t * n0 / n
        v = d_t * (n0 / n) * (1 - n0 / n) * (n - d_t) / (n - 1)
        s_ome += d0 - e0
        s_var += v
    return s_ome, s_var


def test_logrank_matches_hand_unrolled_reference(spark):
    # arm 0 fails early, arm 1 late, with censoring mixed in
    subjects = [(0, 2, 1), (0, 3, 1), (0, 3, 0), (0, 5, 1),
                (1, 4, 1), (1, 6, 1), (1, 7, 0), (1, 8, 1), (1, 8, 0)]
    df = spark.createDataFrame(subjects, "arm int, duration int, observed int")
    row = SURV.logrank_test(df).collect()[0]
    ome, var = _logrank_reference(subjects)
    assert abs(row["o_minus_e"] - round(ome + 1e-9, 6)) < 1e-9
    assert abs(row["var_sum"] - round(var + 1e-9, 6)) < 1e-9
    assert row["n_arm0"] == 4 and row["n_arm1"] == 5
    assert row["d_total"] == 6
    z = (row["o_minus_e"]) / math.sqrt(row["var_sum"])
    assert abs(row["z"] - round(z + 1e-9, 6)) < 1e-9
    assert abs(row["chi2"] - round(row["z"] ** 2 + 1e-9, 6)) < 1e-9


def _pav_reference(ys, ws):
    """Classic pool-adjacent-violators on weighted means; blocks carry
    (weighted sum, weight, length) so the fit expands exactly."""
    blocks = [[y * w, w, 1] for y, w in zip(ys, ws)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            blocks[i][2] += blocks[i + 1][2]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fit = []
    for s, w, ln in blocks:
        fit.extend([s / w] * ln)
    return fit


def test_minimax_isotonic_equals_pav_pooling(spark):
    # non-monotone empirical rates with ties and reversals
    ys = [0.30, 0.10, 0.20, 0.50, 0.40, 0.45]
    ws = [10, 20, 10, 5, 10, 10]
    rows = [(b, float(y), int(w)) for b, (y, w) in enumerate(zip(ys, ws))]
    stats = spark.createDataFrame(rows, "bucket int, rate double, n int")
    stats = stats.select("bucket", "n",
                         (F.col("rate") * F.col("n")).alias("pos"))
    i = stats.select(F.col("bucket").alias("_i"))
    j = stats.select(F.col("bucket").alias("_j"))
    iv = (i.join(j, F.col("_i") <= F.col("_j"))
          .join(stats, (F.col("bucket") >= F.col("_i"))
                & (F.col("bucket") <= F.col("_j")))
          .groupBy("_i", "_j")
          .agg((F.sum("pos") / F.sum("n")).alias("_mean")))
    k = stats.select(F.col("bucket").alias("_k"))
    inner = (iv.join(k, (F.col("_i") <= F.col("_k"))
                     & (F.col("_j") >= F.col("_k")))
             .groupBy("_k", "_i").agg(F.min("_mean").alias("_m")))
    iso = {r["_k"]: r["_iso"] for r in
           inner.groupBy("_k").agg(F.max("_m").alias("_iso")).collect()}
    expected = _pav_reference(ys, ws)
    for b in range(len(ys)):
        assert abs(iso[b] - expected[b]) < 1e-12, (b, iso[b], expected[b])
    # the fit is nondecreasing by construction
    fitted = [iso[b] for b in range(len(ys))]
    assert fitted == sorted(fitted)


def test_mann_kendall_monotone_series(spark):
    """Strictly increasing series: S = n(n-1)/2, z > 0, Theil-Sen
    slope = the common step."""
    import datetime as dt

    rows = [("a", dt.date(2024, 1, 1) + dt.timedelta(days=i),
             1.0 + 0.5 * i) for i in range(12)]
    daily = spark.createDataFrame(rows, "event_type string, d date, v double")
    a = daily.select("event_type", F.col("d").alias("d1"),
                     F.col("v").alias("v1"))
    b = daily.select("event_type", F.col("d").alias("d2"),
                     F.col("v").alias("v2"))
    pr = a.join(b, "event_type").filter(F.col("d1") < F.col("d2"))
    s = pr.agg(F.sum(F.signum(F.col("v2") - F.col("v1"))).cast("long")
               .alias("s")).collect()[0]["s"]
    assert s == 12 * 11 // 2
    med = pr.select(
        F.percentile((F.col("v2") - F.col("v1"))
                     / F.datediff("d2", "d1"), F.lit(0.5)).alias("m")
    ).collect()[0]["m"]
    assert abs(med - 0.5) < 1e-12


def test_runs_test_alternating_vs_blocked(spark):
    """A perfectly alternating sign sequence has the maximum run count
    (z >> 0); a fully blocked one has 2 runs (z << 0). Build both
    through the registry query's own arithmetic on synthetic events."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def mk(name, values):
        return [(name, base + dt.timedelta(hours=i), i, float(v))
                for i, v in enumerate(values)]

    alt = mk("alt", [0, 10] * 20)
    blk = mk("blk", [0] * 20 + [10] * 20)
    df = spark.createDataFrame(
        alt + blk, "event_type string, ts timestamp, event_id long, "
        "value double")
    med = df.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"))
    d = (df.join(med, "event_type")
         .filter(F.col("value") != F.col("med"))
         .select("event_type", "ts", "event_id",
                 (F.col("value") > F.col("med")).cast("int").alias("s")))
    from pyspark.sql import Window
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id"))
    d = d.withColumn("chg",
                     F.when(F.lag("s").over(w).isNull(), 0)
                     .when(F.lag("s").over(w) != F.col("s"), 1)
                     .otherwise(0))
    runs = {r["event_type"]: r["r"] for r in
            d.groupBy("event_type")
            .agg((F.sum("chg") + F.lit(1)).alias("r")).collect()}
    assert runs["alt"] == 40   # every step changes sign
    assert runs["blk"] == 2    # one block each side


def test_ljung_box_white_noise_vs_trend(spark):
    """A strongly autocorrelated (trending) series must produce a far
    larger Q than deterministic hash noise (whose autocorrelations are
    near zero); the chi2(6) closed-form tail must be in [0, 1] and
    ordered accordingly. (An ALTERNATING series would NOT work as the
    null here — rho_1 ~ -1 rejects just as hard as a trend.)"""
    import datetime as dt
    import hashlib
    import math as m

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        rows.append(("trend", base + dt.timedelta(hours=i), i, float(i)))
        noise = int(hashlib.md5(f"lb|{i}".encode()).hexdigest()[:8], 16)
        rows.append(("alt", base + dt.timedelta(hours=i), i,
                     noise / 16 ** 8))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, "
        "value double")
    mu = df.groupBy("event_type").agg(F.avg("value").alias("mu"))
    from pyspark.sql import Window
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lag_cols = [F.lag("value", k).over(w).alias(f"l{k}")
                for k in range(1, 7)]
    d = df.select("event_type", "value", *lag_cols).join(mu, "event_type")
    dev = F.col("value") - F.col("mu")
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(dev * dev).alias("den")]
    for k in range(1, 7):
        aggs.append(F.sum(dev * (F.col(f"l{k}") - F.col("mu")))
                    .alias(f"num{k}"))
    g = d.groupBy("event_type").agg(*aggs)
    out = {}
    for r in g.collect():
        q = 0.0
        for k in range(1, 7):
            rho = r[f"num{k}"] / r["den"]
            q += rho * rho / (r["n"] - k)
        q *= r["n"] * (r["n"] + 2)
        h = q / 2.0
        p = m.exp(-h) * (1 + h + h * h / 2)
        out[r["event_type"]] = (q, p)
    assert out["trend"][0] > 10 * out["alt"][0]
    assert 0.0 <= out["trend"][1] < 1e-6   # trending: overwhelming rejection
    assert 0.01 <= out["alt"][1] <= 1.0    # hash noise: no rejection


# --- property-based invariants (pure Python: no Spark round-trip per
# --- hypothesis example)

from hypothesis import given, settings, strategies as st  # noqa: E402


def _minimax_iso(ys, ws):
    """The closed minimax form iso(k) = max_{i<=k} min_{j>=k}
    wmean(i..j) — the arithmetic q_isotonic_calibration distributes."""
    n = len(ys)
    means = {}
    for i in range(n):
        sw = sy = 0.0
        for j in range(i, n):
            sw += ws[j]
            sy += ys[j] * ws[j]
            means[(i, j)] = sy / sw
    return [max(min(means[(i, j)] for j in range(k, n))
                for i in range(k + 1))
            for k in range(n)]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.floats(0, 1, allow_nan=False,
                                    allow_infinity=False),
                          st.integers(1, 50)),
                min_size=1, max_size=8))
def test_minimax_isotonic_equals_pav_for_arbitrary_inputs(pairs):
    ys = [y for y, _ in pairs]
    ws = [w for _, w in pairs]
    got = _minimax_iso(ys, ws)
    exp = _pav_reference(ys, ws)
    for g, e in zip(got, exp):
        assert abs(g - e) < 1e-9, (got, exp)
    assert all(got[i] <= got[i + 1] + 1e-12 for i in range(len(got) - 1))


def _erfc_as(x):
    """Pure-Python twin of functions/stats.erfc_pos (same literals,
    same Horner shape)."""
    from timeseries_data_analysis_spark.functions.stats import AS_A, AS_P
    t = 1.0 / (1.0 + AS_P * x)
    a1, a2, a3, a4, a5 = AS_A
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return poly * math.exp(-x * x)


@settings(max_examples=300, deadline=None)
@given(st.floats(0, 8, allow_nan=False, allow_infinity=False))
def test_erfc_polynomial_accuracy_everywhere(x):
    assert abs(_erfc_as(x) - math.erfc(x)) < 1.5e-7


@settings(max_examples=300, deadline=None)
@given(st.floats(0, 8), st.floats(0, 8))
def test_erfc_polynomial_monotone_decreasing(a, b):
    lo, hi = sorted((a, b))
    # monotonicity up to the approximation error band
    assert _erfc_as(hi) <= _erfc_as(lo) + 3e-7


# ---------------------------------------------------------------------------
# Round-9 econometrics batch: registry queries driven end-to-end over
# synthetic events (one event per (series, day) so the daily-mean
# collapse is the identity and closed-form expectations hold exactly),
# plus numpy cross-checks of the Cramer/SSE algebra.
# ---------------------------------------------------------------------------

def _events_dir(tmp_path, series_values):
    """Write an events.parquet where series_values maps
    series -> [v_0, v_1, ...] (one event per consecutive day)."""
    import datetime as dt

    import pandas as pd

    tmp_path.mkdir(parents=True, exist_ok=True)
    rows = []
    eid = 0
    for name, vals in series_values.items():
        for i, v in enumerate(vals):
            rows.append((eid, eid % 7,
                         dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
                         name, float(v)))
            eid += 1
    pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ts", "event_type", "value"]).to_parquet(
        str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _noise(i, scale=1.0):
    """Deterministic hash-noise in (-scale, scale)."""
    import math

    return scale * (math.sin(i * 12.9898 + 0.5) * 43758.5453 % 2.0 - 1.0)


def test_kruskal_wallis_rank_invariance_and_separation(spark, tmp_path):
    """Perfectly separated groups push H toward its maximum, and a
    strictly monotone transform of the values leaves H exactly
    unchanged (ranks see only order)."""
    import __spark_entry__ as em

    base = {g: [10.0 * k + i * 0.1 for i in range(12)]
            for k, g in enumerate(["a", "b", "c"])}
    d1 = _events_dir(tmp_path / "raw", base)
    cubed = {g: [v ** 3 for v in vs] for g, vs in base.items()}
    d2 = _events_dir(tmp_path / "cubed", cubed)
    q = em.queries()["kruskal_wallis"]
    r1 = q(spark, d1).collect()[0]
    r2 = q(spark, d2).collect()[0]
    assert r1["h_stat"] == r2["h_stat"]
    # df = 2 critical value at 0.01 is 9.21; separation blows past it
    assert r1["h_stat"] > 9.21
    assert r1["n_obs"] == 36 and r1["k_groups"] == 3


def test_friedman_exact_chi2_and_blocked_confounder(spark, tmp_path):
    """Series ordered identically within EVERY day: within-day ranks
    are (1,2,3) always, so χ²_F = 2n exactly — even when shared
    day-level shocks dwarf the offsets (the confounder Friedman
    blocks away; the same shocks drive pooled-rank KW toward 0)."""
    import __spark_entry__ as em

    n = 15
    shocks = [100.0 * _noise(i) for i in range(n)]
    data = {g: [shocks[i] + k for i in range(n)]
            for k, g in enumerate(["a", "b", "c"])}
    d = _events_dir(tmp_path, data)
    fr = em.queries()["friedman_test"](spark, d).collect()[0]
    assert fr["n_blocks"] == n and fr["k_groups"] == 3
    assert abs(fr["chi2_f"] - 2.0 * n) < 1e-6
    kw = em.queries()["kruskal_wallis"](spark, d).collect()[0]
    # pooled ranks are shock-dominated: far below the df=2 critical
    assert kw["h_stat"] < 4.0


def test_adf_mean_reverting_vs_random_walk(spark, tmp_path):
    """Pure noise rejects the unit root hard (t << 0); its cumulative
    sum (a 'random' walk on the same increments) does not."""
    import __spark_entry__ as em

    incs = [_noise(i) for i in range(40)]
    walk = []
    acc = 0.0
    for x in incs:
        acc += x
        walk.append(acc)
    d = _events_dir(tmp_path, {"noise": incs, "walk": walk})
    rows = {r["event_type"]: r
            for r in em.queries()["adf_test"](spark, d).collect()}
    assert rows["noise"]["adf_t"] < -3.0
    assert rows["walk"]["adf_t"] > -2.5
    assert rows["noise"]["adf_t"] < rows["walk"]["adf_t"]


def test_adf_matches_numpy_lstsq(spark, tmp_path):
    """The Cramer solve + cofactor SE against numpy OLS on the same
    daily sequence (tolerance covers the query's 6-dp sum rounding)."""
    import numpy as np

    import __spark_entry__ as em

    vals = [round(5.0 + _noise(i, 2.0) + 0.3 * _noise(i + 99), 6)
            for i in range(30)]
    d = _events_dir(tmp_path, {"s": vals})
    got = em.queries()["adf_test"](spark, d).collect()[0]
    v = np.array(vals)
    z = np.diff(v)[1:]                    # Δv_t, t = 2..n
    y = v[1:-1]                           # v_{t-1}
    dl = np.diff(v)[:-1]                  # Δv_{t-1}
    X = np.column_stack([np.ones_like(y), y, dl])
    coef, *_ = np.linalg.lstsq(X, z, rcond=None)
    resid = z - X @ coef
    sse = float(resid @ resid)
    sigma2 = sse / (len(z) - 3)
    cov = sigma2 * np.linalg.inv(X.T @ X)
    t_ref = coef[1] / np.sqrt(cov[1, 1])
    assert abs(got["beta"] - coef[1]) < 1e-3
    assert abs(got["adf_t"] - t_ref) < 1e-3


def test_granger_detects_lagged_driver_direction(spark, tmp_path):
    """y_t = x_{t-1} + tiny noise: x Granger-causes y massively; the
    reverse direction explains (almost) nothing."""
    import __spark_entry__ as em

    x = [_noise(i, 5.0) for i in range(40)]
    y = [x[i - 1] + 0.01 * _noise(i + 7) if i else 0.0
         for i in range(40)]
    d = _events_dir(tmp_path, {"x": x, "y": y})
    rows = {(r["cause"], r["effect"]): r["f_stat"]
            for r in em.queries()["granger_causality"](spark, d).collect()}
    assert rows[("x", "y")] > 50.0
    assert rows[("x", "y")] > 10.0 * max(rows[("y", "x")], 1.0)


def test_chow_detects_slope_break(spark, tmp_path):
    """Slope doubles at the midpoint -> F explodes; a stable noisy
    line stays below any conventional critical value."""
    import __spark_entry__ as em

    n, half = 30, 14
    broken = [1.0 * i + 0.05 * _noise(i) if i <= half
              else 1.0 * half + 3.0 * (i - half) + 0.05 * _noise(i)
              for i in range(n)]
    stable = [1.0 * i + 0.05 * _noise(i + 333) for i in range(n)]
    d = _events_dir(tmp_path, {"brk": broken, "ok": stable})
    rows = {r["event_type"]: r
            for r in em.queries()["chow_test"](spark, d).collect()}
    assert rows["brk"]["f_stat"] > 50.0
    assert rows["ok"]["f_stat"] < 5.0
    assert rows["brk"]["n_pre"] == half + 1


def test_welch_matches_numpy(spark, tmp_path):
    """Welch t and Satterthwaite df against the numpy formulas on the
    per-arm daily means the query itself builds (events carry
    user_id = eid % 7, so arms interleave deterministically)."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    import __spark_entry__ as em

    rows = []
    for i in range(60):
        rows.append((i, i % 7,
                     dt.datetime(2024, 1, 1) + dt.timedelta(days=i % 20,
                                                            hours=i // 20),
                     "s", 10.0 + _noise(i, 3.0) + (i % 2)))
    pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ts", "event_type", "value"]).to_parquet(
        str(tmp_path / "events.parquet"))
    got = em.queries()["welch_ttest"](spark, str(tmp_path)).collect()[0]
    df = pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ts", "event_type", "value"])
    df["arm"] = df["user_id"] % 2
    df["d"] = df["ts"].dt.date
    daily = (df.groupby(["arm", "d"])["value"].mean()
             .round(6).reset_index())
    a = daily[daily.arm == 0]["value"].to_numpy()
    b = daily[daily.arm == 1]["value"].to_numpy()
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t_ref = (a.mean() - b.mean()) / np.sqrt(va + vb)
    df_ref = (va + vb) ** 2 / (va ** 2 / (len(a) - 1)
                               + vb ** 2 / (len(b) - 1))
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert abs(got["t_stat"] - t_ref) < 1e-3
    assert abs(got["welch_df"] - df_ref) < 1e-2


def test_jarque_bera_matches_numpy_moments(spark, tmp_path):
    """Skew/kurtosis/JB against numpy population moments; a skewed
    series scores far above a symmetric one."""
    import numpy as np

    import __spark_entry__ as em

    sym = [round(_noise(i, 2.0), 6) for i in range(30)]
    skw = [round(abs(_noise(i, 2.0)) ** 2, 6) for i in range(30)]
    d = _events_dir(tmp_path, {"sym": sym, "skw": skw})
    rows = {r["event_type"]: r
            for r in em.queries()["jarque_bera"](spark, d).collect()}
    v = np.array(skw)
    c = v - round(v.mean(), 6)
    m2, m3, m4 = (c ** 2).mean(), (c ** 3).mean(), (c ** 4).mean()
    skew_ref = m3 / m2 ** 1.5
    kurt_ref = m4 / m2 ** 2
    jb_ref = 30 / 6 * (skew_ref ** 2 + (kurt_ref - 3) ** 2 / 4)
    assert abs(rows["skw"]["skewness"] - skew_ref) < 1e-3
    assert abs(rows["skw"]["kurtosis"] - kurt_ref) < 1e-3
    assert abs(rows["skw"]["jb_stat"] - jb_ref) < 1e-2
    assert rows["skw"]["jb_stat"] > rows["sym"]["jb_stat"]


def test_page_hinkley_flags_level_shift_only(spark, tmp_path):
    """A +8σ-ish level shift raises an alarm at (or just after) the
    shift day; the same series without the shift never crosses 3σ."""
    import __spark_entry__ as em

    # strictly alternating +-0.5: zero drift by construction, so the
    # cumulative PH excursion is bounded by one step and never nears
    # the 3-sigma threshold (hash-noise carries slow drift that DOES
    # alarm a running-mean detector -- measured, hence this shape)
    flat = [10.0 + (0.5 if i % 2 == 0 else -0.5) for i in range(40)]
    shifted = flat[:20] + [v + 15.0 for v in flat[20:]]
    d = _events_dir(tmp_path, {"flat": flat, "shift": shifted})
    rows = {r["event_type"]: r
            for r in em.queries()["page_hinkley"](spark, d).collect()}
    assert rows["flat"]["n_alarms"] == 0
    assert rows["flat"]["first_alarm"] == "none"
    assert rows["shift"]["n_alarms"] >= 1
    assert rows["shift"]["first_alarm"] >= "2024-01-21"


def test_engle_granger_cointegrated_vs_independent(spark, tmp_path):
    """y = 2x + stationary noise is cointegrated with x (residual DF
    t << 0); two independent walks are not (t near 0)."""
    import __spark_entry__ as em

    acc1 = acc2 = 0.0
    w1, w2 = [], []
    for i in range(40):
        acc1 += _noise(i, 2.0)
        acc2 += _noise(i + 1000, 2.0)
        w1.append(acc1)
        w2.append(acc2)
    coint = [2.0 * w1[i] + _noise(i + 55, 0.5) for i in range(40)]
    d = _events_dir(tmp_path, {"a_x": w1, "b_y": coint, "c_w": w2})
    rows = {(r["series_a"], r["series_b"]): r
            for r in em.queries()["engle_granger"](spark, d).collect()}
    assert rows[("a_x", "b_y")]["eg_t"] < -4.0
    assert abs(rows[("a_x", "b_y")]["beta"] - 2.0) < 0.1
    assert rows[("a_x", "c_w")]["eg_t"] > -3.0


def test_aic_prefers_ar2_when_pacf2_is_real(spark, tmp_path):
    """An AR(2) generator with a strong φ₂ beats AR(1) on AIC; a pure
    AR(1) generator keeps order 1 (the extra parameter costs 2)."""
    import __spark_entry__ as em

    ar2, ar1 = [1.0, 1.0], [1.0]
    for i in range(60):
        ar2.append(1.2 * ar2[-1] - 0.6 * ar2[-2] + _noise(i, 1.0))
        ar1.append(0.5 * ar1[-1] + _noise(i + 500, 1.0))
    d = _events_dir(tmp_path, {"two": ar2, "one": ar1})
    rows = {r["event_type"]: r
            for r in em.queries()["aic_order_select"](spark, d).collect()}
    assert rows["two"]["best_order"] == 2
    assert rows["two"]["aic_ar2"] < rows["two"]["aic_ar1"]
    assert rows["one"]["best_order"] == 1


def test_dunn_separated_groups_rank_pairwise(spark, tmp_path):
    """Three separated groups: the widest pair carries the largest
    |z| and a significant p; Dunn's z pool matches KW's ranks."""
    import __spark_entry__ as em

    base = {g: [10.0 * k + i * 0.1 for i in range(12)]
            for k, g in enumerate(["a", "b", "c"])}
    d = _events_dir(tmp_path, base)
    rows = {(r["series_a"], r["series_b"]): r
            for r in em.queries()["dunn_posthoc"](spark, d).collect()}
    assert abs(rows[("a", "c")]["z"]) > abs(rows[("a", "b")]["z"])
    assert rows[("a", "c")]["p_value"] < 0.05
    assert rows[("a", "c")]["z"] < 0  # a ranks below c


def test_variance_ratio_reverting_vs_walk(spark, tmp_path):
    """A strictly alternating series mean-reverts (5-day changes no
    bigger than 1-day ones -> VR << 1, z << 0); a cumulative walk on
    the same increments does not."""
    import __spark_entry__ as em

    alt = [(1.0 if i % 2 == 0 else -1.0) + 0.001 * _noise(i)
           for i in range(40)]
    acc, walk = 0.0, []
    for i in range(40):
        acc += _noise(i, 1.0)
        walk.append(acc)
    d = _events_dir(tmp_path, {"alt": alt, "walk": walk})
    rows = {r["event_type"]: r
            for r in em.queries()["variance_ratio"](spark, d).collect()}
    assert rows["alt"]["vr"] < 0.5
    assert rows["alt"]["z"] < -1.96
    assert rows["alt"]["vr"] < rows["walk"]["vr"]


def test_seasonal_mann_kendall_sees_through_weekly_cycle(spark, tmp_path):
    """Trend + strong weekly cycle: the seasonal test compares Mondays
    with Mondays, so the trend is detected cleanly (z > 1.96); a PURE
    cycle (constant within each weekday) has zero within-season
    variance and is excluded on both engines."""
    import __spark_entry__ as em

    cyc = [10.0 * (i % 7) for i in range(35)]
    trendy = [10.0 * (i % 7) + 0.5 * i for i in range(35)]
    d = _events_dir(tmp_path, {"pure": cyc, "trend": trendy})
    rows = {r["event_type"]: r
            for r in em.queries()["seasonal_mann_kendall"](spark, d)
            .collect()}
    assert "pure" not in rows          # all-tied seasons -> Var = 0
    assert rows["trend"]["z"] > 1.96
    assert rows["trend"]["s_stat"] > 0


def test_cochran_q_matches_hand_formula(spark, tmp_path):
    """Q against the textbook formula computed in pandas with the same
    median binarization over the same complete blocks."""
    import numpy as np

    import __spark_entry__ as em

    data = {g: [round(_noise(i + 100 * k, 5.0), 6) for i in range(16)]
            for k, g in enumerate(["a", "b", "c"])}
    d = _events_dir(tmp_path, data)
    got = em.queries()["cochran_q"](spark, d).collect()[0]

    from timeseries_data_analysis_spark.functions.stats import \
        half_up as r6

    X = []
    for g in ["a", "b", "c"]:
        vals = np.array(data[g])
        med = r6(float(np.quantile(vals, 0.5)))
        X.append((vals > med).astype(int))
    X = np.array(X)          # k x n
    C, R = X.sum(axis=1), X.sum(axis=0)
    k = 3
    q_ref = (k - 1) * (k * (C ** 2).sum() - C.sum() ** 2) \
        / (k * R.sum() - (R ** 2).sum())
    assert got["k_groups"] == 3 and got["n_blocks"] == 16
    assert abs(got["q_stat"] - q_ref) < 1e-6


def test_grubbs_names_the_planted_spike(spark, tmp_path):
    """A single planted spike is the arg-max day with G >> 3."""
    import datetime as dt

    import __spark_entry__ as em

    vals = [10.0 + 0.1 * _noise(i) for i in range(30)]
    vals[17] = 50.0
    d = _events_dir(tmp_path, {"s": vals})
    got = em.queries()["grubbs_outlier"](spark, d).collect()[0]
    assert got["outlier_day"] == dt.date(2024, 1, 1) + dt.timedelta(days=17)
    assert got["g_stat"] > 3.0
