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
