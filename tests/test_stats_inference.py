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
