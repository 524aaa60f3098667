"""Bloom prefilter, Z-order layout, and Kaplan-Meier operator tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timeseries_data_analysis_spark.operators import (
    bloom as BLM, layout as LAY, survival as SURV,
)


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame([(i,) for i in range(0, 100, 3)],
                                    "k long")
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    bits = BLM.bloom_build(members, "k", m=4096, k=3)
    kept = {r["k"] for r in
            BLM.bloom_filter(probe, "k", bits, m=4096, k=3).collect()}
    assert set(range(0, 100, 3)) <= kept  # every member survives


def test_bloom_semi_join_exact(spark):
    small = spark.createDataFrame([(2,), (5,), (7,)], "k long")
    big = spark.createDataFrame([(i, i * 10) for i in range(20)],
                                "k long, v long")
    out = BLM.bloom_semi_join(big, small, "k", "k")
    assert sorted(r["k"] for r in out.collect()) == [2, 5, 7]


def test_bloom_filter_prunes_most_non_members(spark):
    members = spark.createDataFrame([(i,) for i in range(50)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(50, 5050)], "k long")
    bits = BLM.bloom_build(members, "k", m=16384, k=3)
    n = BLM.bloom_filter(probe, "k", bits, m=16384, k=3).count()
    # fp rate ~ (1 - e^{-kn/m})^k ~= 7e-6 at n=50; allow generous slack
    assert n < 50


def test_bloom_empty_build_side(spark):
    empty = spark.createDataFrame([], "k long")
    probe = spark.createDataFrame([(1,), (2,)], "k long")
    bits = BLM.bloom_build(empty, "k")
    assert bits == {}
    assert BLM.bloom_filter(probe, "k", bits).count() == 0


# --------------------------------------------------------------- layout

def test_morton2_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (5, 2)], "x long, y long")
    out = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y",
                     LAY.morton2(F.col("x"), F.col("y")).alias("z"))
           .collect()}
    assert out[(3, 0)] == 0b0101        # x bits at even positions
    assert out[(0, 3)] == 0b1010        # y bits at odd positions
    assert out[(5, 2)] == 0b011001      # 5=101 interleaved with 2=010


def test_zorder_beats_single_sort_on_second_dim(spark):
    # full 64x64 grid: y is INDEPENDENT of x, so an x-sort gives y no
    # locality at all, while the Morton curve gives both dims locality
    rows = [(i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")
    dims = {"x": F.col("x"), "y": F.col("y")}
    z = LAY.bucket_stats(df, LAY.morton2(F.col("x"), F.col("y"), bits=6),
                         dims, n_buckets=16)
    lin = LAY.bucket_stats(df, F.col("x"), dims, n_buckets=16)
    zy = LAY.pruning_power(z, "y", 0, 7).collect()[0]
    liny = LAY.pruning_power(lin, "y", 0, 7).collect()[0]
    assert liny["files_skipped"] == 0       # x-sorted: y unskippable
    assert zy["files_skipped"] > 0          # z-order: y locality exists
    assert zy["rows_scanned"] < liny["rows_scanned"]


def test_bucket_stats_row_conservation(spark):
    df = spark.createDataFrame([(i, i) for i in range(1000)],
                               "x long, y long")
    stats = LAY.bucket_stats(df, F.col("x"), {"x": F.col("x")},
                             n_buckets=8)
    got = stats.agg(F.sum("n_rows")).collect()[0][0]
    assert got == 1000
    assert stats.count() <= 8


# ------------------------------------------------------------- survival

def test_km_textbook_curve(spark):
    # classic example: deaths at t=1 (n=5), t=3 (n=3); censored at 2, 4, 5
    subj = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)],
        "duration int, observed int")
    out = {r["duration"]: r for r in SURV.km_curve(subj).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
    assert math.isclose(out[1]["survival"], 0.8, abs_tol=1e-6)
    assert out[3]["n_risk"] == 3
    assert math.isclose(out[3]["survival"], 0.8 * (1 - 1 / 3),
                        abs_tol=1e-6)


def test_km_terminal_zero_survival(spark):
    subj = spark.createDataFrame([(1, 1), (2, 1), (2, 1)],
                                 "duration int, observed int")
    out = {r["duration"]: r["survival"]
           for r in SURV.km_curve(subj).collect()}
    assert out[2] == 0.0                 # d == n at the last duration


def test_km_all_censored_is_empty(spark):
    subj = spark.createDataFrame([(1, 0), (5, 0)],
                                 "duration int, observed int")
    assert SURV.km_curve(subj).count() == 0


# ------------------------------------------------- containment / kcore

def test_containment_catches_doc_in_doc(spark):
    from timeseries_data_analysis_spark.operators import dedup as DD
    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    small = "gamma delta epsilon zeta eta"        # wholly inside big
    other = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, big), (2, small), (3, other)], "doc_id long, text string")
    cont = {(r["id_l"], r["id_r"]): r["containment"]
            for r in DD.containment_pairs(docs, n=3,
                                          threshold=0.8).collect()}
    assert cont[(1, 2)] == 1.0          # full containment
    assert (1, 3) not in cont and (2, 3) not in cont
    # Jaccard on the same pair is well below any dedup threshold
    jac = DD.ngram_jaccard_all_pairs(docs, n=3, threshold=0.0)
    j12 = {(r["id_l"], r["id_r"]): r["jaccard"] for r in jac.collect()}
    assert j12[(1, 2)] < 0.5


def test_containment_max_posting_cap(spark):
    from timeseries_data_analysis_spark.operators import dedup as DD
    # 6 docs all carry the same boilerplate sentence (its shingles get
    # df=6 > cap=3); docs 1/2 additionally share a REAL overlapping
    # passage, docs 3/4 overlap ONLY via the boilerplate.
    boiler = "all rights reserved by the example corporation today"
    real = "the quick brown fox jumps over the lazy dog"
    rows = [(1, real + " " + boiler),
            (2, real + " again " + boiler),
            (3, "completely unrelated words here " + boiler),
            (4, "other unrelated content entirely " + boiler),
            (5, "fifth filler document text " + boiler),
            (6, "sixth filler document text body " + boiler)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r["id_l"], r["id_r"]): r["containment"]
                for r in DD.containment_pairs(
                    docs, n=3, threshold=0.3).collect()}
    capped = {(r["id_l"], r["id_r"]): r["containment"]
              for r in DD.containment_pairs(
                  docs, n=3, threshold=0.3, max_posting=3).collect()}
    # the real pair survives the cap with the EXACT uncapped score
    assert (1, 2) in capped
    assert capped[(1, 2)] == uncapped[(1, 2)]
    # boilerplate-only pairs exist uncapped but are pruned by the cap
    assert (3, 4) in uncapped
    assert (3, 4) not in capped


def test_kcore_peels_fringe_keeps_clique(spark):
    from timeseries_data_analysis_spark.operators import graph as GR
    # 4-clique {1,2,3,4} + a pendant chain 4-5-6
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6)]
    e = spark.createDataFrame(edges, "id_l long, id_r long")
    out = {r["vertex"]: r["degree"] for r in GR.kcore(e, k=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(d == 3 for d in out.values())


def test_kcore_empty_when_no_core(spark):
    from timeseries_data_analysis_spark.operators import graph as GR
    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "id_l long, id_r long")
    assert GR.kcore(chain, k=2).count() == 0


# ------------------------------------------------- theta intersection

def test_theta_intersect_underfull_is_exact(spark):
    from timeseries_data_analysis_spark.operators import sketch as SK
    a = spark.createDataFrame([(i,) for i in range(60)], "k long")
    b = spark.createDataFrame([(i,) for i in range(40, 100)], "k long")
    r = SK.theta_intersect_est(a, b, "k", "k", k=128).collect()[0]
    # both sketches under-full -> theta = 1.0 -> D IS the exact overlap
    assert r["theta"] == 1.0
    assert r["d_common"] == 20
    assert r["est_common"] == 20.0


def test_theta_intersect_estimates_within_tolerance(spark):
    from timeseries_data_analysis_spark.operators import sketch as SK
    a = spark.createDataFrame([(i,) for i in range(3000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1500, 4500)], "k long")
    r = SK.theta_intersect_est(a, b, "k", "k", k=256).collect()[0]
    # true overlap 1500; k=256 theta-sketch relative error ~1/sqrt(k)
    assert abs(r["est_common"] - 1500) / 1500 < 0.30
    assert r["n_a_kept"] == 256 and r["n_b_kept"] == 256


def test_theta_intersect_disjoint_is_zero(spark):
    from timeseries_data_analysis_spark.operators import sketch as SK
    a = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(5000, 7000)], "k long")
    r = SK.theta_intersect_est(a, b, "k", "k", k=128).collect()[0]
    assert r["d_common"] == 0
    assert r["est_common"] == 0.0
