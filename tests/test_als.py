"""Rank-2 ALS (`ml/als.py`): closed-form half-step correctness against
a NumPy solve, determinism of the md5 init, and the capacity claim —
rank-2's one-alternation reconstruction error beats rank-1's on the
same matrix (VERDICT r7 "Next round" #4's done-condition)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from timeseries_data_analysis_spark.ml import als as ALS

REG = 0.1


def _ratings(spark):
    # small dense-ish matrix with a genuine rank-2 structure:
    # block A users love items 0-2, block B users love items 3-5,
    # plus a shared popularity floor — rank-1 captures the floor,
    # rank-2 captures the blocks.
    rows = []
    for c in range(8):
        for s in range(6):
            base = 1
            block = 4 if (c < 4) == (s < 3) else 0
            rows.append((c, s, base + block))
    return spark.createDataFrame(rows, "c int, s int, r int")


def test_half_step_matches_numpy_solve(spark):
    r = _ratings(spark)
    u, v = ALS.als_rank2_round(r, reg=REG)
    v0 = {row["s"]: (row["v1"], row["v2"])
          for row in ALS.init_item_factors(r).collect()}
    ratings = {(row["c"], row["s"]): row["r"] for row in r.collect()}
    got = {row["c"]: (row["u1"], row["u2"]) for row in u.collect()}
    for c in range(8):
        A = np.eye(2) * REG
        b = np.zeros(2)
        for (cc, s), val in ratings.items():
            if cc != c:
                continue
            vv = np.array(v0[s])
            A += np.outer(vv, vv)
            b += val * vv
        exp = np.linalg.solve(A, b)
        assert abs(got[c][0] - exp[0]) < 1e-8
        assert abs(got[c][1] - exp[1]) < 1e-8


def test_init_is_deterministic_and_symmetry_breaking(spark):
    r = _ratings(spark)
    a = {row["s"]: row["v2"] for row in ALS.init_item_factors(r).collect()}
    b = {row["s"]: row["v2"] for row in ALS.init_item_factors(r).collect()}
    assert a == b
    # the second component must actually vary, else A is singular up to reg
    assert len(set(a.values())) > 1
    assert all(-0.5 <= x < 0.5 for x in a.values())


def _global_rmse(r, pred_col):
    row = r.agg(F.sqrt(F.avg(pred_col)).alias("rmse")).collect()[0]
    return float(row["rmse"])


def test_rank2_beats_rank1_reconstruction(spark):
    r = _ratings(spark).localCheckpoint()
    # rank-1, exactly q_als_rank1's arithmetic
    u1f = (r.groupBy("c")
           .agg(F.round((F.sum("r") / F.count(F.lit(1)))
                        + F.lit(1e-12), 9).alias("u")))
    ru1 = r.join(u1f, "c")
    v1f = (ru1.groupBy("s")
           .agg(F.round((F.sum(F.col("r") * F.col("u"))
                         / F.sum(F.col("u") * F.col("u")))
                        + F.lit(1e-12), 9).alias("v")))
    j1 = ru1.join(v1f, "s")
    e1 = _global_rmse(j1, (F.col("r") - F.col("u") * F.col("v"))
                      * (F.col("r") - F.col("u") * F.col("v")))
    # rank-2, one alternation
    u2, v2 = ALS.als_rank2_round(r, reg=REG)
    j2 = (r.join(u2.select("c", "u1", "u2"), "c")
          .join(v2.select("s", "v1", "v2"), "s"))
    pred = F.col("u1") * F.col("v1") + F.col("u2") * F.col("v2")
    e2 = _global_rmse(j2, (F.col("r") - pred) * (F.col("r") - pred))
    assert e2 < e1, (e2, e1)


def test_second_alternation_decreases_regularized_objective(spark):
    """init_v re-entry: each half-step exactly minimizes the
    REGULARIZED objective J = Σ(r−u·v)² + λ(Σ‖u‖² + Σ‖v‖²) in its
    block, so J is non-increasing across alternations (block
    coordinate descent). Raw RMSE is NOT monotone under λ > 0 —
    measured here: it can tick up while J falls — which is why the
    test pins J, not RMSE."""
    r = _ratings(spark).localCheckpoint()

    def objective(u, v):
        j = (r.join(u.select("c", "u1", "u2"), "c")
             .join(v.select("s", "v1", "v2"), "s"))
        pred = F.col("u1") * F.col("v1") + F.col("u2") * F.col("v2")
        sse = j.agg(F.sum((F.col("r") - pred) * (F.col("r") - pred))
                    .alias("x")).collect()[0]["x"]
        un = u.agg(F.sum(F.col("u1") * F.col("u1")
                         + F.col("u2") * F.col("u2"))
                   .alias("x")).collect()[0]["x"]
        vn = v.agg(F.sum(F.col("v1") * F.col("v1")
                         + F.col("v2") * F.col("v2"))
                   .alias("x")).collect()[0]["x"]
        return sse + REG * (un + vn)

    u1, v1 = ALS.als_rank2_round(r, reg=REG)
    j1 = objective(u1, v1)
    u2, v2 = ALS.als_rank2_round(r, reg=REG, init_v=v1)
    j2 = objective(u2, v2)
    # 9-dp factor quantization perturbs each solve off the exact
    # minimizer by ~1e-9 per coordinate; allow that slack
    assert j2 <= j1 + 1e-6, (j2, j1)


def test_rankk_path_agrees_with_closed_form_at_k2(spark):
    """The general applyInPandas solve and the closed-form column math
    must land on the same 9-dp grid at k=2 — cross-validating both
    implementations of the same normal equations."""
    r = _ratings(spark).localCheckpoint()
    u2, v2 = ALS.als_rank2_round(r, reg=REG)
    # same init: rankk's init uses per-k salts, so feed rank2's init
    init = ALS.init_item_factors(r)
    uk, vk = ALS.als_rankk_round(r, k=2, reg=REG, init_v=init)
    a = {row["c"]: (row["u1"], row["u2"]) for row in u2.collect()}
    b = {row["c"]: (row["u1"], row["u2"]) for row in uk.collect()}
    assert a.keys() == b.keys()
    for c in a:
        assert abs(a[c][0] - b[c][0]) <= 2e-9, (c, a[c], b[c])
        assert abs(a[c][1] - b[c][1]) <= 2e-9, (c, a[c], b[c])
    av = {row["s"]: (row["v1"], row["v2"]) for row in v2.collect()}
    bv = {row["s"]: (row["v1"], row["v2"]) for row in vk.collect()}
    for s in av:
        assert abs(av[s][0] - bv[s][0]) <= 4e-9, (s, av[s], bv[s])
        assert abs(av[s][1] - bv[s][1]) <= 4e-9, (s, av[s], bv[s])


def test_rank4_half_step_matches_numpy(spark):
    """k=4 user factors equal a direct numpy solve of the same
    regularized normal equations from the same deterministic init."""
    r = _ratings(spark)
    v0 = {row["s"]: [row[f"v{j}"] for j in range(1, 5)]
          for row in ALS.init_item_factors_k(r, 4).collect()}
    uk, _ = ALS.als_rankk_round(r, k=4, reg=REG)
    got = {row["c"]: [row[f"u{j}"] for j in range(1, 5)]
           for row in uk.collect()}
    ratings = {(row["c"], row["s"]): row["r"] for row in r.collect()}
    for c in range(8):
        A = np.eye(4) * REG
        b = np.zeros(4)
        for (cc, s), val in ratings.items():
            if cc != c:
                continue
            vv = np.array(v0[s])
            A += np.outer(vv, vv)
            b += val * vv
        exp = np.linalg.solve(A, b)
        for j in range(4):
            assert abs(got[c][j] - exp[j]) < 1e-8, (c, j)


def test_rank4_objective_monotone_across_rounds(spark):
    """Block coordinate descent at k=4: the regularized objective is
    non-increasing across alternations (same invariant as rank-2)."""
    r = _ratings(spark).localCheckpoint()

    def objective(u, v, k):
        ucols = [f"u{j}" for j in range(1, k + 1)]
        vcols = [f"v{j}" for j in range(1, k + 1)]
        j = (r.join(u.select("c", *ucols), "c")
             .join(v.select("s", *vcols), "s"))
        pred = sum((F.col(uc) * F.col(vc)
                    for uc, vc in zip(ucols, vcols)), F.lit(0.0))
        sse = j.agg(F.sum((F.col("r") - pred) * (F.col("r") - pred))
                    .alias("x")).collect()[0]["x"]
        un = u.agg(F.sum(sum((F.col(c) * F.col(c) for c in ucols),
                             F.lit(0.0))).alias("x")).collect()[0]["x"]
        vn = v.agg(F.sum(sum((F.col(c) * F.col(c) for c in vcols),
                             F.lit(0.0))).alias("x")).collect()[0]["x"]
        return sse + REG * (un + vn)

    u1, v1 = ALS.als_rankk_round(r, k=4, reg=REG)
    j1 = objective(u1, v1, 4)
    u2, v2 = ALS.als_rankk_round(r, k=4, reg=REG, init_v=v1)
    j2 = objective(u2, v2, 4)
    assert j2 <= j1 + 1e-6, (j2, j1)


def test_exact_cramer_lane_matches_numpy_lane_at_k4(spark):
    """The Cramer-expression half-step (`als_exact_half_step`, the
    oracle-replayable lane behind `als_rankk_backtest`) and the
    batched-numpy half-step (`_solve_half_step_k`) must land on the
    same 9-dp grid at k=4 — two solves of the same regularized normal
    equations, one shared HALF_UP rounding law."""
    r = _ratings(spark).localCheckpoint()
    ue, ve = ALS.als_rankk_exact_fit(r, k=4, rounds=1, reg=REG)
    un, vn = ALS.als_rankk_round(r, k=4, reg=REG)
    for exact, numpy_lane, key, pre in ((ue, un, "c", "u"),
                                        (ve, vn, "s", "v")):
        a = {row[key]: [row[f"{pre}{j}"] for j in range(1, 5)]
             for row in exact.collect()}
        b = {row[key]: [row[f"{pre}{j}"] for j in range(1, 5)]
             for row in numpy_lane.collect()}
        assert a.keys() == b.keys()
        for kk in a:
            for j in range(4):
                assert abs(a[kk][j] - b[kk][j]) <= 2e-9, (pre, kk, j)


def _split_ratings(spark, rows_df):
    frac = ALS.md5_unit_fraction(
        F.concat(F.col("c").cast("string"), F.lit("|"),
                 F.col("s").cast("string")), "alsbt|")
    r = rows_df.withColumn("_holdout",
                           (frac >= F.lit(0.8)).cast("int")).localCheckpoint()
    return (r.filter(F.col("_holdout") == 0).select("c", "s", "r"),
            r.filter(F.col("_holdout") == 1).select("c", "s", "r"))


def _holdout_rmse(train, test, k, rounds=2):
    u, v = ALS.als_rankk_exact_fit(train, k=k, rounds=rounds, reg=REG)
    ucols = [f"u{j}" for j in range(1, k + 1)]
    vcols = [f"v{j}" for j in range(1, k + 1)]
    pred = sum((F.col(uc) * F.col(vc)
                for uc, vc in zip(ucols, vcols)), F.lit(0.0))
    out = []
    for df in (train, test):
        j = (df.join(u.select("c", *ucols), "c")
             .join(v.select("s", *vcols), "s"))
        row = j.agg(
            F.sqrt(F.avg((F.col("r") - pred) * (F.col("r") - pred)))
            .alias("rmse"), F.count(F.lit(1)).alias("n")).collect()[0]
        out.append((row["rmse"], row["n"]))
    return out  # [(train_rmse, n_train), (test_rmse, n_test)]


def test_rank4_beats_rank2_on_holdout_when_structure_is_rank4(spark):
    """The `als_rankk_backtest` capacity claim, pinned where it is
    TRUE: on a matrix with genuine rank-4 latent structure, the
    two-alternation rank-4 fit beats the rank-2 fit on HELD-OUT RMSE
    (same md5 80/20 split, same reg, same exact solve lane — only
    capacity differs). The real TPC-H count matrix has NO latent
    structure (orders are uniform), so there higher rank overfits —
    see the companion test below, which pins that the backtest
    DETECTS this."""
    rows = []
    for c in range(40):
        uc = [1.0 + (c % 3), (c % 2) * 2 - 1.0,
              ((c // 2) % 2) * 2 - 1.0, ((c // 4) % 2) * 2 - 1.0]
        for s in range(24):
            vs = [1.0 + (s % 2), (s % 3 > 0) * 2 - 1.0,
                  ((s // 3) % 2) * 2 - 1.0, ((s // 6) % 2) * 2 - 1.0]
            rows.append((c, s, sum(a * b for a, b in zip(uc, vs))))
    df = spark.createDataFrame(rows, "c int, s int, r double")
    train, test = _split_ratings(spark, df)
    (_, _), (rmse2, n2) = _holdout_rmse(train, test, 2)
    (_, _), (rmse4, n4) = _holdout_rmse(train, test, 4)
    assert n2 == n4 and n2 > 0
    assert rmse4 < rmse2, (rmse4, rmse2)


def test_backtest_detects_overfit_on_unstructured_matrix(spark, sf_dir):
    """The backtest's diagnostic value on the REAL customer×supplier
    count matrix: TPC-H order placement is uniform-random, so there
    is no latent structure to learn — train RMSE must IMPROVE with
    rank (capacity) while held-out RMSE GETS WORSE (overfit). This is
    the honest generalization lesson the `als_rankk_backtest` registry
    row's (rmse_train, rmse_test) pair exists to surface — the rank
    analogue of round 8's λ-monotonicity lesson."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey")
    base = (li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s"))
            .agg(F.count(F.lit(1)).alias("r")))
    train, test = _split_ratings(spark, base)
    (tr2, _), (te2, n2) = _holdout_rmse(train, test, 2)
    (tr4, _), (te4, n4) = _holdout_rmse(train, test, 4)
    assert n2 == n4 and n2 > 0
    assert tr4 < tr2, (tr4, tr2)   # capacity fits train better
    assert te4 > te2, (te4, te2)   # and generalizes worse
