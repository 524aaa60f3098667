"""KNN imputation (ml/impute.py) — semantics pinned against a naive
independent reference, Spark path vs in-memory block equivalence, and
the LSH-bucketed approximation quality at scale settings."""

from __future__ import annotations

import math

import numpy as np
import pytest

from timeseries_data_analysis_spark.ml.impute import (_knn_impute_block,
                                                      knn_impute)


def _naive_reference(mat, k):
    """Straight-from-the-definition sklearn-KNNImputer semantics: per
    missing cell, k nearest donors (nan-euclidean, observed in that
    column), donor mean. Deliberately unvectorized."""
    n, d = mat.shape
    out = mat.copy()
    for i in range(n):
        for j in range(d):
            if not math.isnan(mat[i, j]):
                continue
            dists = []
            for u in range(n):
                if u == i or math.isnan(mat[u, j]):
                    continue
                shared = [t for t in range(d)
                          if not math.isnan(mat[i, t])
                          and not math.isnan(mat[u, t])]
                if not shared:
                    continue
                sq = sum((mat[i, t] - mat[u, t]) ** 2 for t in shared)
                dists.append((math.sqrt(d / len(shared) * sq), u))
            dists.sort(key=lambda p: p[0])
            donors = [u for _, u in dists[:k]]
            if donors:
                out[i, j] = float(np.mean([mat[u, j] for u in donors]))
            else:
                out[i, j] = float(np.nanmean(mat[:, j]))
    return out


@pytest.mark.parametrize("seed", [0, 7])
def test_block_matches_naive_reference(seed):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((40, 4))
    holes = rng.random((40, 4)) < 0.15
    holes[:, 0] &= rng.random(40) < 0.5
    mat[holes] = np.nan
    col_means = np.nanmean(mat, axis=0)
    got = _knn_impute_block(mat, k=5, col_means=col_means)
    want = _naive_reference(mat, k=5)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    assert not np.isnan(got).any()


def test_no_donor_falls_back_to_mean():
    mat = np.array([[1.0, np.nan],
                    [2.0, np.nan],
                    [3.0, np.nan]])
    col_means = np.array([2.0, 7.5])
    got = _knn_impute_block(mat, k=2, col_means=col_means)
    assert (got[:, 1] == 7.5).all()


def test_spark_exact_mode_matches_block(spark):
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((120, 3)) * 10 + 50
    holes = rng.random((120, 3)) < 0.1
    mat[holes] = np.nan
    rows = [(i, *[None if math.isnan(v) else float(v) for v in mat[i]])
            for i in range(len(mat))]
    df = spark.createDataFrame(
        rows, "id: long, a: double, b: double, c: double").repartition(4)
    out = (knn_impute(df, ["a", "b", "c"], k=5, bits=0)
           .toPandas().sort_values("id"))
    want = _knn_impute_block(mat, 5, np.nanmean(mat, axis=0))
    np.testing.assert_allclose(out[["a", "b", "c"]].to_numpy(), want,
                               rtol=1e-9)
    assert list(out.columns) == ["id", "a", "b", "c"]  # schema preserved


def test_bucketed_mode_fills_and_beats_mean_imputation(spark):
    """Structured data (b = 2a + noise): LSH-bucketed KNN must recover
    holes in b far better than column-mean imputation even though each
    bucket sees only a slice of the data."""
    rng = np.random.default_rng(11)
    a = rng.uniform(-10, 10, 800)
    b = 2 * a + rng.standard_normal(800) * 0.1
    truth = b.copy()
    holes = rng.random(800) < 0.1
    b[holes] = np.nan
    rows = [(i, float(a[i]), None if math.isnan(b[i]) else float(b[i]))
            for i in range(800)]
    df = spark.createDataFrame(rows, "id: long, a: double, b: double") \
        .repartition(8)
    out = (knn_impute(df, ["a", "b"], k=5, bits=4)
           .toPandas().sort_values("id").reset_index(drop=True))
    assert not out["b"].isna().any()
    got = out["b"].to_numpy()[holes]
    knn_err = float(np.mean(np.abs(got - truth[holes])))
    mean_err = float(np.mean(np.abs(np.nanmean(b) - truth[holes])))
    assert knn_err < mean_err / 5, (knn_err, mean_err)


def test_nan_holes_equal_null_holes(spark):
    """Holes may arrive as NaN (pandas round trips) or NULL (SQL) — both
    must impute identically; the stats pass must not be NaN-poisoned."""
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((60, 3))
    holes = rng.random((60, 3)) < 0.15
    mat[holes] = np.nan
    rows_null = [(i, *[None if math.isnan(v) else float(v) for v in mat[i]])
                 for i in range(60)]
    rows_nan = [(i, *[float(v) for v in mat[i]]) for i in range(60)]
    schema = "id: long, a: double, b: double, c: double"
    out_null = (knn_impute(spark.createDataFrame(rows_null, schema),
                           ["a", "b", "c"], k=3, bits=0)
                .toPandas().sort_values("id").reset_index(drop=True))
    out_nan = (knn_impute(spark.createDataFrame(rows_nan, schema),
                          ["a", "b", "c"], k=3, bits=0)
               .toPandas().sort_values("id").reset_index(drop=True))
    np.testing.assert_allclose(out_null[["a", "b", "c"]].to_numpy(),
                               out_nan[["a", "b", "c"]].to_numpy(),
                               rtol=1e-12)
    assert not out_nan[["a", "b", "c"]].isna().any().any()
