"""Distributed PCA over an ``array<float>`` embedding column.

One scan computes the exact covariance Gramian: each Arrow batch
contributes a partial (count, sum-vector, X'X) via ``mapInPandas`` —
numpy does the d×d outer-product accumulation C-side — and the driver
combines the B partials (B = number of batches, thousands at most) and
runs ``numpy.linalg.eigh`` on the d×d result.  Driver state is
O(d²) = 32 KB at d = 64, ~800 MB at d = 10 000 — the documented
ceiling; past ~2 000 dims switch to a randomized range sketch (Halko
et al. 2011) before the eigensolve, which this module deliberately
does not hide behind the same name.

Projection back onto the top-k components is a vectorized Pandas UDF
(one BLAS matmul per batch) — scan-parallel, no shuffle.

The closed-form 2-D special case (axes from the quadratic formula) is
SQL-expressible and lives in ``__spark_entry__.q_pca2_axes`` with a
full DuckDB oracle; this module is the general-k path, covered by
pytest (orthonormality, eigenvalue/variance agreement, reconstruction
monotonicity).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def _partials(col: str, dim: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf[col].to_numpy()).astype(np.float64)
            if x.shape[1] != dim:
                raise ValueError(
                    f"embedding dim {x.shape[1]} != declared {dim}")
            yield pd.DataFrame({
                "n": [len(x)],
                "s": [x.sum(axis=0).tolist()],
                "g": [(x.T @ x).ravel().tolist()],
            })
    return gen


def covariance(df: DataFrame, col: str, dim: int):
    """Exact (mean, population covariance) in ONE distributed pass.

    Returns ``(n, mean[d], cov[d,d])`` as numpy.  The collect is of
    PARTIAL rows — one per Arrow batch, each d²+d+1 doubles — never of
    data rows; the bounded-driver-state contract.
    """
    schema = ("n long, s array<double>, g array<double>")
    parts = df.select(col).mapInPandas(_partials(col, dim), schema) \
        .collect()
    if not parts:
        raise ValueError("covariance over an empty DataFrame")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in parts],
               axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def fit_pca(df: DataFrame, col: str, dim: int, k: int) -> dict:
    """Top-k principal components of the embedding column.

    ``eigh`` on the symmetric d×d covariance (exact, deterministic up
    to eigenvector SIGN, which is normalized so each component's
    largest-|coordinate| entry is positive — reruns and partitionings
    agree bit-for-bit given the same partials sum).
    """
    n, s, g = gramian_partial(df, col, dim)
    if n == 0:
        raise ValueError("fit_pca over an empty DataFrame")
    return fit_from_gramian(n, s, g, k)


def project(df: DataFrame, col: str, mean: np.ndarray,
            components: np.ndarray, out: str = "scores") -> DataFrame:
    """Score rows on the fitted components: one BLAS matmul per batch."""
    mu = mean.copy()
    w = components.T.copy()                    # (d, k)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _score(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64) - mu
        return pd.Series(list(x @ w))

    return df.withColumn(out, _score(F.col(col)))


def gramian_partial(df: DataFrame, col: str, dim: int):
    """Raw (n, Σx, XᵀX) for a frame — the MERGEABLE form of
    :func:`covariance` (sums add across any split of the data; the
    covariance itself does not).  Driver state O(d²)."""
    schema = "n long, s array<double>, g array<double>"
    parts = df.select(col).mapInPandas(_partials(col, dim), schema) \
        .collect()
    n = sum(r["n"] for r in parts)
    if n == 0:
        return 0, np.zeros(dim), np.zeros((dim, dim))
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in parts],
               axis=0)
    return n, s, g


def fit_from_gramian(n: int, s: np.ndarray, g: np.ndarray,
                     k: int) -> dict:
    """eigh on a (possibly merged) raw Gramian — the read side of the
    streaming sink and the day-partial rollup.  Raises on n = 0 (an
    empty-first-batch state) instead of dividing into NaN arrays."""
    if n == 0:
        raise ValueError("PCA fit over an empty Gramian state")
    dim = len(s)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = vals[order]
    total = float(vals.sum())
    return {"n": n, "mean": mean, "components": comps,
            "eigvals": ev,
            "explained_ratio": (ev / total) if total > 0 else ev * 0.0}
