"""Distributed KNN imputation (reference ``pre_processing.py:269-273``).

The reference runs sklearn's ``KNNImputer(n_neighbors=5)`` over the
sensor matrix — O(N²) pairwise nan-euclidean distances on one node.
This is the Spark-shaped equivalent:

1. **Stats pass** (one aggregate): per-column mean/std for z-scoring and
   mean-fill of the LSH signature vector.
2. **Bucketing** (pure JVM projection): each row gets a random-
   hyperplane LSH bucket computed on its mean-filled, z-scored feature
   vector (``operators.similarity.lsh_bucket`` — deterministic LCG
   planes). Near rows collide with high probability, so neighbor search
   within a bucket approximates global KNN; ``bits`` tunes the expected
   bucket size N/2^bits.
3. **Per-bucket solve** (``applyInPandas``): inside a bucket the exact
   sklearn semantics run vectorized in numpy — nan-euclidean distance
   ``sqrt(d_total/d_observed · Σ_both-observed (u-v)²)``, per missing
   cell the k nearest donors *observed in that column*, imputed value =
   donor mean. Buckets are independent → embarrassingly parallel.

``bits=0`` gives one bucket = exact sklearn behavior (used by the tests
to pin equivalence against a pure-numpy reference); production picks
``bits`` so buckets hold ~1-10k rows regardless of N. Rows in sparse
buckets with no eligible donor fall back to the column mean — same as
sklearn when no donor exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.similarity import lsh_bucket


def _knn_impute_block(mat: np.ndarray, k: int,
                      col_means: np.ndarray) -> np.ndarray:
    """Exact nan-euclidean KNN imputation of one in-memory block.

    ``mat``: (n, d) float64 with NaN holes — modified copy returned.
    Matches sklearn ``KNNImputer``: distances use mutually-observed dims
    scaled by d_total/d_shared; donors for column j must have j observed;
    ties broken by row order; no donors → column mean.
    """
    out = mat.copy()
    obs = ~np.isnan(mat)
    need = np.where(~obs.all(axis=1))[0]
    if len(need) == 0:
        return out
    d = mat.shape[1]
    filled = np.where(obs, mat, 0.0)
    for i in need:
        shared = obs[i] & obs                       # (n, d) both-observed
        n_shared = shared.sum(axis=1)
        diff = np.where(shared, filled[i] - filled, 0.0)
        sq = (diff * diff).sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            dist = np.sqrt(np.where(n_shared > 0, d / n_shared, np.inf) * sq)
        dist[i] = np.inf                            # not own donor
        dist[n_shared == 0] = np.inf
        for j in np.where(~obs[i])[0]:
            cand = np.where(obs[:, j] & np.isfinite(dist))[0]
            if len(cand) == 0:
                out[i, j] = col_means[j]
                continue
            top = cand[np.argsort(dist[cand], kind="stable")[:k]]
            out[i, j] = float(mat[top, j].mean())
    return out


def knn_impute(df: DataFrame, cols: list[str], k: int = 5,
               bits: int = 0, seed: int = 42) -> DataFrame:
    """Impute NaN/null holes in ``cols`` by LSH-bucketed KNN.

    Returns ``df`` with the same schema, holes filled. Non-feature
    columns pass through untouched. ``bits=0`` = single global bucket
    (exact, for modest N); at scale pick ``bits ≈ log2(N / 4096)``.
    """
    d = len(cols)
    # NaN-safe stats: avg/stddev are NaN-poisoned in Spark (NULLs are
    # skipped but one NaN makes the aggregate NaN) — holes may arrive as
    # either, so mask NaN to NULL before aggregating.
    def _clean(c):
        return F.when(~F.isnan(c), F.col(c))
    stats = df.select(
        *[F.avg(_clean(c)).alias(f"_m_{c}") for c in cols],
        *[F.coalesce(F.stddev(_clean(c)), F.lit(1.0)).alias(f"_s_{c}")
          for c in cols],
    ).collect()[0]
    means = {c: float(stats[f"_m_{c}"] if stats[f"_m_{c}"] is not None else 0.0)
             for c in cols}
    stds = {c: float(stats[f"_s_{c}"] or 1.0) or 1.0 for c in cols}
    col_means = np.array([means[c] for c in cols])

    # mean-filled z-scored signature vector -> LSH bucket (JVM-side)
    sig = F.array(*[
        ((F.when(F.col(c).isNull() | F.isnan(c), F.lit(means[c]))
          .otherwise(F.col(c))
          - F.lit(means[c])) / F.lit(stds[c])).cast("double")
        for c in cols])
    if bits > 0:
        bucketed = df.withColumn("_kb", lsh_bucket(sig, d, bits=bits,
                                                   seed=seed))
    else:
        bucketed = df.withColumn("_kb", F.lit(0))

    schema = T.StructType(df.schema.fields)
    other = [f.name for f in df.schema.fields if f.name not in cols]
    kk = k

    def fix(key, pdf):
        mat = pdf[cols].to_numpy(dtype=np.float64)
        pdf = pdf.drop(columns=["_kb"])
        fixed = _knn_impute_block(mat, kk, col_means)
        for j, c in enumerate(cols):
            pdf[c] = fixed[:, j]
        return pdf[other + cols][[f.name for f in schema.fields]]

    return bucketed.groupBy("_kb").applyInPandas(fix, schema)
