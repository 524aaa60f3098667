"""Adversarial mini-gate #3: the ANN/similarity family on edge
embeddings, hash-compared against the production DuckDB oracles.

Stress shapes: a ZERO vector among both queries and seeds (DuckDB's
bare list_cosine_similarity yields -1.0 there where the engine's guard
yields 0.0 — the oracles carry the same guard), exact-duplicate
vectors, tiny (1e-20) and huge (1e18) magnitudes, and a degenerate
seed set (only 2 of the requested 16 IVF/PQ seeds exist).
NaN embeddings are out of contract — ANN pipelines validate/normalize
upstream.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                "tools"))

import __spark_entry__ as entry_mod  # noqa: E402
from check_oracles import norm, value_hash  # noqa: E402

DIM = 64


def _edge_embeddings():
    rng = random.Random(17)

    def rand_vec(scale=1.0):
        return [rng.gauss(0, 1) * scale for _ in range(DIM)]

    vecs = {}
    vecs[0] = [0.0] * DIM                        # zero QUERY + seed (id%31==0)
    vecs[1] = rand_vec()
    vecs[2] = list(vecs[1])                      # identical pair in queries
    vecs[3] = rand_vec(1e-20)                    # tiny magnitude
    vecs[4] = rand_vec(1e18)                     # huge magnitude
    for i in range(5, 40):
        vecs[i] = rand_vec()
    vecs[20] = [0.0] * DIM                       # zero vector in the corpus
    vecs[21] = list(vecs[5])                     # duplicate of a query
    ids = sorted(vecs)
    table = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vecs[i] for i in ids],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in ids], pa.int32()),
    })
    return table


ANN_QUERIES = ["similarity_topk", "lsh_topk", "ivf_topk", "pq_topk",
               "emb_near_dup", "centroid_similarity", "array_profile",
               "ivf_pq_topk", "emb_neardup_clusters",
               # round 10: occupancy audit — integer counts + entropy
               # over shares (same degenerate-seed assignment CTE)
               "centroid_balance",
               # pq_distortion is NOT here: its avg(d2) over the 1e18-
               # magnitude fixture rows sums ~1e36 terms, the same
               # summation-order-ulp class that excludes kmeans_step /
               # ivf_kmeans_topk (below); the sf-corpus gate compares
               # its encode+MSE algebra exactly at 2 SFs.
               # round 5: SemDeDup (integer audit output — same
               # zero-vector / degenerate-seed assignment CTE the IVF
               # family stresses). kmeans_step / ivf_kmeans_topk are NOT
               # here: their per-cell MEANS containing the 1e18-scale
               # fixture vector differ across engines at the ulp level
               # (~1e2 absolute on a 1e17 mean) — summation-order noise
               # the 6-dp rounding contract cannot absorb. Extreme
               # magnitudes are out of contract for Lloyd means, same as
               # NaN (see module docstring); the sf-corpus oracle run
               # compares the full mean values exactly.
               "semdedup",
               # embedding_isotropy is NOT here for the kmeans_step
               # reason: its per-dim var_pop over the 1e18-scale
               # fixture vector carries summation-order ulps beyond
               # the rounding contract; the sf-corpus gate compares
               # its moment algebra exactly.
               # pca2_axes is NOT here for the kmeans_step reason: its
               # var_pop/covar_pop over the 1e18-scale fixture vector
               # carry summation-order ulps (~1e20 absolute) the 6-dp
               # contract cannot absorb; the sf-corpus gate compares
               # its moment algebra exactly.
               # round 5 second batch: JL projection recall audit — the
               # projection is ±1 signed sums and the ranking is cosine
               # (magnitude-normalized), so the 1e18 fixture is in
               # contract here unlike the Lloyd means above
               "rp_recall",
               # round 5 second batch: different-label top-k mining +
               # k-NN majority label-noise sweep
               "hard_negatives", "label_noise",
               # semantic decontamination: cosine is magnitude-
               # normalized (the rp_recall argument), so the 1e18
               # fixture is in contract; label%3 gives a non-empty
               # benchmark (label 0) and corpus (labels 1,2)
               "semantic_decontaminate",
               # round 8: prefix-slice retrieval audit (a truncated
               # vector can be all-zero even when the full one isn't —
               # both engines carry the zero-norm guard in BOTH passes)
               # and RBO over the exact+IVF rankers (nested-oracle
               # join); both magnitude-normalized, so 1e18 in contract
               "matryoshka_audit", "rbo_rankings",
               # round 11: k-occurrence counts ride the same
               # magnitude-normalized cosine ranks as similarity_topk;
               # the moments are exact-integer arithmetic (both the
               # brute route and the IVF probe route)
               "hubness_audit", "hubness_ivf"]


@pytest.fixture(scope="module")
def edge_env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_emb")
    pq.write_table(_edge_embeddings(), str(d / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    return str(d), con


@pytest.mark.parametrize("name", ANN_QUERIES)
def test_edge_embeddings_cross_engine(spark, edge_env, name):
    sf_dir, con = edge_env
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = norm(qs[name](spark, sf_dir).toPandas())
    odf = norm(con.execute(oracles[name]).fetchdf())
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf), \
        f"{name}: cross-engine hash mismatch on edge embeddings"


def test_mmr_rerank_defers_redundant_candidates(spark):
    from timeseries_data_analysis_spark.operators import similarity as SIM
    # query 0 at e1; corpus: 1 and 2 are near-identical high-relevance
    # vectors, 3 is orthogonal-ish moderate relevance. Plain top-k ranks
    # (1, 2, 3); MMR must pick 1 then DIVERSIFY to 3 before 2.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0]),
        (2, [0.99, 0.141, 0.0]),
        (3, [0.5, 0.0, 0.86]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = (emb.filter("vec_id = 0")
         .selectExpr("vec_id AS query_id", "embedding"))
    got = [(r["step"], r["vec_id"]) for r in
           SIM.mmr_rerank(emb, q, k_candidates=3, k_select=3, lam=0.5)
           .orderBy("step").collect()]
    assert got == [(1, 1), (2, 3), (3, 2)]
