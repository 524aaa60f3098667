"""Round-8 scale probes: the PRODUCTION twins of the two round-7 graph
ops whose §1l decades stop at 10× (VERDICT r7 "What's missing" #2 /
"What's wrong" #1) — closing the only cells in the measured decade
table that lack a 100× point.

Usage:
  python tools/scale_probe_r8.py <sf_dir> [name ...]
  # 100x protocol: SCALE_TRIALS=1 SPARK_GRAFT_INITIAL_PARTITIONS=128

Scale-shape expectations, stated BEFORE measuring:

- ppr_trust_prod: personalized PageRank over the occupancy-sized
  48-bit `max_bucket=1000` pair build — the `pagerank_capped_prod`
  graph. Budget IS the build's (145 s one-shot at 100×, §1l): the
  fingerprint scan + 48 vote aggs dominate; the 3 seeded power rounds
  shuffle frontier-sized frames (seed 3-hop neighborhood, not |V|).
  Expect ~build + small constant, i.e. 140-170 s at 100× own-load.
- link_prediction_prod: Adamic-Adar (`max_degree=64` witness cap)
  over the SAME build — wedge volume |V|·64² bounded, so again
  build-dominated; the 10× point was 38.3 s. Expect 100× to track
  pagerank_capped_prod's 145 s within margin. (The round-8 input-
  hygiene `.distinct()` inside adamic_adar adds one ids-only shuffle
  over the pair list — pairs ≪ fact rows, expected invisible; the
  10× re-run below is the regression check for exactly that.)

Both twins differ from their REGISTRY queries only in cap widths
(gate constants are sized so the ORACLE bites at sf0.01; production
widths come from band occupancy — SCALE §1l's "a cap is a
per-deployment width" lesson) and, for link_prediction, in the pair
build (48-bit production build vs the 16-bit demo graph that is
gate-scale-only by construction, §1l).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timeseries_data_analysis_spark.session import get_spark  # noqa: E402


def _prod_pairs(spark, sf_dir):
    from timeseries_data_analysis_spark.operators import dedup as DD
    from timeseries_data_analysis_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return DD.simhash_hamming_pairs(docs, n=2, bits=48, bands=4,
                                    max_hamming=3, hex_digits=12,
                                    max_bucket=1000)


def _ppr_trust_prod(spark, sf_dir):
    """q_ppr_trust with the production bucket cap (max_bucket=1000,
    §1i's measured rescue) instead of the gate-scale max_bucket=2 —
    same seeds (doc_id % 3 == 0), same 3 power rounds."""
    from pyspark.sql import functions as F
    from timeseries_data_analysis_spark.operators import graph as GR
    from timeseries_data_analysis_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = _prod_pairs(spark, sf_dir)
    seeds = docs.select("doc_id").filter(F.col("doc_id") % 3 == 0)
    out = GR.personalized_pagerank(pairs, seeds, iters=3)
    return out.select(F.col("vertex").alias("doc_id"), "degree",
                      "is_seed", F.round(F.col("ppr") + 1e-9, 6).alias("ppr"))


def _link_prediction_prod(spark, sf_dir):
    """q_link_prediction's production form: AA with max_degree=64 over
    the 48-bit capped build (the 16-bit demo graph saturates beyond
    gate scale — §1l's standing verdict)."""
    from pyspark.sql import functions as F
    from timeseries_data_analysis_spark.operators import graph as GR

    pairs = _prod_pairs(spark, sf_dir)
    aa = GR.adamic_adar(pairs, max_degree=64)
    return (aa.select("id_l", "id_r", "n_common",
                      F.round(F.col("aa_score") + 1e-9, 6).alias("aa_score"))
            .orderBy(F.col("aa_score").desc(), "id_l", "id_r")
            .limit(20))


PROBES = {
    "ppr_trust_prod": _ppr_trust_prod,
    "link_prediction_prod": _link_prediction_prod,
}


def probe(sf_dir: str, names: list[str], trials: int | None = None) -> None:
    if trials is None:
        trials = int(os.environ.get("SCALE_TRIALS", "2"))
    spark = get_spark("scale-probe-r8")
    print(f"{'query':24s} {'t_min_s':>9s} {'rows':>12s}  loadavg", flush=True)
    for name in names:
        times = []
        for _ in range(trials):
            t0 = time.monotonic()
            df = PROBES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        rows = PROBES[name](spark, sf_dir).count()
        la = os.getloadavg()[0]
        print(f"{name:24s} {min(times):9.2f} {rows:12d}  {la:.1f}",
              flush=True)


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(PROBES)
    probe(sf_dir, names)
