"""Round-11: the verify-then-cluster chain's third decade (SCALE.md
§1t, VERDICT r10 "Next round" #1 — the production dedup artifact's
last unmeasured link).

§1q measured the RAW clusters route at 1000× (373.1 s star CC over the
426M-edge capped pair graph) and found its honest miss: CC only
merges, so band agreement fuses template families into 100k-doc
clusters. §1s measured the FIX — exact-Jaccard verify before CC — at
100× only (147.3 s full chain, 427 micro-clusters). This probe draws
the chain's 1000× cell over the SAME persisted §1o pair table
(/tmp/scale1000_pairs, bands=4 capped build), so verify-route vs
raw-route is apples-to-apples at the decade where the miss appeared.

The naive verify CANNOT run at this decade on this host: the plain
``ngram_jaccard`` join carries each doc's ~1 KB string-shingle array
onto every one of 426M pair rows ≈ 850 GB of join payload (57 GB disk
free). The measured subject is therefore the scale form shipped this
round, ``ngram_jaccard_verify``: 32-bit hash-sketch sets (~200 B/doc,
exactness anchored by ngram_jaccard_all_pairs' hash-equality
contract) broadcast MAP-SIDE so the pair table streams with only ids
in flight. calib100 asserts the form change is invisible: at 100× the
hash-sketch chain must emit the SAME verified-cluster histogram as
the string form.

Stages:

  calib100    build the bands=4 capped pair table over <corpus100>
              (default /tmp/scale100), persist to /tmp/scale100_pairs,
              run verify (hash-sketch, broadcast) + CC + histogram,
              AND the string-form ngram_jaccard verify on the same
              pairs — equality assert on the verified edge set.
  verify1000  distinct(/tmp/scale1000_pairs) → ngram_jaccard_verify
              (≥ 0.5, broadcast) → persist /tmp/scale1000_verified.
  vcc1000     dedup_clusters (star) over the verified edges +
              cluster-size histogram — the §1t readout next to §1q's.

Usage:
  SCALE_TRIALS=1 SPARK_GRAFT_INITIAL_PARTITIONS=256 \
  SPARK_DRIVER_MEMORY=48g python tools/scale_probe_r11.py \
      /tmp/scale1000 verify1000 vcc1000

Pre-registered predictions (committed BEFORE any cell is drawn — the
§1e discipline):

1. **Verify wall at 1000×** = distinct collapse (measured 114.4 s,
   §1q) + sketch build (one token-explode pass over 5M docs; the §1o
   signature stage ran ~100 s) + a map-side scan of 426M pairs doing
   O(90)-element set intersects (CPU-bound on 32 cores, ~100-400 s).
   Predict **250-900 s total**; falsification bar = >2400 s, OOM at
   48 GB, or disk-full.
2. **Verified-edge mass**: §1s found only 910 docs verified at 100×
   (the clone corpus's replicas are textually distinct by design, so
   band agreement vastly overstates ≥0.5-Jaccard duplication).
   Genuine high-Jaccard mass comes from the base corpus's duplicate
   families cloned linearly — predict verified edges **roughly 10×
   the 100× count and < 100k** vs 426M candidates (a ~10⁴× precision
   cut); falsification >10M (would mean clone perturbation leaves
   ≥0.5-Jaccard pairs across clones — then the §1q over-merge story
   needs re-reading, and THAT is the finding).
3. **CC over the verified graph is sub-dominant**: < 60 s (the graph
   is ~10⁻⁴ of §1q's), histogram max cluster size in the tens-to-
   hundreds — NO 100k-doc fusion. The keep-policy readout: §1q's
   2.46M-doc dup mass was recall-side; the precision-side mass CC
   actually deletes is the verified histogram's Σ(size-1) docs.
4. **calib100 equality**: the hash-sketch verified edge set EQUALS
   the string-form verified edge set at 100× (a 32-bit collision
   inside one ~10²-shingle set is ~10⁻⁶ and must also flip a 4-dp
   threshold compare to matter) — an assert, not a prediction.
5. **Chain cost vs the raw route**: verify+CC over given pairs lands
   BELOW §1q's raw-route 373.1 s star cell (CC shrinks to nothing
   after verify; the verify scan replaces 6 edge-sized shuffle
   alternations with one map-side pass). If it lands above, the
   chain's cost story inverts and the keep-policy rule must say so.

Protocol: 1000× cells one-shot or min-of-2 (cost); loadavg quoted per
draw; any draw at loadavg >8 from external load is suspect (§6 rule).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from timeseries_data_analysis_spark.session import get_spark  # noqa: E402
from timeseries_data_analysis_spark.operators import dedup as DD  # noqa: E402
from timeseries_data_analysis_spark.operators import graph as G  # noqa: E402

PAIRS_1000 = "/tmp/scale1000_pairs"
PAIRS_100 = "/tmp/scale100_pairs"
VERIFIED_1000 = "/tmp/scale1000_verified"
SER = StorageLevel.MEMORY_AND_DISK


def _la() -> str:
    return f"loadavg={os.getloadavg()[0]:.2f}"


def _histogram(spark, edges) -> None:
    t0 = time.monotonic()
    cl = G.dedup_clusters(
        edges, cc_fn=lambda e, a, b, m: G.connected_components_star(
            e, a, b, max_iter=15, storage_level=SER))
    hist = (cl.groupBy("cluster_size")
            .agg(F.countDistinct("cluster_id").alias("n_clusters"),
                 F.count(F.lit(1)).alias("n_docs"))
            .orderBy("cluster_size").collect())
    wall = time.monotonic() - t0
    n_cl = sum(r["n_clusters"] for r in hist)
    n_docs = sum(r["n_docs"] for r in hist)
    mx = max((r["cluster_size"] for r in hist), default=0)
    print(f"cc         {wall:9.2f} s  rounds={G.LAST_CC_ROUNDS}  "
          f"clusters={n_cl}  docs={n_docs}  max={mx}  {_la()}", flush=True)
    for r in hist:
        print(f"    size={r['cluster_size']:>6}  "
              f"n_clusters={r['n_clusters']:>8}  n_docs={r['n_docs']:>9}",
              flush=True)


def stage_calib100(spark, corpus100: str) -> None:
    docs = spark.read.parquet(f"{corpus100}/documents.parquet")
    t0 = time.monotonic()
    DD.minhash_lsh_candidates(docs, num_hashes=16, bands=4,
                              max_bucket=1000) \
        .write.mode("overwrite").parquet(PAIRS_100)
    print(f"pairs100   {time.monotonic()-t0:9.2f} s  "
          f"rows={spark.read.parquet(PAIRS_100).count()}  {_la()}",
          flush=True)
    pairs = spark.read.parquet(PAIRS_100).select("id_l", "id_r").distinct()
    t0 = time.monotonic()
    ver = DD.ngram_jaccard_verify(pairs, docs, threshold=0.5).persist(SER)
    n_ver = ver.count()
    print(f"verify100  {time.monotonic()-t0:9.2f} s  edges={n_ver}  "
          f"{_la()}", flush=True)
    _histogram(spark, ver.select("id_l", "id_r"))
    # equality assert vs the string form (prediction 4)
    t0 = time.monotonic()
    want = (DD.ngram_jaccard(pairs, docs)
            .filter(F.round(F.col("jaccard") + F.lit(1e-9), 4) >= 0.5)
            .select("id_l", "id_r"))
    got = ver.select("id_l", "id_r")
    diff = want.exceptAll(got).count() + got.exceptAll(want).count()
    print(f"stringform {time.monotonic()-t0:9.2f} s  symdiff={diff}  "
          f"{_la()}", flush=True)
    assert diff == 0, "hash-sketch verify != string-form verify at 100x"
    ver.unpersist()


def stage_verify1000(spark, corpus: str) -> None:
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    pairs = spark.read.parquet(PAIRS_1000).select("id_l", "id_r").distinct()
    t0 = time.monotonic()
    DD.ngram_jaccard_verify(pairs, docs, threshold=0.5) \
        .write.mode("overwrite").parquet(VERIFIED_1000)
    wall = time.monotonic() - t0
    n = spark.read.parquet(VERIFIED_1000).count()
    print(f"verify1000 {wall:9.2f} s  edges={n}  -> {VERIFIED_1000}  "
          f"{_la()}", flush=True)


def stage_vcc1000(spark) -> None:
    edges = spark.read.parquet(VERIFIED_1000).select("id_l", "id_r")
    _histogram(spark, edges)


# Round-11 pillar decade expectations (pre-registered): msttr_bucketed
# must come OFF msttr's 20-sort-task ceiling (§1s: 46.8 s at 1000×) —
# predict ≤0.5× msttr's wall at 1000× with the same token-explode
# scan floor. dau_wau_mau_hll replaces the |users|·|days| distinct +
# per-user-day fan-out with ≤2⁹ registers/day — predict at-or-below
# the exact form's 5.76 s at 1000× and decade-flat above the scan.
# ks/pettitt/bartlett/permutation/rsi are the reduce-then-bounded
# class (daily grain) — decade-FLAT above the scan (§1p bar: >3× the
# sf0.1 warm cell beyond the cold scan = plan bug). haar_energy is
# one hourly collapse + 3× bounded fan-out — scan-linear.
# markov_stationary is one lead window + |types|² agg — scan-linear,
# the entropy_rate twin. skyline is a grid agg + broadcast filter —
# scan-linear. levenshtein_verify is candidate-bounded: its wall
# follows the banding candidate mass, not the corpus.
PILLAR11 = ("msttr", "msttr_bucketed", "dau_wau_mau", "dau_wau_mau_hll",
            "ks_2sample", "pettitt_test", "bartlett_test",
            "skyline_docs", "permutation_entropy", "haar_energy",
            "markov_stationary", "rsi_daily", "levenshtein_verify")


def stage_pillar11(spark, corpus: str) -> None:
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    trials = int(os.environ.get("SCALE_TRIALS", "2"))
    skip = set(os.environ.get("PILLAR11_SKIP", "").split(","))
    for name in PILLAR11:
        if name in skip:
            print(f"{name:24s} SKIPPED (PILLAR11_SKIP)", flush=True)
            continue
        times, n = [], None
        for _ in range(trials):
            t0 = time.monotonic()
            n = qs[name](spark, corpus).count()
            times.append(time.monotonic() - t0)
        print(f"{name:24s} {min(times):9.2f} s  rows={n}  "
              f"trials={[round(t, 2) for t in times]}  {_la()}",
              flush=True)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1000"
    stages = sys.argv[2:] or ["calib100", "verify1000", "vcc1000"]
    # the broadcast of the 5M-doc sketch table COLLECTS to the driver
    # first, and that collect counts against spark.driver.maxResultSize
    # (measured: 1029.4 MiB vs the 1024 MiB default — the first 1000×
    # draw died on exactly this). On a real cluster the same knob
    # gates any ≳1 GB broadcast dim; raise it alongside driver memory.
    spark = get_spark("scale-probe-r11",
                      extra_conf={"spark.driver.maxResultSize": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    print(f"corpus={corpus} stages={stages} {_la()}", flush=True)
    for s in stages:
        if s == "calib100":
            stage_calib100(spark, "/tmp/scale100")
        elif s == "verify1000":
            stage_verify1000(spark, corpus)
        elif s == "vcc1000":
            stage_vcc1000(spark)
        elif s == "pillar11":
            stage_pillar11(spark, corpus)
        else:
            raise SystemExit(f"unknown stage {s}")


if __name__ == "__main__":
    main()
