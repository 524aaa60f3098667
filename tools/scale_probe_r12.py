"""Round-12 scale probe: (a) the survivor-form Levenshtein verify off
§1u's candidate-mass wall (SCALE §1v, VERDICT r11 "Next round" #1),
and (b) the verified-edge GROWTH LAW (§1w, VERDICT #5) — turning the
§1t honest sub-miss ("38×/decade, family-squared-ish") into a fitted
exponent a 100 TB planner can size the verify stage from.

Corpus geometry that makes (b) measurable: every clone corpus here is
factor-N of sf0.1's 5 000 base documents, so the FAMILY count is
fixed per source set and the decade multiplies only the per-family
clone MULTIPLICITY c. Two 500k-doc cuts exist with the SAME doc count
but 10× different multiplicity:

  /tmp/scale100          500k docs = 5 000 base × c=100, 20 sources
  /tmp/scale1000_2src    500k docs =   500 base × c=1000, 2 sources

so E(calib100)=519 (bands=4, §1t) vs E(scale1000)=19 988 fits the
multiplicity exponent at FIXED families, and E(2src) vs the
src0/src1 share of the 1000× verified edges tests family-LINEARITY
at fixed multiplicity.

Stages:

  surv100   q_levenshtein_survivors at /tmp/scale100 — the §1u wall
            query's survivor form: bands-8 candidates → exact Jaccard
            ≥ 0.5 (4-dp) → O(|l|·|r|) DP on the survivors only.
  grow2src  bands=4 capped pairs over /tmp/scale1000_2src →
            ngram_jaccard_verify ≥ 0.5 → E_2src (+ cluster histogram).
  share1000 per-source-pair rollup of /tmp/scale1000_verified —
            the src0/src1-internal share E(2src) must match if edge
            mass is family-linear.
  fitlaw    print the fitted exponent from the committed constants +
            whatever grow2src/share1000 printed (manual transcription
            into SCALE.md — this stage only restates arithmetic).

Usage:
  SCALE_TRIALS=1 SPARK_DRIVER_MEMORY=48g \
  python tools/scale_probe_r12.py surv100 grow2src share1000

Pre-registered predictions (committed BEFORE any cell is drawn — the
§1e discipline):

1. **surv100 wall = the Jaccard-verify chain cost, not the DP.**
   §1s measured the same bands-8 candidates → string-Jaccard chain
   (verified_clusters) at 147.3 s at 100×; the survivors are ~10²-10³
   pairs, so the added DP is sub-second. Predict **120-300 s**, i.e.
   ≥ 4.5× under the wall form's measured 1 350 s (§1u) with the SAME
   decile readout on the surviving mass. Falsification: > 600 s, or
   a survivor histogram that is not the high-sim tail of the §1u
   histogram (survivors must sit in the top deciles by construction
   — Jaccard ≥ 0.5 token sets with reordering bounded by the clone
   transform).
2. **E_2src is family-linear**: E(2src) ≈ share of the 19 988
   1000×-verified edges whose BOTH endpoints are src0/src1 docs
   (if families spread uniformly over 20 sources, ≈ 2 000 — the
   banding on the cut may differ at the candidate margin, so predict
   within **±25%** of the share1000 count and inside **800-5 000**
   absolutely). Falsification: E_2src ≳ 10 000 (source-concentrated
   family mass — then source labels matter for verify BUDGETING, not
   just leakage, and the budget rule must say so).
3. **The multiplicity exponent**: with families fixed, E grew
   519 → 19 988 for c 100 → 1000 (bands=4 both ends), i.e.
   γ = log10(E₁₀₀₀/E₁₀₀) = **1.59** — SUB-squared (γ < 2: the clone
   perturbation breaks some within-family ≥0.5-Jaccard pairs) but
   strongly super-linear (γ > 1: members × clones compound). The
   2src/share1000 agreement in (2) is the cross-check that lets the
   law read E ≈ E_cal · (c/c_cal)^1.6 · (F/F_cal); falsification of
   family-linearity in (2) kills the (F/F_cal) factor.

Protocol: min-of-SCALE_TRIALS warm (default 1 at this size), loadavg
quoted per draw; any draw at loadavg > 8 from external load is
suspect (§6 rule).
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

CORPUS_100 = "/tmp/scale100"
CORPUS_2SRC = "/tmp/scale1000_2src"
PAIRS_2SRC = "/tmp/scale1000_2src_pairs"
VERIFIED_1000 = "/tmp/scale1000_verified"
CORPUS_1000 = "/tmp/scale1000"
SER = StorageLevel.MEMORY_AND_DISK

# committed constants from §1t (bands=4 capped verify, ≥0.5 at 4 dp)
E_CAL_100 = 519       # 500k docs, c=100, 20 sources
E_FULL_1000 = 19_988  # 5M docs, c=1000, 20 sources


def _la() -> str:
    return f"loadavg={os.getloadavg()[0]:.2f}"


def stage_surv100(spark) -> None:
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    trials = int(os.environ.get("SCALE_TRIALS", "1"))
    times, rows = [], None
    for _ in range(trials):
        t0 = time.monotonic()
        rows = qs["levenshtein_survivors"](spark, CORPUS_100).collect()
        times.append(time.monotonic() - t0)
    print(f"surv100    {min(times):9.2f} s  "
          f"trials={[round(t, 2) for t in times]}  {_la()}", flush=True)
    for r in rows:
        print(f"    bucket={r['bucket']}  n_pairs={r['n_pairs']:>8}  "
              f"avg_sim={r['avg_sim']}", flush=True)


def stage_grow2src(spark) -> None:
    docs = spark.read.parquet(f"{CORPUS_2SRC}/documents.parquet")
    t0 = time.monotonic()
    DD.minhash_lsh_candidates(docs, num_hashes=16, bands=4,
                              max_bucket=1000) \
        .write.mode("overwrite").parquet(PAIRS_2SRC)
    n_pairs = spark.read.parquet(PAIRS_2SRC).count()
    print(f"pairs2src  {time.monotonic()-t0:9.2f} s  rows={n_pairs}  "
          f"{_la()}", flush=True)
    pairs = spark.read.parquet(PAIRS_2SRC).select("id_l", "id_r").distinct()
    t0 = time.monotonic()
    ver = DD.ngram_jaccard_verify(pairs, docs, threshold=0.5).persist(SER)
    n_ver = ver.count()
    print(f"verify2src {time.monotonic()-t0:9.2f} s  edges={n_ver}  "
          f"{_la()}", flush=True)
    t0 = time.monotonic()
    cl = G.dedup_clusters(
        ver.select("id_l", "id_r"),
        cc_fn=lambda e, a, b, m: G.connected_components_star(
            e, a, b, max_iter=15, storage_level=SER))
    hist = (cl.groupBy("cluster_size")
            .agg(F.countDistinct("cluster_id").alias("n_clusters"),
                 F.count(F.lit(1)).alias("n_docs"))
            .orderBy("cluster_size").collect())
    n_cl = sum(r["n_clusters"] for r in hist)
    n_docs = sum(r["n_docs"] for r in hist)
    mx = max((r["cluster_size"] for r in hist), default=0)
    print(f"cc2src     {time.monotonic()-t0:9.2f} s  clusters={n_cl}  "
          f"docs={n_docs}  max={mx}  {_la()}", flush=True)
    ver.unpersist()


def stage_share1000(spark) -> None:
    edges = spark.read.parquet(VERIFIED_1000).select("id_l", "id_r")
    src = (spark.read.parquet(f"{CORPUS_1000}/documents.parquet")
           .select("doc_id", "source"))
    t0 = time.monotonic()
    j = (edges
         .join(src.select(F.col("doc_id").alias("id_l"),
                          F.col("source").alias("_sl")), "id_l")
         .join(src.select(F.col("doc_id").alias("id_r"),
                          F.col("source").alias("_sr")), "id_r"))
    per = (j.groupBy("_sl", "_sr").agg(F.count(F.lit(1)).alias("n"))
           .collect())
    total = sum(r["n"] for r in per)
    in2 = sum(r["n"] for r in per
              if r["_sl"] in ("src0", "src1")
              and r["_sr"] in ("src0", "src1"))
    print(f"share1000  {time.monotonic()-t0:9.2f} s  total={total}  "
          f"src01_internal={in2}  share={in2/total:.4f}  {_la()}",
          flush=True)


def stage_fitlaw(_spark) -> None:
    import math
    gamma = math.log10(E_FULL_1000 / E_CAL_100)
    print(f"fitlaw     gamma = log10({E_FULL_1000}/{E_CAL_100}) "
          f"= {gamma:.3f}  (multiplicity exponent at fixed families; "
          "family factor tested by grow2src vs share1000)", flush=True)


def _timed_queries(spark, names: list[str], sf_dir: str,
                   tag: str) -> None:
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    trials = int(os.environ.get("SCALE_TRIALS", "1"))
    for name in names:
        times = []
        for _ in range(trials):
            t0 = time.monotonic()
            n = qs[name](spark, sf_dir).count()
            times.append(time.monotonic() - t0)
        print(f"{tag}:{name:24} {min(times):9.2f} s  rows={n}  "
              f"trials={[round(t, 2) for t in times]}  {_la()}",
              flush=True)


# Pre-registered predictions for the round-12 pillar decades (written
# before the cells are drawn, §1e discipline):
# - The daily-battery rows (ewma_chart, cohens_d, anderson_darling,
#   cliffs_delta, ts_complexity, mood_median, control_chart) are
#   reduce-then-bounded: predict decade-FLAT (≤ ~2 s at 1000×, the
#   §1u ks/pettitt/bartlett shape).
# - token_fertility / langid_kappa are one-scan codegen rollups:
#   predict scan-LINEAR (~1 s at 100×, ~5-15 s at 1000×).
# - dup_ngram_mass is the shingle-explode + df-groupBy: predict the
#   §1t sketch-build shape, scan-linear (~10-20 s at 100×, ~100-200 s
#   at 1000×; shuffles 8-byte hashes with combinable counts).
# - lsh_recall's truth side is the exact inverted-index join: at the
#   c=100 corpus the within-family pair mass is F·C(c,2) ≈ 2.5e7 —
#   predict O(1-3 min) at 100×; the 1000× truth (F·C(1000,2) ≈ 2.5e9
#   pairs) is OUT by design — the row's contract is truth-on-a-
#   sampled-stratum at that scale (the minhash_accuracy posture).
# - dedup_token_savings / dup_transitivity run the verified chain
#   in-query: predict the verified_clusters 100× cost (~150 s, §1s)
#   + a bounded rollup; at 1000× they inherit §1t's persisted-edges
#   posture (the source_leakage precedent) — 100× only here.
# - ivf_recall: brute truth is the one exact Q·N pass (2 062 queries
#   × 200k vectors at 100×): predict 1-4 min; the IVF routes are the
#   pruned fraction on top. Recall itself should stay in the same
#   band as sf0.1 (the quantizer geometry, not the corpus size,
#   drives it).
# - unseen_vocab (added to the pillar BEFORE its cells were drawn):
#   the (source, token) count is the one fact-sized combinable
#   shuffle (the vocab_coverage stage); the freq-of-freq rollup is
#   bounded. Predict scan-linear: ~2-8 s at 100×, ~20-80 s at 1000×.
#   Estimator NOTE pre-registered too: the clone corpora keep the
#   token MULTISET per replica, so singletons (f1) DON'T grow with c
#   — every base-doc token appears ≥c times — and chao1 should
#   COLLAPSE toward the observed vocab (unseen_frac → ~0): the
#   correct reading, since a clone corpus genuinely has no unseen
#   mass. A corpus where another decade buys nothing new is exactly
#   what Chao1 must report; falsification is unseen_frac staying
#   high at 100×/1000× (would mean the estimator reads noise).
def stage_pillar12(spark) -> None:
    flat = ["ewma_chart", "cohens_d", "anderson_darling",
            "cliffs_delta", "ts_complexity", "mood_median",
            "control_chart"]
    scan = ["token_fertility", "langid_kappa", "dup_ngram_mass",
            "unseen_vocab"]
    _timed_queries(spark, flat + scan, CORPUS_100, "p12@100x")
    _timed_queries(spark, flat + scan, CORPUS_1000, "p12@1000x")


def stage_chain100(spark) -> None:
    _timed_queries(spark, ["lsh_recall", "dedup_token_savings",
                           "dup_transitivity"], CORPUS_100,
                   "chain@100x")


def stage_ivf100(spark) -> None:
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    t0 = time.monotonic()
    rows = qs["ivf_recall"](spark, CORPUS_100).collect()
    dt = time.monotonic() - t0
    print(f"ivf100     {dt:9.2f} s  {_la()}", flush=True)
    for r in rows:
        print("    " + "  ".join(f"{k}={r[k]}" for k in r.asDict()),
              flush=True)


def main() -> None:
    stages = sys.argv[1:] or ["surv100", "grow2src", "share1000", "fitlaw"]
    spark = get_spark("scale-probe-r12",
                      extra_conf={"spark.driver.maxResultSize": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    print(f"stages={stages} {_la()}", flush=True)
    fns = {"surv100": stage_surv100, "grow2src": stage_grow2src,
           "share1000": stage_share1000, "fitlaw": stage_fitlaw,
           "pillar12": stage_pillar12, "chain100": stage_chain100,
           "ivf100": stage_ivf100}
    for s in stages:
        if s not in fns:
            raise SystemExit(f"unknown stage {s}")
        fns[s](spark)


if __name__ == "__main__":
    main()
