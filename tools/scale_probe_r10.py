"""Round-10: the clusters-route third decade (SCALE.md §1q,
VERDICT r9 "Next round" #1 — the round's one `weak`).

§1o's verdict 2 found that on the duplicate-dense 1000× corpus the
CAPPED MinHash pair list itself grows ~13×/decade (729.65M genuine
high-Jaccard pairs at 5M docs) and concluded the right 100 TB artifact
is `dedup_clusters` (connected components) over the capped pairs,
"because genuine duplicate mass grows super-linearly in pair space and
linearly in cluster space". That claim was design-argued, not measured:
star contraction's last decade was 10× (§1j), `dedup_clusters`' 100×
(§1e). This probe measures the cluster route AT the 1000× corpus.

Stages (selectable by name on the CLI so the expensive cells can be
drawn independently):

  pairs      build the §1o capped pair table (minhash_r4: n=3,
             num_hashes=16, bands=4, max_bucket=1000 — the EXACT §1o
             form) over <corpus>/documents.parquet and persist it to
             /tmp/scale1000_pairs so the CC cells are isolated from
             the 415 s build.
  edges      distinct undirected edge count of the persisted pairs —
             the pair-list vs edge-set collapse factor.
  star       dedup_clusters over the persisted pairs with
             connected_components_star (the billion-edge engine),
             per-round checkpoints SERIALIZED (MEMORY_AND_DISK — the
             §1n-b fact-sized-frame rule). Readout: n_rows,
             n_clusters, max/avg cluster size, docs in dup clusters.
  labelprop  same with the label-propagation engine (comparison cell;
             drawn only if star converges with headroom).

Usage:
  SCALE_TRIALS=1 SPARK_GRAFT_INITIAL_PARTITIONS=256 \
  SPARK_DRIVER_MEMORY=48g python tools/scale_probe_r10.py \
      /tmp/scale1000 pairs star

Pre-registered predictions (committed BEFORE any 1000× cell is drawn —
the §1e discipline):

1. **Edge collapse**: bands=4, so one pair appears ≤4× in the pair
   list; template families agree on ALL bands, random collisions on
   one. Predict distinct (a,b) edges 180-400M (collapse factor
   ~1.8-4×).
2. **Star rounds**: the capped graph's components are within-bucket
   near-cliques (≤1000 docs/bucket) stitched by shared docs; star
   contraction halves star depth per alternation ⇒ predict fixpoint
   in ≤6 alternations (§1j measured 3 at 10×; density, not N, drives
   the count).
3. **Wall (the headline cell)**: each alternation is a small
   constant number of edge-sized shuffles and the edge set SHRINKS
   toward one star per component; predict total star wall 1-3× the
   §1o pair-build wall, i.e. **400-1300 s warm**; falsification bar =
   >3600 s, OOM at 48 GB, or non-convergence in 15 rounds. If the
   bar trips on the template-family mega-component, THAT is the
   finding — diagnose as §1o did (bucket forensics).
4. **Artifact size (the verdict-2 rescue)**: cluster-table rows =
   participating vertices ≤ 5M (LINEAR in N, bounded by the corpus)
   vs 729.65M pair rows — ≥150× smaller at the third decade, and its
   growth across decades is bounded by doc count by construction.
   Cluster COUNT prediction: the clone corpus replicates ~49.4k
   originals (5M docs / ~101 avg family size); predict n_clusters
   within 2× of 50k (template families merge some originals'
   clusters; band noise splits none — CC only merges).
5. **Label-prop comparison** (if drawn): re-joins the full immutable
   ~2×E sym edge table every round instead of rewriting it; on this
   shallow-diameter graph predict a similar round count but a wall
   1-4× the star wall (per-round volume does not decay). Either
   engine must emit the IDENTICAL cluster partition (same n_rows,
   n_clusters, checksum) — a cross-engine equality assert, not a
   prediction.

Additional stage (VERDICT r9 "Next round" #6 — the remaining raw-form
stats):

  stats      time `acf_lags`, `pacf_yw`, `spearman_lag1` at <corpus>.
             Pre-registered expectations: acf_lags and pacf_yw are
             SINGLE-window-pass + combinable agg (all lag columns share
             one per-series sort), so their per-decade constant is one
             5-sort-task pass — predict ≤25 s warm at 100× (10M rows),
             series-cardinality-bound but tolerable at 1000×.
             spearman_lag1 is THREE windows (lag + two rank windows
             over the full fact frame) — the §1n raw-rank shape whose
             twins exist for the other rank stats; predict >30 s at
             100×, in which case the measurement DEMANDS a daily twin
             (ship `spearman_daily`), per the §1n-b playbook.

  pillar     time the round-10 event/document pillar at <corpus>.
             Pre-registered (the §1p bar): every daily-grain query
             (garch_select, hp_filter, kpss_test, theil_sen_daily,
             sample_entropy, max_drawdown, ar1_halflife, peak_detect)
             is the reduce-then-bounded-solve class — any 100× cell
             >3× its sf0.1 warm cell beyond the cold scan is a plan
             bug; 1000× cells are scan-bound. The user-partitioned
             windows (transition_matrix (pre-existing), interarrival_burstiness,
             gini_concentration) distribute freely (NOT the 5-sort-
             task shape — partition count is |users|·|types|); expect
             scan-linear. benford_values/brier_decomposition are pure
             combinable aggs. Document queries (msttr,
             kl_source_unigram, pmi_bigrams, simhash_wide_pairs) are
             token-explode linear; simhash_wide ≈ 2× the 48-bit
             build's constant (two vote sets).

Protocol: 1000× cells are one-shot or min-of-2 (cost), loadavg quoted
per draw; host co-tenant load makes any draw at loadavg >8 suspect
(§6 rule).
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

PAIRS_PATH = "/tmp/scale1000_pairs"
SER = StorageLevel.MEMORY_AND_DISK  # serialized + spillable (§1n-b rule)


def stage_pairs(spark, corpus: str) -> None:
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    t0 = time.monotonic()
    pairs = DD.minhash_lsh_candidates(docs, num_hashes=16, bands=4,
                                      max_bucket=1000)
    pairs.write.mode("overwrite").parquet(PAIRS_PATH)
    wall = time.monotonic() - t0
    n = spark.read.parquet(PAIRS_PATH).count()
    print(f"pairs      {wall:9.2f} s  rows={n}  -> {PAIRS_PATH}  "
          f"loadavg={os.getloadavg()[0]:.2f}", flush=True)


def stage_edges(spark) -> None:
    pairs = spark.read.parquet(PAIRS_PATH)
    t0 = time.monotonic()
    n = (pairs.select("id_l", "id_r").distinct()).count()
    wall = time.monotonic() - t0
    print(f"edges      {wall:9.2f} s  distinct={n}  "
          f"loadavg={os.getloadavg()[0]:.2f}", flush=True)


def _cluster_cell(spark, name: str, cc_fn) -> None:
    pairs = spark.read.parquet(PAIRS_PATH).select("id_l", "id_r")
    t0 = time.monotonic()
    cl = G.dedup_clusters(pairs, cc_fn=cc_fn)
    row = cl.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.max("cluster_size").alias("max_size"),
        F.avg("cluster_size").alias("avg_size"),
        F.sum(F.when(F.col("cluster_size") > 1, 1).otherwise(0))
        .alias("docs_in_dup"),
        F.sum(F.col("cluster_id") % 1000003).alias("checksum"),
    ).collect()[0]
    wall = time.monotonic() - t0
    print(f"{name:10s} {wall:9.2f} s  rounds={G.LAST_CC_ROUNDS}  "
          f"rows={row['n_rows']}  clusters={row['n_clusters']}  "
          f"max={row['max_size']}  avg={row['avg_size']:.2f}  "
          f"in_dup={row['docs_in_dup']}  checksum={row['checksum']}  "
          f"loadavg={os.getloadavg()[0]:.2f}", flush=True)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1000"
    stages = sys.argv[2:] or ["pairs", "edges", "star"]
    spark = get_spark("scale-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"corpus={corpus} stages={stages} "
          f"loadavg={os.getloadavg()[0]:.2f}", flush=True)
    for s in stages:
        if s == "pairs":
            stage_pairs(spark, corpus)
        elif s == "edges":
            stage_edges(spark)
        elif s == "star":
            _cluster_cell(
                spark, "star",
                lambda e, a, b, m: G.connected_components_star(
                    e, a, b, max_iter=15, storage_level=SER))
        elif s == "labelprop":
            _cluster_cell(
                spark, "labelprop",
                lambda e, a, b, m: G.connected_components(
                    e, a, b, max_iter=25, storage_level=SER))
        elif s == "pillar":
            import __spark_entry__ as entry_mod
            qs = entry_mod.queries()
            trials = int(os.environ.get("SCALE_TRIALS", "2"))
            for name in ("garch_select", "hp_filter", "kpss_test",
                         "theil_sen_daily", "sample_entropy",
                         "max_drawdown", "ar1_halflife", "peak_detect",
                         "interarrival_burstiness",
                         "gini_concentration", "benford_values",
                         "brier_decomposition", "msttr",
                         "kl_source_unigram", "pmi_bigrams",
                         "simhash_wide_pairs"):
                times, n = [], None
                for _ in range(trials):
                    t0 = time.monotonic()
                    n = qs[name](spark, corpus).count()
                    times.append(time.monotonic() - t0)
                print(f"{name:24s} {min(times):9.2f} s  rows={n}  "
                      f"trials={[round(t, 2) for t in times]}  "
                      f"loadavg={os.getloadavg()[0]:.2f}", flush=True)
        elif s == "stats":
            import __spark_entry__ as entry_mod
            qs = entry_mod.queries()
            trials = int(os.environ.get("SCALE_TRIALS", "2"))
            for name in ("acf_lags", "pacf_yw", "spearman_lag1",
                         "acf_daily", "pacf_daily", "spearman_daily"):
                times, n = [], None
                for _ in range(trials):
                    t0 = time.monotonic()
                    n = qs[name](spark, corpus).count()
                    times.append(time.monotonic() - t0)
                print(f"{name:14s} {min(times):9.2f} s  rows={n}  "
                      f"trials={[round(t, 2) for t in times]}  "
                      f"loadavg={os.getloadavg()[0]:.2f}", flush=True)
        else:
            raise SystemExit(f"unknown stage {s}")


if __name__ == "__main__":
    main()
