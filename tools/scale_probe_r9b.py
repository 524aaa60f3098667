"""Round-9b: the FIRST measured 1000x points (SCALE.md §1o).

SCALE §5 names where each family bends first at 1000x but, until this
probe, no measurement existed past the 100x corpus. This probe clones
the corpus one more decade for the 3 cheapest linear families and
records where the first family actually bends.

Corpora (``tools/make_scale_corpus.py``, tables documents/embeddings/
events only — the 3 families read nothing else):

  /tmp/scale100   factor 100   -> 500k docs / 200k vectors / 10M events
  /tmp/scale1000  factor 1000  -> 5M docs  /  2M vectors  / 100M events

Usage:
  python tools/scale_probe_r9b.py <corpus_dir> [name ...]
  # 1000x protocol: SCALE_TRIALS=1 SPARK_GRAFT_INITIAL_PARTITIONS=256
  #                 SPARK_DRIVER_MEMORY=48g

Pre-registered expectations (committed BEFORE the 1000x corpus
finished building — the §1e discipline):

- **scan-linear stats** (`mann_kendall`, `hurst_daily`; events): the
  one fact-sized stage in both is a map-side-combinable collapse to
  the (series x days) grain, which at EVERY corpus size is ~150 rows
  (5 event types x ~30 days — replicas add users, not days), so the
  decade should be pure scan growth: mann_kendall 2.66 s @100x ->
  ~25-35 s @1000x; hurst_daily 1.58 s @100x -> ~15-25 s. The family
  BENDS only if the collapse's partial-agg map side stops combining
  (it cannot — the grain is fixed) or the single-file scan split
  serializes (mitigated: the builder writes 32 files at factor 1000).
- **capped pair build** (`minhash_r4`, documents, default
  max_bucket=1000): §1e measured capped candidate volume 13.5M @10x
  -> 56.3M @100x (4.2x/decade once the cap engages: buckets multiply
  ~linearly with N while per-bucket pairs stay <=C(1000,2)).
  Prediction: candidates ~4-6x/decade -> ~230-340M @1000x; wall time
  21.5 s @100x -> 100-250 s @1000x, signature stage linear in docs,
  pair join linear in emitted candidates. This family bends FIRST of
  the three (its constant is the largest), but bends LINEAR-ish, not
  quadratic — that is exactly what the cap is for. A >10x wall-time
  jump (super-linear) would falsify the cap story.
- **ANN probe** (`ivf_topk`, embeddings, registry form: 16 cells,
  probe 4): assignment is an N x 16 broadcast (linear in N); search
  scans ~n_probe/C of the corpus per query (linear in N at fixed Q=10);
  top-k tails are bounded. ~1.6 s @sf0.1 -> expect low tens of seconds
  @1000x (2M vectors). The honest caveat to record: at FIXED C=16 the
  per-cell population is 125k vectors — a real 100 TB deployment grows
  C with N (the ivf_store layout partitions by cell so C is free); the
  registry form is measured as-is because it is the oracle-checked
  contract.

Verdict question for §1o: does any of the three bend SUPER-linearly in
its third decade? §5's design claims say no (bounded grain / skew cap /
broadcast assignment); this probe is the falsification attempt.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402
from timeseries_data_analysis_spark.operators import dedup as DD  # noqa: E402


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    trials = int(os.environ.get("SCALE_TRIALS", "2"))
    spark = get_spark("scale-probe-r9b")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def minhash_r4():
        docs = spark.read.parquet(f"{corpus}/documents.parquet")
        return DD.minhash_lsh_candidates(docs, num_hashes=16, bands=4)

    OPS = {
        "mann_kendall": lambda: qs["mann_kendall"](spark, corpus),
        "hurst_daily": lambda: qs["hurst_daily"](spark, corpus),
        "minhash_r4": minhash_r4,
        "ivf_topk": lambda: qs["ivf_topk"](spark, corpus),
    }
    print(f"corpus={corpus} loadavg={os.getloadavg()[0]:.2f}", flush=True)
    for name, build in OPS.items():
        if only and name not in only:
            continue
        times, vol = [], None
        for _ in range(trials):
            t0 = time.monotonic()
            vol = build().count()
            times.append(time.monotonic() - t0)
        print(f"{name:14s} {min(times):9.2f} s  rows={vol}  "
              f"trials={[round(t, 2) for t in times]} "
              f"loadavg={os.getloadavg()[0]:.2f}", flush=True)


if __name__ == "__main__":
    main()
