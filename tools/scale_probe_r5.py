"""Round-5 dedup-pillar scale probe: sf0.1 → 10× → 100×.

Usage: python tools/scale_probe_r5.py <corpus_dir> [op ...]

Runs the dedup/ANN scale paths against a corpus dir (sf0.1 layout or a
``make_scale_corpus.py`` output) and prints one line per op:
``op  time_s(min of 2 warm trials)  volume`` where volume is the
emitted pair/row count — the saturation metric that explains any
superlinear time.

The width variants demonstrate the ``chunk_bits ≈ log2(N / occupancy)``
rule PREDICTIVELY (SCALE.md §1e): widths are chosen from the rule
before measuring, not tuned after.

- simhash48: production 48-bit/4-band SimHash pairs (12-bit chunks,
  4096 buckets/band) — the rule predicts saturation near N≈50k·12.
- simhash60: rule-chosen width for N=500k at target occupancy ~15
  (log2(500k/15) ≈ 15 bits/chunk → 60-bit fingerprint, 32768
  buckets/band; hex_digits=15 keeps the base hash in signed int64).
- lsh8 / lsh12: embedding hyperplane LSH at the round-4 8-bit band
  width (256 buckets) vs the rule-chosen 12-bit width for N=200k at
  target occupancy ~50 (log2(200k/50) ≈ 12 → 4096 buckets/band).
- cc48 / cc60 / cc60_star: connected components over the SimHash pair
  graphs (label propagation vs star contraction).

Trials run noop writes (full plan execution, no driver collect);
CC ops iterate eagerly at construction, so the clock wraps the
construction call too.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_analysis_spark.session import get_spark  # noqa: E402
from timeseries_data_analysis_spark.operators import (  # noqa: E402
    dedup as DD, graph as GR, similarity as SIM,
)


def main() -> None:
    corpus = sys.argv[1]
    only = set(sys.argv[2:])
    spark = get_spark("scale-probe-r5")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    emb = spark.read.parquet(f"{corpus}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>"))

    def sim_pairs(bits: int, hexd: int, cap: int | None = None):
        return DD.simhash_hamming_pairs(docs, n=2, bits=bits, bands=4,
                                        max_hamming=3, hex_digits=hexd,
                                        max_bucket=cap)

    OPS = {
        "exact_dedup": lambda: DD.exact_dedup(docs),
        "minhash_lsh": lambda: DD.minhash_lsh_candidates(
            docs, num_hashes=16, bands=8),
        # r=4 rows/band (bands=4): the width-rule fix for MinHash — band
        # agreement needs 4 matching minhashes instead of 2, so random
        # collisions fall as J^4 and candidate volume stays bounded when
        # the r=2 banding saturates (measured 30M pairs at the 10x corpus)
        "minhash_r4": lambda: DD.minhash_lsh_candidates(
            docs, num_hashes=16, bands=4),
        "simhash48": lambda: sim_pairs(48, 12),
        "simhash60": lambda: sim_pairs(60, 15),
        # skew-capped variants (the minhash max_bucket mechanism applied
        # to simhash banding): super-buckets are dropped from pair
        # generation, so emitted volume tracks the capped occupancy
        "simhash48_cap": lambda: sim_pairs(48, 12, cap=1000),
        "simhash60_cap": lambda: sim_pairs(60, 15, cap=1000),
        "lsh8": lambda: SIM.lsh_neardup_pairs(emb, dim=64, bands=6, bits=8),
        "lsh12": lambda: SIM.lsh_neardup_pairs(emb, dim=64, bands=6, bits=12),
        "cc48": lambda: GR.dedup_clusters(sim_pairs(48, 12)),
        "cc60": lambda: GR.dedup_clusters(sim_pairs(60, 15)),
        "cc60_star": lambda: GR.dedup_clusters(
            sim_pairs(60, 15), cc_fn=GR.connected_components_star),
    }

    print(f"corpus={corpus} loadavg={os.getloadavg()[0]:.2f}")
    for name, build in OPS.items():
        if only and name not in only:
            continue
        if os.environ.get("SCALE_PROBE_ONESHOT"):
            # big-corpus mode: ONE timed count (construction + full
            # execution; warm-up is noise at minutes-long runs) instead
            # of 3 noop writes + a count — 1 execution, not 4
            t0 = time.time()
            vol = build().count()
            print(f"{name:12s} {time.time() - t0:8.2f} s  rows={vol}  "
                  f"trials=oneshot loadavg={os.getloadavg()[0]:.2f}",
                  flush=True)
            continue
        times = []
        n_trials = int(os.environ.get("SCALE_PROBE_TRIALS", "3"))
        for trial in range(n_trials):  # first run warms; min of the rest
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        vol = build().count()
        print(f"{name:12s} {min(times[1:] or times):8.2f} s  rows={vol}  "
              f"trials={[round(t, 2) for t in times]} "
              f"loadavg={os.getloadavg()[0]:.2f}", flush=True)


if __name__ == "__main__":
    main()
