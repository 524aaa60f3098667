"""Round-5 second-batch scale probe: the new analytics/curation ops at
sf0.1 vs the 10x corpus (make_scale_corpus.py output).

Usage: python tools/scale_probe_r5b.py <sf_dir> [query ...]

Times each registry query end-to-end (min of 2 warm trials, noop write
so the full plan executes without a driver collect) and prints
``query  time_s  rows``. The queries probed here are the round-5
second batch: repetition_profile, vocab_coverage, kmv_distinct,
minhash_accuracy, pmi_cooccurrence, length_buckets (documents);
cusum_changepoints, seasonal_forecast_eval, spearman_lag1,
winsorize_stats (events); rp_recall, hard_negatives (embeddings).

Scale-shape expectations, stated before measuring:
- documents family: one or two explode/groupBy passes -> linear;
  pmi_cooccurrence's self-join is bounded by the top-200 vocab
  restriction (volume grows with doc count, not vocab^2);
  minhash_accuracy inherits the capped LSH candidate volume.
- events family: key-partitioned windows + tiny aggs -> linear.
- embeddings family: broadcast scoring joins -> linear in corpus size.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "repetition_profile", "vocab_coverage", "kmv_distinct",
    "minhash_accuracy", "pmi_cooccurrence", "length_buckets",
    "cusum_changepoints", "seasonal_forecast_eval", "spearman_lag1",
    "winsorize_stats", "rp_recall", "hard_negatives",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("scale-probe-r5b")
    qs = entry_mod.queries()
    print(f"{'query':24s} {'t_min2_s':>9s} {'rows':>12s}  loadavg")
    for name in names:
        times = []
        rows = -1
        for _ in range(2):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        rows = qs[name](spark, sf_dir).count()
        la = os.getloadavg()[0]
        print(f"{name:24s} {min(times):9.2f} {rows:12d}  {la:.1f}")


if __name__ == "__main__":
    main()
