"""Round-6 LATE-batch scale probes (the post-gate-freeze queries).

Usage:
  python tools/scale_probe_r6b.py <sf_dir> [name ...]
      min-of-2 warm wall times (one-shot where noted) for the round-6
      late queries — run at sf0.1 and the 10x corpus; one-shot at 100x.

Scale-shape expectations, stated BEFORE measuring:

- roc_auc: distinct-score collapse (map-side combined, linear) + the
  global_cumsum two-pass (one range shuffle of the per-score table +
  a #partitions-row broadcast). Expect ~linear in events; the
  per-score table is the distinct-value count, which grows sublinearly
  on the clone-based corpus (clones repeat values), so the decade may
  come in UNDER linear.
- pacf_yw / kalman_level: one key-partitioned window or daily-grid agg
  (linear scan) + calendar-bounded recursion. Linear.
- js_divergence / bm25_topk: token explode + counted groupBys —
  linear in total tokens; js's per-source join touches (source, term)
  cardinality, bm25's tf only the 3 query terms.
- hll_distinct: linear scan; register state fixed at 512 rows/group
  regardless of N (THE point of the sketch).
- degree_distribution / bfs_hops: dominated by the banded, max_bucket-
  capped MinHash candidate build (SCALE 1e measured the candidate
  volume ~linear over the second decade); degrees adds two bounded
  shuffles, BFS adds 3 fixed rounds of (frontier join edges) — linear
  in edges per round. The 100x candidate graph is ~122M edges, so
  expect BFS to cost a few edge-table scans.
- bootstrap_ci: one scan x64 explode, map-side combined to 64 rows per
  partition before the shuffle — linear with a constant 64x row
  fan-out (CPU-bound md5). The 64 replicate means and the percentile
  are O(1). basket_lift rides lineitem, which the clone corpus does
  not carry — measured at sf0.1 only (its pair join is bounded by
  basket size ~4, the same per-key-quadratic contract as
  robust_regression's days).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "roc_auc", "pacf_yw", "js_divergence", "hll_distinct",
    "degree_distribution", "bfs_hops", "bootstrap_ci", "kalman_level",
    "bm25_topk",
]


def probe_queries(sf_dir: str, names: list[str], trials: int = 2) -> None:
    spark = get_spark("scale-probe-r6b")
    qs = entry_mod.queries()
    print(f"{'query':24s} {'t_min_s':>9s} {'rows':>12s}  loadavg")
    for name in names:
        times = []
        for _ in range(trials):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        rows = qs[name](spark, sf_dir).count()
        la = os.getloadavg()[0]
        print(f"{name:24s} {min(times):9.2f} {rows:12d}  {la:.1f}",
              flush=True)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    trials = 1 if "scale100" in sf else 2
    probe_queries(sf, names, trials=trials)
