"""Round-9 scale probes: the bounded-grain daily twins of the
per-series raw-rank family, across the clone-corpus decade
(sf0.1 / 10x / 100x).

Usage:
  python tools/scale_probe_r9.py <sf_dir> [name ...]
  # 100x protocol: SCALE_TRIALS=1 SPARK_GRAFT_INITIAL_PARTITIONS=128

Scale-shape expectations, stated BEFORE measuring:

- ljung_box_daily / runs_test_daily / mann_whitney_daily /
  cvm_drift_daily / hurst_daily: ALL are the mann_kendall class —
  ONE map-side-combined fact collapse to (series x days) [or
  (series x arm x days) for the two-sample pair], then every
  window/rank/lag runs over a CALENDAR-BOUNDED frame (~30 days at
  this corpus: <=150 rows total downstream of the collapse). Expect
  scan-linear decades tracking mann_kendall's 0.98 / 1.15 / 2.66 s,
  i.e. ~1 s at sf0.1 and LOW single digits at 100x — vs the raw
  forms' 18-46 s 100x cells (SCALE §1n). The per-series sort-task
  constant (5 series -> 5 tasks of ~12M rows) must be GONE from the
  profile: the only fact-sized stage is the combinable groupBy, which
  parallelizes by input split, not by series cardinality.
- The twins' 100x cells should be within ~2x of EACH OTHER (same
  collapse, different bounded tails); hurst_daily's 4x stack fan-out
  happens on the bounded frame so it should cost nothing.
- als_rankk_backtest: the ratings build (the als_rank1-measured 29 s
  at 100x) + FOUR exact half-steps, each one fact-sized join + one
  map-side-combinable groupBy shuffling 14 doubles/key, solve in
  codegen (no Python rows ever) + two bounded readout joins. als_rank2
  (ONE alternation, 2 half-steps) measured 64.4 s at 100x; expect
  roughly 1.5-2.5x that — order 100-160 s — linear, never quadratic,
  with the k! Cramer expression cost purely compile-time.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe_r8b import probe  # noqa: E402

DEFAULT_QUERIES = [
    "ljung_box_daily", "runs_test_daily", "mann_whitney_daily",
    "cvm_drift_daily", "hurst_daily",
]

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    probe(sf_dir, names)
