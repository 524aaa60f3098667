"""Round-6 FINAL-batch scale probes (this session's 12 queries).

Usage:
  python tools/scale_probe_r6c.py <sf_dir> [name ...]

Scale-shape expectations, stated BEFORE measuring:

- containment_dedup: the set-similarity posting join — candidate volume
  is pairs-sharing-a-shingle, the same axis SCALE §1e measured for the
  Jaccard twin; the clone corpus manufactures shared shingles, so
  expect superlinear growth in the PAIR table (that is the data, not
  the operator) with ids-only shuffle.
- kcore: dominated by the capped MinHash candidate build (§1e ~linear
  per decade); the 5 peeling rounds add 10 bounded ids-only shuffles
  over a shrinking edge set. On the clone corpus almost nothing peels
  (cliques), so rounds ~ edge-table scans.
- kaplan_meier / diff_in_diff / uplift_deciles / forecast_backtest:
  one or two map-side-combined collapses over events (+ the rank's
  range exchange for uplift) — linear.
- pareto_front / zorder_layout / rfm_segments: orders-collapse bound —
  linear scans, bounded post-agg tables.
- bloom_prejoin / dq_suite / neyman_allocation: need the customer dim,
  which the clone corpora do not carry — sf0.1 evidence only, noted.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "kaplan_meier", "zorder_layout", "diff_in_diff", "pareto_front",
    "uplift_deciles", "forecast_backtest", "rfm_segments",
    "containment_dedup", "kcore",
]


def probe_queries(sf_dir: str, names: list[str], trials: int = 2) -> None:
    spark = get_spark("scale-probe-r6c")
    qs = entry_mod.queries()
    print(f"{'query':24s} {'t_min_s':>9s} {'rows':>12s}  loadavg", flush=True)
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    probe_queries(sf_dir, names)
