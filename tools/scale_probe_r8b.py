"""Round-8b scale probes: the 12 round-8 registry queries across the
clone-corpus decade (sf0.1 / 10x / 100x).

Usage:
  python tools/scale_probe_r8b.py <sf_dir> [name ...]
  # 100x protocol: SCALE_TRIALS=1 SPARK_GRAFT_INITIAL_PARTITIONS=128

Scale-shape expectations, stated BEFORE measuring:

- isotonic_calibration / mann_kendall / binseg_changepoint: one
  map-side-combined fact collapse (to B=11 buckets / series x days)
  + bounded tails — scan-linear, the best decade shape.
- ljung_box / runs_test / mann_whitney: one per-series window pass
  (6-lag materialization / sign-change lag / joint rank) — linear in
  fact bytes BUT partitioned by event_type (5 series), so at 100x a
  single series partition sorts ~12M rows on one task: the documented
  per-series-window skew surface the rolling family already carries
  (SCALE §1 family); expect linear-with-skew-constant, not a DNF.
- logrank_test: per-user collapse + bounded duration-grid windows —
  linear in the user collapse.
- bh_fdr: mann_whitney + an m-bounded rank window — tracks
  mann_whitney.
- silhouette_trained: 2 Lloyd assignment scans + the silhouette
  scoring scan, each the N x 16 broadcast join — expect ~3x
  silhouette_audit's measured decade (8.7 s at 100x).
- als_rank2: the ratings distinct-agg dominates exactly as in
  als_rank1 (29 s at 100x); the extra half-step joins shuffle
  |customers|/|suppliers| rows of 5 doubles — expect ~als_rank1 plus
  a small constant.
- matryoshka_audit / rbo_rankings: two exact N x Q scoring passes
  (embeddings table) — linear in vectors; Q·k-bounded tails.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "isotonic_calibration", "mann_kendall", "binseg_changepoint",
    "ljung_box", "runs_test", "mann_whitney", "logrank_test",
    "bh_fdr", "silhouette_trained", "als_rank2",
    "matryoshka_audit", "rbo_rankings",
    # late round-8 additions. Expectations: l_diversity is
    # scan-linear in the customer dim (two combinable groupBys + a
    # QI-partitioned window over the bracket collapse); ar2_forecast
    # is the mann_kendall class (daily collapse bounds everything);
    # hurst_exponent is scan-linear with a 5x zero-shuffle fan-out
    # and rides the same 5-series per-series-window sort constant as
    # the ljung_box trio (the row_number pass).
    "l_diversity", "ar2_forecast", "hurst_exponent",
]


def probe(sf_dir: str, names: list[str], trials: int | None = None) -> None:
    if trials is None:
        trials = int(os.environ.get("SCALE_TRIALS", "2"))
    spark = get_spark("scale-probe-r8b")
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
    probe(sf_dir, names)
