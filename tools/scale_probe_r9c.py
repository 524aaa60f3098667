"""Round-9c scale probe: the econometric-diagnostics batch across the
clone-corpus decade (sf0.1 / 100x, and optionally 1000x — the events
table exists at /tmp/scale1000 from the §1o build).

Usage:
  python tools/scale_probe_r9c.py <sf_dir> [name ...]
  # big-corpus protocol: SCALE_TRIALS=2 (min-of-2 warm, the §1
  # standard), SPARK_GRAFT_INITIAL_PARTITIONS=128 (100x) / 256 (1000x)

Scale-shape expectations, stated BEFORE measuring:

- jarque_bera / welch_ttest / aic_order_select / chow_test /
  page_hinkley / adf_test: ALL are the mann_kendall class — ONE
  map-side-combined fact collapse to the (series × days) [or
  (series, arm, days)] grain, then moments/lags/Cramer solves over a
  calendar-bounded frame. §1o measured that class warm-FLAT across
  three decades (1.1 → 1.7 → 1.8 s) with the cold scan as the entire
  marginal cost; expect every one of these within ~2× of
  mann_kendall's cells at the same corpus.
- kruskal_wallis / friedman_test: same collapse + a rank window over
  the pooled/blocked bounded frame (the KW one deliberately
  single-task — ≤ |series|·|days| rows at ANY corpus size). Same
  prediction; the constant-partition sort must NOT grow with N.
- granger_causality / engle_granger: the pair frame is the daily
  collapse self-joined on day — ≤ |series|²·|days| rows (bounded),
  plus one lag window per pair and (engle) a second pass for
  residuals. Expect the family's largest constants (engle runs two
  chained windows) but the same flat-after-collapse decade.

Falsification bar: any query whose 100× cell exceeds 3× its sf0.1
warm cell (beyond the documented cold-scan constant) means a
fact-sized stage escaped the collapse — a plan bug, not noise.
"""

from __future__ import annotations

import sys

from scale_probe_r8b import probe  # noqa: E402  (shared harness)

DEFAULT_QUERIES = [
    "jarque_bera", "welch_ttest", "kruskal_wallis", "friedman_test",
    "page_hinkley", "adf_test", "aic_order_select", "chow_test",
    "granger_causality", "engle_granger",
    # batch C + GARCH (same class; dunn adds the |series|²-bounded
    # self-join, garch the sequential-per-series Arrow recursion over
    # the bounded grain — expect the same flat-after-collapse decade)
    "dunn_posthoc", "variance_ratio", "seasonal_mann_kendall",
    "cochran_q", "grubbs_outlier", "garch_vol",
]

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    probe(sf_dir, names)
