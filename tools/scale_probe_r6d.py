"""Round-6 continuation-batch scale probes (logit / conformal / LPA /
PCA / feature-engineering queries).

Usage:
  python tools/scale_probe_r6d.py <sf_dir> [name ...]

Scale-shape expectations, stated BEFORE measuring:

- quality_logit: 2 GD steps + 1 loss pass = 3 scans of documents with
  3-double-per-partition shuffles — expect pure scan-linear.
- conformal_interval / group_kfold / target_encode_oof: one or two
  keyed collapses over events (+ conformal's per-type window sort) —
  linear.
- woe_iv: single grouped agg over documents — linear, bounded groups.
- feature_hashing: explode → distinct(vocab) → 256-bucket agg; the
  distinct is the cost, and vocab saturates (~200 synthetic tokens),
  so expect SUBlinear growth — the whole point of hashing after
  distinct.
- pca2_axes: one aggregate over embeddings — linear.
- community_labelprop: pair-graph build (SCALE §1e measured the
  48-bit chain per decade) + 2 LPA rounds, each one E-row join and a
  V-row argmax — expect the build to dominate exactly as it does for
  pagerank_neardup; the clone corpus multiplies clique density, so
  the edge table grows superlinearly (data property, ids-only
  shuffle).
- regional_supplier_volume / top_supplier_share: need supplier /
  lineitem dims the clone corpora do not carry — sf0.1 evidence only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "quality_logit", "conformal_interval", "group_kfold",
    "target_encode_oof", "woe_iv", "feature_hashing", "pca2_axes",
    "community_labelprop", "community_modularity",
    "degree_assortativity", "int8_quant_audit",
]


def probe_queries(sf_dir: str, names: list[str], trials: int = 2) -> None:
    spark = get_spark("scale-probe-r6d")
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
