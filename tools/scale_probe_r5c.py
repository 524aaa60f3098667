"""Round-5 third-batch scale probe: graph/CDC/sketch/analytics ops at
sf0.1 vs the 10x corpus (make_scale_corpus.py output; orders included
via its round-5 `orders` builder).

Usage: python tools/scale_probe_r5c.py <sf_dir> [query ...]

Same protocol as scale_probe_r5b: min-of-2 warm trials, noop write,
loadavg per row.

Scale-shape expectations, stated BEFORE measuring:
- pagerank_neardup: pair generation is the known 48-bit SimHash path
  (§1c: sublinear candidate growth); the 6 power iterations are each
  one edge-join + vertex-agg, so total time ~ linear in edges. The 10x
  corpus's replicas are near-dup-disjoint by construction, so the edge
  count (and the vertex count) grows ~1x..10x sublinearly — expect the
  fingerprint stage to dominate at both scales.
- trend_slopes / acf_lags: one scan + one key-partitioned window pass
  -> linear.
- xcorr_leadlag: event-volume work is ONLY the hourly count agg; all
  spine frames are calendar-bounded (same span both corpora) -> the
  ratio should be well BELOW 10x (agg is map-side combined).
- snapshot_cdc: two per-key latest windows + full-outer join, 10x keys
  -> linear.
- scd2_history: key-partitioned windows over 10x users (1-in-17
  subset) -> linear.
- heavy_hitters: pass 1 is embarrassingly parallel (per-partition MG);
  pass 2 recounts ~30 candidates -> linear map cost, constant shuffle.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "trend_slopes", "acf_lags", "xcorr_leadlag", "snapshot_cdc",
    "scd2_history", "heavy_hitters", "pagerank_neardup",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("scale-probe-r5c")
    qs = entry_mod.queries()
    print(f"{'query':24s} {'t_min2_s':>9s} {'rows':>12s}  loadavg")
    for name in names:
        times = []
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
