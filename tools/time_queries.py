"""Time individual queries in isolation through the noop sink.

Usage: python tools/time_queries.py [-n TRIALS] [sf_dir] q1 q2 ...
       (sf_dir defaults to /root/testdata/sf0.1; trials default 3)

Same methodology as bench.py (construction + noop write timed per
trial, min reported) but one warm session, chosen queries only — the
guide §1.4 isolation harness for before/after comparisons.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    trials = 3
    if args and args[0] == "-n":
        trials = int(args[1])
        args = args[2:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    spark = get_spark("time-queries")
    qs = entry_mod.queries()
    # warm the JVM + parquet footers (excluded)
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    def cpu_snap() -> list[int]:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]

    for name in names:
        ts = []
        steals = []
        for _ in range(trials):
            spark.sparkContext.setJobDescription(name)
            c0 = cpu_snap()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            ts.append(round(time.time() - t0, 3))
            c1 = cpu_snap()
            d = [y - x for x, y in zip(c0, c1)]
            # steal% of total jiffies during the trial: the co-tenant
            # contamination marker (SCALE §6 — a trial with steal >~2%
            # is a load sample, not a plan property)
            steals.append(round(100 * d[7] / max(sum(d), 1), 1))
        print(f"{name}: min={min(ts)} trials={ts} steal%={steals} "
              f"loadavg={os.getloadavg()[0]:.2f}", flush=True)


if __name__ == "__main__":
    main()
