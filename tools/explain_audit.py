"""Physical-plan audit for the headline queries.

For each query: counts exchanges (shuffles), broadcast vs sort-merge vs
nested-loop joins, whole-stage-codegen coverage, pushed filters, and flags
plan smells (single-partition exchanges feeding compute, nested-loop joins
on non-tiny sides, missing pushdown under a filter). This is the
".explain and iterate" loop as a repeatable artifact.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict:
    lines = plan.split("\n")
    d = {
        "exchanges": len([l for l in lines if "Exchange hashpartitioning" in l]),
        "single_part_exchanges": len([l for l in lines
                                      if "Exchange SinglePartition" in l]),
        "broadcast_joins": len([l for l in lines if "BroadcastHashJoin" in l]),
        "smj": len([l for l in lines if "SortMergeJoin" in l]),
        "shuffle_hash_joins": len([l for l in lines if "ShuffledHashJoin" in l]),
        "bnlj": len([l for l in lines if "BroadcastNestedLoopJoin" in l]),
        "windows": len([l for l in lines if re.search(r"\bWindow \[", l)]),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": len([l for l in lines
                               if "PushedFilters: [" in l and "PushedFilters: []" not in l]),
        "python_stages": len([l for l in lines
                              if "MapInPandas" in l or "ArrowEvalPython" in l
                              or "BatchEvalPython" in l or "FlatMapGroupsInPandas" in l]),
    }
    return d


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark("explain-audit")
    qs = entry_mod.queries()
    from bench import HEADLINE
    targets = names or [n for n in HEADLINE if n in qs]

    # AQE wraps everything in AdaptiveSparkPlan until execution, hiding the
    # WholeStageCodegen annotations — audit the static plan instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    print(f"{'query':24s} exch 1part bcast smj shj bnlj win codegen pushed py")
    for name in targets:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit_plan(plan)
        flags = []
        if a["single_part_exchanges"] > 1:
            flags.append("MULTI-1PART")
        if a["python_stages"] > 0 and name != "multimodal_features":
            flags.append("PYTHON")
        if a["codegen_stages"] == 0:
            flags.append("NO-CODEGEN")
        print(f"{name:24s} {a['exchanges']:4d} {a['single_part_exchanges']:5d} "
              f"{a['broadcast_joins']:5d} {a['smj']:3d} {a['shuffle_hash_joins']:3d} "
              f"{a['bnlj']:4d} {a['windows']:3d} {a['codegen_stages']:7d} "
              f"{a['pushed_filters']:6d} {a['python_stages']:2d}"
              + ("   " + ",".join(flags) if flags else ""))


if __name__ == "__main__":
    main()
