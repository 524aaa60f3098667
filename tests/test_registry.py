"""Pins the `queries()` registry rotation: the driver's correctness gate
checks the FIRST 50 entries per round, so registry order is the de-facto
evidence scheduler. A silent reorder could starve a never-driver-checked
row of its gate slot; this test makes the round-7 window (and the
documented round-8 spill) an explicit, reviewed contract.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

# Round-7 gate window: slot 1 is the round-7 addition (pagerank_capped —
# the oracle-checked max_bucket pair-build cap), slots 2-50 are 49 of the
# 51 round-6 rows that had never been driver-checked. Slots 51-52 are the
# documented spill to round 8 (pure built-in TPC-H Q17/Q19 shapes, the
# least-at-risk of the 51).
ROUND7_WINDOW = [
    "pagerank_capped",
    "roc_auc", "pacf_yw", "js_divergence", "hll_distinct",
    "degree_distribution", "bfs_hops", "bootstrap_ci", "kalman_level",
    "bm25_topk", "basket_lift", "ab_test", "entity_resolution",
    "rolling_corr", "kaplan_meier", "bloom_prejoin", "zorder_layout",
    "diff_in_diff", "pareto_front", "uplift_deciles", "containment_dedup",
    "containment_capped", "kcore", "dq_suite", "forecast_backtest",
    "rfm_segments", "neyman_allocation", "quality_logit",
    "conformal_interval", "regional_supplier_volume", "top_supplier_share",
    "community_labelprop", "pca2_axes", "group_kfold", "target_encode_oof",
    "woe_iv", "feature_hashing", "community_modularity",
    "degree_assortativity", "int8_quant_audit", "pr_auc",
    "join_cardinality", "semantic_decontaminate", "msprt_monitor",
    "quantile_sgd", "shipping_priority", "order_priority_counts",
    "returned_item_revenue", "supplier_part_variety", "idle_rich_customers",
]
ROUND8_SPILL = ["small_qty_revenue", "bracketed_revenue"]


def test_gate_window_matches_documented_rotation():
    keys = list(entry_mod.queries())
    assert keys[:50] == ROUND7_WINDOW
    assert keys[50:52] == ROUND8_SPILL


def test_registry_and_oracles_are_bijective():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert len(qs) >= 251
    # every query has a value-level oracle and vice versa — no weaker
    # rows-only checks hiding in the registry
    assert set(qs) == set(osql)


def test_no_duplicate_keys_in_registry_source():
    """A dict literal silently keeps the LAST binding of a duplicated
    key, shrinking the registry by one and shifting every later gate
    slot — the silent reorder this file exists to catch. A dict-level
    uniqueness check is a tautology, so count the quoted keys in the
    SOURCE of queries() instead."""
    import inspect
    import re

    src = inspect.getsource(entry_mod.queries)
    keys = re.findall(r'^\s+"([a-z0-9_]+)":\s*q_', src, re.MULTILINE)
    assert len(keys) == len(set(keys)), sorted(
        k for k in set(keys) if keys.count(k) > 1)
    assert len(keys) == len(entry_mod.queries())
