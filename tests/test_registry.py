"""Pins the `queries()` registry rotation: the driver's correctness gate
checks the FIRST 50 entries per round, so registry order is the de-facto
evidence scheduler. A silent reorder could starve a never-driver-checked
row of its gate slot; this test makes the round-8 window an explicit,
reviewed contract.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

# Round-8 gate window head: slots 1-22 are the COMPLETE never-driver-
# checked ledger as of round 7 (VERDICT r7 "Next round" #1) — the
# documented round-7 spill (TPC-H Q17/Q19 shapes), the 12 round-7 TPC-H
# shapes, and the 8 round-7 analytics ops. Round-8 NEW additions slot in
# directly after (newest-code-first); anything past slot 50 is already
# driver-green from r07 or earlier, so no row can be starved.
LEDGER_22 = [
    "small_qty_revenue", "bracketed_revenue",
    "discounted_revenue", "nation_trade_volume", "market_share",
    "product_type_profit", "late_line_priority", "custdist",
    "promo_revenue_share", "large_volume_customers", "waiting_suppliers",
    "min_cost_supplier", "important_stock", "excess_stock_suppliers",
    "periodogram", "hits_authority", "nb_langid", "als_rank1",
    "silhouette_audit", "ppr_trust", "link_prediction", "nelson_aalen",
]
# Round-8 additions occupying slots 23+ (newest-first), kept in sync as
# round 8 lands queries. Appending here is part of adding a query.
ROUND8_NEW: list[str] = [
    "cvm_drift", "seasonal_strength",
    "spectral_entropy", "cramers_v", "mcnemar",
    "hurst_exponent", "ar2_forecast", "l_diversity", "rbo_rankings",
    "ljung_box", "runs_test",
    "bh_fdr", "matryoshka_audit", "binseg_changepoint",
    "mann_kendall", "mann_whitney", "logrank_test",
    "isotonic_calibration", "silhouette_trained", "als_rank2",
]
# Rows already driver-green (CORRECTNESS_r07 and earlier) that fill the
# rest of the 50-row window — safe filler, any order.
DRIVER_GREEN_FILLER_HEAD = ["pagerank_capped", "roc_auc"]


def test_gate_window_matches_documented_rotation():
    keys = list(entry_mod.queries())
    assert keys[:22] == LEDGER_22
    n8 = len(ROUND8_NEW)
    assert keys[22:22 + n8] == ROUND8_NEW
    assert keys[22 + n8:24 + n8] == DRIVER_GREEN_FILLER_HEAD


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
