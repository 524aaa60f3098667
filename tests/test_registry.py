"""Pins the `queries()` registry rotation: the driver's correctness gate
checks the FIRST 50 entries per round, so registry order is the de-facto
evidence scheduler. A silent reorder could starve a row of its gate
slot; this test makes the round-9 window an explicit, reviewed contract.

Round-9 rotation policy (VERDICT r8 "Next round" #2): the
never-driver-checked ledger has been empty since round 8, so the window
now rotates on evidence FRESHNESS — new round-9 queries first (never
checked = oldest debt), then the 50 rows whose latest driver-green is
round 3 (the stalest evidence in the registry), in CORRECTNESS_r03
order. The stale rows the new queries push past slot 50 lead the
round-10 rotation.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

# Round-9 new queries (newest-first), occupying the head of the gate
# window. Appending here is part of adding a query.
ROUND9_NEW: list[str] = [
    "embedding_isotropy", "term_burstiness", "heaps_law",
    "garch_vol",
    "grubbs_outlier", "cochran_q", "seasonal_mann_kendall",
    "variance_ratio", "dunn_posthoc",
    "engle_granger", "granger_causality",
    "chow_test", "aic_order_select", "adf_test",
    "page_hinkley", "friedman_test", "kruskal_wallis", "welch_ttest",
    "jarque_bera",
    "als_rankk_backtest", "kendall_tau", "levene_test",
    "hurst_daily", "cvm_drift_daily", "mann_whitney_daily",
    "runs_test_daily", "ljung_box_daily",
]
# The complete stale-evidence ledger: every registry row whose latest
# driver-green is round 3 (verified against the r1-r8 CORRECTNESS
# union), in CORRECTNESS_r03 order. len(ROUND9_NEW) of these fall past
# slot 50 and are the documented round-10 front.
STALE_LEDGER_50 = [
    "null_profile", "zone_drop_counts", "multi_zone_cooling",
    "dummies_top", "token_entropy", "winnow_fingerprints", "ivf_topk",
    "cubic_interp", "rollup_totals", "ntile_quartiles", "running_total",
    "first_last", "daily_trend", "accretion_status", "quality_scatter",
    "oversample_counts", "hash_split", "stratified_sample",
    "decontaminate", "doc_repetition", "source_mix", "pack_documents",
    "confusion_eval", "calibration_bins", "pq_topk", "ivf_pq_topk",
    "simhash48_pairs", "seasonal_baseline", "spine_ffill", "interpolate",
    "fill_chain", "hourly_spine", "savgol_smooth", "lag_features",
    "rolling_stats", "rolling_min_periods", "zscore", "diff_pct_change",
    "cooling_runs", "anomaly_detect", "baseline_ratio",
    "sequence_windows", "interval_join", "asof_join",
    "label_events_full", "latest_per_user", "pivot_event_types",
    "melt_metrics", "dup_collapse", "hourly_downsample",
]


def test_gate_window_matches_documented_rotation():
    keys = list(entry_mod.queries())
    n9 = len(ROUND9_NEW)
    assert keys[:n9] == ROUND9_NEW
    assert keys[n9:n9 + 50] == STALE_LEDGER_50


def test_registry_and_oracles_are_bijective():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert len(qs) >= 291
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


def test_driver_gate_report_has_no_red_rows():
    """Regression tripwire (VERDICT r8 'Next round' #6): when the
    driver has written this round's gate report, a red row in it must
    fail the SUITE, not just sit in a JSON file nobody reruns. Skips
    gracefully before the driver's first gate run of the round."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CORRECTNESS_r09.json")
    if not os.path.exists(path):
        pytest.skip("driver has not written CORRECTNESS_r09.json yet")
    with open(path) as f:
        report = json.load(f)
    red = {k: v for k, v in report.items()
           if not (v.get("rows_match") and v.get("schema_match")
                   and v.get("hash_match") and v.get("err") is None)}
    assert not red, f"driver gate regressions: {sorted(red)}"
