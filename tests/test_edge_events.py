"""Adversarial mini-gate #2: the events-based query family on crafted
edge data, hash-compared against the production DuckDB oracles.

Edge shapes the generated sf corpora never produce: NULL and NaN values,
NULL event_type, duplicate (user, ts) rows, identical timestamps across
users, a single-event user, zero/negative/huge values. Queries must
agree cross-engine on all of them (div-by-zero guards, null window
frames, tie-breaks).
"""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                "tools"))

import __spark_entry__ as entry_mod  # noqa: E402
from check_oracles import norm, value_hash  # noqa: E402


def _edge_events() -> pd.DataFrame:
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(user, ts, value, etype):
        nonlocal eid
        rows.append((eid, user, ts, value, etype))
        eid += 1

    types = ["click", "view", "purchase", "signup", "error"]
    # regular-ish activity for three users over 3 weeks (covers the
    # retention windows 01-01..01-15), hourly grain with value variety
    for u in (1, 2, 3):
        for d in range(18):
            for h in (3, 9, 15, 21):
                ts = base + timedelta(days=d, hours=h, minutes=u)
                v = 50.0 + 10 * u + d - h / 2
                add(u, ts, v, types[(d + h + u) % 5])
    # duplicate (user, ts) pair — dup_collapse / tie-break territory
    dup_ts = base + timedelta(days=2, hours=9, minutes=1)
    add(1, dup_ts, 10.0, "click")
    add(1, dup_ts, 30.0, "click")
    # identical ts across users
    shared = base + timedelta(days=5, hours=15)
    for u in (1, 2, 3):
        add(u, shared, 77.0, "view")
    # NULL values, NaN values, NULL event_type
    add(2, base + timedelta(days=6, hours=3, minutes=30), None, "click")
    add(2, base + timedelta(days=6, hours=4, minutes=30), float("nan"), "view")
    add(3, base + timedelta(days=7, hours=5), 42.0, None)
    add(3, base + timedelta(days=7, hours=6), None, None)
    # zero / negative / large magnitudes. Deliberately 1e9, NOT 1e15:
    # at 1e15 the double ulp is ~0.125, so any sum mixing that row with
    # ~50-magnitude values becomes summation-ORDER-dependent beyond the
    # 4-decimal rounding contract — no engine pair (or even one engine
    # under different partitioning) can hash-agree there. 1e9 keeps the
    # magnitude stress with ~1e-7 ulp, far inside the contract.
    add(1, base + timedelta(days=8, hours=1), 0.0, "purchase")
    add(1, base + timedelta(days=8, hours=2), -5.5, "error")
    add(2, base + timedelta(days=8, hours=3), 1.0e9, "click")
    add(2, base + timedelta(days=8, hours=4), 1.0e-12, "view")
    # single-event user (empty window frames, lag=NULL paths)
    add(4, base + timedelta(days=9, hours=12), 99.0, "signup")
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value", "event_type"])
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf["user_id"] = pdf["user_id"].astype("int64")
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    # props: JSON wire column with edge payloads — valid, malformed,
    # empty, NULL, null-valued key, nested, wrong-typed
    props_cycle = ['{"k": 7}', "{k:", "", None, '{"k": null}',
                   '{"k": 3, "nested": {"x": 1}}', '{"k": "str"}',
                   "[1,2,3]"]
    pdf["props"] = [props_cycle[i % len(props_cycle)]
                    for i in range(len(pdf))]
    return pdf


EVENT_QUERIES = [
    "null_profile", "zone_drop_counts", "multi_zone_cooling", "dummies_top",
    "hourly_downsample", "dup_collapse", "value_counts_topn",
    "distinct_users", "latest_per_user", "lag_features", "zscore",
    "diff_pct_change", "cooling_runs", "anomaly_detect", "sequence_windows",
    "gap_detect", "sessionize", "time_rolling", "group_standardize", "ewma",
    "running_total", "first_last", "ntile_quartiles", "daily_trend",
    "calendar_features", "moments", "histogram", "percentile_summary",
    "retention", "funnel", "cooccurrence", "hash_split", "stratified_sample",
    "confusion_eval", "calibration_bins", "seasonal_baseline",
    "oversample_counts", "cat_codes", "rank_distribution",
    # resample / fill / window-frame family (NULL bridging, duplicate
    # knots, single-point series) + the JSON wire column
    "spine_ffill", "interpolate", "fill_chain", "savgol_smooth",
    "hourly_spine", "interval_join", "baseline_ratio", "rolling_stats",
    "rolling_min_periods", "stride_sample", "topk_per_type", "time_split",
    "time_range_filter", "isin_sample", "pivot_event_types",
    "cubic_interp", "json_extract",
    # interval labeling, skew-salting, SAX indexing, serving panels
    "label_events_full", "salted_agg", "robust_scale_params",
    "paa_sax", "series_similarity", "sax_bucket_search", "accretion_status",
    # round 4: nearest-direction as-of
    "asof_nearest",
    # round 5 second batch: integer-micro CUSUM + seasonal backtest
    # (degenerate series, duplicate timestamps, NULL-adjacent paths)
    "cusum_changepoints", "seasonal_forecast_eval",
    "spearman_lag1", "winsorize_stats", "rolling_robust",
    "transition_matrix", "skew_report", "active_users", "cohort_retention",
    # round 6: exact EWMA, deterministic quantile sketch + rollup,
    # robust regression, ensemble outliers, KMV union, KS drift,
    # Holt-Winters (short-series skip + NULL-key contracts on the
    # NULL/NaN/duplicate-ts shapes the sf corpora never produce)
    "ewma_exact", "kll_quantiles", "kll_rollup", "robust_regression",
    "anomaly_ensemble", "theta_union_distinct", "ks_drift",
    "holt_winters",
    # round 6 continuation: conformal (the fixture ends before the
    # Jan-20 split, so the CALIBRATION SIDE IS EMPTY — both engines
    # must agree on the empty-result path), k-fold + OOF encoding
    # (NULL event_type rows drop out of the equi-join identically)
    "conformal_interval", "group_kfold", "target_encode_oof",
    # PR-AUC / mSPRT on the NULL/duplicate-score shapes. NOTE on the
    # fixture's float('nan') row: pandas.to_parquet stores a float NaN
    # as NULL, so no true NaN ever reaches either engine here — which
    # is why both queries EXCLUDE NaN scores explicitly (review found
    # the engines genuinely disagree on a negated-NaN sort order, so
    # NaN-out is the contract, not an assumption)
    "pr_auc",
    "msprt_monitor",
    # round 8: nonparametric inference + changepoint + FDR on the
    # NULL-key / duplicate-value / tie-heavy shapes. Degenerate-series
    # exclusions (ljung_box n<=6 or constant, runs_test one-sided) are
    # part of the cross-engine contract these rows exercise; NULL
    # event_type series drop out of every stats join identically.
    "mann_kendall", "mann_whitney", "runs_test", "ljung_box",
    "binseg_changepoint", "logrank_test", "bh_fdr", "ar2_forecast",
    "hurst_exponent",
    # cvm_drift is rank-based (magnitude-normalized), so the 1e9
    # fixture row is in contract. seasonal_strength is NOT here for
    # the kmeans_step/pca2_axes reason: var_pop over the 1e9-magnitude
    # row carries summation-order ulps (~1e2 absolute on a ~1e17
    # variance) the 6-dp contract cannot absorb; the sf-corpus gate
    # compares its variance algebra exactly.
    "cvm_drift",
    # round 9: the bounded-grain daily twins exercise the SAME
    # degenerate shapes at the daily grain (short series n<=6 days,
    # constant daily means, one-sided signs); kendall_tau adds the
    # cross-series paired-day path (NULL event_type drops out of the
    # self-join identically; all-tied pairs excluded on both engines).
    # levene_test is NOT here for the seasonal_strength reason: its
    # within-group SS over the 1e9-magnitude row carries summation-
    # order ulps (~1e2 absolute on a ~1e18 SS) the 6-dp contract
    # cannot absorb; the sf-corpus gate compares its SS algebra
    # exactly.
    "ljung_box_daily", "runs_test_daily", "mann_whitney_daily",
    "cvm_drift_daily", "hurst_daily", "kendall_tau",
    # round 10: exact-comparison / rank / count / pinned-recursion
    # queries are in contract with the 1e9 row (slopes and drawdowns
    # difference 6-dp daily means exactly; hp_filter's banded LU is a
    # pinned SEQUENTIAL recursion — no unordered summation anywhere;
    # Benford's digit comes from an exact integer string; burstiness/
    # gini see timestamps/counts, not values; brier clamps to [0,1]).
    # kpss_test / sample_entropy / garch_select / ar1_halflife /
    # acf_daily / pacf_daily are NOT here for the levene_test reason
    # (variance, covariance, or tolerance algebra over the 1e9 row
    # carries summation-order ulps past the 6-dp contract); they get
    # their exact-algebra comparison at the sf-corpus gate.
    "theil_sen_daily", "max_drawdown", "peak_detect", "spearman_daily",
    "hp_filter", "interarrival_burstiness", "gini_concentration",
    "benford_values", "brier_decomposition",
    # round 10 wave 2: croston/entropy_rate see counts and integer hour
    # indices only; mde_power is NOT here (levene_test reason).
    "croston_demand", "entropy_rate",
    # round 10 wave 3: funnel_depth compares exact timestamps;
    # lorenz_deciles sees counts only. seasonal_outliers is NOT here
    # (its round moments over the 1e9-deviation row are the
    # levene_test summation-ulp class).
    "funnel_depth", "lorenz_deciles",
    "dau_wau_mau", "time_to_convert", "prop_ztest", "activity_powerlaw",
    # round 9 econometrics batch: the RANK-based k-sample tests are
    # magnitude-normalized, so the 1e9 fixture row is in contract
    # (joint/within-day ranks compare identical 6-dp decimals).
    # jarque_bera is NOT here (4th central moments of the 1e9 row are
    # ~1e36 — summation-order ulps the 6-dp contract cannot absorb);
    # welch_ttest and page_hinkley are NOT here for the levene_test
    # reason (variance / cumulative-sum algebra over the 1e9 row);
    # all three get their exact-algebra comparison at the sf-corpus
    # gate instead. The OLS family (adf_test, aic_order_select,
    # chow_test, granger_causality, engle_granger) is also excluded
    # here: their moment sums square/cross the 1e9 row (~1e18
    # magnitudes) where summation-order ulps exceed the 6-dp
    # contract; the sf-corpus gate compares their Cramer/SSE algebra
    # exactly. garch_vol is excluded for the same reason (its
    # difference-variance and r² terms square the 1e9 row).
    "kruskal_wallis", "friedman_test",
    # batch C: dunn_posthoc shares KW's rank pool (magnitude-
    # normalized); seasonal_mann_kendall is sign-based; cochran_q
    # binarizes on exact 6-dp median compares. variance_ratio and
    # grubbs_outlier are NOT here (squared raw diffs / stddev over
    # the 1e9 row — the levene_test summation-ulp reason).
    "dunn_posthoc", "seasonal_mann_kendall", "cochran_q",
    # round 11: the HLL panel is md5/count algebra; KS and Pettitt are
    # rank/count-based (magnitude-normalized); permutation_entropy is
    # ordinal compares on 6-dp decimals; markov_stationary is pure
    # transition counts + a pinned bounded iteration. bartlett_test is
    # NOT here (variances over the 1e9 row — the levene_test
    # summation-ulp class); haar_energy is NOT here (squared block
    # differences of the 1e9 row, same class); rsi_daily is NOT here
    # (its NaN daily mean hits divergent NaN-comparison semantics:
    # the Python fold's `d > 0` is False for NaN while DuckDB orders
    # NaN greater — the sf-corpus gate compares the exact fold
    # instead).
    "dau_wau_mau_hll", "ks_2sample", "pettitt_test",
    "permutation_entropy", "markov_stationary",
    # round 11 batch 2: turning/records compare 6-dp daily means under
    # both engines' shared NaN-is-greatest total order — strict
    # compares stay consistent. gumbel_maxima is NOT here (stddev of
    # daily maxima squares the 1e9 row — the levene_test summation-ulp
    # class).
    "turning_points", "records_test",
    # round 11 batch 3: mmd_drift's kernel cells are exp(−Δ²/2σ²) of
    # identical 6-dp decimals — the 1e9 row enters σ and the cells as
    # the same doubles on both engines; ≤4k-term sums at 6 dp.
    # cusum_squares is NOT here (running sums of squares of the 1e9
    # row — the levene_test summation-ulp class).
    "mmd_drift",
]


@pytest.fixture(scope="module")
def edge_env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    _edge_events().to_parquet(str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    return str(d), con


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_edge_events_cross_engine(spark, edge_env, name):
    sf_dir, con = edge_env
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = norm(qs[name](spark, sf_dir).toPandas())
    odf = norm(con.execute(oracles[name]).fetchdf())
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf), \
        f"{name}: cross-engine hash mismatch on edge events"
