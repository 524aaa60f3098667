"""Pipeline-level golden tests on kiln-shaped fixtures (SURVEY.md §5.2-2).

The fixture injects one accretion event with known [start, critical)
boundaries, a maintenance gap, duplicate rows, and a long NaN run — the
semantic traps from SURVEY.md §7.4 — and the tests assert the Spark
pipeline reproduces the reference's labeling/fill/window semantics.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_analysis_spark.plans import kiln_pipeline as KP
from tests.fixtures import kiln_fixture as FX


@pytest.fixture(scope="module")
def tables(spark):
    pdfs = FX.all_tables()
    return {name: spark.createDataFrame(pdf) for name, pdf in pdfs.items()}


@pytest.fixture(scope="module")
def pipeline_result(spark, tables):
    out, metrics = KP.run_pipeline(spark, tables, max_features=500)
    pdf = out.toPandas().sort_values("ts").reset_index(drop=True)
    return pdf, metrics


def test_shape_and_grain(pipeline_result):
    pdf, _ = pipeline_result
    # hourly grain, one row per hour, spanning the fixture's 60 days
    assert pdf["ts"].is_unique
    deltas = pdf["ts"].diff().dropna().unique()
    assert list(deltas) == [pd.Timedelta(hours=1)]
    assert len(pdf) >= 59 * 24


def test_no_unfilled_sensor_values(pipeline_result):
    pdf, _ = pipeline_result
    zone_cols = [c for c in pdf.columns if c.startswith("zone_ZONE_")]
    assert zone_cols, "zone series missing from wide output"
    # stage-3 fill chain ends in 0.0 — aligned sensor values are never null
    assert pdf[zone_cols].notna().all().all()


def test_event_labeling_matches_truth(pipeline_result):
    pdf, _ = pipeline_result
    ev = FX.EVENT
    forming = pdf[pdf["accretion_forming"] == 1]["ts"]
    # forming window is [start, critical) exactly (J3 boundary semantics)
    assert forming.min() == ev["START_DATE"]
    assert forming.max() == ev["CRITICAL_DATE"] - pd.Timedelta(hours=1)
    critical = pdf[pdf["accretion_critical"] == 1]["ts"]
    assert critical.min() == ev["CRITICAL_DATE"]
    # zone label carried through
    assert set(pdf[pdf["accretion_forming"] == 1]["accretion_zone"]) == {ev["ZONE"]}


def test_days_to_critical_decreases_to_zero(pipeline_result):
    pdf, _ = pipeline_result
    ev = FX.EVENT
    f = pdf[pdf["accretion_forming"] == 1].sort_values("ts")
    d = f["days_to_critical"]
    assert (d.diff().dropna() < 0).all()
    assert abs(d.iloc[0] - 15.0) < 1e-9  # critical − start = 15 days
    assert d.iloc[-1] > 0


def test_pre_critical_windows_nested(pipeline_result):
    pdf, _ = pipeline_result
    n24 = int(pdf["pre_critical_24h"].sum())
    n48 = int(pdf["pre_critical_48h"].sum())
    n72 = int(pdf["pre_critical_72h"].sum())
    assert n24 == 24 and n48 == 48 and n72 == 72
    # nesting: every 24h row is also a 48h and 72h row
    sub = pdf[pdf["pre_critical_24h"] == 1]
    assert (sub["pre_critical_48h"] == 1).all()
    assert (sub["pre_critical_72h"] == 1).all()


def test_anomaly_detector_fires_in_event_zone(pipeline_result):
    pdf, _ = pipeline_result
    ev = FX.EVENT
    # the event zone cools 200°C into CRITICAL_DATE: drops must be flagged,
    # which surface as nonzero zones_with_drops during the forming window
    forming = pdf[(pdf["ts"] >= ev["START_DATE"]) & (pdf["ts"] < ev["CRITICAL_DATE"])]
    assert forming["zones_with_drops"].max() >= 1
    assert forming["max_drop_magnitude"].max() > 0
    before = pdf[pdf["ts"] < ev["START_DATE"] - pd.Timedelta(days=2)]
    # quiet period: mean drop count strictly below the forming window's
    assert before["zones_with_drops"].mean() < forming["zones_with_drops"].mean()


def test_ratios_present_and_guarded(pipeline_result):
    pdf, _ = pipeline_result
    assert "plan_attainment" in pdf.columns
    # maintenance days have PLAN=0 → safe_div yields 0, never inf/NaN
    import numpy as np
    vals = pdf["plan_attainment"].dropna()
    assert np.isfinite(vals).all()


def test_feature_cap(spark, tables):
    out, _ = KP.run_pipeline(spark, tables, max_features=30)
    assert len(out.columns) <= 31 + 10  # ts + cap + always-kept priority block
    # priority columns survive the cap
    assert "accretion_forming" in out.columns
    assert "zones_with_drops" in out.columns


def test_single_window_exchange(spark, tables):
    """Scale check: the per-series window features reuse ONE exchange —
    the physical plan must contain exactly one shuffle on series for all
    window columns (SURVEY.md §4 point 3)."""
    # drop cached plans from earlier fixtures — cache substitution splices
    # the cached build plan (with its own exchanges) into the plan string
    spark.catalog.clearCache()
    sensor = KP.build_long_sensor_table(tables)
    aligned = KP.align_and_fill(sensor)
    feat = KP.window_features(aligned)
    plan = feat._jdf.queryExecution().executedPlan().toString()
    # every window feature shares partitioning; hashpartitioning(series)
    # appears in exchanges — count distinct Exchange nodes on series only
    exchanges = [ln for ln in plan.split("\n") if "Exchange hashpartitioning" in ln]
    # exchanges keyed on series alone (the window partitioning); join
    # exchanges on (ts, series) are counted separately and are expected
    series_exchanges = [ln for ln in exchanges
                        if "hashpartitioning(series" in ln]
    assert len(series_exchanges) <= 2, plan  # explicit repartition (+cache edge)
