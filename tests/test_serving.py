"""Serving-view tests (SURVEY.md §2.12): each dashboard chart query runs
as a SQL view over the kiln tables and returns sane results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.fixtures import kiln_fixture as FX
from timeseries_data_analysis_spark.operators import pivot as PV
from timeseries_data_analysis_spark.plans import serving


@pytest.fixture(scope="module")
def views(spark):
    pdfs = FX.all_tables(n_days=20)
    for name in ("mis_report", "shell_temperature", "accretion_events"):
        spark.createDataFrame(pdfs[name]).createOrReplaceTempView(name)
    zone_long = PV.melt(spark.createDataFrame(pdfs["zone_temperature"]),
                        ["DATETIME"], key_name="series", value_name="value") \
        .withColumnRenamed("DATETIME", "ts")
    zone_long.createOrReplaceTempView("zone_temperature_long")
    return serving.register_views(spark, start="2024-06-05", stride=10)


def test_all_views_created(spark, views):
    assert len(views) == len(serving.VIEWS)
    for v in views:
        assert spark.sql(f"SELECT * FROM {v} LIMIT 1").columns


def test_zone_trends_stride_and_filter(spark, views):
    out = spark.sql("SELECT * FROM v_zone_trends").toPandas()
    assert out["ts"].min() >= __import__("pandas").Timestamp("2024-06-05")
    # stride 10 on a 10-min grid → hourly points; 11 series
    per_series = out.groupby("series").size()
    assert len(per_series) == 11
    assert per_series.nunique() == 1


def test_production_quality_zero_guard(spark, views):
    out = spark.sql("SELECT * FROM v_production_quality").toPandas()
    # maintenance days: production 0 → pct 0, never inf/NaN
    maint = out[out["production"] == 0]
    assert len(maint) > 0
    assert (maint["grade_a_pct"] == 0).all()
    ok = out[out["production"] > 0]
    assert ((ok["grade_a_pct"] > 0) & (ok["grade_a_pct"] <= 100)).all()


def test_quality_join_and_latest_probe(spark, views):
    j = spark.sql("SELECT * FROM v_quality_vs_accretion").toPandas()
    assert len(j) == 20  # inner join on 20 fixture days
    assert j["mean_shell_temp"].notna().all()
    latest = spark.sql("SELECT * FROM v_latest_mis").toPandas()
    assert len(latest) == 1
    assert latest["DATE"].iloc[0] == j["day"].max()


def test_events_timeline_classes(spark, views):
    out = spark.sql("SELECT * FROM v_events_timeline").toPandas()
    assert len(out) == 1
    assert out["severity_class"].iloc[0] == "mild"  # 20-day fixture event


def test_accretion_status_rules(spark, views):
    """dashboard.py:812-924: latest temp per zone vs the per-zone
    threshold map; >=3 low zones => 'temperature_anomaly'."""
    out = spark.sql("SELECT * FROM v_accretion_status").toPandas()
    assert len(out) == 11  # one row per zone
    assert set(out["zone"]) == set(range(11))
    # rule consistency: is_low matches temp < thr; one global status
    assert ((out["temp"] < out["thr"]).astype(int) == out["is_low"]).all()
    assert out["n_low_zones"].nunique() == 1
    expect = ("temperature_anomaly" if out["is_low"].sum() >= 3 else "normal")
    assert (out["status"] == expect).all()
    assert out["model_probability"].isna().all()  # ML hook, not engine


def test_quality_grades_scatter_pairs(spark, views):
    """dashboard.py:1738-1839: pairwise (grade x material) long source —
    every day emits all 6 pairs with values copied from mis_report."""
    out = spark.sql("SELECT * FROM v_quality_grades_scatter").toPandas()
    assert len(out) == 20 * 2 * 3
    assert set(out["grade_name"]) == {"GRADE_A", "GRADE_B"}
    assert set(out["material_name"]) == {"IRON_ORE", "GROSS_COAL", "PELLETS"}
    mis = spark.sql("SELECT * FROM mis_report").toPandas()
    day0 = mis["DATE"].iloc[0]
    row = out[(out["day"] == day0) & (out["grade_name"] == "GRADE_A")
              & (out["material_name"] == "IRON_ORE")]
    assert len(row) == 1
    assert row["grade_value"].iloc[0] == mis["GRADE_A"].iloc[0]
    assert row["material_value"].iloc[0] == mis["IRON ORE CONSUMPTION"].iloc[0]
