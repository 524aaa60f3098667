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
