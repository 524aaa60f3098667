"""ML-layer tests: 3-headed predictor on the kiln pipeline output.

End-to-end: fixture tables → preprocessing pipeline → time split → fit →
evaluate. The fixture's single accretion event makes the binary head's
task learnable (the event zone cools 200 °C), so AUC must beat chance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseries_data_analysis_spark.ml import pipeline as ML
from timeseries_data_analysis_spark.plans import kiln_pipeline as KP
from tests.fixtures import kiln_fixture as FX

FEATURES = ["zones_with_drops", "accretion_risk_cooling_trends",
            "accretion_risk_drop_magnitude", "accretion_risk_drop_magnitude_max",
            "accretion_risk_mean_zone_temp", "accretion_risk_min_zone_temp"]


@pytest.fixture(scope="module")
def features_df(spark):
    tables = {k: spark.createDataFrame(v) for k, v in FX.all_tables().items()}
    out, _ = KP.run_pipeline(spark, tables, max_features=100)
    return out.select("ts", "accretion_forming", "days_to_critical",
                      "accretion_zone", *FEATURES).persist()


def test_time_split_order(features_df):
    train, test = ML.time_ordered_split(features_df, frac=0.8)
    n_train, n_test = train.count(), test.count()
    assert abs(n_train / (n_train + n_test) - 0.8) < 0.01
    assert train.agg(F.max("ts")).first()[0] < test.agg(F.min("ts")).first()[0]


def test_binary_head_learns(features_df):
    # split mid-event: forming spans days 20-35 of 60, so frac=0.5 puts
    # positives on both sides (train: days 20-30, test: days 30-35)
    train, test = ML.time_ordered_split(features_df, frac=0.5)
    model = ML.binary_head(FEATURES, max_iter=10).fit(train)
    metrics = ML.evaluate_binary(model, test)
    assert metrics["auc"] > 0.6, metrics
    assert 0 < metrics["accuracy"] <= 1


def test_days_head_regression(features_df):
    forming = features_df.filter(F.col("accretion_forming") == 1)
    train, test = ML.time_ordered_split(forming, frac=0.5)
    model = ML.days_head(FEATURES, max_iter=10).fit(train)
    m = ML.evaluate_regression(model, test)
    assert m["rmse"] < 16.0  # label range is 0..15 days
    assert m["mae"] >= 0


def test_feature_importances(features_df):
    train, _ = ML.time_ordered_split(features_df, frac=0.8)
    model = ML.binary_head(FEATURES, max_iter=5).fit(train)
    imp = ML.feature_importances(model, FEATURES, top_n=3)
    assert 1 <= len(imp) <= 3
    assert all(v >= 0 for _, v in imp)
    names = [n for n, _ in imp]
    assert set(names) <= set(FEATURES)


def test_prescriptor_roundtrip(features_df, spark):
    params = ["accretion_risk_mean_zone_temp"]
    train, _ = ML.time_ordered_split(features_df, frac=0.8)
    models = ML.prescriptor_fit(train, FEATURES, params, max_iter=5)
    current = features_df.orderBy(F.col("ts").desc()).limit(1)
    out = ML.prescribe(models, current,
                       bounds={"accretion_risk_mean_zone_temp": (700.0, 950.0, 5.0)},
                       top_n=3).toPandas()
    assert len(out) == 1
    rec = out["recommended"].iloc[0]
    assert 700.0 <= rec <= 950.0
    assert rec % 5.0 == 0  # step grid


def test_pipeline_model_persistence(features_df, tmp_path):
    train, test = ML.time_ordered_split(features_df, frac=0.8)
    model = ML.binary_head(FEATURES, max_iter=5).fit(train)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel
    loaded = PipelineModel.load(path)
    a = model.transform(test).select("prediction").toPandas()
    b = loaded.transform(test).select("prediction").toPandas()
    assert (a["prediction"] == b["prediction"]).all()
