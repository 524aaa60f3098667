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


def test_zone_head_and_evaluator(features_df):
    """Multiclass zone evaluator (reference models_backup.py:177-243):
    accuracy over valid zones only, class sets reported."""
    valid = features_df.filter(F.col("accretion_zone") >= 0)
    train, test = ML.time_ordered_split(valid, frac=0.5)
    model = ML.zone_head(FEATURES, num_trees=10).fit(train)
    m = ML.evaluate_zone(model, test)
    assert 0.0 <= m["accuracy"] <= 1.0
    assert m["unique_classes_truth"]  # fixture has one event zone
    # no-valid-zones branch: NaN accuracy, matching the reference
    import math
    empty = ML.evaluate_zone(model, features_df.filter(F.col("accretion_zone") < 0))
    assert math.isnan(empty["accuracy"])


def test_oversample_minority_counts(spark):
    """Noise-jitter augmentation (reference models.py:771-796): exact
    deterministic target count, originals preserved, jitter on features
    only."""
    import pandas as pd
    n = 400
    pdf = pd.DataFrame({
        "id": range(n),
        "label": [1 if i % 100 == 0 else 0 for i in range(n)],  # 4 positives
        "f1": [float(i % 7) for i in range(n)],
    })
    df = spark.createDataFrame(pdf)
    aug = ML.oversample_minority(df, "label", ["f1"], order_cols=["id"])
    counts = {r["label"]: r["n"] for r in
              aug.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    # needed = min(400//4, 1000) - 4 = 96 -> 100 positives total
    assert counts[1] == 100
    assert counts[0] == 396  # negatives untouched
    # balanced input: no-op
    bal = spark.createDataFrame(pd.DataFrame(
        {"id": range(40), "label": [i % 2 for i in range(40)],
         "f1": [0.0] * 40}))
    assert ML.oversample_minority(bal, "label", ["f1"],
                                  order_cols=["id"]).count() == 40


def test_oversample_minority_no_global_window(spark):
    """Scale guard: the remainder distribution must never funnel all
    positives through one partition — the row_number windows are
    partitioned by hash bucket, so the executed plan of the augmented
    frame contains no single-partition shuffle."""
    import pandas as pd
    n = 4000
    pdf = pd.DataFrame({
        "id": range(n),
        "label": [1 if i % 10 == 0 else 0 for i in range(n)],  # 400 pos
        "f1": [float(i % 7) for i in range(n)],
    })
    # force the trigger: 400 pos / 4000 = 10%, use min_frac above that
    df = spark.createDataFrame(pdf)
    aug = ML.oversample_minority(df, "label", ["f1"], order_cols=["id"],
                                 min_frac=0.2, cap=2000)
    plan = aug._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # exact arithmetic still holds: needed = min(1000, 2000) - 400 = 600
    counts = {r["label"]: r["n"] for r in
              aug.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[1] == 1000 and counts[0] == 3600


def test_incremental_trainer_warm_updates(features_df, tmp_path):
    """T4 incremental update (reference models_backup.py:311-420): each
    batch refits on a bounded replay buffer; history mirrors the
    reference's training_history."""
    trainer = ML.IncrementalTrainer(
        lambda: ML.binary_head(FEATURES, max_iter=5),
        buffer_path=str(tmp_path / "buf"),
        buffer_batches=2)
    b1, rest = ML.time_ordered_split(features_df, frac=0.4)
    b2, b3 = ML.time_ordered_split(rest, frac=0.5)
    for i, b in enumerate([b1, b2, b3]):
        trainer.update(b.select("ts", "accretion_forming", *FEATURES), i)
    assert trainer.model is not None
    assert len(trainer.history) == 3
    # bounded buffer: batch 3 trains on batches {1,2} only
    n12 = b2.count() + b3.count()
    assert trainer.history[-1]["samples"] == n12
    # the refit model still predicts
    pred = trainer.model.transform(
        b3.select("ts", "accretion_forming", *FEATURES))
    assert pred.select("prediction").count() == b3.count()


def test_category_codes_max_vocab_guard(spark):
    """The bounded-vocabulary contract is enforceable: max_vocab raises
    on a column whose cardinality exceeds the bound, and passes through
    unchanged when the vocab fits."""
    from timeseries_data_analysis_spark.operators.encoding import category_codes
    df = spark.range(0, 100).select(
        (F.col("id") % 50).cast("string").alias("c"))
    with pytest.raises(ValueError, match="more than 10 distinct"):
        category_codes(df, "c", max_vocab=10)
    ok = category_codes(df, "c", max_vocab=64)
    assert ok.select("c_code").distinct().count() == 50
