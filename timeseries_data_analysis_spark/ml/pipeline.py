"""Spark ML layer (SURVEY.md §2.11) — the reference's model surface on Spark ML.

Reference: a 3-headed predictor (binary "is accretion forming" classifier,
days-to-critical regressor, zone multi-class classifier) built on
RF/XGB/LGBM (``models_backup.py:12-243`` decoded), plus a per-parameter
prescriptor with clip/step-round action spaces (``models_backup.py:427-623``),
trained on a time-ordered 80/20 split (``train_models_simple.py:324-328``).

Spark mapping:
- imputer→assembler→scaler→model as ONE ``Pipeline`` (fit artifacts
  persist via Spark ML's native save/load, replacing joblib pickles S4);
- GBT/RandomForest stand in for XGB/LGBM (same tree-ensemble family,
  in-box); heads share one feature preparation;
- the time split is a ``filter(ts <= quantile)`` — never a shuffle;
- evaluators: areaUnderROC / accuracy / rmse — the reference's
  ``evaluate()`` metric set;
- prescriptor: one regressor per controllable parameter + ``least/
  greatest`` clip + ``round(x/step)*step`` — top-N by predicted impact.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier, RandomForestClassifier
from pyspark.ml.evaluation import (BinaryClassificationEvaluator,
                                   MulticlassClassificationEvaluator,
                                   RegressionEvaluator)
from pyspark.ml.feature import Imputer, StandardScaler, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_ordered_split(df: DataFrame, ts_col: str = "ts",
                       frac: float = 0.8) -> tuple[DataFrame, DataFrame]:
    """80/20 split at the interpolated time quantile — order-preserving,
    no shuffle (reference train_models_simple.py:324-328)."""
    q = df.agg(F.percentile(F.unix_micros(ts_col), frac).alias("q"))
    b = F.broadcast(q)
    train = df.join(b).filter(F.unix_micros(ts_col).cast("double") <= F.col("q")).drop("q")
    test = df.join(b).filter(F.unix_micros(ts_col).cast("double") > F.col("q")).drop("q")
    return train, test


def feature_prep(feature_cols: list[str], impute: bool = True,
                 scale: bool = True) -> list:
    """Shared head-independent stages: median-impute → assemble → scale.

    KNN imputation (reference pre_processing.py:269-273) has no scalable
    equivalent — median Imputer substituted per SURVEY.md §2.10.
    """
    stages: list = []
    cols = feature_cols
    if impute:
        imputed = [f"{c}__imp" for c in cols]
        stages.append(Imputer(strategy="median", inputCols=cols,
                              outputCols=imputed))
        cols = imputed
    stages.append(VectorAssembler(inputCols=cols, outputCol="_features_raw",
                                  handleInvalid="keep"))
    if scale:
        stages.append(StandardScaler(inputCol="_features_raw",
                                     outputCol="features", withMean=True))
    else:
        stages.append(VectorAssembler(inputCols=["_features_raw"],
                                      outputCol="features"))
    return stages


def binary_head(feature_cols: list[str], label: str = "accretion_forming",
                max_iter: int = 20) -> Pipeline:
    """Head 1: is-accretion-forming classifier (GBT ≈ reference XGB)."""
    return Pipeline(stages=feature_prep(feature_cols) + [
        GBTClassifier(labelCol=label, featuresCol="features",
                      maxIter=max_iter, maxDepth=5, seed=42)])


def days_head(feature_cols: list[str], label: str = "days_to_critical",
              max_iter: int = 20) -> Pipeline:
    """Head 2: days-to-critical regressor (trained on forming rows only)."""
    return Pipeline(stages=feature_prep(feature_cols) + [
        GBTRegressor(labelCol=label, featuresCol="features",
                     maxIter=max_iter, maxDepth=5, seed=42)])


def zone_head(feature_cols: list[str], label: str = "accretion_zone",
              num_trees: int = 50) -> Pipeline:
    """Head 3: zone multi-class classifier (RandomForest)."""
    return Pipeline(stages=feature_prep(feature_cols) + [
        RandomForestClassifier(labelCol=label, featuresCol="features",
                               numTrees=num_trees, maxDepth=5, seed=42)])


def evaluate_binary(model: PipelineModel, test: DataFrame,
                    label: str = "accretion_forming") -> dict[str, float]:
    pred = model.transform(test)
    auc = BinaryClassificationEvaluator(
        labelCol=label, metricName="areaUnderROC").evaluate(pred)
    acc = MulticlassClassificationEvaluator(
        labelCol=label, metricName="accuracy").evaluate(pred)
    f1 = MulticlassClassificationEvaluator(
        labelCol=label, metricName="f1").evaluate(pred)
    return {"auc": auc, "accuracy": acc, "f1": f1}


def evaluate_regression(model: PipelineModel, test: DataFrame,
                        label: str = "days_to_critical") -> dict[str, float]:
    pred = model.transform(test)
    out = {}
    for m in ("rmse", "mae", "r2"):
        out[m] = RegressionEvaluator(labelCol=label,
                                     metricName=m).evaluate(pred)
    return out


def feature_importances(model: PipelineModel,
                        feature_cols: list[str], top_n: int = 20) -> list[tuple[str, float]]:
    """Top-N feature importances from the tree head (reference
    models_backup.py:245-274 ranking)."""
    head = model.stages[-1]
    imp = head.featureImportances
    pairs = [(feature_cols[i] if i < len(feature_cols) else f"f{i}", float(v))
             for i, v in zip(imp.indices, imp.values)]
    return sorted(pairs, key=lambda t: -t[1])[:top_n]


# -- prescriptor -------------------------------------------------------------

def clip_and_step(col, lo: float, hi: float, step: float):
    """Action-space projection: clip to [lo, hi], round to step grid
    (reference models_backup.py:538-542: np.clip + round(x/step)*step)."""
    clipped = F.least(F.greatest(col, F.lit(lo)), F.lit(hi))
    return F.round(clipped / step) * step


def prescriptor_fit(train: DataFrame, feature_cols: list[str],
                    control_params: list[str],
                    max_iter: int = 10) -> dict[str, PipelineModel]:
    """One regressor per controllable parameter: predicts the parameter
    value associated with low-risk states (reference trains per-param XGB
    regressors, models_backup.py:427-520)."""
    models = {}
    others = [c for c in feature_cols if c not in control_params]
    for p in control_params:
        pipe = Pipeline(stages=feature_prep(others) + [
            GBTRegressor(labelCol=p, featuresCol="features",
                         maxIter=max_iter, maxDepth=4, seed=42)])
        models[p] = pipe.fit(train)
    return models


def prescribe(models: dict[str, PipelineModel], current: DataFrame,
              bounds: dict[str, tuple[float, float, float]],
              top_n: int = 3) -> DataFrame:
    """Recommended parameter adjustments ranked by |delta| (impact proxy;
    reference ranks by predicted risk reduction, models_backup.py:560-583).

    Returns (param, current_value, recommended, delta) — top-N rows.
    """
    spark = current.sparkSession
    rows = []
    for p, model in models.items():
        lo, hi, step = bounds[p]
        pred = model.transform(current).select(
            F.lit(p).alias("param"),
            F.col(p).cast("double").alias("current_value"),
            clip_and_step(F.col("prediction"), lo, hi, step).alias("recommended"))
        rows.append(pred.withColumn(
            "delta", F.col("recommended") - F.col("current_value")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy(F.abs(F.col("delta")).desc()).limit(top_n)
