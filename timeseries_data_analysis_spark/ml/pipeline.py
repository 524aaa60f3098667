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

    The in-pipeline Imputer is median (fast, estimator-shaped). Full KNN
    imputation fidelity (reference pre_processing.py:269-273, sklearn
    KNNImputer semantics) is available as a pre-processing step:
    ``ml.impute.knn_impute(df, cols, k=5, bits=...)`` — LSH-bucketed
    nan-euclidean KNN, exact at bits=0, distributed at any scale.
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


def evaluate_zone(model: PipelineModel, test: DataFrame,
                  label: str = "accretion_zone") -> dict:
    """Multiclass zone evaluator (reference models_backup.py:177-243):
    accuracy over VALID zones only (label ≥ 0 — −1 means "no accretion
    zone"), plus the distinct truth/prediction class sets the reference
    reports. NaN accuracy when the test slice has no valid zones,
    matching the reference's no-valid-zones branch."""
    valid = test.filter(F.col(label) >= 0)
    if valid.isEmpty():
        return {"accuracy": float("nan"), "unique_classes_truth": [],
                "unique_classes_pred": [], "note": "no valid zones"}
    pred = model.transform(valid)
    acc = MulticlassClassificationEvaluator(
        labelCol=label, metricName="accuracy").evaluate(pred)
    truth = sorted(r[0] for r in valid.select(label).distinct().collect())
    got = sorted(r[0] for r in
                 pred.select("prediction").distinct().collect())
    return {"accuracy": acc, "unique_classes_truth": truth,
            "unique_classes_pred": got}


def oversample_minority(df: DataFrame, label_col: str,
                        feature_cols: list[str],
                        min_count: int = 20, min_frac: float = 0.1,
                        cap: int = 1000, noise_std: float = 0.1,
                        order_cols: list[str] | None = None,
                        seed: int = 42) -> DataFrame:
    """Class-imbalance augmentation (reference models.py:771-796): when
    positives are scarce (< ``min_count`` or < ``min_frac`` of rows), add
    ``min(n_rows // 4, cap) − n_pos`` synthetic positives — copies of
    existing positives with N(0, noise_std) jitter on the feature columns.

    Scale design: the trigger decision is one tiny aggregate (the
    reference likewise counts classes up front); replication is a
    DETERMINISTIC explode — each positive emits ``needed // n_pos``
    copies, plus exactly ``needed % n_pos`` positives one more — so the
    output row count is exact and oracle-checkable, unlike a
    ``sample(withReplacement)`` whose count is only approximate. The
    remainder is distributed by HASH BUCKET, not a global row_number
    (which would serialize every positive through one partition — at
    100 TB with a 1% positive class, a scale-killer): positives hash
    into ``n_buckets`` groups, per-bucket sizes (≤ ``n_buckets`` rows)
    come to the driver once, greedy per-bucket quotas summing to the
    remainder parameterize a per-bucket ``row_number`` — every window
    is partitioned, parallelism = ``n_buckets``. Noise is
    ``randn(seed)`` — JVM-side, no Python boundary, no driver loop.
    """
    from pyspark.sql import Window

    n_rows, n_pos = df.agg(
        F.count(F.lit(1)),
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0))).first()
    n_pos = n_pos or 0
    if n_pos == 0 or (n_pos >= min_count and n_pos / n_rows >= min_frac):
        return df
    needed = min(n_rows // 4, cap) - n_pos
    if needed <= 0:
        return df

    k, rem = divmod(needed, n_pos)
    order_cols = order_cols or feature_cols
    n_buckets = 64
    bucket = F.pmod(F.xxhash64(*order_cols), F.lit(n_buckets)).alias("_b")
    pos_base = df.filter(F.col(label_col) == 1).withColumn("_b", bucket)
    # bounded driver read: ≤ n_buckets (size) rows, the quota table
    sizes = {r["_b"]: r["_n"] for r in
             pos_base.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
             .collect()}
    quotas: dict[int, int] = {}
    remaining = rem
    for b in sorted(sizes):
        take = min(sizes[b], remaining)
        if take > 0:
            quotas[b] = take
        remaining -= take
    quota_expr = F.lit(0)
    for b, q in quotas.items():
        quota_expr = F.when(F.col("_b") == b, q).otherwise(quota_expr)
    w = Window.partitionBy("_b").orderBy(*order_cols)
    pos = (pos_base
           .withColumn("_copies",
                       F.lit(k) + (F.row_number().over(w) <= quota_expr)
                       .cast("int"))
           .filter(F.col("_copies") > 0)
           .withColumn("_dup", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
           .drop("_copies", "_dup", "_b"))
    jittered = pos.select(*[
        (F.col(c) + F.randn(seed + i) * noise_std).alias(c)
        if c in feature_cols else F.col(c)
        for i, c in enumerate(df.columns)])
    return df.unionByName(jittered)


class IncrementalTrainer:
    """T4: incremental model update for ``foreachBatch`` (reference
    update_incrementally, models_backup.py:311-420; dashboard trigger
    dashboard.py:2056-2133).

    Spark ML tree ensembles have no ``xgb_model`` warm-start, so the
    equivalent semantics are replay-buffer refit: each micro-batch appends
    to a bounded parquet buffer (newest ``buffer_batches`` kept) and the
    pipeline refits on the union — the model adapts to new patterns
    without full-history retraining, and the per-update ``history``
    (timestamp, samples, metrics) mirrors the reference's
    ``training_history``. First batch = plain fit, like the reference's
    ``if not self.models`` branch.
    """

    def __init__(self, pipeline_factory, buffer_path: str,
                 label_col: str = "accretion_forming",
                 buffer_batches: int = 5):
        self.pipeline_factory = pipeline_factory
        self.buffer_path = buffer_path
        self.label_col = label_col
        self.buffer_batches = buffer_batches
        self.model: PipelineModel | None = None
        self.history: list[dict] = []

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # Buffer is partitioned by _batch_id so expiry is a partition
        # DELETE, not a read-time filter: disk usage stays bounded at
        # ``buffer_batches`` partitions over an infinite stream.
        (batch_df.withColumn("_batch_id", F.lit(batch_id))
         .write.mode("append").partitionBy("_batch_id")
         .parquet(self.buffer_path))
        keep_from = batch_id - self.buffer_batches + 1
        self._expire_partitions(spark, keep_from)
        buf = spark.read.parquet(self.buffer_path)
        train = buf.filter(F.col("_batch_id") >= keep_from).drop("_batch_id")
        self.model = self.pipeline_factory().fit(train)
        n = train.count()
        metrics: dict = {"samples": int(n), "batch_id": int(batch_id)}
        try:
            metrics.update(evaluate_binary(self.model, train,
                                           label=self.label_col))
        except Exception:  # noqa: BLE001 — single-class batches have no AUC
            pass
        self.history.append(metrics)

    def _expire_partitions(self, spark, keep_from: int) -> None:
        """Delete ``_batch_id=<k>`` partition dirs with k < keep_from via
        the Hadoop FileSystem API (works on local, HDFS, and S3A alike)."""
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(self.buffer_path)
        fs = path.getFileSystem(conf)
        if not fs.exists(path):
            return
        for status in fs.listStatus(path):
            name = status.getPath().getName()
            if name.startswith("_batch_id="):
                try:
                    if int(name.split("=", 1)[1]) < keep_from:
                        fs.delete(status.getPath(), True)
                except ValueError:
                    continue


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
