"""Optional-dependency adapters stay exercised even where the optional
package is absent: the torch inference adapter and the mlflow tracking
mirror are tested through injected stand-in modules (verifying OUR glue
— dtype casts, context handling, call routing), plus skipif-gated tests
against the real packages for environments that have them."""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

HAS_TORCH = importlib.util.find_spec("torch") is not None
HAS_MLFLOW = importlib.util.find_spec("mlflow") is not None


# --- torch_forward ----------------------------------------------------------


def _fake_torch(calls):
    """Minimal torch stand-in covering exactly the adapter's surface."""
    mod = types.ModuleType("torch")

    class _Tensor:
        def __init__(self, arr):
            self.arr = arr

    class _NoGrad:
        def __enter__(self):
            calls.append("no_grad_enter")
            return self

        def __exit__(self, *a):
            calls.append("no_grad_exit")
            return False

    def from_numpy(arr):
        calls.append(("from_numpy", arr.dtype.name))
        return _Tensor(arr)

    mod.from_numpy = from_numpy
    mod.no_grad = _NoGrad
    mod._Tensor = _Tensor
    return mod


def test_torch_forward_glue_with_stand_in(monkeypatch):
    """The adapter must cast to float32, run under no_grad, and flatten
    the model output — verified against a recording stand-in module."""
    from timeseries_data_analysis_spark.ml import sequence as SQ

    calls: list = []
    fake = _fake_torch(calls)
    monkeypatch.setitem(sys.modules, "torch", fake)
    monkeypatch.setattr(SQ, "HAS_TORCH", True)

    class Model:
        def __call__(self, t):
            out = 1.0 / (1.0 + np.exp(-t.arr.mean(axis=(1, 2))))
            return types.SimpleNamespace(
                numpy=lambda: out.reshape(-1, 1))  # torch-like (n,1) head

    fwd = SQ.torch_forward(Model())
    batch = np.random.default_rng(0).standard_normal((6, 4, 2))
    probs = fwd(batch)
    assert probs.shape == (6,)
    np.testing.assert_allclose(
        probs, 1.0 / (1.0 + np.exp(-batch.astype(np.float32).mean(axis=(1, 2)))),
        rtol=1e-6)
    assert ("from_numpy", "float32") in calls          # dtype cast happened
    assert "no_grad_enter" in calls and "no_grad_exit" in calls


def test_torch_forward_raises_without_torch(monkeypatch):
    from timeseries_data_analysis_spark.ml import sequence as SQ
    monkeypatch.setattr(SQ, "HAS_TORCH", False)
    with pytest.raises(ImportError, match="torch not available"):
        SQ.torch_forward(object())


@pytest.mark.skipif(not HAS_TORCH, reason="torch not installed")
def test_torch_forward_real_module(spark):
    """With real torch present: a linear torch module scores through the
    Arrow predict_sequences path end to end."""
    import torch
    from timeseries_data_analysis_spark.ml import sequence as SQ

    class Mean(torch.nn.Module):
        def forward(self, x):
            return torch.sigmoid(x.mean(dim=(1, 2)))

    fwd = SQ.torch_forward(Mean())
    rows = [([1.0, 2.0], [3.0, 4.0])]
    df = spark.createDataFrame(rows, "f0: array<double>, f1: array<double>")
    out = SQ.predict_sequences(df, ["f0", "f1"], forward=fwd).collect()
    assert 0.0 < out[0]["seq_probability"] < 1.0


# --- mlflow mirroring -------------------------------------------------------


def _fake_mlflow(calls):
    mod = types.ModuleType("mlflow")
    for fn in ("set_experiment", "start_run", "end_run", "log_params",
               "log_metrics", "set_tags", "log_artifact", "log_figure"):
        def make(f):
            return lambda *a, **k: calls.append((f, a, k))
        setattr(mod, fn, make(fn))
    return mod


def test_tracker_mirrors_to_mlflow_stand_in(tmp_path, monkeypatch):
    """With mlflow importable, every tracker call mirrors to the mlflow
    API while the file layout stays the source of truth."""
    from timeseries_data_analysis_spark.ml import tracking as TK

    calls: list = []
    monkeypatch.setattr(TK, "mlflow", _fake_mlflow(calls), raising=False)
    monkeypatch.setattr(TK, "HAS_MLFLOW", True)

    tr = TK.Tracker(str(tmp_path / "runs"))
    with tr.start_run("exp", run_name="m1") as run:
        run.log_params({"lr": 0.1})
        run.log_metrics({"loss": 0.5}, step=3)
        run.set_tags({"stage": "test"})
    names = [c[0] for c in calls]
    assert names[:2] == ["set_experiment", "start_run"]
    assert "log_params" in names and "log_metrics" in names
    assert names[-1] == "end_run"
    lm = next(c for c in calls if c[0] == "log_metrics")
    assert lm[1][0] == {"loss": 0.5} and lm[2].get("step") == 3
    er = next(c for c in calls if c[0] == "end_run")
    assert er[2].get("status") == "FINISHED"
    # files still written (source of truth for load_run)
    loaded = TK.load_run(str(tmp_path / "runs" / "exp" / "m1"))
    assert loaded["params"] == {"lr": 0.1}
    assert loaded["metrics"]["loss"] == 0.5


def test_tracker_file_only_without_mlflow(tmp_path, monkeypatch):
    from timeseries_data_analysis_spark.ml import tracking as TK
    monkeypatch.setattr(TK, "HAS_MLFLOW", False)
    tr = TK.Tracker(str(tmp_path / "runs"))
    with tr.start_run("exp", run_name="f1") as run:
        run.log_params({"a": 1})
    assert TK.load_run(str(tmp_path / "runs" / "exp" / "f1"))["params"] == {"a": 1}


@pytest.mark.skipif(not HAS_MLFLOW, reason="mlflow not installed")
def test_tracker_real_mlflow(tmp_path, monkeypatch):
    import mlflow
    from timeseries_data_analysis_spark.ml import tracking as TK
    monkeypatch.setenv("MLFLOW_TRACKING_URI",
                       f"file://{tmp_path}/mlruns")
    tr = TK.Tracker(str(tmp_path / "runs"))
    with tr.start_run("exp", run_name="r1") as run:
        run.log_params({"lr": 0.1})
        run.log_metrics({"loss": 0.4}, step=0)
    runs = mlflow.search_runs(experiment_names=["exp"])
    assert len(runs) == 1


# --- signatures & figures ---------------------------------------------------


def test_log_model_signature_and_figure(tmp_path, spark):
    """Signature/figure parity (reference train_models_simple.py:360-398):
    the signature captures the DataFrame schema as a JSON artifact; the
    figure API is duck-typed on savefig so it works without matplotlib."""
    import json
    from timeseries_data_analysis_spark.ml import tracking as TK

    tr = TK.Tracker(str(tmp_path / "runs"))
    with tr.start_run("exp", run_name="s1") as run:
        df = spark.createDataFrame([(1, 0.5)], "id: long, score: double")
        p = run.log_model_signature("scorer", df,
                                    outputs=[("prob", "double")])
        with open(p) as f:
            sig = json.load(f)
        assert sig["inputs"] == [{"name": "id", "type": "bigint"},
                                 {"name": "score", "type": "double"}]
        assert sig["outputs"] == [{"name": "prob", "type": "double"}]

        class Fig:
            def savefig(self, path):
                with open(path, "wb") as fh:
                    fh.write(b"\x89PNG fake")

        fp = run.log_figure(Fig(), "roc.png")
        assert open(fp, "rb").read().startswith(b"\x89PNG")
    # both live under the run's artifacts dir
    import os
    arts = os.listdir(tmp_path / "runs" / "exp" / "s1" / "artifacts")
    assert "signature-scorer.json" in arts and "roc.png" in arts


def test_signature_and_figure_mirror_to_mlflow(tmp_path, monkeypatch):
    from timeseries_data_analysis_spark.ml import tracking as TK
    calls: list = []
    monkeypatch.setattr(TK, "mlflow", _fake_mlflow(calls), raising=False)
    monkeypatch.setattr(TK, "HAS_MLFLOW", True)
    tr = TK.Tracker(str(tmp_path / "runs"))
    with tr.start_run("exp", run_name="m2") as run:
        run.log_model_signature("m", [("x", "double")])

        class Fig:
            def savefig(self, path):
                open(path, "wb").write(b"x")

        run.log_figure(Fig(), "cm.png")
    names = [c[0] for c in calls]
    assert "log_artifact" in names and "log_figure" in names
