"""Real LSTM training (ml/dl.py) + experiment tracking (ml/tracking.py).

Covers the SURVEY §2.10/§2.11 deep-sequence rows with an actually
trained model: gradient correctness vs finite differences, loss descent,
held-out generalization on a temporal rule, local/distributed fit
equivalence, inference through the Arrow ``predict_sequences`` path, and
tracked-run persistence (the MLflow-parity row).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from timeseries_data_analysis_spark.ml.dl import NumpyLSTM, NumpyTransformer
from timeseries_data_analysis_spark.ml.sequence import predict_sequences
from timeseries_data_analysis_spark.ml.tracking import Tracker, load_run


def _toy(n=240, t=8, d=2, seed=3):
    """Label = 1 iff the LAST step of feature 0 exceeds its mean — a
    temporal rule a final-state readout can represent."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, t, d))
    y = (x[:, -1, 0] > 0).astype(np.float64)
    return x, y


def test_gradient_matches_finite_differences():
    x, y = _toy(n=12, t=4, d=2)
    m = NumpyLSTM(2, hidden=5, seed=0)
    _, grad = m.loss_and_grad(x, y)
    p0 = m.get_params()
    rng = np.random.default_rng(1)
    idx = rng.choice(len(p0), size=25, replace=False)
    eps = 1e-6
    for i in idx:
        pp = p0.copy(); pp[i] += eps
        m.set_params(pp)
        lp, _ = m.loss_and_grad(x, y)
        pm = p0.copy(); pm[i] -= eps
        m.set_params(pm)
        lm, _ = m.loss_and_grad(x, y)
        num = (lp - lm) / (2 * eps)
        assert abs(num - grad[i]) < 1e-5 * max(1.0, abs(num)), \
            f"param {i}: numeric {num} vs analytic {grad[i]}"


def test_local_fit_descends_and_generalizes():
    x, y = _toy(n=300, t=8, d=2, seed=5)
    xte, yte = _toy(n=200, t=8, d=2, seed=99)
    m = NumpyLSTM(2, hidden=12, seed=0)
    hist = m.fit_local(x, y, epochs=120, lr=0.03)
    assert hist[-1]["loss"] < 0.35 < hist[0]["loss"]
    acc = float(np.mean((m.forward(xte) > 0.5) == (yte > 0.5)))
    assert acc > 0.85, f"held-out accuracy {acc}"


def test_determinism_same_seed_same_weights():
    x, y = _toy(n=60, t=5, d=2)
    a, b = NumpyLSTM(2, hidden=6, seed=7), NumpyLSTM(2, hidden=6, seed=7)
    a.fit_local(x, y, epochs=5)
    b.fit_local(x, y, epochs=5)
    np.testing.assert_array_equal(a.get_params(), b.get_params())


def test_distributed_fit_matches_local(spark, tmp_path):
    """One epoch of the treeAggregate path must produce exactly the
    full-batch gradient step (sum-of-partition-sums == whole-batch sum)."""
    x, y = _toy(n=160, t=6, d=2, seed=11)
    rows = [([float(v) for v in x[i, :, 0]],
             [float(v) for v in x[i, :, 1]], float(y[i]))
            for i in range(len(y))]
    df = spark.createDataFrame(rows, "f0: array<double>, f1: array<double>, label: double") \
        .repartition(4)
    m_dist = NumpyLSTM(2, hidden=6, seed=2)
    m_dist.fit_distributed(df, ["f0", "f1"], "label", epochs=3, lr=0.05)
    m_loc = NumpyLSTM(2, hidden=6, seed=2)
    m_loc.fit_local(x, y, epochs=3, lr=0.05)
    np.testing.assert_allclose(m_dist.get_params(), m_loc.get_params(),
                               rtol=1e-9, atol=1e-9)
    assert m_dist.history[-1]["samples"] == 160


def test_save_load_preserves_adam_state(tmp_path):
    """A restored model's partial_fit must continue Adam bias correction
    at the saved step counter, not restart at t=0 — save/load carries
    the moment vectors and t, so a save/load round trip mid-training is
    a no-op for the optimizer trajectory."""
    x, y = _toy(n=80, t=5, d=2, seed=3)
    a = NumpyLSTM(2, hidden=6, seed=9)
    a.fit_local(x, y, epochs=5, lr=0.03)
    a.save(str(tmp_path / "m"))
    b = NumpyLSTM.load(str(tmp_path / "m"))
    assert b._adam_t == a._adam_t == 5
    np.testing.assert_array_equal(a._adam_m, b._adam_m)
    np.testing.assert_array_equal(a._adam_v, b._adam_v)
    # continuing training from the restored model == never having saved
    a.fit_local(x, y, epochs=3, lr=0.03)
    b.fit_local(x, y, epochs=3, lr=0.03)
    np.testing.assert_allclose(a.get_params(), b.get_params(),
                               rtol=1e-12, atol=1e-12)


def test_tracker_reused_run_name_gets_distinct_dir(tmp_path):
    """Starting a second run with an already-used run_name must not
    merge into the first run's directory (MLflow creates a distinct
    run); the tracker uniquifies instead."""
    tr = Tracker(str(tmp_path / "runs"))
    with tr.start_run("exp", run_name="dup") as r1:
        r1.log_params({"v": 1})
        r1.log_metrics({"loss": 0.5}, step=0)
    with tr.start_run("exp", run_name="dup") as r2:
        r2.log_params({"v": 2})
        r2.log_metrics({"loss": 0.9}, step=0)
    assert r1.run_id != r2.run_id
    runs = tr.list_runs("exp")
    assert len(runs) == 2
    by_id = {r["run_id"]: r for r in runs}
    assert by_id[r1.run_id]["params"] == {"v": 1}
    assert by_id[r1.run_id]["metrics"]["loss"] == 0.5
    assert by_id[r2.run_id]["params"] == {"v": 2}


def test_trained_model_through_arrow_inference(spark, tmp_path):
    x, y = _toy(n=300, t=8, d=2, seed=5)
    m = NumpyLSTM(2, hidden=12, seed=0)
    m.fit_local(x, y, epochs=120, lr=0.03)
    # save -> load round trip, then score a DataFrame via mapInPandas
    m.save(str(tmp_path / "model"))
    m2 = NumpyLSTM.load(str(tmp_path / "model"))
    np.testing.assert_array_equal(m.get_params(), m2.get_params())
    xte, yte = _toy(n=120, t=8, d=2, seed=42)
    rows = [(i, [float(v) for v in xte[i, :, 0]],
             [float(v) for v in xte[i, :, 1]], float(yte[i]))
            for i in range(len(yte))]
    df = spark.createDataFrame(
        rows, "id: long, f0: array<double>, f1: array<double>, label: double")
    out = predict_sequences(df, ["f0", "f1"], forward=m2.forward_fn(),
                            out_col="prob").toPandas()
    assert len(out) == 120
    acc = float(np.mean((out["prob"] > 0.5) == (out["label"] > 0.5)))
    assert acc > 0.8
    # partition-count invariance: weights are fixed, so probabilities must
    # not depend on batch boundaries (the round-2 stub bug class, where
    # each batch drew fresh weights). BLAS reduction order varies with the
    # batch dimension, so allow ulp-level noise — the bug class this
    # guards against produced O(1) differences.
    out2 = predict_sequences(df.repartition(7), ["f0", "f1"],
                             forward=m2.forward_fn(), out_col="prob") \
        .toPandas().sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(
        out.sort_values("id")["prob"].to_numpy(), out2["prob"].to_numpy(),
        rtol=1e-9, atol=1e-12)


def test_tracker_run_persists_and_reloads(tmp_path):
    tr = Tracker(str(tmp_path / "runs"))
    with tr.start_run("kiln", run_name="r1") as run:
        run.log_params({"lr": 0.03, "hidden": 12})
        for step, loss in enumerate([0.9, 0.5, 0.3]):
            run.log_metrics({"loss": loss}, step=step)
        run.set_tags({"stage": "test"})
    loaded = load_run(str(tmp_path / "runs" / "kiln" / "r1"))
    assert loaded["params"] == {"lr": 0.03, "hidden": 12}
    assert loaded["metrics"]["loss"] == 0.3
    assert loaded["metric_series"]["loss"] == [(0, 0.9), (1, 0.5), (2, 0.3)]
    assert loaded["tags"]["status"] == "FINISHED"
    runs = tr.list_runs("kiln")
    assert len(runs) == 1 and runs[0]["run_id"] == "r1"


def test_tracker_integrates_with_training(tmp_path):
    x, y = _toy(n=80, t=5, d=2)
    tr = Tracker(str(tmp_path / "runs"))
    with tr.start_run("lstm", run_name="fit1") as run:
        run.log_params({"epochs": 10, "lr": 0.02})
        m = NumpyLSTM(2, hidden=6, seed=1)
        m.fit_local(x, y, epochs=10, lr=0.02, tracker=run)
    loaded = load_run(str(tmp_path / "runs" / "lstm" / "fit1"))
    series = loaded["metric_series"]["loss"]
    assert len(series) == 10
    assert series[-1][1] < series[0][1]


def test_partial_fit_foreachbatch_shape(spark):
    """Two sequential micro-batch updates (the foreachBatch contract):
    weights + optimizer state carry over, and loss keeps descending on a
    stationary stream."""
    x, y = _toy(n=400, t=6, d=2, seed=21)

    def to_df(lo, hi):
        rows = [([float(v) for v in x[i, :, 0]],
                 [float(v) for v in x[i, :, 1]], float(y[i]))
                for i in range(lo, hi)]
        return spark.createDataFrame(
            rows, "f0: array<double>, f1: array<double>, label: double")

    m = NumpyLSTM(2, hidden=8, seed=4)
    m.partial_fit(to_df(0, 200), ["f0", "f1"], "label", epochs=15, lr=0.03)
    loss_after_b0 = m.history[-1]["loss"]
    t_before = m._adam_t
    m.partial_fit(to_df(200, 400), ["f0", "f1"], "label", epochs=15, lr=0.03)
    assert m._adam_t == t_before + 15          # optimizer state carried over
    assert m.history[-1]["loss"] < loss_after_b0


@pytest.mark.parametrize("n_feat,hidden", [(1, 4), (3, 8)])
def test_shapes(n_feat, hidden):
    x = np.random.default_rng(0).standard_normal((10, 6, n_feat))
    m = NumpyLSTM(n_feat, hidden=hidden)
    p = m.forward(x)
    assert p.shape == (10,)
    assert np.all((p >= 0) & (p <= 1))


# --- NumpyTransformer (reference models.py:157-208) ---------------------


def test_transformer_gradient_matches_finite_differences():
    x, y = _toy(n=10, t=5, d=3)
    m = NumpyTransformer(3, hidden=5, seed=1)
    _, grad = m.loss_and_grad(x, y)
    p0 = m.get_params()
    rng = np.random.default_rng(2)
    idx = rng.choice(len(p0), size=40, replace=False)
    eps = 1e-5
    for i in idx:
        pp = p0.copy(); pp[i] += eps
        m.set_params(pp)
        lp, _ = m.loss_and_grad(x, y)
        pm = p0.copy(); pm[i] -= eps
        m.set_params(pm)
        lm, _ = m.loss_and_grad(x, y)
        num = (lp - lm) / (2 * eps)
        assert abs(num - grad[i]) < 1e-6 * max(1.0, abs(num)), \
            f"param {i}: numeric {num} vs analytic {grad[i]}"


def test_transformer_fit_descends_and_generalizes():
    x, y = _toy(n=300, t=8, d=2, seed=5)
    xte, yte = _toy(n=200, t=8, d=2, seed=99)
    m = NumpyTransformer(2, hidden=12, seed=0)
    hist = m.fit_local(x, y, epochs=120, lr=0.03)
    assert hist[-1]["loss"] < 0.35 < hist[0]["loss"]
    acc = float(np.mean((m.forward(xte) > 0.5) == (yte > 0.5)))
    assert acc > 0.85, f"held-out accuracy {acc}"


def test_transformer_learns_positional_comparison():
    """A rule an order-blind model cannot express: label = 1 iff the
    LAST step of feature 0 exceeds the FIRST step. Requires the
    positional encoding + attention to route both endpoints into the
    readout — the capability the LSTM covers with recurrence."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1500, 8, 2))
    y = (x[:, -1, 0] > x[:, 0, 0]).astype(np.float64)
    m = NumpyTransformer(2, hidden=8, seed=3)
    m.fit_local(x, y, epochs=250, lr=0.02)
    xte = rng.standard_normal((400, 8, 2))
    yte = (xte[:, -1, 0] > xte[:, 0, 0]).astype(np.float64)
    acc = float(np.mean((m.forward(xte) > 0.5) == (yte > 0.5)))
    assert acc > 0.9, f"held-out accuracy {acc}"


def test_transformer_distributed_fit_matches_local(spark):
    x, y = _toy(n=160, t=6, d=2, seed=11)
    rows = [([float(v) for v in x[i, :, 0]],
             [float(v) for v in x[i, :, 1]], float(y[i]))
            for i in range(len(y))]
    df = spark.createDataFrame(
        rows, "f0: array<double>, f1: array<double>, label: double") \
        .repartition(4)
    m_dist = NumpyTransformer(2, hidden=6, seed=2)
    m_dist.fit_distributed(df, ["f0", "f1"], "label", epochs=3, lr=0.05)
    m_loc = NumpyTransformer(2, hidden=6, seed=2)
    m_loc.fit_local(x, y, epochs=3, lr=0.05)
    np.testing.assert_allclose(m_dist.get_params(), m_loc.get_params(),
                               rtol=1e-9, atol=1e-9)
    assert m_dist.history[-1]["samples"] == 160


def test_transformer_save_load_and_arrow_inference(spark, tmp_path):
    """Same contract as the LSTM: save/load round trip (weights + Adam
    state) and scoring through the mapInPandas predict_sequences path."""
    x, y = _toy(n=300, t=8, d=2, seed=5)
    m = NumpyTransformer(2, hidden=12, seed=0)
    m.fit_local(x, y, epochs=100, lr=0.03)
    m.save(str(tmp_path / "model"))
    m2 = NumpyTransformer.load(str(tmp_path / "model"))
    np.testing.assert_array_equal(m.get_params(), m2.get_params())
    assert m2._adam_t == m._adam_t
    xte, yte = _toy(n=120, t=8, d=2, seed=42)
    rows = [(i, [float(v) for v in xte[i, :, 0]],
             [float(v) for v in xte[i, :, 1]], float(yte[i]))
            for i in range(len(yte))]
    df = spark.createDataFrame(
        rows, "id: long, f0: array<double>, f1: array<double>, label: double")
    out = predict_sequences(df, ["f0", "f1"], forward=m2.forward_fn(),
                            out_col="prob").toPandas()
    assert len(out) == 120
    acc = float(np.mean((out["prob"] > 0.5) == (out["label"] > 0.5)))
    assert acc > 0.8


@pytest.mark.parametrize("n_feat,hidden", [(1, 4), (3, 8)])
def test_transformer_shapes(n_feat, hidden):
    x = np.random.default_rng(0).standard_normal((10, 6, n_feat))
    m = NumpyTransformer(n_feat, hidden=hidden)
    p = m.forward(x)
    assert p.shape == (10,)
    assert np.all((p >= 0) & (p <= 1))


def test_transformer_is_order_sensitive():
    """The positional encoding must make the model distinguish token
    order: reversing a sequence changes the output (an encoder without
    PE — like the reference's — is nearly permutation-blind apart from
    the last-token residual)."""
    rng = np.random.default_rng(7)
    m = NumpyTransformer(2, hidden=6, seed=0)
    x = rng.standard_normal((20, 8, 2))
    p_fwd = m.forward(x)
    p_rev = m.forward(x[:, ::-1, :].copy())
    assert np.max(np.abs(p_fwd - p_rev)) > 1e-4


# -- round 5: reference-default capacity (stacked / multi-head / bidir) ------

def _fd_assert(m, x, y, n_probe=30, eps=1e-5, seed=1):
    """Shared finite-difference gate for deep configs (eps=1e-5: deeper
    nets amplify float cancellation at 1e-6 without any gradient error)."""
    _, grad = m.loss_and_grad(x, y)
    p0 = m.get_params()
    rng = np.random.default_rng(seed)
    for i in rng.choice(len(p0), size=n_probe, replace=False):
        pp = p0.copy(); pp[i] += eps
        m.set_params(pp)
        lp, _ = m.loss_and_grad(x, y)
        pm = p0.copy(); pm[i] -= eps
        m.set_params(pm)
        lm, _ = m.loss_and_grad(x, y)
        num = (lp - lm) / (2 * eps)
        assert abs(num - grad[i]) < 1e-5 * max(1.0, abs(num)), \
            f"param {i}: numeric {num} vs analytic {grad[i]}"
    m.set_params(p0)


@pytest.mark.parametrize("layers,bidi", [(2, False), (1, True), (2, True)])
def test_lstm_deep_gradient_matches_finite_differences(layers, bidi):
    x, y = _toy(n=10, t=5, d=2)
    _fd_assert(NumpyLSTM(2, hidden=4, seed=0, layers=layers,
                         bidirectional=bidi), x, y)


@pytest.mark.parametrize("n_layers,n_heads", [(2, 1), (1, 4), (2, 4)])
def test_transformer_deep_gradient_matches_finite_differences(n_layers, n_heads):
    x, y = _toy(n=10, t=5, d=2)
    _fd_assert(NumpyTransformer(2, hidden=8, seed=0, n_layers=n_layers,
                                n_heads=n_heads), x, y)


def test_transformer_reference_default_learns_positional_rule():
    """The reference-default capacity (2 encoder layers, 4 heads —
    models.py:157-208) through the SAME scaffolding: held-out positional
    rule an order-blind model cannot express."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1500, 8, 2))
    y = (x[:, -1, 0] > x[:, 0, 0]).astype(np.float64)
    m = NumpyTransformer(2, hidden=8, seed=3, n_layers=2, n_heads=4)
    m.fit_local(x, y, epochs=250, lr=0.02)
    xte = rng.standard_normal((400, 8, 2))
    yte = (xte[:, -1, 0] > xte[:, 0, 0]).astype(np.float64)
    acc = float(np.mean((m.forward(xte) > 0.5) == (yte > 0.5)))
    assert acc > 0.9, f"held-out accuracy {acc}"


def test_bidirectional_lstm_learns_first_step_rule():
    """Label = 1 iff the FIRST step of feature 0 is positive. The
    bidirectional readout includes the backward cell's step-0 output
    (which has seen the whole reversed sequence, i.e. the first element
    last) — the capacity bidirectionality exists for. A unidirectional
    last-state readout must carry the first element through T steps of
    recurrence; the backward direction reads it directly."""
    rng = np.random.default_rng(9)
    x = rng.standard_normal((600, 8, 2))
    y = (x[:, 0, 0] > 0).astype(np.float64)
    m = NumpyLSTM(2, hidden=8, seed=1, bidirectional=True)
    m.fit_local(x, y, epochs=150, lr=0.03)
    xte = rng.standard_normal((300, 8, 2))
    yte = (xte[:, 0, 0] > 0).astype(np.float64)
    acc = float(np.mean((m.forward(xte) > 0.5) == (yte > 0.5)))
    assert acc > 0.9, f"held-out accuracy {acc}"


def test_deep_models_save_load_roundtrip(tmp_path):
    """Deep hyperparameters survive save/load: the restored instance is
    architecture-identical (params, Adam state, hyper) for the
    reference-default configs."""
    x, y = _toy(n=80, t=6, d=2)
    m = NumpyLSTM(2, hidden=6, seed=2, layers=2, bidirectional=True)
    m.fit_local(x, y, epochs=3)
    m.save(str(tmp_path / "lstm"))
    m2 = NumpyLSTM.load(str(tmp_path / "lstm"))
    assert m2._hyper() == m._hyper()
    np.testing.assert_array_equal(m.get_params(), m2.get_params())
    np.testing.assert_array_equal(m.forward(x), m2.forward(x))

    t = NumpyTransformer(2, hidden=8, seed=2, n_layers=2, n_heads=4)
    t.fit_local(x, y, epochs=3)
    t.save(str(tmp_path / "tr"))
    t2 = NumpyTransformer.load(str(tmp_path / "tr"))
    assert t2._hyper() == t._hyper()
    np.testing.assert_array_equal(t.get_params(), t2.get_params())
    np.testing.assert_array_equal(t.forward(x), t2.forward(x))


def test_deep_distributed_fit_matches_local(spark):
    """The treeAggregate epoch reproduces the local full-batch epoch for
    the deep configs too (same mean gradient, same Adam step)."""
    x, y = _toy(n=120, t=6, d=2, seed=11)
    rows = [([float(v) for v in x[i, :, 0]],
             [float(v) for v in x[i, :, 1]], float(y[i]))
            for i in range(len(y))]
    df = spark.createDataFrame(
        rows, "f0: array<double>, f1: array<double>, label: double") \
        .repartition(4)
    for mk in (lambda: NumpyLSTM(2, hidden=4, seed=2, layers=2,
                                 bidirectional=True),
               lambda: NumpyTransformer(2, hidden=8, seed=2,
                                        n_layers=2, n_heads=4)):
        m_dist, m_loc = mk(), mk()
        m_dist.fit_distributed(df, ["f0", "f1"], "label", epochs=2, lr=0.05)
        m_loc.fit_local(x, y, epochs=2, lr=0.05)
        np.testing.assert_allclose(m_dist.get_params(), m_loc.get_params(),
                                   rtol=1e-9, atol=1e-9)


def test_invalid_deep_configs_raise():
    with pytest.raises(ValueError, match="layers"):
        NumpyLSTM(2, layers=0)
    with pytest.raises(ValueError, match="n_layers"):
        NumpyTransformer(2, n_layers=0)
    with pytest.raises(ValueError, match="n_heads"):
        NumpyTransformer(2, hidden=6, n_heads=4)
