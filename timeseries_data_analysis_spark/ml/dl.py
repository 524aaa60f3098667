"""Trainable LSTM sequence classifier — pure numpy, Spark-distributed fit.

Reference: the torch ``LSTMPredictor`` (``models.py:113-208``) and its
training loop (``train_models.py``). Torch is not installed in this
environment, so the cell is implemented directly: a standard single-layer
LSTM (gates ``i,f,g,o``, shared ``(d,4H)/(H,4H)`` weight layout) with a
sigmoid readout on the final hidden state, full backpropagation-through-
time, and Adam. Everything is float64 numpy, deterministic under a fixed
seed — this is a *real* trained model (loss provably decreases, learns
held-out synthetic rules in tests), not a stubbed forward; the seeded
stub in ``ml/sequence.py`` remains only as the zero-dependency fallback
for plumbing tests.

Distribution model (the part torch would not give us anyway):

- **Inference** plugs into ``ml.sequence.predict_sequences`` unchanged —
  ``model.forward_fn()`` is a ``batch -> probs`` callable captured by the
  ``mapInPandas`` closure, so weights ship to executors by closure
  broadcast and each executor scores its own partitions.
- **Training** (``fit_distributed``) is synchronous data-parallel SGD:
  per epoch, the current weights broadcast to executors, each partition
  computes its *summed* gradient and loss via one numpy BPTT pass over
  its rows (``rdd.mapPartitions``), a ``treeAggregate``-shaped reduce
  adds the per-partition sums, and the driver applies one Adam step on
  the mean gradient. Communication per epoch is O(model size · log
  partitions), independent of row count — the same full-batch
  gradient-descent shape Spark MLlib uses for its linear models. For
  100 TB you would sample/shard epochs (mini-batch per round), which
  ``fraction`` provides.
"""

from __future__ import annotations

import json
import os

import numpy as np

from pyspark.sql import DataFrame


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


class NumpyLSTM:
    """Single-layer LSTM binary classifier with BPTT + Adam (numpy).

    Weight layout: ``w_x (d, 4H)``, ``w_h (H, 4H)``, ``b (4H,)`` with the
    gate order ``[input, forget, cell, output]``; readout ``w_out (H,)``,
    ``b_out``. Forget-gate bias initialized to +1 (standard trick so
    early training does not forget everything).
    """

    def __init__(self, n_features: int, hidden: int = 16, seed: int = 42):
        self.d = n_features
        self.h = hidden
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(max(n_features, 1))
        sh = 1.0 / np.sqrt(hidden)
        self.w_x = rng.standard_normal((n_features, 4 * hidden)) * s
        self.w_h = rng.standard_normal((hidden, 4 * hidden)) * sh
        self.b = np.zeros(4 * hidden)
        self.b[hidden:2 * hidden] = 1.0  # forget bias
        self.w_out = rng.standard_normal(hidden) * sh
        self.b_out = 0.0
        self._adam_m = None
        self._adam_v = None
        self._adam_t = 0
        self.history: list[dict] = []

    # -- parameter (de)serialization as one flat vector ---------------------

    def get_params(self) -> np.ndarray:
        return np.concatenate([self.w_x.ravel(), self.w_h.ravel(), self.b,
                               self.w_out, [self.b_out]])

    def set_params(self, flat: np.ndarray) -> None:
        d, h = self.d, self.h
        i = 0
        self.w_x = flat[i:i + d * 4 * h].reshape(d, 4 * h); i += d * 4 * h
        self.w_h = flat[i:i + h * 4 * h].reshape(h, 4 * h); i += h * 4 * h
        self.b = flat[i:i + 4 * h].copy(); i += 4 * h
        self.w_out = flat[i:i + h].copy(); i += h
        self.b_out = float(flat[i])

    # -- forward / backward --------------------------------------------------

    def forward(self, x: np.ndarray, cache: bool = False):
        """x: (n, T, d) -> probs (n,). With ``cache`` returns the per-step
        activations needed by :meth:`backward`."""
        n, t_len, _ = x.shape
        h = np.zeros((n, self.h))
        c = np.zeros((n, self.h))
        steps = []
        hh = self.h
        for t in range(t_len):
            z = x[:, t, :] @ self.w_x + h @ self.w_h + self.b
            i_g = _sigmoid(z[:, :hh])
            f_g = _sigmoid(z[:, hh:2 * hh])
            g_g = np.tanh(z[:, 2 * hh:3 * hh])
            o_g = _sigmoid(z[:, 3 * hh:])
            c_new = f_g * c + i_g * g_g
            h_new = o_g * np.tanh(c_new)
            if cache:
                steps.append((h, c, i_g, f_g, g_g, o_g, c_new))
            h, c = h_new, c_new
        logit = h @ self.w_out + self.b_out
        p = _sigmoid(logit)
        if cache:
            return p, (x, steps, h)
        return p

    def backward(self, p: np.ndarray, y: np.ndarray, ctx) -> tuple[float, np.ndarray]:
        """Mean BCE loss + flat gradient for one batch (full BPTT)."""
        x, steps, h_last = ctx
        n, t_len, _ = x.shape
        hh = self.h
        eps = 1e-12
        loss = float(-np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))
        dlogit = (p - y) / n                      # (n,)
        g_w_out = h_last.T @ dlogit
        g_b_out = float(dlogit.sum())
        dh = dlogit[:, None] * self.w_out[None, :]
        dc = np.zeros((n, hh))
        g_w_x = np.zeros_like(self.w_x)
        g_w_h = np.zeros_like(self.w_h)
        g_b = np.zeros_like(self.b)
        for t in range(t_len - 1, -1, -1):
            h_prev, c_prev, i_g, f_g, g_g, o_g, c_new = steps[t]
            tc = np.tanh(c_new)
            do = dh * tc
            dc = dc + dh * o_g * (1.0 - tc * tc)
            di = dc * g_g
            dg = dc * i_g
            df = dc * c_prev
            dz = np.concatenate([
                di * i_g * (1.0 - i_g),
                df * f_g * (1.0 - f_g),
                dg * (1.0 - g_g * g_g),
                do * o_g * (1.0 - o_g)], axis=1)
            g_w_x += x[:, t, :].T @ dz
            g_w_h += h_prev.T @ dz
            g_b += dz.sum(axis=0)
            dh = dz @ self.w_h.T
            dc = dc * f_g
        grad = np.concatenate([g_w_x.ravel(), g_w_h.ravel(), g_b,
                               g_w_out, [g_b_out]])
        return loss, grad

    def loss_and_grad(self, x: np.ndarray, y: np.ndarray) -> tuple[float, np.ndarray]:
        p, ctx = self.forward(x, cache=True)
        return self.backward(p, y, ctx)

    # -- optimizers ----------------------------------------------------------

    def adam_step(self, grad: np.ndarray, lr: float = 0.01,
                  beta1: float = 0.9, beta2: float = 0.999,
                  eps: float = 1e-8) -> None:
        if self._adam_m is None:
            self._adam_m = np.zeros_like(grad)
            self._adam_v = np.zeros_like(grad)
        self._adam_t += 1
        self._adam_m = beta1 * self._adam_m + (1 - beta1) * grad
        self._adam_v = beta2 * self._adam_v + (1 - beta2) * grad * grad
        mhat = self._adam_m / (1 - beta1 ** self._adam_t)
        vhat = self._adam_v / (1 - beta2 ** self._adam_t)
        self.set_params(self.get_params() - lr * mhat / (np.sqrt(vhat) + eps))

    def fit_local(self, x: np.ndarray, y: np.ndarray, epochs: int = 30,
                  lr: float = 0.02, tracker=None) -> list[dict]:
        """Full-batch Adam on in-memory arrays (driver-side path)."""
        for epoch in range(epochs):
            loss, grad = self.loss_and_grad(x, y)
            self.adam_step(grad, lr=lr)
            rec = {"epoch": epoch, "loss": loss}
            self.history.append(rec)
            if tracker is not None:
                tracker.log_metrics({"loss": loss}, step=epoch)
        return self.history

    def fit_distributed(self, df: DataFrame, seq_cols: list[str],
                        label_col: str, epochs: int = 10, lr: float = 0.02,
                        fraction: float | None = None, seed: int = 7,
                        tracker=None) -> list[dict]:
        """Synchronous data-parallel full-batch GD over a DataFrame of
        trailing-sequence array columns (one per feature) + binary label.

        Per epoch: broadcast current params → per-partition summed
        gradient (one vectorized BPTT over the partition's rows) →
        depth-2 ``treeAggregate`` add → driver Adam step on the mean.
        """
        d, h = self.d, self.h
        n_feat = len(seq_cols)
        assert n_feat == d, f"model expects {d} features, got {n_feat}"
        base = df.select(*seq_cols, label_col)
        rdd_base = None
        for epoch in range(epochs):
            sample = base.sample(fraction=fraction, seed=seed + epoch) \
                if fraction else base
            if rdd_base is None or fraction:
                rdd_base = sample.rdd
            params = self.get_params()
            sc = df.sparkSession.sparkContext
            bc = sc.broadcast(params)
            dd, hhh = d, h

            def part_grad(rows):
                mats, ys = [], []
                for row in rows:
                    mats.append([row[i] for i in range(n_feat)])
                    ys.append(row[n_feat])
                if not ys:
                    return iter([])
                x = np.asarray(mats, dtype=np.float64).transpose(0, 2, 1)
                yv = np.asarray(ys, dtype=np.float64)
                m = NumpyLSTM(dd, hhh)
                m.set_params(bc.value)
                loss, grad = m.loss_and_grad(x, yv)
                n = len(yv)
                # de-mean: sums are additive across partitions
                return iter([(loss * n, grad * n, n)])

            zero = (0.0, np.zeros_like(params), 0)
            loss_sum, grad_sum, n_total = rdd_base.mapPartitions(part_grad) \
                .treeAggregate(
                    zero,
                    lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
                    lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
                    depth=2)
            bc.unpersist()
            if n_total == 0:
                break
            self.adam_step(grad_sum / n_total, lr=lr)
            rec = {"epoch": epoch, "loss": loss_sum / n_total,
                   "samples": int(n_total)}
            self.history.append(rec)
            if tracker is not None:
                tracker.log_metrics({"loss": rec["loss"]}, step=epoch)
        return self.history

    # -- inference & persistence --------------------------------------------

    def forward_fn(self):
        """``batch -> probs`` closure for ``ml.sequence.predict_sequences``
        (weights captured by value: executor-safe, no Spark references)."""
        d, h = self.d, self.h
        params = self.get_params().copy()

        def fwd(batch: np.ndarray) -> np.ndarray:
            m = NumpyLSTM(d, h)
            m.set_params(params)
            return m.forward(batch)

        return fwd

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "params.npy"), self.get_params())
        # Adam moments + step counter persist too: a restored model's
        # partial_fit continues bias correction at the saved t instead
        # of restarting at t=0 (the warm-start contract).
        if self._adam_m is not None:
            np.save(os.path.join(path, "adam_m.npy"), self._adam_m)
            np.save(os.path.join(path, "adam_v.npy"), self._adam_v)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"n_features": self.d, "hidden": self.h,
                       "adam_t": self._adam_t,
                       "history": self.history}, f)

    def partial_fit(self, df: DataFrame, seq_cols: list[str], label_col: str,
                    epochs: int = 2, lr: float = 0.01, tracker=None) -> list[dict]:
        """Warm-start continuation for ``foreachBatch`` incremental update
        (reference ``dashboard.py:2056-2133``): unlike the tree-ensemble
        ``IncrementalTrainer`` (which must refit on a replay buffer), the
        LSTM carries its weights AND Adam state across micro-batches, so
        each call is a true incremental step on just the new data."""
        return self.fit_distributed(df, seq_cols, label_col,
                                    epochs=epochs, lr=lr, tracker=tracker)

    @classmethod
    def load(cls, path: str) -> "NumpyLSTM":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        m = cls(meta["n_features"], meta["hidden"])
        m.set_params(np.load(os.path.join(path, "params.npy")))
        m.history = meta.get("history", [])
        m._adam_t = meta.get("adam_t", 0)
        m_path = os.path.join(path, "adam_m.npy")
        if os.path.exists(m_path):
            m._adam_m = np.load(m_path)
            m._adam_v = np.load(os.path.join(path, "adam_v.npy"))
        return m
