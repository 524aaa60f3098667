"""Trainable sequence classifiers (LSTM + Transformer) — pure numpy,
Spark-distributed fit.

Reference: the torch ``LSTMPredictor`` (``models.py:113-155``) and
``TransformerModel`` (``models.py:157-208``) and their training loop
(``train_models.py``). Torch is not installed in this environment, so
both cells are implemented directly in float64 numpy with hand-derived
backprop and Adam, deterministic under a fixed seed — these are *real*
trained models (gradients finite-difference-checked, loss provably
decreases, learn held-out synthetic rules in tests), not stubbed
forwards; the seeded stub in ``ml/sequence.py`` remains only as the
zero-dependency fallback for plumbing tests.

Distribution model (the part torch would not give us anyway), shared by
both models via :class:`TrainableSequenceModel`:

- **Inference** plugs into ``ml.sequence.predict_sequences`` unchanged —
  ``model.forward_fn()`` is a ``batch -> probs`` callable captured by the
  ``mapInPandas`` closure, so weights ship to executors by closure
  broadcast and each executor scores its own partitions.
- **Training** (``fit_distributed``) is synchronous data-parallel SGD:
  per epoch, the current weights broadcast to executors, each partition
  computes its *summed* gradient and loss via one vectorized numpy pass
  over its rows (``rdd.mapPartitions``), a ``treeAggregate``-shaped
  reduce adds the per-partition sums, and the driver applies one Adam
  step on the mean gradient. Communication per epoch is O(model size ·
  log partitions), independent of row count — the same full-batch
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


class TrainableSequenceModel:
    """Optimizer + Spark-training + persistence scaffolding shared by
    :class:`NumpyLSTM` and :class:`NumpyTransformer`.

    Subclasses provide ``forward(x, cache=False)``,
    ``backward(p, y, ctx)``, ``get_params``/``set_params`` (flat float64
    vector), and ``_hyper()`` — the constructor kwargs that determine
    every weight shape, so ``cls(**hyper)`` rebuilds an architecture-
    identical instance on executors and at load time.
    """

    d: int  # number of input features — checked against seq_cols

    def _init_opt(self) -> None:
        self._adam_m = None
        self._adam_v = None
        self._adam_t = 0
        self.history: list[dict] = []

    def _hyper(self) -> dict:
        raise NotImplementedError

    def loss_and_grad(self, x: np.ndarray, y: np.ndarray) -> tuple[float, np.ndarray]:
        p, ctx = self.forward(x, cache=True)
        return self.backward(p, y, ctx)

    # -- optimizer -----------------------------------------------------------

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

    # -- training ------------------------------------------------------------

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
        gradient (one vectorized backprop over the partition's rows) →
        depth-2 ``treeAggregate`` add → driver Adam step on the mean.
        """
        n_feat = len(seq_cols)
        assert n_feat == self.d, f"model expects {self.d} features, got {n_feat}"
        cls, hyper = type(self), self._hyper()
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

            def part_grad(rows):
                mats, ys = [], []
                for row in rows:
                    mats.append([row[i] for i in range(n_feat)])
                    ys.append(row[n_feat])
                if not ys:
                    return iter([])
                x = np.asarray(mats, dtype=np.float64).transpose(0, 2, 1)
                yv = np.asarray(ys, dtype=np.float64)
                m = cls(**hyper)
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

    def partial_fit(self, df: DataFrame, seq_cols: list[str], label_col: str,
                    epochs: int = 2, lr: float = 0.01, tracker=None) -> list[dict]:
        """Warm-start continuation for ``foreachBatch`` incremental update
        (reference ``dashboard.py:2056-2133``): unlike the tree-ensemble
        ``IncrementalTrainer`` (which must refit on a replay buffer), the
        sequence models carry their weights AND Adam state across
        micro-batches, so each call is a true incremental step on just
        the new data."""
        return self.fit_distributed(df, seq_cols, label_col,
                                    epochs=epochs, lr=lr, tracker=tracker)

    # -- inference & persistence --------------------------------------------

    def forward_fn(self):
        """``batch -> probs`` closure for ``ml.sequence.predict_sequences``
        (weights captured by value: executor-safe, no Spark references)."""
        cls, hyper = type(self), self._hyper()
        params = self.get_params().copy()

        def fwd(batch: np.ndarray) -> np.ndarray:
            m = cls(**hyper)
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
            json.dump({"model": type(self).__name__, "hyper": self._hyper(),
                       "adam_t": self._adam_t,
                       "history": self.history}, f)

    @classmethod
    def load(cls, path: str):
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        m = cls(**meta["hyper"])
        m.set_params(np.load(os.path.join(path, "params.npy")))
        m.history = meta.get("history", [])
        m._adam_t = meta.get("adam_t", 0)
        m_path = os.path.join(path, "adam_m.npy")
        if os.path.exists(m_path):
            m._adam_m = np.load(m_path)
            m._adam_v = np.load(os.path.join(path, "adam_v.npy"))
        return m


class NumpyLSTM(TrainableSequenceModel):
    """Single-layer LSTM binary classifier with BPTT + Adam (numpy).

    Reference ``models.py:113-155`` (``LSTMPredictor``). Weight layout:
    ``w_x (d, 4H)``, ``w_h (H, 4H)``, ``b (4H,)`` with the gate order
    ``[input, forget, cell, output]``; readout ``w_out (H,)``, ``b_out``.
    Forget-gate bias initialized to +1 (standard trick so early training
    does not forget everything).
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
        self._init_opt()

    def _hyper(self) -> dict:
        return {"n_features": self.d, "hidden": self.h}

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


def _positional_encoding(t_len: int, h: int) -> np.ndarray:
    """Fixed sinusoidal positional encoding (Vaswani et al. 2017, public),
    shape (t_len, h)."""
    pos = np.arange(t_len)[:, None].astype(np.float64)
    half = (h + 1) // 2
    div = np.exp(-np.log(10000.0) * (2 * np.arange(half)) / h)
    pe = np.zeros((t_len, h))
    pe[:, 0::2] = np.sin(pos * div)[:, : (h + 1) // 2]
    pe[:, 1::2] = np.cos(pos * div)[:, : h // 2]
    return pe


class NumpyTransformer(TrainableSequenceModel):
    """Single-block, single-head Transformer encoder binary classifier
    (numpy, hand-derived backprop + Adam).

    Reference ``models.py:157-208`` (``TransformerModel``: input
    projection → ``nn.TransformerEncoder`` → last token → linear →
    sigmoid). Honest simplifications, documented rather than hidden:
    one encoder block with one attention head (reference defaults:
    2 layers, 4 heads), no dropout/batch-norm (full-batch float64
    training doesn't need the regularizers), internal LayerNorms
    omitted (identity) — the residual structure is kept. A fixed
    sinusoidal positional encoding is ADDED (the reference's encoder
    has none, leaving it nearly permutation-invariant; position
    information is the point of a sequence model).

    Key structural economy: with ONE block and a last-token readout,
    only the last token's attention query and FFN path influence the
    output — attending FROM the last position TO every position is
    mathematically identical to running the full encoder and slicing
    ``out[:, -1, :]``, at 1/T the FFN cost. The keys/values (and their
    gradients) still span every position, so the model genuinely mixes
    the whole sequence.

    Weights: ``w_in (d,H)``, ``b_in (H)``, ``wq/wk/wv/wo (H,H)``,
    FFN ``w1 (H,F)``, ``b1 (F)``, ``w2 (F,H)``, ``b2 (H)``, readout
    ``w_out (H)``, ``b_out``; ``F = 2H`` by default.
    """

    def __init__(self, n_features: int, hidden: int = 16,
                 ffn: int | None = None, seed: int = 42):
        self.d = n_features
        self.h = hidden
        self.f = ffn if ffn is not None else 2 * hidden
        rng = np.random.default_rng(seed)
        s_in = 1.0 / np.sqrt(max(n_features, 1))
        s_h = 1.0 / np.sqrt(hidden)
        s_f = 1.0 / np.sqrt(self.f)
        self.w_in = rng.standard_normal((n_features, hidden)) * s_in
        self.b_in = np.zeros(hidden)
        self.wq = rng.standard_normal((hidden, hidden)) * s_h
        self.wk = rng.standard_normal((hidden, hidden)) * s_h
        self.wv = rng.standard_normal((hidden, hidden)) * s_h
        self.wo = rng.standard_normal((hidden, hidden)) * s_h
        self.w1 = rng.standard_normal((hidden, self.f)) * s_h
        self.b1 = np.zeros(self.f)
        self.w2 = rng.standard_normal((self.f, hidden)) * s_f
        self.b2 = np.zeros(hidden)
        self.w_out = rng.standard_normal(hidden) * s_h
        self.b_out = 0.0
        self._init_opt()

    def _hyper(self) -> dict:
        return {"n_features": self.d, "hidden": self.h, "ffn": self.f}

    _FIELDS = ["w_in", "b_in", "wq", "wk", "wv", "wo",
               "w1", "b1", "w2", "b2", "w_out"]

    def get_params(self) -> np.ndarray:
        return np.concatenate(
            [getattr(self, f).ravel() for f in self._FIELDS] + [[self.b_out]])

    def set_params(self, flat: np.ndarray) -> None:
        i = 0
        for f in self._FIELDS:
            shape = getattr(self, f).shape
            size = int(np.prod(shape))
            setattr(self, f, flat[i:i + size].reshape(shape).copy())
            i += size
        self.b_out = float(flat[i])

    # -- forward / backward --------------------------------------------------

    def forward(self, x: np.ndarray, cache: bool = False):
        """x: (n, T, d) -> probs (n,)."""
        n, t_len, _ = x.shape
        pe = _positional_encoding(t_len, self.h)
        z0 = x @ self.w_in + self.b_in + pe            # (n,T,H)
        k = z0 @ self.wk                               # (n,T,H)
        v = z0 @ self.wv                               # (n,T,H)
        q = z0[:, -1, :] @ self.wq                     # (n,H) last-token query
        scale = 1.0 / np.sqrt(self.h)
        scores = np.einsum("nh,nth->nt", q, k) * scale  # (n,T)
        scores -= scores.max(axis=1, keepdims=True)     # stable softmax
        e = np.exp(scores)
        a = e / e.sum(axis=1, keepdims=True)            # (n,T)
        s = np.einsum("nt,nth->nh", a, v)               # (n,H)
        z1 = z0[:, -1, :] + s @ self.wo                 # residual (n,H)
        pre = z1 @ self.w1 + self.b1                    # (n,F)
        f1 = np.maximum(pre, 0.0)
        z2 = z1 + f1 @ self.w2 + self.b2                # residual (n,H)
        logit = z2 @ self.w_out + self.b_out
        p = _sigmoid(logit)
        if cache:
            return p, (x, z0, q, k, v, a, s, z1, pre, f1, z2)
        return p

    def backward(self, p: np.ndarray, y: np.ndarray, ctx) -> tuple[float, np.ndarray]:
        x, z0, q, k, v, a, s, z1, pre, f1, z2 = ctx
        n = x.shape[0]
        eps = 1e-12
        loss = float(-np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))
        dlogit = (p - y) / n                            # (n,)
        g_w_out = z2.T @ dlogit
        g_b_out = float(dlogit.sum())
        dz2 = dlogit[:, None] * self.w_out[None, :]     # (n,H)
        # FFN (residual)
        df1 = dz2 @ self.w2.T                           # (n,F)
        g_w2 = f1.T @ dz2
        g_b2 = dz2.sum(axis=0)
        dpre = df1 * (pre > 0)
        g_w1 = z1.T @ dpre
        g_b1 = dpre.sum(axis=0)
        dz1 = dz2 + dpre @ self.w1.T                    # (n,H)
        # attention output projection (residual)
        g_wo = s.T @ dz1
        ds = dz1 @ self.wo.T                            # (n,H)
        # s = sum_t a[n,t] v[n,t,:]
        da = np.einsum("nh,nth->nt", ds, v)             # (n,T)
        dv = a[:, :, None] * ds[:, None, :]             # (n,T,H)
        # softmax jacobian (rowwise)
        dscores = a * (da - (da * a).sum(axis=1, keepdims=True))
        scale = 1.0 / np.sqrt(self.h)
        dq = np.einsum("nt,nth->nh", dscores, k) * scale
        dk = dscores[:, :, None] * q[:, None, :] * scale  # (n,T,H)
        g_wq = z0[:, -1, :].T @ dq
        g_wk = np.einsum("nth,ntk->hk", z0, dk)
        g_wv = np.einsum("nth,ntk->hk", z0, dv)
        dz0 = dk @ self.wk.T + dv @ self.wv.T           # (n,T,H)
        dz0[:, -1, :] += dz1 + dq @ self.wq.T           # residual + query
        g_w_in = np.einsum("ntd,nth->dh", x, dz0)
        g_b_in = dz0.sum(axis=(0, 1))
        grads = {"w_in": g_w_in, "b_in": g_b_in, "wq": g_wq, "wk": g_wk,
                 "wv": g_wv, "wo": g_wo, "w1": g_w1, "b1": g_b1,
                 "w2": g_w2, "b2": g_b2, "w_out": g_w_out}
        grad = np.concatenate(
            [grads[f].ravel() for f in self._FIELDS] + [[g_b_out]])
        return loss, grad
