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


def _lstm_cell_forward(x: np.ndarray, w_x: np.ndarray, w_h: np.ndarray,
                       b: np.ndarray):
    """One LSTM direction over a full sequence. x: (n, T, in) ->
    (h_seq (n, T, H), per-step cache)."""
    n, t_len, _ = x.shape
    hh = w_h.shape[0]
    h = np.zeros((n, hh))
    c = np.zeros((n, hh))
    steps = []
    h_seq = np.empty((n, t_len, hh))
    for t in range(t_len):
        z = x[:, t, :] @ w_x + h @ w_h + b
        i_g = _sigmoid(z[:, :hh])
        f_g = _sigmoid(z[:, hh:2 * hh])
        g_g = np.tanh(z[:, 2 * hh:3 * hh])
        o_g = _sigmoid(z[:, 3 * hh:])
        c_new = f_g * c + i_g * g_g
        h_new = o_g * np.tanh(c_new)
        steps.append((h, c, i_g, f_g, g_g, o_g, c_new))
        h, c = h_new, c_new
        h_seq[:, t, :] = h
    return h_seq, steps


def _lstm_cell_backward(dh_seq: np.ndarray, x: np.ndarray, steps,
                        w_x: np.ndarray, w_h: np.ndarray):
    """Full BPTT for one direction given the loss gradient w.r.t. EVERY
    timestep's hidden output (stacked layers consume the whole h_seq,
    not just the last step). Returns (dx_seq, g_w_x, g_w_h, g_b)."""
    n, t_len, _ = x.shape
    hh = w_h.shape[0]
    dh_rec = np.zeros((n, hh))
    dc = np.zeros((n, hh))
    g_w_x = np.zeros_like(w_x)
    g_w_h = np.zeros_like(w_h)
    g_b = np.zeros(4 * hh)
    dx = np.zeros_like(x)
    for t in range(t_len - 1, -1, -1):
        dh = dh_seq[:, t, :] + dh_rec
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
        dx[:, t, :] = dz @ w_x.T
        dh_rec = dz @ w_h.T
        dc = dc * f_g
    return dx, g_w_x, g_w_h, g_b


class NumpyLSTM(TrainableSequenceModel):
    """Stackable, optionally bidirectional LSTM binary classifier with
    full BPTT + Adam (numpy).

    Reference ``models.py:113-155`` (``LSTMPredictor``; its defaults are
    2 layers, bidirectional, hidden 64 — reachable here via
    ``NumpyLSTM(d, hidden=64, layers=2, bidirectional=True)``; this
    repo's pipelines default to the smaller 1×16 unidirectional config,
    which trains faster at identical scaffolding). Per direction the
    weight layout is ``w_x (in, 4H)``, ``w_h (H, 4H)``, ``b (4H,)``
    with gate order ``[input, forget, cell, output]`` and forget bias
    +1; layer l>0 consumes the (n, T, H·dirs) output sequence of layer
    l-1, and the readout ``w_out (H·dirs,)`` reads the LAST timestep of
    the top layer (torch semantics: that slot concatenates the forward
    cell's step T-1 with the backward cell's step 0 — the step that has
    seen the whole reversed sequence). Dropout/batch-norm are omitted:
    full-batch float64 training doesn't need the regularizers.

    For ``layers=1, bidirectional=False`` the flat parameter vector is
    byte-identical to the round-3/4 single-layer layout, so existing
    saved models load unchanged.
    """

    def __init__(self, n_features: int, hidden: int = 16, seed: int = 42,
                 layers: int = 1, bidirectional: bool = False):
        if layers < 1:
            raise ValueError(f"layers must be >= 1, got {layers}")
        self.d = n_features
        self.h = hidden
        self.layers = layers
        self.bidirectional = bool(bidirectional)
        self.dirs = 2 if bidirectional else 1
        rng = np.random.default_rng(seed)
        self.w_x, self.w_h, self.b = [], [], []
        for layer in range(layers):
            in_dim = n_features if layer == 0 else hidden * self.dirs
            s = 1.0 / np.sqrt(max(in_dim, 1))
            sh = 1.0 / np.sqrt(hidden)
            wx_l, wh_l, b_l = [], [], []
            for _ in range(self.dirs):
                wx_l.append(rng.standard_normal((in_dim, 4 * hidden)) * s)
                wh_l.append(rng.standard_normal((hidden, 4 * hidden)) * sh)
                bb = np.zeros(4 * hidden)
                bb[hidden:2 * hidden] = 1.0  # forget bias
                b_l.append(bb)
            self.w_x.append(wx_l)
            self.w_h.append(wh_l)
            self.b.append(b_l)
        self.w_out = rng.standard_normal(hidden * self.dirs) \
            * (1.0 / np.sqrt(hidden * self.dirs))
        self.b_out = 0.0
        self._init_opt()

    def _hyper(self) -> dict:
        return {"n_features": self.d, "hidden": self.h,
                "layers": self.layers, "bidirectional": self.bidirectional}

    # -- parameter (de)serialization as one flat vector ---------------------

    def get_params(self) -> np.ndarray:
        parts = []
        for layer in range(self.layers):
            for d_ in range(self.dirs):
                parts += [self.w_x[layer][d_].ravel(),
                          self.w_h[layer][d_].ravel(),
                          self.b[layer][d_]]
        parts += [self.w_out, [self.b_out]]
        return np.concatenate(parts)

    def set_params(self, flat: np.ndarray) -> None:
        i = 0
        for layer in range(self.layers):
            for d_ in range(self.dirs):
                for attr in ("w_x", "w_h", "b"):
                    cur = getattr(self, attr)[layer][d_]
                    size = cur.size
                    getattr(self, attr)[layer][d_] = \
                        flat[i:i + size].reshape(cur.shape).copy()
                    i += size
        size = self.w_out.size
        self.w_out = flat[i:i + size].copy(); i += size
        self.b_out = float(flat[i])

    # -- forward / backward --------------------------------------------------

    def forward(self, x: np.ndarray, cache: bool = False):
        """x: (n, T, d) -> probs (n,). With ``cache`` returns the per-layer
        per-step activations needed by :meth:`backward`."""
        inp = x
        layer_ctx = []
        for layer in range(self.layers):
            h_f, steps_f = _lstm_cell_forward(
                inp, self.w_x[layer][0], self.w_h[layer][0], self.b[layer][0])
            if self.bidirectional:
                rev = inp[:, ::-1, :]
                h_b_rev, steps_b = _lstm_cell_forward(
                    rev, self.w_x[layer][1], self.w_h[layer][1],
                    self.b[layer][1])
                out = np.concatenate([h_f, h_b_rev[:, ::-1, :]], axis=2)
                layer_ctx.append((inp, steps_f, rev, steps_b))
            else:
                out = h_f
                layer_ctx.append((inp, steps_f, None, None))
            inp = out
        last = inp[:, -1, :]
        logit = last @ self.w_out + self.b_out
        p = _sigmoid(logit)
        if cache:
            return p, (x, layer_ctx, last)
        return p

    def backward(self, p: np.ndarray, y: np.ndarray, ctx) -> tuple[float, np.ndarray]:
        """Mean BCE loss + flat gradient for one batch (full BPTT through
        every layer and direction)."""
        x, layer_ctx, last = ctx
        n, t_len, _ = x.shape
        hh = self.h
        eps = 1e-12
        loss = float(-np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))
        dlogit = (p - y) / n                      # (n,)
        g_w_out = last.T @ dlogit
        g_b_out = float(dlogit.sum())
        dout = np.zeros((n, t_len, hh * self.dirs))
        dout[:, -1, :] = dlogit[:, None] * self.w_out[None, :]
        layer_grads = [None] * self.layers
        for layer in range(self.layers - 1, -1, -1):
            inp, steps_f, rev, steps_b = layer_ctx[layer]
            dx_f, g_wx_f, g_wh_f, g_b_f = _lstm_cell_backward(
                dout[:, :, :hh], inp, steps_f,
                self.w_x[layer][0], self.w_h[layer][0])
            if self.bidirectional:
                # the backward cell ran over the time-reversed input; its
                # per-step output gradient is the reversed tail slice
                dh_b_rev = dout[:, ::-1, hh:]
                dx_b_rev, g_wx_b, g_wh_b, g_b_b = _lstm_cell_backward(
                    dh_b_rev, rev, steps_b,
                    self.w_x[layer][1], self.w_h[layer][1])
                dinp = dx_f + dx_b_rev[:, ::-1, :]
                layer_grads[layer] = [g_wx_f.ravel(), g_wh_f.ravel(), g_b_f,
                                      g_wx_b.ravel(), g_wh_b.ravel(), g_b_b]
            else:
                dinp = dx_f
                layer_grads[layer] = [g_wx_f.ravel(), g_wh_f.ravel(), g_b_f]
            dout = dinp
        parts = []
        for layer in range(self.layers):
            parts += layer_grads[layer]
        parts += [g_w_out, [g_b_out]]
        return loss, np.concatenate(parts)


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
    """Stackable multi-head Transformer encoder binary classifier
    (numpy, hand-derived backprop + Adam).

    Reference ``models.py:157-208`` (``TransformerModel``: input
    projection → ``nn.TransformerEncoder`` → last token → linear →
    sigmoid; reference defaults 2 layers / 4 heads — reachable here via
    ``NumpyTransformer(d, hidden=16, n_layers=2, n_heads=4)``).
    Remaining honest simplifications, documented rather than hidden:
    no dropout (full-batch float64 training doesn't need the
    regularizer), internal LayerNorms omitted (identity) — the
    residual structure is kept. A fixed sinusoidal positional encoding
    is ADDED (the reference's encoder has none, leaving it nearly
    permutation-invariant; position information is the point of a
    sequence model).

    Every block runs FULL self-attention at every position (the round-4
    single-block last-token-query economy was retired when stacking
    landed: with L>1 blocks, every position of block l feeds block l+1,
    so all queries are live; for L=1 the full encoder sliced at
    ``[:, -1, :]`` is mathematically identical to the old economy path
    — same probabilities, same gradients — just more arithmetic, which
    is negligible at these model sizes). Multi-head attention splits H
    into ``n_heads`` slices of H/n_heads with per-head softmax (scale
    1/√(H/n_heads)), concatenated before the output projection —
    Vaswani et al. 2017, public.

    Per-block weights: ``wq/wk/wv/wo (H,H)``, FFN ``w1 (H,F)``,
    ``b1 (F)``, ``w2 (F,H)``, ``b2 (H)``; shared ``w_in (d,H)``,
    ``b_in (H)``, readout ``w_out (H)``, ``b_out``; ``F = 2H`` by
    default. For ``n_layers=1`` the flat parameter layout is identical
    to the round-4 single-block vector, so saved models load unchanged.
    """

    _BLOCK_FIELDS = ["wq", "wk", "wv", "wo", "w1", "b1", "w2", "b2"]

    def __init__(self, n_features: int, hidden: int = 16,
                 ffn: int | None = None, seed: int = 42,
                 n_layers: int = 1, n_heads: int = 1):
        if n_layers < 1:
            raise ValueError(f"n_layers must be >= 1, got {n_layers}")
        if hidden % n_heads != 0:
            raise ValueError(
                f"hidden ({hidden}) must divide evenly by n_heads ({n_heads})")
        self.d = n_features
        self.h = hidden
        self.f = ffn if ffn is not None else 2 * hidden
        self.n_layers = n_layers
        self.n_heads = n_heads
        rng = np.random.default_rng(seed)
        s_in = 1.0 / np.sqrt(max(n_features, 1))
        s_h = 1.0 / np.sqrt(hidden)
        s_f = 1.0 / np.sqrt(self.f)
        self.w_in = rng.standard_normal((n_features, hidden)) * s_in
        self.b_in = np.zeros(hidden)
        self.blocks = []
        for _ in range(n_layers):
            self.blocks.append({
                "wq": rng.standard_normal((hidden, hidden)) * s_h,
                "wk": rng.standard_normal((hidden, hidden)) * s_h,
                "wv": rng.standard_normal((hidden, hidden)) * s_h,
                "wo": rng.standard_normal((hidden, hidden)) * s_h,
                "w1": rng.standard_normal((hidden, self.f)) * s_h,
                "b1": np.zeros(self.f),
                "w2": rng.standard_normal((self.f, hidden)) * s_f,
                "b2": np.zeros(hidden),
            })
        self.w_out = rng.standard_normal(hidden) * s_h
        self.b_out = 0.0
        self._init_opt()

    def _hyper(self) -> dict:
        return {"n_features": self.d, "hidden": self.h, "ffn": self.f,
                "n_layers": self.n_layers, "n_heads": self.n_heads}

    def get_params(self) -> np.ndarray:
        parts = [self.w_in.ravel(), self.b_in]
        for blk in self.blocks:
            parts += [blk[f].ravel() for f in self._BLOCK_FIELDS]
        parts += [self.w_out, [self.b_out]]
        return np.concatenate(parts)

    def set_params(self, flat: np.ndarray) -> None:
        i = 0
        for arr_name in ("w_in", "b_in"):
            cur = getattr(self, arr_name)
            setattr(self, arr_name, flat[i:i + cur.size]
                    .reshape(cur.shape).copy())
            i += cur.size
        for blk in self.blocks:
            for f in self._BLOCK_FIELDS:
                cur = blk[f]
                blk[f] = flat[i:i + cur.size].reshape(cur.shape).copy()
                i += cur.size
        self.w_out = flat[i:i + self.w_out.size].copy()
        i += self.w_out.size
        self.b_out = float(flat[i])

    # -- forward / backward --------------------------------------------------

    def forward(self, x: np.ndarray, cache: bool = False):
        """x: (n, T, d) -> probs (n,)."""
        n, t_len, _ = x.shape
        nh, hd = self.n_heads, self.h // self.n_heads
        scale = 1.0 / np.sqrt(hd)
        pe = _positional_encoding(t_len, self.h)
        z = x @ self.w_in + self.b_in + pe             # (n,T,H)
        block_ctx = []
        for blk in self.blocks:
            q = (z @ blk["wq"]).reshape(n, t_len, nh, hd)
            k = (z @ blk["wk"]).reshape(n, t_len, nh, hd)
            v = (z @ blk["wv"]).reshape(n, t_len, nh, hd)
            scores = np.einsum("nqhd,nkhd->nhqk", q, k) * scale
            scores -= scores.max(axis=3, keepdims=True)  # stable softmax
            e = np.exp(scores)
            a = e / e.sum(axis=3, keepdims=True)         # (n,nh,T,T)
            s = np.einsum("nhqk,nkhd->nqhd", a, v).reshape(n, t_len, self.h)
            z1 = z + s @ blk["wo"]                       # residual (n,T,H)
            pre = z1 @ blk["w1"] + blk["b1"]             # (n,T,F)
            f1 = np.maximum(pre, 0.0)
            z2 = z1 + f1 @ blk["w2"] + blk["b2"]         # residual (n,T,H)
            block_ctx.append((z, q, k, v, a, s, z1, pre, f1))
            z = z2
        last = z[:, -1, :]
        logit = last @ self.w_out + self.b_out
        p = _sigmoid(logit)
        if cache:
            return p, (x, block_ctx, last)
        return p

    def backward(self, p: np.ndarray, y: np.ndarray, ctx) -> tuple[float, np.ndarray]:
        x, block_ctx, last = ctx
        n, t_len, _ = x.shape
        nh, hd = self.n_heads, self.h // self.n_heads
        scale = 1.0 / np.sqrt(hd)
        eps = 1e-12
        loss = float(-np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))
        dlogit = (p - y) / n                            # (n,)
        g_w_out = last.T @ dlogit
        g_b_out = float(dlogit.sum())
        dz = np.zeros((n, t_len, self.h))
        dz[:, -1, :] = dlogit[:, None] * self.w_out[None, :]
        block_grads = [None] * self.n_layers
        for li in range(self.n_layers - 1, -1, -1):
            blk = self.blocks[li]
            z_in, q, k, v, a, s, z1, pre, f1 = block_ctx[li]
            dz2 = dz                                     # (n,T,H)
            # FFN (residual)
            df1 = dz2 @ blk["w2"].T                      # (n,T,F)
            g_w2 = np.einsum("ntf,nth->fh", f1, dz2)
            g_b2 = dz2.sum(axis=(0, 1))
            dpre = df1 * (pre > 0)
            g_w1 = np.einsum("nth,ntf->hf", z1, dpre)
            g_b1 = dpre.sum(axis=(0, 1))
            dz1 = dz2 + dpre @ blk["w1"].T               # (n,T,H)
            # attention output projection (residual)
            g_wo = np.einsum("nth,ntk->hk", s, dz1)
            ds = (dz1 @ blk["wo"].T).reshape(n, t_len, nh, hd)
            da = np.einsum("nqhd,nkhd->nhqk", ds, v)     # (n,nh,T,T)
            dv = np.einsum("nhqk,nqhd->nkhd", a, ds)
            # softmax jacobian (per query row)
            dscores = a * (da - (da * a).sum(axis=3, keepdims=True))
            dq = np.einsum("nhqk,nkhd->nqhd", dscores, k) * scale
            dk = np.einsum("nhqk,nqhd->nkhd", dscores, q) * scale
            dq_f = dq.reshape(n, t_len, self.h)
            dk_f = dk.reshape(n, t_len, self.h)
            dv_f = dv.reshape(n, t_len, self.h)
            g_wq = np.einsum("nth,ntk->hk", z_in, dq_f)
            g_wk = np.einsum("nth,ntk->hk", z_in, dk_f)
            g_wv = np.einsum("nth,ntk->hk", z_in, dv_f)
            # residual: z1 = z_in + attn, so dz1 flows straight through
            dz = (dz1 + dq_f @ blk["wq"].T + dk_f @ blk["wk"].T
                  + dv_f @ blk["wv"].T)
            grads = {"wq": g_wq, "wk": g_wk, "wv": g_wv, "wo": g_wo,
                     "w1": g_w1, "b1": g_b1, "w2": g_w2, "b2": g_b2}
            block_grads[li] = [grads[f].ravel() for f in self._BLOCK_FIELDS]
        g_w_in = np.einsum("ntd,nth->dh", x, dz)
        g_b_in = dz.sum(axis=(0, 1))
        parts = [g_w_in.ravel(), g_b_in]
        for bg in block_grads:
            parts += bg
        parts += [g_w_out, [g_b_out]]
        return loss, np.concatenate(parts)
