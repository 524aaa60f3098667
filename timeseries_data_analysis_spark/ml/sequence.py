"""Sequence-model batch inference (SURVEY.md §2.10 LSTM/Transformer row).

Reference: PyTorch LSTM/Transformer predictors (``models.py:113-625``)
consuming per-row trailing windows built in a Python loop
(``models.py:66-89``). Here the two halves are split the Spark way:

- **Windowing** is native: ``operators.windows.trailing_sequence`` emits
  fixed-length zero-padded arrays via ``collect_list`` over a row frame —
  JVM-side, one sort per series, no Python (W13, driver-verified by the
  ``sequence_windows`` oracle query).
- **Inference** is an Arrow-batched ``mapInPandas`` stage: sequences
  arrive as numpy batches, the model forward runs vectorized over the
  whole batch, and ONE output column (probability) returns to the JVM.
  This is the ``predict_batch_udf`` shape — at 100 TB each executor
  scores its own partitions; no collect, no driver loop, model weights
  broadcast by closure capture.

The REAL model lives in ``ml.dl.NumpyLSTM`` — a trainable LSTM (full
BPTT + Adam, local or treeAggregate-distributed fit) whose
``forward_fn()`` plugs straight into ``predict_sequences``. The seeded
stub below remains as the zero-dependency fallback for plumbing tests,
and ``torch_forward`` adapts a real torch module when the library is
present. ``predict_sequences`` accepts any ``forward(batch: np.ndarray)
-> np.ndarray`` with that signature.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np

from pyspark.sql import Column, DataFrame, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import windows as WIN

try:  # optional heavy dependency — plumbing must work without it
    import torch  # type: ignore  # noqa: F401
    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False


def sequence_column(col: str, w: WindowSpec, seq_len: int = 10) -> Column:
    """W13 trailing window as a fixed-length array column (native)."""
    return WIN.trailing_sequence(col, w, seq_len=seq_len)


def stub_forward(hidden: int = 16, seed: int = 42
                 ) -> Callable[[np.ndarray], np.ndarray]:
    """Deterministic stand-in for the reference's LSTM forward
    (``models.py:113-208``): seeded dense recurrence ``h = tanh(x·W_x +
    h·W_h)`` folded over the sequence axis, sigmoid readout. Vectorized
    over the batch — the per-batch cost profile of a real cell without
    the torch dependency."""
    def forward(batch: np.ndarray) -> np.ndarray:
        # batch: (n, seq_len, n_features).  The rng is RE-CREATED from the
        # fixed seed on every call: weights are a pure function of
        # (seed, n_features), so every Arrow batch on every executor sees
        # identical parameters regardless of batch/partition boundaries.
        rng = np.random.default_rng(seed)
        n_feat = batch.shape[2]
        w_x = rng.standard_normal((n_feat, hidden)) / np.sqrt(n_feat)
        w_h = rng.standard_normal((hidden, hidden)) / np.sqrt(hidden)
        w_o = rng.standard_normal(hidden) / np.sqrt(hidden)
        h = np.zeros((batch.shape[0], hidden))
        for t in range(batch.shape[1]):  # seq_len steps, batch-vectorized
            h = np.tanh(batch[:, t, :] @ w_x + h @ w_h)
        logit = h @ w_o
        return 1.0 / (1.0 + np.exp(-logit))

    probe = forward(np.zeros((1, 1, 1)))
    assert probe.shape == (1,)
    return forward


def torch_forward(model) -> Callable[[np.ndarray], np.ndarray]:
    """Adapter for a real torch module (gated on availability)."""
    if not HAS_TORCH:
        raise ImportError("torch not available — use stub_forward()")
    import torch as _t

    def forward(batch: np.ndarray) -> np.ndarray:
        with _t.no_grad():
            out = model(_t.from_numpy(batch.astype(np.float32)))
        return out.numpy().reshape(-1)

    return forward


def predict_sequences(df: DataFrame, seq_cols: list[str],
                      forward: Callable[[np.ndarray], np.ndarray] | None = None,
                      out_col: str = "seq_probability") -> DataFrame:
    """Batch inference over trailing-sequence array columns.

    ``seq_cols`` are same-length ``array<double>`` columns (one per
    feature, from ``sequence_column``); each Arrow batch stacks them to a
    ``(n, seq_len, n_features)`` tensor, runs ``forward`` once, and
    appends ``out_col``. The plan is scan → one Python stage → project:
    no shuffle is introduced, so this composes with any upstream
    partitioning.  Batch size is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    fwd = forward or stub_forward()
    schema = T.StructType(df.schema.fields
                          + [T.StructField(out_col, T.DoubleType())])

    def infer(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: np.zeros(0)})
                continue
            feats = np.stack(
                [np.stack(pdf[c].to_numpy()) for c in seq_cols], axis=2)
            yield pdf.assign(**{out_col: fwd(feats)})

    return df.mapInPandas(infer, schema=schema)
