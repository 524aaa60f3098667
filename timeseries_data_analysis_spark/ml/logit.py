"""Distributed logistic regression via full-batch gradient descent.

The quality-classifier trainer curation pipelines put behind their
heuristic scores (reference: ``models.py`` trains its per-target heads
with an sklearn-style fit loop on a single node; SURVEY.md §2.11 maps
that to a distributed fit).  Here each gradient step is ONE DataFrame
aggregation::

    grad_j = mean( (y_i - sigmoid(x_i . beta)) * x_ij )

which Spark executes with map-side partial aggregation — the shuffle
per step is ``len(beta)`` doubles per partition, independent of row
count, so the fit scales to any corpus the scan itself survives.  The
only driver-side state is the beta vector (K-bounded, the same
contract as the BPE argmax loop in ``operators/tokenizer.py``).

Cross-engine determinism: each step's betas are rounded to ``QUANT``
decimals before the next step's sigmoid, so Spark and a SQL oracle
that unrolls the same steps walk identical doubles up to
summation-order ulps (absorbed by the rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-step beta quantization (decimal places). Coarse enough to absorb
# summation-order ulp noise between engines, fine enough that 2-30
# quantized steps track the un-quantized trajectory to ~1e-8.
QUANT = 9


def _logits(xcols: list[str], beta: list[float]) -> Column:
    """beta[0] + sum_j beta[j+1] * x_j as a single column expression."""
    z: Column = F.lit(float(beta[0]))
    for j, c in enumerate(xcols):
        z = z + F.lit(float(beta[j + 1])) * F.col(c)
    return z


def gd_step(df: DataFrame, xcols: list[str], ycol: str,
            beta: list[float], lr: float = 0.5) -> list[float]:
    """One full-batch gradient-ascent step on the log-likelihood.

    Returns the new beta (Python floats, ``QUANT``-rounded).  The
    aggregation is a single job: ``1 + len(xcols)`` avg() columns over
    one scan, combinable map-side.
    """
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logits(xcols, beta)))
    resid = F.col(ycol).cast("double") - p
    aggs = [F.avg(resid).alias("g0")]
    aggs += [F.avg(resid * F.col(c)).alias(f"g{j + 1}")
             for j, c in enumerate(xcols)]
    row = df.agg(*aggs).first()
    # +1e-12 nudge BEFORE rounding (the ROUND_EPS discipline at 9 dp):
    # moves summation-order ulp noise off decimal boundaries so Python
    # round (banker's) and SQL round (half-away) see the same side.
    return [round(beta[j] + lr * float(row[f"g{j}"]) + 1e-12, QUANT)
            for j in range(len(beta))]


def fit(df: DataFrame, xcols: list[str], ycol: str,
        lr: float = 0.5, steps: int = 2,
        beta0: list[float] | None = None) -> list[float]:
    """Full-batch GD fit: ``steps`` jobs, each one aggregate-only pass.

    The driver loop holds only the beta vector; with ``steps`` fixed
    and small this is the bounded-driver-state pattern, not a
    collect-the-data anti-pattern.
    """
    beta = list(beta0) if beta0 is not None else [0.0] * (len(xcols) + 1)
    for _ in range(steps):
        beta = gd_step(df, xcols, ycol, beta, lr)
    return beta


def log_loss(df: DataFrame, xcols: list[str], ycol: str,
             beta: list[float]) -> Column:
    """Mean negative log-likelihood at ``beta`` (aggregate column).

    Uses the numerically-stable form ``softplus(z) - y*z`` =
    ``ln(1+exp(z)) - y*z``, identical algebra on both engines.
    """
    z = _logits(xcols, beta)
    y = F.col(ycol).cast("double")
    # stable softplus: max(z,0) + ln(1 + exp(-|z|))
    sp = F.greatest(z, F.lit(0.0)) + F.log(F.lit(1.0) + F.exp(-F.abs(z)))
    return F.avg(sp - y * z)


def predict(df: DataFrame, xcols: list[str],
            beta: list[float]) -> Column:
    """sigmoid(x . beta) as a column — scoring is scan-parallel."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_logits(xcols, beta)))


def pinball_gd_step(df: DataFrame, xcols: list[str], ycol: str,
                    beta: list[float], tau: float = 0.5,
                    lr: float = 0.5) -> list[float]:
    """One full-batch subgradient step of QUANTILE regression (pinball
    loss): beta_j += lr * mean(x_j * (tau - 1{y <= x.beta})).  The
    same one-combinable-aggregate-per-step contract as :func:`gd_step`
    and the same 9-dp quantization, so a SQL oracle can unroll the
    identical trajectory.  tau = 0.5 is distributed median regression
    — the trained twin of the Theil-Sen estimator."""
    z = _logits(xcols, beta)
    ind = (F.col(ycol).cast("double") <= z).cast("double")
    g = F.lit(float(tau)) - ind
    aggs = [F.avg(g).alias("g0")]
    aggs += [F.avg(g * F.col(c)).alias(f"g{j + 1}")
             for j, c in enumerate(xcols)]
    row = df.agg(*aggs).first()
    return [round(beta[j] + lr * float(row[f"g{j}"]) + 1e-12, QUANT)
            for j in range(len(beta))]


def pinball_fit(df: DataFrame, xcols: list[str], ycol: str,
                tau: float = 0.5, lr: float = 0.5,
                steps: int = 2,
                beta0: list[float] | None = None) -> list[float]:
    """``steps`` pinball subgradient steps (bounded driver state)."""
    beta = list(beta0) if beta0 is not None else [0.0] * (len(xcols) + 1)
    for _ in range(steps):
        beta = pinball_gd_step(df, xcols, ycol, beta, tau, lr)
    return beta


def pinball_loss(df: DataFrame, xcols: list[str], ycol: str,
                 beta: list[float], tau: float = 0.5) -> Column:
    """Mean pinball loss at ``beta``: mean(max(tau*r, (tau-1)*r))."""
    r = F.col(ycol).cast("double") - _logits(xcols, beta)
    return F.avg(F.greatest(F.lit(float(tau)) * r,
                            F.lit(float(tau) - 1.0) * r))
