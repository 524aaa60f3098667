"""Kaplan-Meier survival estimation over event streams.

Churn/retention analysis at warehouse scale: each subject contributes a
(duration, observed) pair — observed=1 when the terminal event was seen
inside the observation window, 0 when the subject is right-censored by
the window edge. The product-limit estimator
``S(t) = Π_{tᵢ ≤ t, dᵢ>0} (1 − dᵢ/nᵢ)`` needs, per distinct duration,
the death count dᵢ and the at-risk count nᵢ (subjects with duration
≥ tᵢ), then a running product.

Scale shape: the raw table collapses to ONE row per distinct duration
(map-side combined — durations are calendar-bounded, e.g. ≤ a few
thousand days, so the post-agg table is tiny by construction). The
reverse cumulative at-risk count and the running product then run as
windows over that bounded table — a deliberate, documented
bounded-cardinality window, the same contract as the calendar-day
spines elsewhere in this package (`operators/timeseries.py`). The
running product is computed as ``exp(Σ ln(1 − d/n))`` so both engines
execute identical float operations; results round to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def at_risk_table(durations: DataFrame, duration_col: str = "duration",
                  event_col: str = "observed") -> DataFrame:
    """The shared duration-level table both estimators run on: one row
    per distinct duration with ``(n_events, n_censored, n_risk)`` —
    the per-duration collapse is the only fact-sized work; the
    reverse-cumulative at-risk count runs over the calendar-bounded
    result."""
    per_t = (durations.groupBy(F.col(duration_col).alias("duration"))
             .agg(F.sum(F.col(event_col).cast("int")).alias("n_events"),
                  F.sum(F.lit(1) - F.col(event_col).cast("int"))
                  .alias("n_censored"),
                  F.count(F.lit(1)).alias("_n")))
    w_rev = (Window.orderBy(F.col("duration").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return per_t.withColumn("n_risk", F.sum("_n").over(w_rev))


def km_curve(durations: DataFrame, duration_col: str = "duration",
             event_col: str = "observed", round_dp: int = 6) -> DataFrame:
    """Kaplan-Meier curve from per-subject ``(duration, observed)`` rows.

    Returns one row per distinct duration that had ≥1 death:
    ``(duration, n_risk, n_events, n_censored, survival)``. All heavy
    lifting happens in the per-duration collapse; the windows run over
    the calendar-bounded duration-level table only.
    """
    at_risk = at_risk_table(durations, duration_col, event_col)
    # survival = exp( sum of ln(1 - d/n) over durations <= t ); the
    # terminal d == n row (everyone at risk dies) sends S to EXACTLY 0,
    # handled as a propagated flag so neither engine evaluates ln(0)
    w_fwd = (Window.orderBy("duration")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    term = F.when((F.col("n_events") > 0)
                  & (F.col("n_events") < F.col("n_risk")),
                  F.log(F.lit(1.0) - F.col("n_events") / F.col("n_risk"))
                  ).otherwise(F.lit(0.0))
    dead = F.max((F.col("n_events") >= F.col("n_risk")).cast("int")) \
            .over(w_fwd)
    curve = at_risk.withColumn(
        "survival",
        F.when(dead == 1, F.lit(0.0)).otherwise(
            F.round(F.exp(F.sum(term).over(w_fwd)) + F.lit(1e-9),
                    round_dp)))
    return (curve.filter(F.col("n_events") > 0)
            .select("duration", "n_risk", "n_events", "n_censored",
                    "survival")
            .orderBy("duration"))


def na_cumhazard(durations: DataFrame, duration_col: str = "duration",
                 event_col: str = "observed",
                 round_dp: int = 6) -> DataFrame:
    """Nelson-Aalen cumulative hazard from per-subject
    ``(duration, observed)`` rows: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ with the
    Klein variance Σ dᵢ/nᵢ² — the hazard-scale twin of
    :func:`km_curve` (H = −ln S asymptotically; preferred when hazards
    are compared or smoothed). Same scale shape: one per-duration
    collapse, then cumulative windows over the calendar-bounded
    duration-level table. Pure rational increments (no ln), so the
    only cross-engine float surface is summation order, absorbed by
    the ``round_dp`` rounding. Returns one row per duration with ≥1
    death: ``(duration, n_risk, n_events, n_censored, cum_hazard,
    var_hazard)``.
    """
    at_risk = at_risk_table(durations, duration_col, event_col)
    w_fwd = (Window.orderBy("duration")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    inc = F.col("n_events") / F.col("n_risk")
    inc_var = F.col("n_events") / (F.col("n_risk") * F.col("n_risk"))
    curve = (at_risk
             .withColumn("cum_hazard",
                         F.round(F.sum(inc).over(w_fwd) + F.lit(1e-9),
                                 round_dp))
             .withColumn("var_hazard",
                         F.round(F.sum(inc_var).over(w_fwd)
                                 + F.lit(1e-9), round_dp)))
    return (curve.filter(F.col("n_events") > 0)
            .select("duration", "n_risk", "n_events", "n_censored",
                    "cum_hazard", "var_hazard")
            .orderBy("duration"))
