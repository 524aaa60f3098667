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


def logrank_test(durations: DataFrame, arm_col: str = "arm",
                 duration_col: str = "duration",
                 event_col: str = "observed",
                 round_dp: int = 6) -> DataFrame:
    """Two-sample log-rank test (Mantel-Cox) — the inference step the
    KM/NA estimators feed: does arm 0's survival curve differ from
    arm 1's beyond chance? At every distinct event time the observed
    arm-0 deaths are compared with the hypergeometric expectation
    ``E = d·n₀/n`` and variance ``V = d(n₀/n)(n₁/n)(n−d)/(n−1)``;
    ``Z = Σ(O−E)/√ΣV`` and ``chi2 = Z²`` (1 df).

    Scale shape: the per-(arm, duration) collapse is the only
    fact-sized work (map-side combined); the at-risk counts are
    reverse-cumulative windows over the calendar-bounded duration
    grid — the :func:`at_risk_table` contract — densified to the
    POOLED duration grid per arm (a bounded grid × 2 cross join) so
    each arm's at-risk is defined at every pooled event time without
    an as-of join.

    Cross-engine: all counts are exact integers; the per-time E and V
    are ratios of identical integer operands (identical doubles both
    engines); the two Σs are rounded to ``round_dp`` BEFORE forming
    Z so groupBy summation order cannot leak into the statistic.
    Returns ONE row: ``(n_arm0, n_arm1, d_total, o_minus_e, var_sum,
    z, chi2)``.
    """
    # Two-sample test: rows whose arm is not exactly 0 or 1 (or NULL)
    # are DROPPED up front — without this they would pool into the
    # at-risk/death totals while being excluded from the arm-0 O−E
    # side, silently skewing the statistic.
    durations = durations.filter(F.col(arm_col).isin(0, 1))
    per = (durations.groupBy(F.col(arm_col).alias("_arm"),
                             F.col(duration_col).alias("duration"))
           .agg(F.sum(F.col(event_col).cast("int")).alias("_d"),
                F.count(F.lit(1)).alias("_n")))
    durs = per.select("duration").distinct()
    arms = per.select("_arm").distinct()
    grid = durs.crossJoin(F.broadcast(arms))
    filled = (grid.join(per, ["duration", "_arm"], "left")
              .fillna(0, ["_d", "_n"]))
    w_rev = (Window.partitionBy("_arm")
             .orderBy(F.col("duration").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = filled.withColumn("_risk", F.sum("_n").over(w_rev))
    a0 = F.when(F.col("_arm") == 0, F.col("_d"))
    r0 = F.when(F.col("_arm") == 0, F.col("_risk"))
    pooled = (filled.groupBy("duration")
              .agg(F.sum("_d").alias("_dt"),
                   F.sum("_risk").alias("_nt"),
                   F.sum(a0).alias("_d0"),
                   F.sum(r0).alias("_r0")))
    ev = pooled.filter((F.col("_dt") > 0) & (F.col("_nt") > 1))
    p0 = F.col("_r0") / F.col("_nt")
    e0 = F.col("_dt") * p0
    v = (F.col("_dt") * p0 * (F.lit(1.0) - p0)
         * (F.col("_nt") - F.col("_dt")) / (F.col("_nt") - F.lit(1)))
    sums = ev.agg(
        F.round(F.sum(F.col("_d0") - e0) + F.lit(1e-9), round_dp)
        .alias("o_minus_e"),
        F.round(F.sum(v) + F.lit(1e-9), round_dp).alias("var_sum"),
        F.sum("_dt").alias("d_total"))
    counts = (durations.groupBy()
              .agg(F.sum((F.col(arm_col) == 0).cast("int"))
                   .alias("n_arm0"),
                   F.sum((F.col(arm_col) == 1).cast("int"))
                   .alias("n_arm1")))
    z = F.when(F.col("var_sum") > 0,
               F.col("o_minus_e") / F.sqrt(F.col("var_sum"))) \
         .otherwise(F.lit(0.0))
    return (counts.crossJoin(sums)
            .withColumn("z", F.round(z + F.lit(1e-9), round_dp))
            .withColumn("chi2", F.round(F.col("z") * F.col("z")
                                        + F.lit(1e-9), round_dp))
            .select("n_arm0", "n_arm1", "d_total", "o_minus_e",
                    "var_sum", "z", "chi2"))
