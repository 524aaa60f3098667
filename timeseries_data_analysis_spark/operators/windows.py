"""Window feature engine (SURVEY.md §2.5 W1-W12).

The reference implements these as numba JIT kernels over per-column numpy
arrays (``pre_processing.py:333-1148``) and pandas ``.rolling/.shift/
.diff`` (``simple_pre_processing.py:297-925``). Here every one is a
*native Spark window expression* — whole-stage-codegen'd, no Python
boundary, one sort per (partition key) instead of one kernel call per
column.

Scale design:

- All builders take a ``Window`` spec partitioned by the series key(s) and
  ordered by time. Partitioning by series is the scale enabler: each
  series sorts independently, so a 100 TB table with millions of series
  parallelizes across the cluster with no global sort. A *wide* frame
  (500 columns) should be melted to long ``(ts, series, value)`` first —
  see ``operators.pivot.melt`` — so one window pass serves all series
  (SURVEY.md §4 point 3).
- Rolling frames are ROW-based (``rowsBetween``), matching the reference's
  row-count windows over a regular hourly grid. For irregular grids use
  ``rangeBetween`` on ``unix_timestamp`` (builders accept any frame).
- Multiple features over the same (partition, order) share one physical
  Window — Catalyst collapses them into a single ``Window`` operator, so
  adding the 10th rolling stat costs no extra shuffle or sort.

Semantics fidelity notes (SURVEY.md §7.4):

- ``rolling_*`` with ``full_window=True`` emits null until the frame holds
  exactly ``window`` rows — matching the numba kernels
  (``pre_processing.py:545``). ``min_periods`` variants mirror
  ``simple_pre_processing.py:347``.
- ``rolling_std`` defaults to **population** std (ddof=0) like the numba
  kernel (``pre_processing.py:552-585``); pass ``sample=True`` for the
  pandas-variant ddof=1 (``simple_pre_processing.py:888-890``).
- ``anomaly_flags`` uses the *preceding* window **excluding the current
  row** (``values[i-w:i]``, reference ``pre_processing.py:1010``) —
  i.e. ``rowsBetween(-window, -1)``.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

ColumnOrName = Column | str


def series_window(partition_by: list[ColumnOrName] | ColumnOrName,
                  order_by: list[ColumnOrName] | ColumnOrName = "ts") -> WindowSpec:
    """Canonical per-series time window: partition by series key, order by ts.

    Include a unique tiebreak column (e.g. event id) in ``order_by`` when
    timestamps may collide — window results are otherwise nondeterministic
    across runs/engines.
    """
    if not isinstance(partition_by, list):
        partition_by = [partition_by]
    if not isinstance(order_by, list):
        order_by = [order_by]
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def _frame(w: WindowSpec, window: int, exclude_current: bool = False) -> WindowSpec:
    end = -1 if exclude_current else 0
    start = -window if exclude_current else -(window - 1)
    return w.rowsBetween(start, end)


# -- W1: lag / shift ---------------------------------------------------------

def lag_features(col: ColumnOrName, w: WindowSpec,
                 lags: list[int] = (1, 6, 24)) -> dict[str, Column]:
    """``x[t-k]`` for each k; null for the first k rows of a series.

    Reference: numba ``create_lag`` (``pre_processing.py:333-347``) and
    pandas ``shift`` (``simple_pre_processing.py:846-853``).
    """
    name = col if isinstance(col, str) else "value"
    return {f"{name}_lag_{k}": F.lag(col, k).over(w) for k in lags}


# -- W2/W4/W5: rolling mean / min / max with emission rules ------------------

def _masked(agg: Column, col: ColumnOrName, frame: WindowSpec,
            window: int, full_window: bool, min_periods: int | None) -> Column:
    """Apply the reference's emission rule: null unless enough valid rows."""
    if full_window:
        # numba kernels emit only when the frame physically contains
        # `window` rows AND all are counted (null-aware count of valid).
        n = F.count(F.col(col) if isinstance(col, str) else col).over(frame)
        return F.when(n >= window, agg)
    if min_periods is not None and min_periods > 1:
        n = F.count(F.col(col) if isinstance(col, str) else col).over(frame)
        return F.when(n >= min_periods, agg)
    return agg


def rolling_mean(col: ColumnOrName, w: WindowSpec, window: int,
                 full_window: bool = False,
                 min_periods: int | None = None) -> Column:
    """Trailing null-aware rolling mean (reference ``pre_processing.py:520-550``)."""
    frame = _frame(w, window)
    return _masked(F.avg(col).over(frame), col, frame, window, full_window, min_periods)


def rolling_std(col: ColumnOrName, w: WindowSpec, window: int,
                full_window: bool = False, min_periods: int | None = None,
                sample: bool = False) -> Column:
    """Trailing rolling std; population ddof=0 by default (``pre_processing.py:552-585``)."""
    frame = _frame(w, window)
    agg = (F.stddev_samp(col) if sample else F.stddev_pop(col)).over(frame)
    return _masked(agg, col, frame, window, full_window, min_periods)


def rolling_min(col: ColumnOrName, w: WindowSpec, window: int,
                full_window: bool = False) -> Column:
    frame = _frame(w, window)
    return _masked(F.min(col).over(frame), col, frame, window, full_window, None)


def rolling_max(col: ColumnOrName, w: WindowSpec, window: int,
                full_window: bool = False) -> Column:
    frame = _frame(w, window)
    return _masked(F.max(col).over(frame), col, frame, window, full_window, None)


# -- W6: short/long baseline ratio ------------------------------------------

def baseline_ratio(col: ColumnOrName, w: WindowSpec,
                   short: int = 7 * 24, long: int = 30 * 24,
                   long_min_periods: int = 7 * 24) -> Column:
    """``(ma_short / ma_long − 1) · 100`` (reference ``pre_processing.py:1187-1199``)."""
    ma_s = rolling_mean(col, w, short, min_periods=1)
    ma_l = rolling_mean(col, w, long, min_periods=long_min_periods)
    return F.when(F.abs(ma_l) > 1e-9, (ma_s / ma_l - 1.0) * 100.0)


# -- W7: rolling z-score -----------------------------------------------------

def rolling_zscore(col: ColumnOrName, w: WindowSpec, window: int = 30 * 24,
                   min_std: float = 0.001, min_periods: int | None = None,
                   sample: bool = True) -> Column:
    """``(x − ma)/sd`` guarded ``sd > min_std`` (reference ``pre_processing.py:1240-1251``)."""
    ma = rolling_mean(col, w, window, min_periods=min_periods)
    sd = rolling_std(col, w, window, min_periods=min_periods, sample=sample)
    x = F.col(col) if isinstance(col, str) else col
    return F.when(sd > min_std, (x - ma) / sd)


# -- W8: difference / derivative --------------------------------------------

def diff(col: ColumnOrName, w: WindowSpec, periods: int = 1) -> Column:
    """``x[t] − x[t−k]`` (reference ``pre_processing.py:862-864``)."""
    x = F.col(col) if isinstance(col, str) else col
    return x - F.lag(x, periods).over(w)


def gradient_per_second(col: ColumnOrName, ts_col: ColumnOrName, w: WindowSpec) -> Column:
    """``diff(x)/Δseconds`` (reference ``pre_processing.py:878``).

    Microsecond-precision time delta (``unix_micros``) — ``unix_timestamp``
    would truncate to whole seconds, visibly wrong on sub-second or
    irregular grids.
    """
    x = F.col(col) if isinstance(col, str) else col
    t = F.unix_micros(F.col(ts_col) if isinstance(ts_col, str) else ts_col)
    dt_us = t - F.lag(t, 1).over(w)
    dx = x - F.lag(x, 1).over(w)
    return F.when(dt_us > 0, dx / (dt_us / F.lit(1000000.0)))


# -- W9: percent change ------------------------------------------------------

def pct_change(col: ColumnOrName, w: WindowSpec, periods: int = 1,
               scale: float = 100.0) -> Column:
    """``(x/x[t−k] − 1)·100`` (reference ``pre_processing.py:867-871``)."""
    x = F.col(col) if isinstance(col, str) else col
    prev = F.lag(x, periods).over(w)
    return F.when(prev != 0, (x / prev - 1.0) * scale)


# -- W10: consecutive-run detection -----------------------------------------

def consecutive_run_flag(col: ColumnOrName, w: WindowSpec, run: int = 3,
                         direction: str = "down",
                         stable_digits: int | None = None) -> Column:
    """1 when the last ``run`` consecutive deltas all move one way.

    Reference "cooling trend": rolling(3).sum of ``diff()<0`` ≥ 3
    (``pre_processing.py:873-881``).

    ``stable_digits``: round the delta (nudged +1e-9 off exact halves)
    before the sign test. Use when ``col`` is itself a float aggregate
    (e.g. an hourly ``avg``): a delta that is exactly 0 in real arithmetic
    carries ±1ulp summation-order noise that differs between engines, and
    the raw ``d < 0`` test turns that noise into a flag flip. Rounding to
    a precision far above noise (6 dp) but far below real deltas makes the
    discretization engine-stable.
    """
    d = diff(col, w, 1)
    if stable_digits is not None:
        d = F.round(d + F.lit(1e-9), stable_digits)
    flag = (d < 0) if direction == "down" else (d > 0)
    s = F.sum(flag.cast("int")).over(w.rowsBetween(-(run - 1), 0))
    return F.when(s >= run, F.lit(1)).otherwise(F.lit(0))


# -- W11: trailing-window anomaly detection (the reference's bottleneck) ----

def anomaly_features(col: ColumnOrName, w: WindowSpec, window: int = 24,
                     n_sigma: float = 2.0,
                     min_valid_frac: float = 0.5,
                     stable_digits: int | None = None) -> dict[str, Column]:
    """Trailing-window anomaly detector (reference ``pre_processing.py:982-1148``).

    For each row t: μ, σ_pop over the *preceding* ``[t−window, t−1]`` rows
    (current row excluded — ``values[i-w:i]`` at ``pre_processing.py:1010``);
    the stats are valid only when more than ``min_valid_frac`` of the
    window is non-null. Flags: −1 if ``x < μ − nσ`` (drop), +1 if
    ``x > μ + nσ`` (spike), else 0. Drop magnitude: ``(μ−x)/μ·100`` when
    flagged as drop and μ>0.

    The reference's numba kernel is its #1 bottleneck (22.5 s of 34.6 s,
    BASELINE.md). Here it is 4 shared-frame window aggregates inside one
    whole-stage-codegen'd Window operator — the same sort serves all
    series after a melt to long layout.

    ``stable_digits``: discretize the threshold margins ``x − (μ ∓ nσ)``
    (nudged +1e-9 off exact halves) before the sign test. Needed when
    ``col`` is itself a float aggregate: a constant-valued window has
    σ = 0 and a margin of exactly 0, where ±1ulp cross-engine summation
    noise flips the flag. 6 dp is far above noise, far below real margins.
    """
    x = F.col(col) if isinstance(col, str) else col
    frame = w.rowsBetween(-window, -1)
    mu = F.avg(x).over(frame)
    sigma = F.stddev_pop(x).over(frame)
    n_valid = F.count(x).over(frame)
    n_rows = F.count(F.lit(1)).over(frame)
    valid = (n_rows >= window) & (n_valid > window * min_valid_frac)

    if stable_digits is not None:
        drop_cond = F.round(x - (mu - n_sigma * sigma) + F.lit(1e-9),
                            stable_digits) < 0
        spike_cond = F.round(x - (mu + n_sigma * sigma) - F.lit(1e-9),
                             stable_digits) > 0
    else:
        drop_cond = x < mu - n_sigma * sigma
        spike_cond = x > mu + n_sigma * sigma

    flag = (
        F.when(~valid, F.lit(0))
        .when(drop_cond, F.lit(-1))
        .when(spike_cond, F.lit(1))
        .otherwise(F.lit(0))
    )
    drop_mag = F.when(
        valid & drop_cond & (mu > 0), (mu - x) / mu * 100.0
    ).otherwise(F.lit(0.0))
    name = col if isinstance(col, str) else "value"
    return {
        f"{name}_anomaly_flag": flag,
        f"{name}_drop_magnitude": drop_mag,
        f"{name}_baseline_mean": F.when(valid, mu),
        f"{name}_baseline_std": F.when(valid, sigma),
    }


# -- W12: multi-zone (adjacent-series) pattern detection ---------------------

def adjacent_pattern_counts(flags, ts_col: str = "ts",
                            zone_col: str = "zone_idx",
                            flag_col: str = "flag",
                            span: int = 3):
    """Count runs of ``span`` ADJACENT series all flagged at the same ts.

    Reference "multi-zone cooling pattern": AND of 3 adjacent zones'
    cooling flags, then count of patterns + any-pattern flag per timestamp
    (``pre_processing.py:946-967``).

    Long-layout implementation: two self-joins on (ts, zone±offset) would
    shuffle twice; instead ONE window per ts ordered by zone index collects
    the neighboring flags with ``lead`` — zones are dense integers, so
    lead-by-rows equals lead-by-zone. One shuffle on ts, no join.
    Returns (ts, n_patterns, any_pattern).
    """
    w = Window.partitionBy(ts_col).orderBy(zone_col)
    f0 = F.col(flag_col)
    conds = [f0 == 1]
    for k in range(1, span):
        # guard: the k-th neighbor must be exactly k zones away (dense ids)
        conds.append(F.lead(flag_col, k).over(w) == 1)
        conds.append(F.lead(zone_col, k).over(w) == F.col(zone_col) + k)
    acc = conds[0]
    for c in conds[1:]:
        acc = acc & c
    pattern = F.when(acc, F.lit(1)).otherwise(F.lit(0))
    per_row = flags.select(ts_col, pattern.alias("_pat"))
    return (per_row.groupBy(ts_col)
            .agg(F.sum("_pat").alias("n_patterns"),
                 F.max("_pat").alias("any_pattern")))


# -- W13: fixed-length trailing sequence (for sequence models) ---------------

def trailing_sequence(col: ColumnOrName, w: WindowSpec, seq_len: int = 10) -> Column:
    """Trailing ``seq_len`` values as an array, left-padded with 0.0.

    Reference builds per-row LSTM input windows in a Python loop
    (``models.py:66-89``); here: ``collect_list`` over a row frame +
    array pad — stays JVM-side.
    """
    x = F.col(col) if isinstance(col, str) else col
    seq = F.collect_list(x).over(w.rowsBetween(-(seq_len - 1), 0))
    pad = F.array_repeat(F.lit(0.0), seq_len - F.size(seq))
    return F.concat(pad, seq)


def cusum_features(df, series_cols, value_col: str, order_cols,
                   k_sigma: float = 0.5) -> "DataFrame":
    """Two-sided CUSUM drift statistic per series (Page 1954), computed
    NATIVELY — no recursion, no UDF — via the prefix-sum identity

        S⁺_t = max(0, S⁺_{t-1} + z_t − k)  ⇔  S⁺_t = P_t − min(0, min_{i≤t} P_i)

    where ``P`` is the plain running sum of ``z − k`` (and symmetrically
    for the downward side over ``−z − k``). The running sum and running
    min are ordinary window aggregates, so the classic "inherently
    sequential" control-chart statistic runs as two codegen'd window
    passes per side.

    Cross-engine exactness: ``z`` is standardized by per-series power-sum
    mean/σ, then quantized to integer MICRO-units (round(z·10⁶)) before
    the cumulative algebra. Integer window sums are bit-exact in every
    engine — no float-accumulation-order drift can flip an alarm near the
    threshold, so the statistic carries a full value oracle.

    Returns the input columns plus ``z_micro``, ``cusum_pos_micro``,
    ``cusum_neg_micro`` (micro-units; divide by 1e6 for the usual scale).
    Alarm thresholds are the caller's: e.g. ``cusum_pos_micro > h·10⁶``.

    Scale shape: one groupBy for the per-series moments (map-side
    combined, broadcast back on the series key), then windows partitioned
    by series — per-series sorts, no global order.
    """
    if not isinstance(series_cols, list):
        series_cols = [series_cols]
    k_micro = int(round(k_sigma * 1_000_000))
    stats = (df.groupBy(*series_cols)
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum(value_col).alias("_sx"),
                  F.sum(F.col(value_col) * F.col(value_col)).alias("_sxx")))
    mean = F.col("_sx") / F.col("_n")
    var = F.col("_sxx") / F.col("_n") - mean * mean
    stats = stats.select(*series_cols, mean.alias("_mu"),
                         F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sigma"))
    z = F.when(F.col("_sigma") > 0,
               (F.col(value_col) - F.col("_mu")) / F.col("_sigma")) \
         .otherwise(F.lit(0.0))
    d = (df.join(stats, on=series_cols)
         .withColumn("z_micro",
                     F.round(z * 1_000_000).cast("bigint")))
    w = series_window(series_cols, order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    y_pos = F.col("z_micro") - F.lit(k_micro)
    y_neg = -F.col("z_micro") - F.lit(k_micro)
    # Materialize the prefix sums first (a window cannot nest inside
    # another window expression), then the running min over them — both
    # windows share the one per-series sort/exchange.
    d = (d.withColumn("_p_pos", F.sum(y_pos).over(run))
         .withColumn("_p_neg", F.sum(y_neg).over(run)))
    s_pos = F.col("_p_pos") - F.least(F.min("_p_pos").over(run), F.lit(0))
    s_neg = F.col("_p_neg") - F.least(F.min("_p_neg").over(run), F.lit(0))
    return (d.withColumn("cusum_pos_micro", s_pos)
            .withColumn("cusum_neg_micro", s_neg)
            .drop("_mu", "_sigma", "_p_pos", "_p_neg"))


def rolling_median(col: ColumnOrName, w: WindowSpec, window: int,
                   min_periods: int | None = None) -> Column:
    """Trailing rolling MEDIAN — the robust location statistic the
    reference's mean-based kernels lack. Exact ``percentile`` evaluated
    as a window aggregate over the trailing ROW frame (no UDF; Spark
    runs aggregate functions over window frames natively, as does any
    SQL engine via ``quantile_cont(...) OVER``). O(w log w) per row —
    reserve for the dashboards/QA paths that need robustness, not the
    bulk feature matrix."""
    frame = _frame(w, window)
    med = F.percentile(col, F.lit(0.5)).over(frame)
    return _masked(med, col, frame, window, False, min_periods)


def rolling_iqr(col: ColumnOrName, w: WindowSpec, window: int,
                min_periods: int | None = None) -> Column:
    """Trailing rolling IQR (p75 − p25) — the robust spread companion to
    ``rolling_median`` (outlier-insensitive where rolling_std is not)."""
    frame = _frame(w, window)
    iqr = (F.percentile(col, F.lit(0.75)).over(frame)
           - F.percentile(col, F.lit(0.25)).over(frame))
    return _masked(iqr, col, frame, window, False, min_periods)
