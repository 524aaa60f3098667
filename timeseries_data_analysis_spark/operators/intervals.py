"""Interval joins and as-of joins (SURVEY.md §2.3 J3/J4).

Reference: per-event boolean-mask loops over the spine
(``pre_processing.py:1483-1528``, ``simple_pre_processing.py:504-536``)
and ``reindex(method='nearest')`` (``data_generator.py:953``). Here:
declarative range joins + a union-scan as-of join — both shuffle-aware.

Scale design (SURVEY.md §4 point 1): with a small event dimension the
range join broadcasts the events side — a broadcast-nested-loop over a
handful of intervals is optimal. At large event counts
(:func:`interval_join_binned`) both sides are binned to coarse time
buckets and equi-joined on the bin (turning O(rows × events) into a
hash join), then refined by the exact range predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# -- J3: interval join for event labeling -----------------------------------

def interval_join(spine: DataFrame, events: DataFrame,
                  ts_col: str = "ts",
                  start_col: str = "start", end_col: str = "end",
                  how: str = "left", broadcast_events: bool = True) -> DataFrame:
    """Join spine rows to every event whose ``[start, end)`` contains ts.

    Reference labeling semantics (``pre_processing.py:1499-1504``): a row
    belongs to an event when ``start <= ts < end``. Boundary inclusivity
    is [closed, open) exactly as the reference.
    """
    ev = F.broadcast(events) if broadcast_events else events
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return spine.join(ev, on=cond, how=how)


def interval_join_binned(spine: DataFrame, events: DataFrame,
                         ts_col: str = "ts",
                         start_col: str = "start", end_col: str = "end",
                         bin_interval: str = "1 day") -> DataFrame:
    """Range join via time-bucket binning for LARGE event tables.

    Each event explodes to one row per coarse bin it overlaps; the spine
    maps each row to its bin; an equi-join on the bin replaces the
    nested-loop, and the exact range predicate refines. Bin width should
    be ≥ the median interval length so the explode factor stays small.
    """
    binned_ev = events.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.date_trunc("day", F.col(start_col)),
            F.date_trunc("day", F.col(end_col)),
            F.expr(f"interval {bin_interval}"),
        )),
    )
    binned_spine = spine.withColumn("_bin", F.date_trunc("day", F.col(ts_col)))
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return (binned_spine.join(binned_ev, on="_bin", how="inner")
            .filter(cond).drop("_bin"))


def label_events(spine: DataFrame, events: DataFrame,
                 ts_col: str = "ts",
                 start_col: str = "START_DATE",
                 critical_col: str = "CRITICAL_DATE",
                 zone_col: str = "ZONE",
                 pre_windows_h: tuple[int, ...] = (24, 48, 72)) -> DataFrame:
    """The reference's full target-labeling operator (J3).

    Emits per spine row:
      - ``accretion_forming``  : 1 if ts ∈ [start, critical)   (``pre_processing.py:1499``)
      - ``accretion_critical`` : 1 if ts ≥ critical (same event) (``pre_processing.py:1502``)
      - ``days_to_critical``   : (critical − ts) in fractional days, while forming
      - ``accretion_zone``     : zone of the matching event (0 if none)
      - ``pre_critical_{h}h``  : 1 if ts ∈ [critical−h, critical) (``simple_pre_processing.py:520-531``)

    Overlapping events collapse by max/min — matching the reference's
    sequential mask overwrites which keep "any event active".
    """
    ev = F.broadcast(events.select(
        F.col(start_col).alias("_start"),
        F.col(critical_col).alias("_crit"),
        F.col(zone_col).alias("_zone"),
    ))
    ts = F.col(ts_col)
    # an event influences every row from its start onward (forming, then
    # critical); rows before any event match nothing → label 0 via fillna
    joined = spine.join(ev, on=ts >= F.col("_start"), how="left")
    forming = (ts >= F.col("_start")) & (ts < F.col("_crit"))
    critical = ts >= F.col("_crit")
    days_to_crit = (F.col("_crit").cast("double") - ts.cast("double")) / 86400.0

    aggs = [
        F.max(F.when(forming, 1).otherwise(0)).alias("accretion_forming"),
        F.max(F.when(critical, 1).otherwise(0)).alias("accretion_critical"),
        F.min(F.when(forming, days_to_crit)).alias("days_to_critical"),
        F.max(F.when(forming | critical, F.col("_zone"))).alias("accretion_zone"),
    ]
    for h in pre_windows_h:
        pre = (ts >= F.col("_crit") - F.expr(f"interval {h} hours")) & (ts < F.col("_crit"))
        aggs.append(F.max(F.when(pre, 1).otherwise(0)).alias(f"pre_critical_{h}h"))

    group_cols = [c for c in spine.columns]
    return joined.groupBy(*group_cols).agg(*aggs).na.fill(
        {"accretion_forming": 0, "accretion_critical": 0, "accretion_zone": 0,
         **{f"pre_critical_{h}h": 0 for h in pre_windows_h}})


# -- J4: as-of join ----------------------------------------------------------

def asof_join(left: DataFrame, right: DataFrame,
              left_ts: str, right_ts: str,
              by: tuple[str, str] | None = None,
              value_cols: list[str] | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join, pandas ``merge_asof`` semantics in all three
    directions: for each left row take the right row with the latest
    ts ≤ left ts (``backward``), the earliest ts ≥ left ts
    (``forward``), or whichever of those two is closer in absolute
    time (``nearest``; exact-distance ties resolve backward, and an
    equal-timestamp right row is distance 0 so it always wins).

    Reference: ``reindex(all_times, method='nearest')`` and latest-row
    probes (``data_generator.py:953``, ``dashboard.py:263-313``).

    Implementation is the union-scan pattern — scalable and skew-free
    WHEN a ``by`` key is passed: tag both sides, union on a common
    schema, sort per key by ``(ts, side)``, and carry the last seen
    right-side values forward with ``last(ignorenulls)``. The forward
    leg is the identical running scan over a DESCENDING sort (same
    partitioning, so one exchange total; ``nearest`` pays both sorts
    and picks per row). No nested-loop, no per-key pandas (contrast
    ``merge_asof``). Ties (equal ts) take the right row in every
    direction (right sorts before left at equal ts).

    KEYLESS CONTRACT (``by=None``): a single global as-of scan has no
    partition key, so BOTH tables funnel through one partition — the
    correct semantics, but inherently sequential. It is intended for
    bounded inputs only (a probe batch against a small dimension); a
    ``UserWarning`` fires so a keyless call inside a big pipeline is
    visible in logs instead of silently serializing. Mirrors the
    ``category_codes.max_vocab`` bounded-contract discipline.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"got {direction!r}")
    if by is None:
        import warnings
        warnings.warn(
            "asof_join(by=None) runs a single-partition global scan — "
            "correct, but sequential. Intended for bounded inputs only; "
            "pass a `by` key to distribute.",
            UserWarning, stacklevel=2)
    value_cols = value_cols or [
        c for c in right.columns
        if c != right_ts and (by is None or c != by[1])
    ]
    lkey, rkey = (by if by is not None else (None, None))
    # carry the matched right TIMESTAMP too: nearest needs the distance
    carry = list(value_cols) + ["__rts"]

    lsel = [F.col(left_ts).alias("_ats"), F.lit(1).alias("_side")]
    if lkey:
        lsel.append(F.col(lkey).alias("_akey"))
    lsel += [F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
             for c in value_cols]
    lsel.append(F.lit(None).cast(dict(right.dtypes)[right_ts])
                .alias("_r___rts"))
    l_tagged = left.select(*left.columns, *lsel)

    rsel = [F.col(right_ts).alias("_ats"), F.lit(0).alias("_side")]
    if rkey:
        rsel.append(F.col(rkey).alias("_akey"))
    rsel += [F.col(c).alias(f"_r_{c}") for c in value_cols]
    rsel.append(F.col(right_ts).alias("_r___rts"))
    r_tagged = right.select(*rsel)

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    part = ["_akey"] if lkey else [F.lit(1)]
    w_bwd = (Window.partitionBy(*part).orderBy("_ats", "_side")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_fwd = (Window.partitionBy(*part)
             .orderBy(F.col("_ats").desc(), "_side")
             .rowsBetween(Window.unboundedPreceding, 0))

    def leg(w):
        return {c: F.last(f"_r_{c}", ignorenulls=True).over(w)
                for c in carry}

    if direction == "backward":
        out_cols = leg(w_bwd)
    elif direction == "forward":
        out_cols = leg(w_fwd)
    else:
        b, f_ = leg(w_bwd), leg(w_fwd)
        dist_b = F.col("_ats").cast("double") - b["__rts"].cast("double")
        dist_f = f_["__rts"].cast("double") - F.col("_ats").cast("double")
        use_b = b["__rts"].isNotNull() & (
            f_["__rts"].isNull() | (dist_b <= dist_f))
        out_cols = {c: F.when(use_b, b[c]).otherwise(f_[c])
                    for c in carry}
    filled = unioned.select(
        "*", *[out_cols[c].alias(c) for c in value_cols])
    return (filled.filter(F.col("_side") == 1)
            .drop("_ats", "_side", *(["_akey"] if lkey else []),
                  *[f"_r_{c}" for c in value_cols], "_r___rts"))


# -- P8: latest-row probe ----------------------------------------------------

def latest_rows(df: DataFrame, keys: list[str], ts_col: str = "ts",
                tiebreak: str | None = None) -> DataFrame:
    """Latest row per key (reference ``dashboard.py:263-313`` latest probes).

    ``row_number`` over a per-key descending window — shuffle on keys only,
    no global sort. Pass a unique ``tiebreak`` column for determinism.
    """
    order = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
