"""Deterministic distinct-count sketches (KMV / bottom-k).

The classic k-minimum-values estimator (Bar-Yossef et al. 2002 /
Beyer et al. 2007 "distinct sampling"): hash every distinct item to a
uniform fraction in [0, 1); keep only the k smallest hashes per group.
If a group holds at least k distinct items, the k-th smallest hash
``h_k`` estimates the cardinality as ``(k - 1) / h_k``; groups with
fewer than k distinct items are counted exactly (their bottom-k set IS
the distinct set).

Why this and not ``approx_count_distinct``: Spark's HLL++ sketch is
engine-internal state — its estimate cannot be replayed by an external
SQL engine, so it can never carry a cross-engine value oracle. KMV with
an md5-derived hash is engine-portable: the same ``(k-1)/h_k``
arithmetic over the same 60-bit hash fractions reproduces bit-identical
estimates anywhere md5 exists, which is exactly the property every
operator in this repo is held to.

Scale shape: the map side reduces to DISTINCT (group, item) — shuffled
as hashes, map-side combined — then a per-group bottom-k window over the
group key (key-partitioned, never a global sort). The sketch state per
group is k doubles, independent of group cardinality; merging partial
sketches = union + re-take bottom-k, which is what the groupBy already
does. At 100 TB the shuffle carries one row per distinct (group, item)
pair at most — the same cost as exact countDistinct — but the ESTIMATE
path exists so downstream consumers (mergeable profiles, incremental
rollups under plans/incremental.py's algebraic-partial contract) can
keep k rows per group instead of the full distinct set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^15 = 2^60: the md5-prefix integer below is uniform on [0, 2^60).
_KMV_DENOM = float(1 << 60)


def hash_frac(col: Column) -> Column:
    """Deterministic uniform fraction in [0, 1): the first 15 hex digits
    of md5 as a 60-bit integer over 2^60. Portable: DuckDB replays it as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT / 2^60``."""
    return (F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
            / F.lit(_KMV_DENOM))


def kmv_distinct(df: DataFrame, group_col: str, item_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns ``(group_col, n_kept, kth_frac, est)`` where ``est`` is the
    bottom-k estimate ``(k-1)/h_k`` when the group has ≥ k distinct
    items, else the exact distinct count. ``n_kept`` (= min(k, distinct))
    and ``kth_frac`` are exposed so audits can see the sketch state.

    NULL items are ignored (they hash to NULL and drop out of the
    bottom-k window), matching countDistinct's NULL semantics.
    """
    pairs = (df.select(F.col(group_col), F.col(item_col).alias("_item"))
             .filter(F.col("_item").isNotNull())
             .distinct()
             .select(group_col, hash_frac(F.col("_item")).alias("_f")))
    w = Window.partitionBy(group_col).orderBy("_f")
    bottom = (pairs.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= k))
    agg = bottom.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_f").alias("kth_frac"))
    return agg.select(
        group_col, "n_kept", "kth_frac",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("kth_frac")).alias("est"))


def heavy_hitters(df: DataFrame, item_col: str, threshold_inv: int = 500,
                  k: int | None = None) -> DataFrame:
    """Exact frequent items above support 1/``threshold_inv`` via a
    two-pass Misra-Gries sketch: items with count > N/threshold_inv,
    with EXACT counts — without ever shuffling the long tail.

    Pass 1 (``mapInPandas``): each partition folds its items through a
    mergeable Misra-Gries summary of size ``k`` (default
    4 × threshold_inv) — per Arrow batch, add exact batch counts into
    the running summary, then compress by subtracting the (k+1)-largest
    weight and dropping non-positives (the mergeable-summaries MERGE of
    Agarwal et al., PODS'12, which preserves the N_p/(k+1) error bound).
    Pass 2: the candidate union is inner-joined back (broadcast — at
    most k rows per partition survive) and ONLY candidate items are
    exactly recounted and thresholded.

    Output is DETERMINISTIC despite the partition-dependent sketch:
    pigeonhole gives every item with global count > N/(k+1) a partition
    where its local count exceeds N_p/(k+1), so with k+1 > threshold_inv
    the candidate set is a superset of every qualifying item under ANY
    partitioning; the exact recount then keeps precisely the qualifiers.

    Why not plain groupBy-count: correctness-equal, but the full
    aggregation shuffles one row per DISTINCT item (billions for web
    tokens). Here the shuffle carries ≤ k rows per partition (candidates)
    plus the map-side-combined counts of candidate items only — the
    sketch prunes the tail before the exchange, which is the entire
    point at 100 TB.

    Returns ``(item, cnt, share)`` with share = cnt/N rounded to 6.
    """
    import pandas as pd

    if k is None:
        k = 4 * threshold_inv
    if k + 1 <= threshold_inv:
        raise ValueError(
            f"k ({k}) must be >= threshold_inv ({threshold_inv}) for the "
            "superset guarantee — candidates would miss true heavy hitters")

    items = df.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull())

    def mg_partition(batches):
        summary: dict = {}
        for pdf in batches:
            vc = pdf["item"].value_counts()
            for it, c in vc.items():
                summary[it] = summary.get(it, 0) + int(c)
            if len(summary) > k:
                # mergeable compress: subtract the (k+1)-largest weight
                cut = sorted(summary.values(), reverse=True)[k]
                summary = {i: c - cut for i, c in summary.items() if c > cut}
        if summary:
            yield pd.DataFrame({"item": list(summary.keys())})

    candidates = (items.mapInPandas(mg_partition, "item string")
                  .distinct())
    total = items.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    exact = (items.join(F.broadcast(candidates), on="item")
             .groupBy("item").agg(F.count(F.lit(1)).alias("cnt")))
    return (exact.join(F.broadcast(total))
            .filter(F.col("cnt") * F.lit(threshold_inv) > F.col("_n"))
            .select("item", "cnt",
                    F.round(F.col("cnt") / F.col("_n") + F.lit(1e-9), 6)
                    .alias("share")))


# ---------------------------------------------------------------------------
# Deterministic quantile sketch (Munro-Paterson / MRL family)
# ---------------------------------------------------------------------------

def _stride_cols(n: Column, k: int) -> tuple[Column, Column]:
    """Smallest level h with k·2^h ≥ n, and the stride 2^h, as columns.

    Integer-exact in both engines: with m = ceil(n/k) (integer floor-div
    algebra), h = bit_length(m−1) = length of the base-2 rendering — no
    float log2 anywhere near an exactness cliff. DuckDB replays it as
    ``length(printf('%b', m-1))``.
    """
    m = F.floor((n + F.lit(k - 1)) / F.lit(k)).cast("bigint")
    h = (F.when(m <= 1, F.lit(0))
         .otherwise(F.length(F.conv((m - 1).cast("string"), 10, 2)))
         .cast("int"))
    stride = F.pow(F.lit(2.0), h).cast("bigint")   # exact to 2^52
    return h, stride


def quantile_sketch_state(df: DataFrame, group_cols: list[str],
                          value_col: str, k: int = 256) -> DataFrame:
    """Per-group DETERMINISTIC quantile-sketch state: the canonical
    fully-compacted form of the Munro-Paterson (1980) / MRL'98 merging-
    buffers sketch (the deterministic ancestor of KLL, Karnin-Lang-
    Liberty 2016).

    The classic algorithm repeatedly pair-compacts sorted buffers —
    keep every 2nd item, double its weight. Iterating that compaction
    h times over the FULL sorted multiset keeps exactly the items of
    0-based rank r ≡ 2^h−1 (mod 2^h), each representing the 2^h ranks
    [j·2^h, (j+1)·2^h). So the canonical batch state is a RANK-STRIDE
    selection — a pure function of the sorted multiset, independent of
    partitioning and arrival order (what makes it oracle-replayable,
    unlike randomized KLL compaction), computed natively: one window
    ``row_number`` per group, one modulo filter. No UDF.

    Guarantee: rank error ≤ 2^h < 2n/k, i.e. ε = 2/k uniform rank
    accuracy with ≤ k retained items per group.

    Returns long-format state: ``(group_cols…, n, h, j, value)`` with
    j = 0-based retained index and implicit weight 2^h.

    Scale shape: one count agg (map-side combined, broadcast back) +
    one per-group window sort — same exchange profile as any per-key
    ranking; never a global sort. State is ≤ k rows per group. For
    unbounded groups the per-group sort IS the cost — use
    ``plans.incremental.kll_day_partials`` to sketch bounded day slices
    and merge, which is the point of a mergeable summary.
    """
    d = df.filter(F.col(value_col).isNotNull())
    counts = d.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    h, stride = _stride_cols(F.col("n"), k)
    par = counts.select(*group_cols, "n", h.alias("h"),
                        stride.alias("stride"))
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = d.select(*group_cols, F.col(value_col).alias("value")) \
        .withColumn("_r", F.row_number().over(w) - 1)
    return (ranked.join(F.broadcast(par), on=group_cols)
            .filter(F.col("_r") % F.col("stride") == F.col("stride") - 1)
            .select(*group_cols, "n", "h",
                    F.floor(F.col("_r") / F.col("stride")).cast("bigint")
                    .alias("j"),
                    "value"))


def sketch_quantile_estimates(state: DataFrame, group_cols: list[str],
                              probs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                              ) -> DataFrame:
    """Quantile estimates from :func:`quantile_sketch_state` long-format
    state. For prob p: target rank t = max(1, ceil(p·n)); the retained
    item j* = min(ceil(t/2^h)−1, m−1) covers t (m = retained count).
    Pure integer arithmetic — deterministic, replayable.

    Returns ``(group_cols…, p, est, n, h)``, one row per group × prob.
    """
    spark = state.sparkSession
    stride = F.pow(F.lit(2.0), F.col("h")).cast("bigint")
    meta = (state.groupBy(*group_cols)
            .agg(F.max("n").alias("n"), F.max("h").alias("h"),
                 F.count(F.lit(1)).alias("m")))
    pdf = spark.createDataFrame([(float(p),) for p in probs], "p double")
    t = F.greatest(F.lit(1).cast("bigint"),
                   F.ceil(F.col("p") * F.col("n")).cast("bigint"))
    jstar = F.least(
        F.floor((t + stride - F.lit(1)) / stride).cast("bigint") - 1,
        F.col("m") - 1)
    picks = (meta.crossJoin(F.broadcast(pdf))
             .select(*group_cols, "p", "n", "h", jstar.alias("j")))
    return (picks.join(state.select(*group_cols, "j",
                                    F.col("value").alias("est")),
                       on=[*group_cols, "j"])
            .select(*group_cols, "p", "est", "n", "h"))


def merged_quantile_estimates(states: DataFrame, group_cols: list[str],
                              probs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                              ) -> DataFrame:
    """Quantile estimates over the UNION of several sketch states (e.g.
    one per day) WITHOUT recompaction: each retained item carries its
    own weight 2^h, the merged CDF is the weight-cumulative over value
    order (RANGE frame — all value-ties share one cumulative, keeping
    the pick order-invariant), and quantile(p) = first value whose
    cumulative weight ≥ max(1, ceil(p·W)). Rank error ≤ Σ_part 2^h_part.

    Input: long-format state rows ``(group_cols…, h, value)`` — the
    ``n``/``j`` columns are not needed for the merge. Returns
    ``(group_cols…, p, est, w_total)``.
    """
    spark = states.sparkSession
    wt = F.pow(F.lit(2.0), F.col("h")).cast("bigint")
    st = states.select(*group_cols, "value", wt.alias("_w"))
    tot = st.groupBy(*group_cols).agg(F.sum("_w").alias("w_total"))
    cw = Window.partitionBy(*group_cols).orderBy("value")  # RANGE default
    cum = st.withColumn("_cw", F.sum("_w").over(cw))
    pdf = spark.createDataFrame([(float(p),) for p in probs], "p double")
    t = F.greatest(F.lit(1).cast("bigint"),
                   F.ceil(F.col("p") * F.col("w_total")).cast("bigint"))
    return (cum.join(F.broadcast(tot), on=group_cols)
            .crossJoin(F.broadcast(pdf))
            .filter(F.col("_cw") >= t)
            .groupBy(*group_cols, "p")
            .agg(F.min("value").alias("est"),
                 F.max("w_total").alias("w_total")))


def cms_state(df: DataFrame, item_col: str, depth: int = 4,
              width: int = 256) -> DataFrame:
    """Count-min sketch state (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows × ``width`` counters; every item increments
    cell (r, md5(r || item) % width) for each row r. The classic
    mergeable frequency summary — state is depth×width counters
    regardless of stream length, merge = cell-wise addition (a plain
    groupBy-sum over the union of states), and the point estimate
    min_r cell(r, h_r(x)) NEVER undercounts (one-sided error ≤
    e·N/width with probability 1−e^−depth).

    Like every sketch here the hash family is md5-derived, so the
    STATE ITSELF replays in any SQL engine — the oracle rebuilds every
    cell and every estimate, not just sanity totals. NULL items drop.

    Scale shape: one explode (depth rows per item — map-side combined
    into ≤ depth·width cells) and nothing else; the shuffle carries at
    most depth·width rows per partition.

    Returns ``(r, c, cnt)`` cell rows.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    cells = (df.select(F.col(item_col).alias("_it")).filter(
                F.col("_it").isNotNull())
             .select("_it", rows)
             .select("r", (F.conv(F.substring(
                 F.md5(F.concat(F.col("r").cast("string"), F.lit("|"),
                                F.col("_it").cast("string"))), 1, 15),
                 16, 10).cast("bigint") % width).alias("c")))
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(state: DataFrame, items: DataFrame, item_col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point estimates from a CMS state for the given items: min over
    the depth rows of the item's cells. ``items`` is a bounded frame
    (the candidates you care about — e.g. heavy-hitter output); the
    probe is a broadcast join against the ≤ depth·width-cell state."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    probes = (items.select(F.col(item_col).alias("item")).distinct()
              .select("item", rows)
              .select("item", "r", (F.conv(F.substring(
                  F.md5(F.concat(F.col("r").cast("string"), F.lit("|"),
                                 F.col("item").cast("string"))), 1, 15),
                  16, 10).cast("bigint") % width).alias("c")))
    return (probes.join(state, on=["r", "c"], how="left")
            .groupBy("item")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est")))


# ---------------------------------------------------------------------------
# HyperLogLog (deterministic, oracle-replayable)
# ---------------------------------------------------------------------------

def hll_registers(df: DataFrame, group_col: str, item_col: str,
                  p: int = 9) -> DataFrame:
    """(group, _b, _m): HyperLogLog registers (Flajolet et al. 2007)
    with a fully portable layout — bucket = 60-bit-md5 mod 2^p, ρ =
    leading-zero rank of the remaining (60−p) bits computed from the
    ``bin()`` STRING length (identical in Spark and DuckDB; no float
    ``log2`` at a power-of-two boundary). Registers merge by MAX, so
    partial sketches from any split of the data — micro-batches, day
    partials, shards — compose exactly; the map side combines to ≤ 2^p
    rows per group before the shuffle. Only occupied buckets are
    emitted; :func:`hll_estimates` rejoins the dense spine."""
    m = 1 << p
    wbits = 60 - p
    h = (F.conv(F.substring(F.md5(F.col(item_col).cast("string")), 1, 15),
                16, 10).cast("bigint"))
    d = df.select(F.col(group_col), h.alias("_h"))
    d = d.select(group_col,
                 F.pmod(F.col("_h"), F.lit(m)).alias("_b"),
                 F.shiftright(F.col("_h"), p).alias("_w"))
    rho = (F.when(F.col("_w") == 0, F.lit(wbits + 1))
           .otherwise(F.lit(wbits + 1) - F.length(F.bin(F.col("_w")))))
    return (d.groupBy(group_col, "_b")
            .agg(F.max(rho).alias("_m")))


def hll_estimates(regs: DataFrame, group_col: str,
                  p: int = 9) -> DataFrame:
    """(group, hll_estimate): the HLL estimate from a register frame
    (post-merge) — harmonic mean α_m·m²·2^(wbits+1)/S, switched to
    LINEAR COUNTING m·ln(m/V) (V = empty registers) in the small-range
    regime E ≤ 2.5m where the raw estimator's empty-bucket bias blows
    up (the standard Flajolet correction; at p=9 that's n ≲ 1280). The
    denominator is the INTEGER S = Σ 2^(wbits+1−M_j) — exact bigint
    adds in any order (≤ 2^61 for p ≥ 9) — and V is an integer count,
    so BOTH branches and the branch PREDICATE are bit-identical across
    engines and partitionings. Empty registers enter via a broadcast
    2^p-row spine, never a driver collect."""
    m = 1 << p
    wbits = 60 - p
    spark = regs.sparkSession
    spine = (regs.select(group_col).distinct()
             .crossJoin(F.broadcast(
                 spark.range(m).select(F.col("id").alias("_b")))))
    full = (spine.join(regs, [group_col, "_b"], "left")
            .withColumn("_m", F.coalesce(F.col("_m"), F.lit(0))))
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    s = F.sum(F.expr(
        f"shiftleft(cast(1 as bigint), cast({wbits + 1} - _m as int))"))
    v = F.sum(F.when(F.col("_m") == 0, 1).otherwise(0))
    est = full.groupBy(group_col).agg(s.alias("_s"), v.alias("_v"))
    raw = (alpha * F.lit(float(m)) * F.lit(float(m))
           * F.lit(float(1 << (wbits + 1))) / F.col("_s"))
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_v"))
    return est.select(
        group_col,
        F.when((raw <= F.lit(2.5 * m)) & (F.col("_v") > 0), lc)
        .otherwise(raw).alias("hll_estimate"))


def hll_day_panel(regs: DataFrame, p: int = 9) -> DataFrame:
    """(day, dau_hll, wau_hll, mau_hll): the 1/7/30-day distinct-user
    panel from MERGEABLE per-day HLL registers ``(_d, _b, _m)`` — all
    three horizons in ONE dense-spine aggregation. The 7/30-day
    windows union day sketches by the register MAX law over a
    |days|²-bounded range join (≤ 37 register rows fan out per DAY,
    never per user-day), then each horizon's harmonic-mean /
    linear-counting estimate (the :func:`hll_estimates` arithmetic,
    inlined so the three horizons share one groupBy) reads sketch
    state only. Shared VERBATIM by the batch row `dau_wau_mau_hll`
    and the streaming maintained view
    ``streaming.jobs.dau_panel_estimate``, so batch/stream equality
    is structural, not coincidental. Estimates round at 4 dp (the
    engine-portable readout contract). Ref anchor: the reference's
    dashboard nunique serving reads (dashboard.py:723) on a 60 s
    trigger, scaled to sketch state."""
    m = 1 << p
    wbits = 60 - p
    spark = regs.sparkSession
    days = regs.select(F.col("_d").alias("day")).distinct()
    j = days.join(regs, (F.col("_d") <= F.col("day"))
                  & (F.col("_d") >= F.date_sub(F.col("day"), 29)))
    merged = (j.groupBy("day", "_b")
              .agg(F.max(F.when(F.col("_d") == F.col("day"),
                                F.col("_m"))).alias("_md"),
                   F.max(F.when(
                       F.col("_d") >= F.date_sub(F.col("day"), 6),
                       F.col("_m"))).alias("_mw"),
                   F.max("_m").alias("_mm")))
    spine = (days.crossJoin(F.broadcast(
        spark.range(m).select(F.col("id").alias("_b")))))
    full = (spine.join(merged, ["day", "_b"], "left")
            .select("day",
                    F.coalesce("_md", F.lit(0)).alias("_md"),
                    F.coalesce("_mw", F.lit(0)).alias("_mw"),
                    F.coalesce("_mm", F.lit(0)).alias("_mm")))
    aggs = []
    for src in ("_md", "_mw", "_mm"):
        aggs.append(F.sum(F.expr(
            f"shiftleft(cast(1 as bigint), "
            f"cast({wbits + 1} - {src} as int))")).alias(f"_s{src}"))
        aggs.append(F.sum(F.when(F.col(src) == 0, 1).otherwise(0))
                    .alias(f"_v{src}"))
    est = full.groupBy("day").agg(*aggs)
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))

    def _est(src: str):
        raw = (alpha * F.lit(float(m)) * F.lit(float(m))
               * F.lit(float(1 << (wbits + 1))) / F.col(f"_s{src}"))
        lc = (F.lit(float(m))
              * F.log(F.lit(float(m)) / F.col(f"_v{src}")))
        return F.round(
            F.when((raw <= F.lit(2.5 * m)) & (F.col(f"_v{src}") > 0), lc)
            .otherwise(raw) + F.lit(1e-9), 4)

    return est.select("day", _est("_md").alias("dau_hll"),
                      _est("_mw").alias("wau_hll"),
                      _est("_mm").alias("mau_hll"))


def theta_intersect_est(a: DataFrame, b: DataFrame,
                        a_col: str, b_col: str, k: int = 128) -> DataFrame:
    """Theta-sketch set-INTERSECTION estimate (Dasgupta et al. 2016)
    over two key columns: the join-cardinality planning number — "how
    many distinct keys do these two tables share?" — from two bottom-k
    sketches, never a join of the raw tables.

    θ = min of the two sketches' k-th fractions (1.0 for an under-full
    sketch = it holds its set exactly); D = retained hashes BELOW θ
    present in both sketches; estimate = D/θ. Every step is
    deterministic md5 arithmetic (:func:`hash_frac`), so the estimate
    is oracle-replayable, and the bottom-k cut uses ``orderBy.limit``
    — Spark's TakeOrderedAndProject per-partition heaps — NOT a
    single-partition row_number window, so the sketch build
    distributes at any key count.

    Returns one row: (n_a_kept, theta, d_common, est_common).
    """
    def bottom(df: DataFrame, col: str) -> DataFrame:
        return (df.select(F.col(col).cast("string").alias("_i"))
                .filter(F.col("_i").isNotNull()).distinct()
                .select(hash_frac(F.col("_i")).alias("_f"))
                .orderBy("_f").limit(k))

    sa, sb = bottom(a, a_col), bottom(b, b_col)
    ka = sa.agg(F.count(F.lit(1)).alias("_na"), F.max("_f").alias("_ka"))
    kb = sb.agg(F.count(F.lit(1)).alias("_nb"), F.max("_f").alias("_kb"))
    th = (ka.crossJoin(kb)
          .select("_na", "_nb",
                  F.least(
                      F.when(F.col("_na") < k, F.lit(1.0))
                      .otherwise(F.col("_ka")),
                      F.when(F.col("_nb") < k, F.lit(1.0))
                      .otherwise(F.col("_kb"))).alias("_theta")))
    inter = sa.join(sb, on="_f")
    d = (inter.crossJoin(F.broadcast(th))
         .filter(F.col("_f") < F.col("_theta"))
         .agg(F.count(F.lit(1)).alias("d_common")))
    return (th.crossJoin(F.broadcast(d))
            .select(F.col("_na").alias("n_a_kept"),
                    F.col("_nb").alias("n_b_kept"),
                    F.col("_theta").alias("theta"),
                    F.coalesce("d_common", F.lit(0)).alias("d_common"),
                    (F.col("d_common") / F.col("_theta"))
                    .alias("est_common")))
