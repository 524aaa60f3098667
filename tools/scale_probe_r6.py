"""Round-6 scale probes.

Usage:
  python tools/scale_probe_r6.py queries <sf_dir> [name ...]
      min-of-2 warm wall times for the round-6 queries (default list
      below) — run at sf0.1 and the 10x corpus; one-shot at 100x.
  python tools/scale_probe_r6.py bpe <sf_dir> [depth_local] [depth_dist]
      BPE merge-depth probe: the driver-local deep loop (default 500
      merges) vs the distributed 2-jobs-per-merge loop (default 25
      merges, extrapolated) on the same corpus; prints merges/sec.
  python tools/scale_probe_r6.py dtw <sf_dir> [segments] [alphabet]
      SAX-bucketed DTW over per-user day profiles: series count is the
      quadratic axis; prints user count, bucket stats, pair count, wall.

Scale-shape expectations, stated BEFORE measuring:

- bpe: vocab collapse is one corpus scan (linear); after it both loops
  are corpus-size-independent (they touch the bounded word-count
  table). The distributed loop's floor is ~2 Spark-job round-trips per
  merge (~0.2-0.5 s/merge regardless of data); the local loop's cost is
  the in-memory incremental update over affected words — expect two to
  three orders of magnitude more merges/sec, with the 10x corpus
  adding only vocab-size (not corpus-size) cost to the loop.
- dtw: per-user profile build is one map-side-combined agg (linear in
  events). With SAX bucketing (segments x alphabet sized by the
  log2(N/occupancy) rule) pair volume = sum over buckets C(n_b, 2);
  at 10x users expect ~linear pair growth IF bucket width is re-sized
  for N (8 segments x 4 letters = 65k words for 20k users), and the
  max_keys-per-bucket guard quantifies the skew tail.
- queries: kll_quantiles/kll_rollup are one count-agg + one per-key
  window sort (linear, same family as percentile_summary);
  triangle_stats_prod inherits the capped minhash candidate volume
  (measured ~linear second decade in SCALE 1e) plus the wedge join
  (quadratic only within capped buckets); robust_regression is
  quadratic in DAYS per series (calendar-bounded) and linear in series;
  ks_drift/anomaly_ensemble are window/percentile passes (linear);
  chi2_keywords is token-explode + three aggs (linear in tokens);
  theta_union_distinct is distinct + bottom-k windows (linear);
  ewma_exact is applyInPandas over calendar-bounded day series.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "ewma_exact", "kll_quantiles", "kll_rollup", "triangle_stats_prod",
    "robust_regression", "anomaly_ensemble", "theta_union_distinct",
    "ks_drift", "chi2_keywords", "holt_winters", "weighted_reservoir",
    "cms_counts", "ab_test",
]


def probe_queries(sf_dir: str, names: list[str]) -> None:
    spark = get_spark("scale-probe-r6")
    qs = entry_mod.queries()
    print(f"{'query':24s} {'t_min2_s':>9s} {'rows':>12s}  loadavg")
    for name in names:
        times = []
        for _ in range(2):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        rows = qs[name](spark, sf_dir).count()
        la = os.getloadavg()[0]
        print(f"{name:24s} {min(times):9.2f} {rows:12d}  {la:.1f}")


def probe_bpe(sf_dir: str, depth_local: int = 500,
              depth_dist: int = 25) -> None:
    from timeseries_data_analysis_spark.operators import tokenizer as TOKZ
    from timeseries_data_analysis_spark.sources import load_table
    spark = get_spark("scale-probe-r6-bpe")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    t0 = time.monotonic()
    vocab_n = TOKZ.word_vocab(docs).count()
    t_vocab = time.monotonic() - t0
    print(f"docs={n_docs} distinct_words={vocab_n} "
          f"vocab_collapse={t_vocab:.2f}s loadavg={os.getloadavg()[0]:.1f}")

    t0 = time.monotonic()
    local = TOKZ.bpe_learn_merges_local(docs, n_merges=depth_local)
    n_local = local.count()
    t_local = time.monotonic() - t0
    print(f"local  depth={n_local:5d}: {t_local:8.2f}s  "
          f"{n_local / t_local:8.1f} merges/s (incl. vocab collapse)")

    t0 = time.monotonic()
    dist = TOKZ.bpe_learn_merges(docs, n_merges=depth_dist)
    n_dist = dist.count()
    t_dist = time.monotonic() - t0
    per = t_dist / max(n_dist, 1)
    print(f"dist   depth={n_dist:5d}: {t_dist:8.2f}s  "
          f"{n_dist / t_dist:8.1f} merges/s -> {per:.2f}s/merge; "
          f"{depth_local} merges would take ~{per * depth_local:.0f}s")
    # agreement at the shared depth
    lo = [(r["lhs"], r["rhs"], r["n"]) for r in
          local.orderBy("rank").limit(n_dist).collect()]
    di = [(r["lhs"], r["rhs"], r["n"]) for r in
          dist.orderBy("rank").collect()]
    print(f"first-{n_dist} agreement: {lo == di}")


def probe_bpe_synthetic(n_words: int = 50_000, depth: int = 2000) -> None:
    """The corpus vocab is tiny (31 distinct words — BPE exhausts at 89
    merges), so the REALISTIC-depth claim needs a realistic vocabulary:
    manufacture ``n_words`` distinct hash-derived words (Zipf-ish counts
    via hash mod), collapse them through the same distributed
    word_vocab path, and time the local loop to ``depth`` merges — the
    merges/sec number a 32k-vocab tokenizer fit would actually see."""
    from pyspark.sql import functions as F
    from timeseries_data_analysis_spark.operators import tokenizer as TOKZ
    spark = get_spark("scale-probe-r6-bpe-syn")
    docs = (spark.range(n_words)
            .select(F.substring(F.md5(F.col("id").cast("string")), 1, 10)
                    .alias("text")))
    t0 = time.monotonic()
    out = TOKZ.bpe_learn_merges_local(docs, n_merges=depth)
    n = out.count()
    t = time.monotonic() - t0
    print(f"synthetic vocab={n_words} depth={n}: {t:.2f}s  "
          f"{n / t:.1f} merges/s  loadavg={os.getloadavg()[0]:.1f}")


def probe_dtw(sf_dir: str, segments: int = 8, alphabet: int = 4) -> None:
    from pyspark.sql import functions as F
    from timeseries_data_analysis_spark.operators import tsindex as TSI
    from timeseries_data_analysis_spark.sources import load_table
    spark = get_spark("scale-probe-r6-dtw")
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    prof = (ev.groupBy("user_id", F.hour("ts").alias("_hr"))
            .agg(F.round(F.avg("value"), 4).alias("_m"))
            .groupBy("user_id")
            .agg(F.array_sort(F.collect_list(F.struct("_hr", "_m")))
                 .alias("_s"))
            .select(F.col("user_id").cast("string").alias("uid"),
                    F.expr("transform(_s, x -> x._m)").alias("profile"))
            .filter(F.size("profile") == 24))
    paa = (prof.select("uid", F.posexplode("profile").alias("_hr", "_m"))
           .withColumnRenamed("uid", "k"))
    p = TSI.paa(paa, "k", ["_hr"], "_m", n_segments=segments)
    words = TSI.sax_words(p, "k", alphabet=alphabet)
    profw = (prof.join(words.select(F.col("k").alias("uid"), "sax_word"),
                       on="uid"))
    n_users = prof.count()
    stats = (profw.groupBy("sax_word")
             .agg(F.count(F.lit(1)).alias("n"))
             .agg(F.count(F.lit(1)).alias("n_buckets"),
                  F.max("n").alias("max_bucket"),
                  F.sum(F.col("n") * (F.col("n") - 1) / 2)
                  .alias("pairs")).collect()[0])
    print(f"users={n_users} buckets={stats['n_buckets']} "
          f"max_bucket={stats['max_bucket']} "
          f"pair_volume={int(stats['pairs'])}")
    t0 = time.monotonic()
    d = TSI.dtw_pairs(profw, "uid", "profile", bucket_col="sax_word",
                      max_keys=max(2000, stats["max_bucket"]))
    d.write.format("noop").mode("overwrite").save()
    t = time.monotonic() - t0
    print(f"bucketed dtw: {t:.2f}s  pairs={d.count()} "
          f"loadavg={os.getloadavg()[0]:.1f}")


def main() -> None:
    mode = sys.argv[1]
    if mode == "queries":
        probe_queries(sys.argv[2], sys.argv[3:] or DEFAULT_QUERIES)
    elif mode == "bpe":
        probe_bpe(sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 500,
                  int(sys.argv[4]) if len(sys.argv) > 4 else 25)
    elif mode == "bpe-synthetic":
        probe_bpe_synthetic(
            int(sys.argv[2]) if len(sys.argv) > 2 else 50_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 2000)
    elif mode == "dtw":
        probe_dtw(sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 8,
                  int(sys.argv[4]) if len(sys.argv) > 4 else 4)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
