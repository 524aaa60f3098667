"""Round-7 scale probes: the relational decade (TPC-H shapes over the
clone corpora, now that make_scale_corpus.py grows lineitem/customer/
supplier/part with consistent foreign-key offsets) plus the capped
pagerank decade (the oracle-checked `max_bucket` form).

Usage:
  python tools/scale_probe_r7.py <sf_dir> [name ...]

Scale-shape expectations, stated BEFORE measuring:

- pricing_summary / order_priority_counts / returned_item_revenue:
  single scan + bounded-group agg — pure scan-linear, AQE coalesces.
- shipping_priority (Q3) / idle_rich_customers (Q22): filter-at-scan +
  one shuffled fact join against an Nx dim — linear in fact bytes; the
  dim side stays shuffle-joined (it grows with N, no broadcast).
- regional_supplier_volume (Q5): 6-table join; nation/region stay
  broadcast (fixed dims), customer/supplier/lineitem/orders all Nx —
  expect linear, dominated by the two fact shuffles.
- top_supplier_share (Q15): lineitem group-agg + global-max semi —
  linear; the revenue table is supplier-bounded (Nx rows, tiny).
- small_qty_revenue (Q17) / bracketed_revenue (Q19): part-filtered
  joins; Q17's per-part avg subquery is grouped (not correlated) —
  linear in the filtered fact volume.
- supplier_part_variety (Q16): distinct (part, supp) count — the
  distinct shuffle grows Nx, linear.
- join_cardinality: bottom-k per side + sketch merge — linear scans,
  K-bounded merge.
- pagerank_capped: the capped 48-bit pair build — SCALE §1i measured
  the UNCAPPED build DNF at 100× (1.28B candidates) and max_bucket as
  the rescue; the capped chain's candidate volume is bucket-bounded
  (≤ cap² per bucket), so expect the fingerprint build (scan + 48
  vote aggs) to dominate and the pair join to stay invisible. The
  clone corpus multiplies clique density, so edge counts grow
  superlinearly (data property); runtime should track the BUILD.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from timeseries_data_analysis_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "pricing_summary", "shipping_priority", "order_priority_counts",
    "regional_supplier_volume", "returned_item_revenue",
    "top_supplier_share", "supplier_part_variety", "small_qty_revenue",
    "bracketed_revenue", "idle_rich_customers", "join_cardinality",
    "nation_revenue", "pagerank_capped",
    # round-7 late additions: the 12 shapes completing the TPC-H suite.
    # Scale expectations: all scan-linear in fact bytes except the
    # derived-partsupp trio (Q2/Q11/Q20), whose distinct-pair shuffle is
    # ALSO linear (pairs ⊆ lineitem rows); Q21's decorrelated census
    # shuffles map-side-deduped pairs, not fact rows.
    "discounted_revenue", "nation_trade_volume", "market_share",
    "product_type_profit", "late_line_priority", "custdist",
    "promo_revenue_share", "large_volume_customers", "waiting_suppliers",
    "min_cost_supplier", "important_stock", "excess_stock_suppliers",
    # analytics additions: one combinable-agg DFT (scan-linear), N×K
    # broadcast silhouette, explode-scan NB, edge-agg ALS/HITS, and
    # seeded PPR riding the same capped pair build as pagerank_capped
    "periodogram", "hits_authority", "nb_langid", "als_rank1",
    "silhouette_audit", "ppr_trust",
]


def _pagerank_capped_prod(spark, sf_dir):
    """The PRODUCTION-cap form of `pagerank_capped` (max_bucket=1000,
    SCALE §1i's measured DNF rescue). The registry query pins
    max_bucket=2 so the cap BITES at gate scale (sf0.01); at the 100×
    corpus avg 12-bit band occupancy is ~122, so cap=2 drops EVERY
    bucket and yields the (now gracefully) empty graph — this variant
    carries the decade evidence for the form a 100 TB run uses."""
    from pyspark.sql import functions as F
    from timeseries_data_analysis_spark.operators import dedup as DD
    from timeseries_data_analysis_spark.operators import graph as GR
    from timeseries_data_analysis_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.simhash_hamming_pairs(docs, n=2, bits=48, bands=4,
                                     max_hamming=3, hex_digits=12,
                                     max_bucket=1000)
    pr = GR.pagerank(pairs, iters=6, damping=0.85)
    return pr.select(F.col("vertex").alias("doc_id"), "degree",
                     F.round(F.col("pr_rel") + 1e-9, 4).alias("pr_rel"))


EXTRA = {"pagerank_capped_prod": _pagerank_capped_prod}


def probe_queries(sf_dir: str, names: list[str],
                  trials: int | None = None) -> None:
    # SCALE_TRIALS=1 for the 100x corpus (runs are minutes long and
    # saturate the host themselves — the round-5 one-shot convention)
    if trials is None:
        trials = int(os.environ.get("SCALE_TRIALS", "2"))
    spark = get_spark("scale-probe-r7")
    qs = dict(entry_mod.queries(), **EXTRA)
    print(f"{'query':26s} {'t_min_s':>9s} {'rows':>12s}  loadavg", flush=True)
    for name in names:
        times = []
        for _ in range(trials):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        rows = qs[name](spark, sf_dir).count()
        la = os.getloadavg()[0]
        print(f"{name:26s} {min(times):9.2f} {rows:12d}  {la:.1f}",
              flush=True)


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    probe_queries(sf_dir, names)
