"""Pivot/melt round-trip and top-k operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_data_analysis_spark.operators import pivot as PV, topk as TK


def test_pivot_then_melt_round_trip(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)],
        "ts long, k string, value double")
    wide = PV.pivot_wide(df, ["ts"], "k", "value", values=["a", "b"])
    assert set(wide.columns) == {"ts", "a", "b"}
    long = PV.melt(wide, ["ts"], key_name="k", value_name="value")
    back = {(r["ts"], r["k"]): r["value"] for r in long.collect()}
    assert back[(1, "a")] == 10.0 and back[(1, "b")] == 20.0
    assert back[(2, "a")] == 30.0 and back[(2, "b")] is None


def test_pivot_prefix_flatten(spark):
    df = spark.createDataFrame([(1, "SAF02", 5.0)], "ts long, FAN string, AIR_FLOW double")
    wide = PV.pivot_wide(df, ["ts"], "FAN", "AIR_FLOW", values=["SAF02"], prefix="air_")
    assert "air_SAF02" in wide.columns


def test_top_k_per_group_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("x", 1, 5.0), ("x", 2, 5.0), ("x", 3, 1.0), ("y", 4, 9.0)],
        "g string, id int, v double")
    out = TK.top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 2)
    got = sorted((r["g"], r["id"], r["rk"]) for r in out.collect())
    assert got == [("x", 1, 1), ("x", 2, 2), ("y", 4, 1)]


def test_stride_sample(spark):
    df = spark.createDataFrame([("a", i) for i in range(10)], "k string, ts long")
    out = TK.stride_sample(df, [F.col("ts")], 3, partition_by=["k"])
    assert [r["ts"] for r in out.orderBy("ts").collect()] == [0, 3, 6, 9]


def test_value_counts_top_n(spark):
    df = spark.createDataFrame([(c,) for c in "aaabbc"], "v string")
    out = TK.value_counts_top_n(df, "v", 2)
    got = [(r["v"], r["n"]) for r in out.collect()]
    assert got == [("a", 3), ("b", 2)]


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    from timeseries_data_analysis_spark.operators import skew as SKEW
    from timeseries_data_analysis_spark.sources import load_table
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    got = {r["event_type"]: r for r in
           SKEW.salted_agg(ev, ["event_type"], "value", n_salt=8).collect()}
    exp = {r["event_type"]: r for r in
           ev.groupBy("event_type").agg(
               F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"),
               F.min("value").alias("min_v"), F.max("value").alias("max_v"),
               F.avg("value").alias("avg_v")).collect()}
    assert set(got) == set(exp)
    for k in got:
        assert got[k]["n"] == exp[k]["n"]
        assert got[k]["min_v"] == exp[k]["min_v"]
        assert got[k]["max_v"] == exp[k]["max_v"]
        assert abs(got[k]["sum_v"] - exp[k]["sum_v"]) < 1e-6
        assert abs(got[k]["avg_v"] - exp[k]["avg_v"]) < 1e-9


def test_salted_broadcast_join_matches_plain_join(spark, sf_dir):
    from timeseries_data_analysis_spark.operators import skew as SKEW
    from timeseries_data_analysis_spark.sources import load_table
    ev = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [(t, i) for i, t in enumerate(
            ["click", "error", "purchase", "signup", "view"])],
        "event_type string, type_code int")
    got = SKEW.salted_broadcast_join(ev, dim, "event_type", n_salt=4)
    exp = ev.join(dim, "event_type")
    assert got.count() == exp.count()
    g = got.groupBy("event_type").count().collect()
    e = exp.groupBy("event_type").count().collect()
    assert {(r["event_type"], r["count"]) for r in g} == \
           {(r["event_type"], r["count"]) for r in e}


def test_label_centroid_pairs_bounds(spark, sf_dir):
    from timeseries_data_analysis_spark.operators import similarity as SIM
    from timeseries_data_analysis_spark.sources import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SIM.label_centroids(emb)
    n_labels = emb.select("label").distinct().count()
    dim = len(emb.select("embedding").first()[0])
    assert cents.count() == n_labels * dim
    pairs = SIM.centroid_cosine_pairs(cents).collect()
    assert len(pairs) == n_labels * (n_labels - 1) // 2
    assert all(-1.0 - 1e-9 <= r["cos_sim"] <= 1.0 + 1e-9 for r in pairs)


def test_global_rank_matches_single_partition_window(spark):
    """Distributed two-pass ranking must assign exactly the ranks a
    single-partition ORDER BY window would, for any range-boundary
    placement (total-order key)."""
    import random

    from pyspark.sql import Window, functions as F
    from timeseries_data_analysis_spark.operators import topk as TK

    rng = random.Random(9)
    rows = [(i, rng.uniform(0, 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(13)
    got = {r["id"]: r["rank"] for r in
           TK.global_rank(df, ["v", "id"]).collect()}
    w = Window.orderBy("v", "id")
    want = {r["id"]: r["rn"] for r in
            df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == {k: int(v) for k, v in want.items()}


def test_global_cumsum_matches_single_partition_window(spark):
    """Distributed two-pass prefix sum must equal the single-partition
    ORDER BY window's cumulative sum — inclusive and exclusive forms —
    for any range-boundary placement (total-order key, integer adds)."""
    import random

    from pyspark.sql import Window, functions as F
    from timeseries_data_analysis_spark.operators import topk as TK

    rng = random.Random(11)
    rows = [(i, rng.randrange(1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    got_inc = {r["id"]: r["cumsum"] for r in
               TK.global_cumsum(df, ["v", "id"], "v").collect()}
    got_exc = {r["id"]: r["cumsum"] for r in
               TK.global_cumsum(df, ["v", "id"], "v",
                                exclusive=True).collect()}
    w = Window.orderBy("v", "id")
    inc = w.rowsBetween(Window.unboundedPreceding, 0)
    exc = w.rowsBetween(Window.unboundedPreceding, -1)
    want_inc = {r["id"]: r["c"] for r in
                df.withColumn("c", F.sum("v").over(inc)).collect()}
    want_exc = {r["id"]: r["c"] or 0 for r in
                df.withColumn("c", F.sum("v").over(exc)).collect()}
    assert got_inc == want_inc
    assert got_exc == want_exc
