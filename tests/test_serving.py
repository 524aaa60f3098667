"""Serving-view tests (SURVEY.md §2.12): each dashboard chart query runs
as a SQL view over the kiln tables and returns sane results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.fixtures import kiln_fixture as FX
from timeseries_data_analysis_spark.operators import pivot as PV
from timeseries_data_analysis_spark.plans import serving


@pytest.fixture(scope="module")
def views(spark):
    pdfs = FX.all_tables(n_days=20)
    for name in ("mis_report", "shell_temperature", "accretion_events"):
        spark.createDataFrame(pdfs[name]).createOrReplaceTempView(name)
    zone_long = PV.melt(spark.createDataFrame(pdfs["zone_temperature"]),
                        ["DATETIME"], key_name="series", value_name="value") \
        .withColumnRenamed("DATETIME", "ts")
    zone_long.createOrReplaceTempView("zone_temperature_long")
    return serving.register_views(spark, start="2024-06-05", stride=10)


def test_all_views_created(spark, views):
    assert len(views) == len(serving.VIEWS)
    for v in views:
        assert spark.sql(f"SELECT * FROM {v} LIMIT 1").columns


def test_zone_trends_stride_and_filter(spark, views):
    out = spark.sql("SELECT * FROM v_zone_trends").toPandas()
    assert out["ts"].min() >= __import__("pandas").Timestamp("2024-06-05")
    # stride 10 on a 10-min grid → hourly points; 11 series
    per_series = out.groupby("series").size()
    assert len(per_series) == 11
    assert per_series.nunique() == 1


def test_production_quality_zero_guard(spark, views):
    out = spark.sql("SELECT * FROM v_production_quality").toPandas()
    # maintenance days: production 0 → pct 0, never inf/NaN
    maint = out[out["production"] == 0]
    assert len(maint) > 0
    assert (maint["grade_a_pct"] == 0).all()
    ok = out[out["production"] > 0]
    assert ((ok["grade_a_pct"] > 0) & (ok["grade_a_pct"] <= 100)).all()


def test_quality_join_and_latest_probe(spark, views):
    j = spark.sql("SELECT * FROM v_quality_vs_accretion").toPandas()
    assert len(j) == 20  # inner join on 20 fixture days
    assert j["mean_shell_temp"].notna().all()
    latest = spark.sql("SELECT * FROM v_latest_mis").toPandas()
    assert len(latest) == 1
    assert latest["DATE"].iloc[0] == j["day"].max()


def test_events_timeline_classes(spark, views):
    out = spark.sql("SELECT * FROM v_events_timeline").toPandas()
    assert len(out) == 1
    assert out["severity_class"].iloc[0] == "mild"  # 20-day fixture event


def test_accretion_status_rules(spark, views):
    """dashboard.py:812-924: latest temp per zone vs the per-zone
    threshold map; >=3 low zones => 'temperature_anomaly'."""
    out = spark.sql("SELECT * FROM v_accretion_status").toPandas()
    assert len(out) == 11  # one row per zone
    assert set(out["zone"]) == set(range(11))
    # rule consistency: is_low matches temp < thr; one global status
    assert ((out["temp"] < out["thr"]).astype(int) == out["is_low"]).all()
    assert out["n_low_zones"].nunique() == 1
    expect = ("temperature_anomaly" if out["is_low"].sum() >= 3 else "normal")
    assert (out["status"] == expect).all()
    assert out["model_probability"].isna().all()  # ML hook, not engine


def test_quality_grades_scatter_pairs(spark, views):
    """dashboard.py:1738-1839: pairwise (grade x material) long source —
    every day emits all 6 pairs with values copied from mis_report."""
    out = spark.sql("SELECT * FROM v_quality_grades_scatter").toPandas()
    assert len(out) == 20 * 2 * 3
    assert set(out["grade_name"]) == {"GRADE_A", "GRADE_B"}
    assert set(out["material_name"]) == {"IRON_ORE", "GROSS_COAL", "PELLETS"}
    mis = spark.sql("SELECT * FROM mis_report").toPandas()
    day0 = mis["DATE"].iloc[0]
    row = out[(out["day"] == day0) & (out["grade_name"] == "GRADE_A")
              & (out["material_name"] == "IRON_ORE")]
    assert len(row) == 1
    assert row["grade_value"].iloc[0] == mis["GRADE_A"].iloc[0]
    assert row["material_value"].iloc[0] == mis["IRON ORE CONSUMPTION"].iloc[0]


def test_streaming_dashboard_loop(spark, tmp_path):
    """End-to-end §3.3 serving loop (VERDICT r8 'Next round' #4): the
    kiln zone feed and the daily MIS report replay through
    Trigger.AvailableNow file micro-batches (maxFilesPerTrigger=1 —
    genuinely multiple batches) into parquet sink tables; the §2.12
    serving views then run over the STREAMED tables and must equal the
    same views over the batch-loaded fixture, and the threshold-alert
    stream must equal the identical batch rule on every finalized
    window. This is the reference's 60-s dashboard poll loop
    (dashboard.py:782+) recomposed as Structured Streaming → SQL
    serving views."""
    import pandas as pd

    from timeseries_data_analysis_spark.streaming import jobs as SJ

    pdfs = FX.all_tables(n_days=30)
    zone_long = (PV.melt(spark.createDataFrame(pdfs["zone_temperature"]),
                         ["DATETIME"], key_name="series",
                         value_name="value")
                 .withColumnRenamed("DATETIME", "ts"))
    mis = spark.createDataFrame(pdfs["mis_report"])

    def replay(df, name, n_files, ts_col):
        src = str(tmp_path / f"src_{name}")
        sink = str(tmp_path / f"sink_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        # chronological slices written sequentially (increasing mtime)
        # — a real feed delivers time-ordered files, and the watermark
        # semantics REQUIRE it: a time-shuffled replay advances the
        # watermark past rows still sitting in later files and the
        # stateful alert rollup correctly drops them as late (measured
        # — the first version of this test did exactly that)
        from pyspark.sql.window import Window
        slices = df.select(
            F.ntile(n_files).over(Window.orderBy(ts_col)).alias("_sl"),
            "*")
        for i in range(1, n_files + 1):
            (slices.filter(F.col("_sl") == i).drop("_sl")
             .coalesce(1).write.mode("append").parquet(src))
        stream = SJ.stream_source(spark, f"{src}/*", df.schema,
                                  max_files_per_trigger=1)
        q = (stream.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.schema(df.schema).parquet(sink)

    streamed_zone = replay(zone_long, "zone", 6, "ts")
    streamed_mis = replay(mis, "mis", 3, "DATE")
    assert streamed_zone.count() == zone_long.count()
    assert streamed_mis.count() == mis.count()

    # static side tables (not part of the feed)
    for name in ("shell_temperature", "accretion_events"):
        spark.createDataFrame(pdfs[name]).createOrReplaceTempView(name)

    deterministic = ["v_production_quality", "v_material_consumption",
                     "v_quality_vs_accretion", "v_latest_mis",
                     "v_accretion_status"]

    def view_outputs(zone_df, mis_df):
        zone_df.createOrReplaceTempView("zone_temperature_long")
        mis_df.createOrReplaceTempView("mis_report")
        serving.register_views(spark, start="2024-06-05", stride=10)
        out = {v: sorted(map(tuple, spark.sql(
            f"SELECT * FROM {v}").collect())) for v in deterministic}
        # v_zone_trends: the fixture injects duplicate timestamps, so
        # the stride's row_number tie order is nondeterministic in
        # `value` — compare the (series, ts) multiset, which IS
        # deterministic (tied rows share series and ts)
        out["v_zone_trends_keys"] = sorted(
            (r["series"], r["ts"])
            for r in spark.sql("SELECT series, ts FROM v_zone_trends")
            .collect())
        return out

    got_stream = view_outputs(streamed_zone, streamed_mis)
    got_batch = view_outputs(zone_long, mis)
    for v in deterministic + ["v_zone_trends_keys"]:
        assert got_stream[v] == got_batch[v], v
    assert len(got_stream["v_accretion_status"]) == 11  # one row/zone

    # the alert loop: stream rule == batch rule on finalized windows
    # (append mode only emits a window once the 2 h watermark passes
    # it, so the feed's last ~3 h of windows never finalize — restrict
    # BOTH sides to the finalized range)
    src = SJ.stream_source(spark, str(tmp_path / "src_zone") + "/*",
                           zone_long.schema, max_files_per_trigger=1)
    alerts = SJ.threshold_alerts(
        src, threshold=800.0, ts_col="ts", key_col="series")
    q = (alerts.writeStream.format("memory").queryName("loop_alerts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    stream_alerts = spark.sql("SELECT * FROM loop_alerts").toPandas()
    max_ts = zone_long.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts).floor("h") - pd.Timedelta(hours=4)
    batch_alerts = (
        zone_long.groupBy(F.window("ts", "1 hour").alias("win"), "series")
        .agg(F.avg("value").alias("avg_value"))
        .withColumn("_low", (F.col("avg_value") < 800.0).cast("int"))
        .groupBy(F.col("win.start").alias("ts"))
        .agg(F.sum("_low").alias("n_low_series"))
        .withColumn("alert",
                    (F.col("n_low_series") >= 3).cast("int"))
        .toPandas())
    s = (stream_alerts[stream_alerts["ts"] <= cutoff]
         .sort_values("ts").reset_index(drop=True))
    b = (batch_alerts[batch_alerts["ts"] <= cutoff]
         .sort_values("ts").reset_index(drop=True))
    assert len(s) == len(b) and len(s) > 0
    assert (s["n_low_series"].to_numpy()
            == b["n_low_series"].to_numpy()).all()
    assert (s["alert"].to_numpy() == b["alert"].to_numpy()).all()
