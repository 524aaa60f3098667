"""Source/sink coverage (SURVEY.md §2.1): schema-pinned CSV round-trip,
parquet sink, and pushdown/pruning assertions on the corpus readers.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.fixtures import kiln_fixture as FX
from timeseries_data_analysis_spark.sources import readers, schemas


def test_kiln_csv_roundtrip(spark, tmp_path):
    """S1/S2: write the fixture as headered CSV, read with pinned schema —
    dtypes come from the schema, never inference."""
    pdf = FX.air_calibration(n_days=5)
    path = str(tmp_path / "air_calibration.csv")
    pdf.to_csv(path, index=False)
    df = readers.load_kiln_csv(spark, str(tmp_path), "air_calibration")
    assert df.schema == schemas.KILN_SCHEMAS["air_calibration"]
    out = df.toPandas()
    assert len(out) == len(pdf)
    assert out["AIR_FLOW"].dtype == "float64"
    # timestamps parsed at scan time, not post-hoc
    assert str(df.schema["DATE"].dataType) == "TimestampType()"


def test_parquet_sink_partitioned(spark, tmp_path):
    """S2: the engine's native sink — date-partitioned parquet, readable
    back with partition pruning."""
    pdf = FX.qrt_temperature(n_days=4)
    df = spark.createDataFrame(pdf).withColumn(
        "day", F.to_date("DATETIME"))
    out_dir = str(tmp_path / "qrt")
    df.write.partitionBy("day").mode("overwrite").parquet(out_dir)
    assert len(glob.glob(os.path.join(out_dir, "day=*"))) == 4

    back = spark.read.parquet(out_dir)
    one_day = back.filter(F.col("day") == "2024-06-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan must carry the partition filter
    assert "PartitionFilters" in plan
    assert one_day.count() == len(pdf[pdf["DATETIME"].dt.date.astype(str)
                                      == "2024-06-02"])


def test_corpus_scan_pushdown(spark):
    """P3 at the scan: a ts-range filter must reach the parquet reader as
    a pushed filter, and the projection must prune to the read columns."""
    df = readers.load_table(spark, "/root/testdata/sf0.01", "lineitem")
    q = df.filter(F.col("l_shipdate") <= F.lit("1995-01-01")) \
        .select("l_quantity", "l_shipdate")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # column pruning: ReadSchema carries only the 2 selected columns
    rs = [ln for ln in plan.split("\n") if "ReadSchema" in ln][0]
    assert "l_quantity" in rs and "l_shipdate" in rs
    assert "l_extendedprice" not in rs


def test_events_ns_truncation(spark):
    """events.ts stores nanos; the reader truncates ns→µs exactly like
    DuckDB's parquet read (the oracle-comparability invariant)."""
    df = readers.load_table(spark, "/root/testdata/sf0.001", "events")
    assert str(df.schema["ts"].dataType) == "TimestampType()"
    import duckdb
    want = duckdb.sql(
        "SELECT max(ts) FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()[0]
    got = df.agg(F.max("ts")).first()[0]
    assert got == want


def test_write_partitioned_layout(spark, tmp_path):
    """S2 scale path: day-partitioned parquet, bounded file count."""
    from timeseries_data_analysis_spark.sources import sinks
    df = spark.range(200).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts0")
    ).select("id", (F.col("ts0") + F.make_interval(hours=F.col("id"))).alias("ts"))
    out = str(tmp_path / "part_out")
    sinks.write_partitioned(df, out, "ts")
    import glob, os
    days = sorted(os.path.basename(p) for p in glob.glob(out + "/dt=*"))
    assert len(days) == 9 and days[0] == "dt=2024-03-01"
    # one data file per day directory
    for d in glob.glob(out + "/dt=*"):
        assert len(glob.glob(d + "/*.parquet")) == 1
    back = spark.read.parquet(out)
    assert back.count() == 200
    # partition pruning: a dt filter scans one directory
    plan = back.filter(F.col("dt") == "2024-03-05")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" not in plan or "dt" in plan


def test_export_csv_single_file(spark, tmp_path):
    from timeseries_data_analysis_spark.sources import sinks
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out = str(tmp_path / "export.csv")
    sinks.export_csv(df, out)
    import glob
    files = glob.glob(out + "/part-*.csv")
    assert len(files) == 1
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 10 and set(back.columns) == {"id", "v"}


def test_jsonl_round_trip(spark, tmp_path):
    import json
    from pyspark.sql import types as T
    from timeseries_data_analysis_spark.sources.readers import load_jsonl, write_jsonl
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    src = tmp_path / "in"
    src.mkdir()
    lines = [json.dumps({"doc_id": i, "text": f"doc {i}"}) for i in range(5)]
    lines.append("{not valid json")
    (src / "part0.jsonl").write_text("\n".join(lines))
    df = load_jsonl(spark, str(src), schema)
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 5 and len(bad) == 1  # malformed quarantined, not fatal
    out = tmp_path / "out"
    write_jsonl(df.filter(F.col("_corrupt_record").isNull())
                .select("doc_id", "text"), str(out))
    back = load_jsonl(spark, str(out), T.StructType(schema.fields[:2]))
    assert sorted(r["doc_id"] for r in back.collect()) == [0, 1, 2, 3, 4]


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    """The scale claim behind write_bucketed: two tables bucketed on the
    join key join WITHOUT any shuffle (no Exchange over either side), and
    a bucket+sort table feeds a same-key window without an Exchange."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from timeseries_data_analysis_spark.sources.sinks import write_bucketed
    write_bucketed(ev.select("event_id", "user_id", "ts", "value"),
                   "t_ev_b", "user_id", n_buckets=4, sort_col="user_id")
    write_bucketed(ev.groupBy("user_id").count(),
                   "t_us_b", "user_id", n_buckets=4, sort_col="user_id")
    try:
        joined = spark.table("t_ev_b").join(spark.table("t_us_b"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == ev.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_ev_b")
        spark.sql("DROP TABLE IF EXISTS t_us_b")
