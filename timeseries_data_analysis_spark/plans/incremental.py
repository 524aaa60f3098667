"""Incremental aggregate maintenance (batch materialized-view pattern).

The reference recomputes its whole feature matrix every run (eager pandas,
`pre_processing.py:1741-2020`); at 100 TB a daily increment must NOT
re-scan history. The standard fix: persist the rollup as ALGEBRAIC
PARTIALS (sum/count/min/max per grain), merge new partials in, and derive
the final measures (avg = sum/count) at read time. Every step is a plain
group-agg, so the merge is associative and idempotent-by-grain.

Storage layout: day-partitioned parquet written with DYNAMIC partition
overwrite, so refreshing late-arriving days rewrites ONLY the partitions
actually touched — the incremental-load sink every warehouse uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTIAL_COLS = ("n", "sum_v", "min_v", "max_v")


def rollup_partials(events: DataFrame, key_cols: list[str],
                    ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Daily algebraic partials per key: (day, keys..., n, sum_v, min_v,
    max_v). This is the STORED form of the rollup — mergeable, not final."""
    return (events
            .withColumn("day", F.to_date(ts_col))
            .groupBy("day", *key_cols)
            .agg(F.count(value_col).alias("n"),
                 F.sum(value_col).alias("sum_v"),
                 F.min(value_col).alias("min_v"),
                 F.max(value_col).alias("max_v")))


def merge_partials(existing: DataFrame, delta: DataFrame,
                   key_cols: list[str]) -> DataFrame:
    """Merge two partial tables on the same grain: union + re-aggregate.

    Associativity makes this exact: sum-of-sums, sum-of-counts,
    min-of-mins, max-of-maxes. Only rows for days present in ``delta``
    change, so pair with dynamic partition overwrite to rewrite just
    those day partitions.
    """
    return (existing.unionByName(delta)
            .groupBy("day", *key_cols)
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_v").alias("sum_v"),
                 F.min("min_v").alias("min_v"),
                 F.max("max_v").alias("max_v")))


def finalize(partials: DataFrame) -> DataFrame:
    """Derive the user-facing measures from stored partials."""
    return partials.select(
        "*", (F.col("sum_v") / F.col("n")).alias("avg_v"))


def write_day_partitions(df: DataFrame, path: str) -> None:
    """Day-partitioned write with DYNAMIC partition overwrite: only the
    day partitions present in ``df`` are replaced; untouched history
    stays as-is. (Static overwrite — the default — would DROP every
    other partition: the classic incremental-load foot-gun.)
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def incremental_refresh(spark, rollup_path: str, new_events: DataFrame,
                        key_cols: list[str], ts_col: str = "ts",
                        value_col: str = "value") -> None:
    """One maintenance cycle: partials(new) ⟶ merge with the stored days
    they touch ⟶ rewrite only those day partitions.

    Reads back ONLY the affected days (partition pruning on the stored
    table); everything else never leaves disk.
    """
    from pyspark.errors import AnalysisException

    delta = rollup_partials(new_events, key_cols, ts_col, value_col)
    days = [r["day"] for r in delta.select("day").distinct().collect()]
    try:
        existing = spark.read.parquet(rollup_path).filter(F.col("day").isin(days))
        merged = merge_partials(existing, delta, key_cols)
    except AnalysisException:  # first load: nothing stored yet
        merged = delta
    # materialize BEFORE the write: the merge reads the same files the
    # dynamic overwrite is about to replace (read-overwrite hazard)
    write_day_partitions(merged.localCheckpoint(), rollup_path)
