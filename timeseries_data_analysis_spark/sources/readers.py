"""Table readers (SURVEY.md §2.1 S1).

Reference: ``pd.read_csv(path, parse_dates=[...])`` per table
(``pre_processing.py:93-176``). Here: schema-pinned ``spark.read`` so the
scan gets column pruning + predicate pushdown. Parquet is the engine's
native format; CSV is supported for the reference's raw feeds.

Scale note: readers never ``inferSchema`` (a full extra pass over 100 TB)
and never cache by default — lineage stays lazy so Catalyst can push
filters from downstream operators into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import schemas


_TS_UNIT_CACHE: dict[str, str] = {}


def _events_ts_unit(path: str) -> str:
    """Physical unit of events.ts, probed from the parquet footer once
    (driver-side metadata read — no data scan). The corpus has shipped
    with both timestamp[ns] and timestamp[us] encodings across rounds."""
    unit = _TS_UNIT_CACHE.get(path)
    if unit is None:
        import pyarrow.parquet as pq
        probe = path
        if os.path.isdir(path):
            # Spark-written dataset: a directory of part files with a
            # uniform schema — probe the first part's footer.
            parts = sorted(f for f in os.listdir(path)
                           if f.endswith(".parquet"))
            if not parts:
                return "us"
            probe = os.path.join(path, parts[0])
        t = pq.read_schema(probe).field("ts").type
        unit = getattr(t, "unit", "us")
        _TS_UNIT_CACHE[path] = unit
    return unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one benchmark-corpus parquet table with its pinned schema."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = schemas.CORPUS_SCHEMAS.get(name)
    if name == "events" and _events_ts_unit(path) == "ns":
        # timestamp[ns]: Spark's vectorized reader rejects ns as
        # TimestampType — scan the raw int64 nanos and truncate to µs
        # exactly like DuckDB reads it.
        from pyspark.sql import functions as F
        df = spark.read.schema(schemas.EVENTS_NS).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_all(spark: SparkSession, sf_dir: str,
             names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load several corpus tables; also registers each as a temp view."""
    names = names or list(schemas.CORPUS_SCHEMAS)
    out = {}
    for n in names:
        df = load_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


def load_kiln_csv(spark: SparkSession, data_dir: str, name: str) -> DataFrame:
    """Load one of the 7 kiln CSV feeds with an explicit schema.

    Mirrors reference ``pre_processing.py:91-177`` (read + parse_dates),
    minus inference. Timestamp columns are declared TimestampType in the
    schema so Spark parses them at scan time.
    """
    schema = schemas.KILN_SCHEMAS[name]
    path = os.path.join(data_dir, f"{name}.csv")
    return spark.read.schema(schema).option("header", "true").csv(path)


def load_jsonl(spark: SparkSession, path: str, schema,
               timestamp_format: str | None = None) -> DataFrame:
    """Schema-pinned JSON-Lines reader — the interchange format most raw
    text corpora arrive in (one JSON doc per line, splittable, appendable).

    Same discipline as the other readers: an explicit schema (never
    inferSchema — that is a full extra pass over the corpus), malformed
    lines quarantined into ``_corrupt_record`` instead of failing the job
    (PERMISSIVE mode), so one bad crawl record cannot kill a 100 TB read.
    """
    reader = (spark.read.schema(schema)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record"))
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """JSON-Lines export (compressed, splittable-per-file): the write-side
    twin of ``load_jsonl`` for corpus interchange."""
    df.write.mode("overwrite").option("compression", compression).json(path)
