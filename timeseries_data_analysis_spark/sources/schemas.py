"""Explicit schemas for every table the engine reads.

The reference infers schemas with pandas at read time (SURVEY.md §1.3;
reference ``pre_processing.py:91-177``). At 100 TB that is both slow and
unsafe — a single malformed file silently changes dtypes. The engine
always reads with an explicit ``StructType`` (``spark.read.schema(...)``),
which also lets Catalyst prune columns at the parquet/CSV scan.

Two table families:

1. **Kiln tables** — the reference's 7 CSV inputs
   (reference ``data_generator.py:764-1030``).
2. **Benchmark corpus** — the driver's TPC-H-ish parquet tables
   (TESTDATA.md) used for correctness oracles and benchmarks.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Kiln tables (reference data model, SURVEY.md §1.1)
# ---------------------------------------------------------------------------

_MIS_NUMERIC_COLS = [
    "PRODUCTION ACTUAL", "GRADE_A", "GRADE_B", "DRI_FINES", "DRI_DUST",
    "PRODUCTION PLAN", "PROD_LOSS", "PELLETS_CONSUMPTION",
    "IRON ORE CONSUMPTION", "TOTAL_IRON_ORE_PELLETS", "HG_COAL_CONSUMPTION",
    "SA_COAL_CONSUMPTION", "ESSAR_FINES", "NCL_FINES", "WASH_COAL",
    "COAL_LOSSES_BYPRODUCTS", "GROSS COAL CONSUMPTION", "COAL_PER_TDRI",
    "DOLO_CONSUMPTION", "CHAR_GENERATION", "PLUS_6_CHAR", "MINUS_6_CHAR",
    "MAG_CHAR", "MIX_CHAR", "POWER", "KILN_AVAILABILITY",
    "TOTAL_STEAM_FLOW", "AVERAGE_STEAM", "FEED_LOSS_TOTAL", "SLINGER_LOSS",
]

MIS_REPORT = T.StructType(
    [T.StructField("DATE", T.TimestampType()), T.StructField("CAMP_DAY", T.IntegerType())]
    + [T.StructField(c, T.DoubleType()) for c in _MIS_NUMERIC_COLS]
    + [
        T.StructField("FEED_LOSS_REASON", T.StringType()),
        T.StructField("SLINGER_LOSS_REASON", T.StringType()),
        T.StructField("REMARKS", T.StringType()),
    ]
)

SHELL_TEMPERATURE = T.StructType([
    T.StructField("DATE", T.TimestampType()),
    T.StructField("POSITION", T.StringType()),
    T.StructField("SHELL_TEMP_0", T.DoubleType()),
    T.StructField("SHELL_TEMP_90", T.DoubleType()),
    T.StructField("SHELL_TEMP_180", T.DoubleType()),
    T.StructField("SHELL_TEMP_270", T.DoubleType()),
    T.StructField("SHELL_TEMP_AVG", T.DoubleType()),
])

AIR_CALIBRATION = T.StructType([
    T.StructField("DATE", T.TimestampType()),
    T.StructField("FAN", T.StringType()),
    T.StructField("DAMPER", T.DoubleType()),
    T.StructField("VELOCITY", T.DoubleType()),
    T.StructField("AIR_FLOW", T.DoubleType()),
])

QRT_TEMPERATURE = T.StructType([
    T.StructField("DATETIME", T.TimestampType()),
    T.StructField("ZONE", T.IntegerType()),
    T.StructField("TEMPERATURE", T.DoubleType()),
])

ZONE_TEMPERATURE = T.StructType(
    [T.StructField("DATETIME", T.TimestampType())]
    + [T.StructField(f"ZONE_{i}", T.DoubleType()) for i in range(11)]
)

ACCRETION_EVENTS = T.StructType([
    T.StructField("EVENT_ID", T.IntegerType()),
    T.StructField("START_DATE", T.TimestampType()),
    T.StructField("CRITICAL_DATE", T.TimestampType()),
    T.StructField("CLEARED_DATE", T.TimestampType()),
    T.StructField("ZONE", T.IntegerType()),
    T.StructField("DURATION_DAYS", T.IntegerType()),
])

ACCRETION_TRUTH = T.StructType([
    T.StructField("DATE", T.TimestampType()),
    T.StructField("HAS_ACCRETION", T.BooleanType()),
    T.StructField("ACTIVE_ACCRETION_COUNT", T.IntegerType()),
    T.StructField("ZONES_AFFECTED", T.StringType()),  # split() → array<int> at load
    T.StructField("MAX_SEVERITY", T.DoubleType()),
])

KILN_SCHEMAS: dict[str, T.StructType] = {
    "mis_report": MIS_REPORT,
    "shell_temperature": SHELL_TEMPERATURE,
    "air_calibration": AIR_CALIBRATION,
    "qrt_temperature": QRT_TEMPERATURE,
    "zone_temperature": ZONE_TEMPERATURE,
    "accretion_events": ACCRETION_EVENTS,
    "accretion_truth": ACCRETION_TRUTH,
}

# ---------------------------------------------------------------------------
# Benchmark corpus (TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType()),
    T.StructField("r_name", T.StringType()),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType()),
    T.StructField("c_name", T.StringType()),
    T.StructField("c_nationkey", T.IntegerType()),
    T.StructField("c_acctbal", T.DoubleType()),
    T.StructField("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType()),
    T.StructField("s_name", T.StringType()),
    T.StructField("s_nationkey", T.IntegerType()),
    T.StructField("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("p_name", T.StringType()),
    T.StructField("p_brand", T.StringType()),
    T.StructField("p_type", T.StringType()),
    T.StructField("p_size", T.IntegerType()),
    T.StructField("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampType()),
    T.StructField("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_partkey", T.LongType()),
    T.StructField("l_suppkey", T.LongType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_tax", T.DoubleType()),
    T.StructField("l_returnflag", T.StringType()),
    T.StructField("l_linestatus", T.StringType()),
    T.StructField("l_shipdate", T.TimestampType()),
])

# NOTE: events.ts has shipped as BOTH parquet timestamp[ns] (round-1
# corpus) and timestamp[us] (round-2 regeneration). readers.load_table
# probes the footer (driver-side metadata read, O(1)) and picks the right
# variant: ns → scan as raw int64 + truncating ns→µs divide (matching
# DuckDB's read); µs → plain TimestampType scan.
EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

EVENTS_NS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

CORPUS_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
