"""timeseries_data_analysis_spark — a PySpark-native time-series analytics engine.

A from-scratch re-expression of the query/data-processing semantics of the
reference system ``shivam675/timeseries_data_analysis`` (a pandas/numba
rotary-kiln accretion-monitoring pipeline) on Apache Spark DataFrame/SQL/
Window/Structured Streaming, designed for 100 TB-scale clusters.

Layout
------
- ``session``    : SparkSession factory with scale-aware defaults
- ``sources``    : explicit schemas + readers for the kiln tables and the
                   benchmark corpus (TPC-H-ish parquet)
- ``operators``  : time-series operators (spine/resample/fill/interpolate),
                   window feature engine (lag/rolling/anomaly), interval &
                   as-of joins, pivot/melt, dedup, similarity search
- ``functions``  : scalar expression builders (safe division, flags, text
                   analysis, fingerprinting)
- ``plans``      : end-to-end pipelines (kiln preprocessing, serving views)
- ``streaming``  : Structured Streaming equivalents of the serving loop
"""

__version__ = "0.1.0"
