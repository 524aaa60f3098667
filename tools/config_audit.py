"""Config-insensitivity audit: the full oracle gate under a HOSTILE
Spark config (SCALE.md §3).

Usage: python tools/config_audit.py [sf_dir] [query ...]

Creates the session FIRST with ``spark.sql.shuffle.partitions=200`` and
AQE disabled (the opposite of the tuned local defaults), then runs the
exact ``check_oracles`` comparison loop — ``getOrCreate`` inside the
gate returns this active session, so every query executes under the
hostile config. Asserts at the end that the hostile confs survived the
run (a query that silently reset them would invalidate the audit).

Result contract: identical hash-for-hash agreement with DuckDB — query
results must not depend on partition counts, AQE runtime re-planning,
or any tuned setting.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.appName("config-audit")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate())

    import check_oracles  # noqa: E402
    # getOrCreate RE-APPLIES builder options onto an active session, so
    # letting the gate call get_spark would silently restore the tuned
    # confs (measured: shuffle back to 32, AQE back on) — hand it the
    # hostile session directly instead.
    check_oracles.get_spark = lambda *a, **k: spark
    rc = check_oracles.main()

    assert spark.conf.get("spark.sql.shuffle.partitions") == "200", \
        "hostile shuffle partitions did not survive the run"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false", \
        "hostile AQE-off did not survive the run"
    print("hostile config survived: shuffle=200, AQE=off")
    sys.exit(rc)


if __name__ == "__main__":
    main()
