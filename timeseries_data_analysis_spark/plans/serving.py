"""Serving layer: the dashboard's read queries as SQL views (SURVEY.md §2.12).

The reference's Dash callbacks each deserialize a JSON blob and re-run
pandas slicing per browser tick (``dashboard.py:782-1935``). Here each
chart is a named SQL view over the (streaming-updated) tables: a serving
tier issues plain SQL, Catalyst prunes/pushes down per query, and the
same views work over batch parquet or a streaming sink's output table.

``register_views(spark)`` expects the kiln tables as temp views
(``mis_report``, ``shell_temperature``, ``zone_temperature_long``,
``accretion_events``) and creates one view per dashboard chart.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# view name → SQL (kept as plain strings: the serving tier IS SQL)
VIEWS: dict[str, str] = {
    # zone temp trends: time filter + stride-sample + multi-series select
    # (dashboard.py:1437-1498) — stride via row_number per series
    "v_zone_trends": """
        SELECT ts, series, value FROM (
            SELECT ts, series, value,
                   row_number() OVER (PARTITION BY series ORDER BY ts) AS rn
            FROM zone_temperature_long
            WHERE ts >= to_timestamp('{start}') )
        WHERE (rn - 1) % {stride} = 0
    """,
    # production quality: per-day grades + % share with zero-guard
    # (dashboard.py:1500-1653)
    "v_production_quality": """
        SELECT DATE AS day,
               `PRODUCTION ACTUAL` AS production,
               GRADE_A, GRADE_B,
               CASE WHEN `PRODUCTION ACTUAL` <> 0
                    THEN GRADE_A * 100.0 / `PRODUCTION ACTUAL` ELSE 0.0
               END AS grade_a_pct
        FROM mis_report
    """,
    # material consumption + ore/coal ratio (dashboard.py:1655-1736)
    "v_material_consumption": """
        SELECT DATE AS day,
               `IRON ORE CONSUMPTION` AS iron_ore,
               `GROSS COAL CONSUMPTION` AS gross_coal,
               PELLETS_CONSUMPTION AS pellets,
               CASE WHEN `GROSS COAL CONSUMPTION` <> 0
                    THEN `IRON ORE CONSUMPTION` / `GROSS COAL CONSUMPTION`
                    ELSE 0.0 END AS ore_coal_ratio
        FROM mis_report
    """,
    # quality vs accretion: mis ⋈ shell on DATE + row-sum severity
    # (dashboard.py:1841-1935)
    "v_quality_vs_accretion": """
        SELECT m.DATE AS day, m.GRADE_A, m.`PRODUCTION ACTUAL` AS production,
               s.mean_shell_temp
        FROM mis_report m
        INNER JOIN (
            SELECT DATE, avg(SHELL_TEMP_AVG) AS mean_shell_temp
            FROM shell_temperature GROUP BY DATE) s
        ON m.DATE = s.DATE
    """,
    # current parameters panel: latest-row probe (dashboard.py:926-1035)
    "v_latest_mis": """
        SELECT * FROM mis_report
        ORDER BY DATE DESC LIMIT 1
    """,
    # events timeline (the reference's dead 'historical-events' chart,
    # implemented properly): per-event duration + severity class
    "v_events_timeline": """
        SELECT EVENT_ID, START_DATE, CRITICAL_DATE, CLEARED_DATE, ZONE,
               DURATION_DAYS,
               CASE WHEN DURATION_DAYS >= 45 THEN 'severe'
                    WHEN DURATION_DAYS >= 25 THEN 'moderate'
                    ELSE 'mild' END AS severity_class
        FROM accretion_events
    """,
}


def register_views(spark: SparkSession, start: str = "1970-01-01",
                   stride: int = 10) -> list[str]:
    """Create every serving view; returns the view names."""
    names = []
    for name, sql in VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS "
                  + sql.format(start=start, stride=stride))
        names.append(name)
    return names
