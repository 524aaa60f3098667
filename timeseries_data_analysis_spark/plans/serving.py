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
    # accretion status panel (dashboard.py:812-924): latest zone temps vs
    # the per-zone threshold map (dashboard.py:869-872), count of low
    # zones, and the rule-based status — 'temperature_anomaly' at >=3 low
    # zones (dashboard.py:899-913). The model-probability input is a hook
    # (NULL here): the serving tier joins a predictions table when the ML
    # layer runs; the RULES are engine semantics and live in the view.
    "v_accretion_status": """
        WITH latest AS (
            SELECT series, value,
                   row_number() OVER (PARTITION BY series
                                      ORDER BY ts DESC) AS rn
            FROM zone_temperature_long
        ), thresholds(zone, thr) AS (
            VALUES (0, 750.0), (1, 775.0), (2, 800.0), (3, 825.0),
                   (4, 850.0), (5, 875.0), (6, 875.0), (7, 875.0),
                   (8, 850.0), (9, 825.0), (10, 800.0)
        ), flagged AS (
            SELECT CAST(regexp_extract(l.series, 'ZONE_(\\\\d+)', 1) AS INT)
                       AS zone,
                   l.value AS temp, t.thr,
                   CASE WHEN l.value < t.thr THEN 1 ELSE 0 END AS is_low
            FROM latest l
            JOIN thresholds t
              ON CAST(regexp_extract(l.series, 'ZONE_(\\\\d+)', 1) AS INT)
                 = t.zone
            WHERE l.rn = 1
        )
        SELECT zone, temp, thr, is_low,
               sum(is_low) OVER () AS n_low_zones,
               CASE WHEN sum(is_low) OVER () >= 3 THEN 'temperature_anomaly'
                    ELSE 'normal' END AS status,
               CAST(NULL AS DOUBLE) AS model_probability
        FROM flagged
    """,
    # material quality vs grades scatter source (dashboard.py:1738-1839):
    # column-pattern select (GRADE_* x material columns) emitted as the
    # long pairwise projection the scatter matrix plots.
    "v_quality_grades_scatter": """
        SELECT day, grade_name, grade_value, material_name, material_value
        FROM (
            SELECT DATE AS day,
                   g.grade_name,
                   CASE g.grade_name WHEN 'GRADE_A' THEN GRADE_A
                                     ELSE GRADE_B END AS grade_value,
                   m.material_name,
                   CASE m.material_name
                        WHEN 'IRON_ORE' THEN `IRON ORE CONSUMPTION`
                        WHEN 'GROSS_COAL' THEN `GROSS COAL CONSUMPTION`
                        ELSE PELLETS_CONSUMPTION END AS material_value
            FROM mis_report
            CROSS JOIN (VALUES ('GRADE_A'), ('GRADE_B')) g(grade_name)
            CROSS JOIN (VALUES ('IRON_ORE'), ('GROSS_COAL'),
                               ('PELLETS')) m(material_name)
        )
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
