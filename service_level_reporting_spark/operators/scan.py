"""Scan/projection/scalar-function surface (SURVEY.md §2.1 S1, §2.2 P1, §2.7).

Reference anchors: table reads are SLR's SQLAlchemy model scans
(upstream:app/models [H]); column select/alias/cast mirrors the resource
serializers exposing API subsets (upstream:app/libs/resource.py [M]); the
scalar families are the date/string/math/JSON helpers used throughout
sli.py/report.py [H].

These are the "plumbing" rows of the operator inventory — trivial on purpose,
but each carries an oracle so the type-normalization layer (ns timestamps,
UTC session, cast policy) is hash-checked end to end, not just assumed.

S3 (JDBC catalog source) lives in sources/jdbc.py (option builder only:
testdata is parquet-only and no driver jar ships in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables


# S1 — normalized parquet scan: the ns-timestamp fix + schema is what's
# actually under test (every other query builds on this layer)
@register(
    "scan_events_normalized",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT event_type) AS n_types,
           min(ts) AS min_ts,
           max(ts) AS max_ts,
           CAST(min(event_id) AS BIGINT) AS min_event_id,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events
    """,
)
def scan_events_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


# P1 + F1/F2/F3/F4/F6 — projection/rename/cast (API serializers expose typed
# subsets [M]) and the scalar-function families in ONE checked per-row query
# (round-2 consolidation — both were narrow projections over the same rows):
# date/time (day-of-week buckets + formatted ts), string (slug), math
# (clamp/safe-div), JSON (props tag), conditional (band CASE), cast policy.
@register(
    "project_scalar_functions",
    oracle="""
    SELECT event_id AS id,
           CAST(user_id AS VARCHAR) AS entity,
           upper(event_type) AS indicator,
           CAST(trunc(value) AS BIGINT) AS value_int,  -- Spark CAST truncates; DuckDB rounds
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           strftime(ts, '%a')                                   AS weekday,
           lower(replace(event_type, 'e', '3'))                 AS slug,
           CAST(json_extract_string(props, '$.k') AS BIGINT)    AS tag_k,
           round(greatest(least(value, 95.0), 5.0), 6)          AS clamped,
           CASE WHEN value > 95.0 THEN 'high'
                WHEN value < 5.0  THEN 'low'
                ELSE 'ok' END                                   AS band,
           round(coalesce(value / nullif(CAST(json_extract_string(props, '$.k')
                                              AS BIGINT), 0), -1.0), 6) AS per_tag
    FROM events
    WHERE event_id < 500
    """,
)
def project_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.where(F.col("event_id") < 500).select(
        F.col("event_id").alias("id"),
        F.col("user_id").cast("string").alias("entity"),
        F.upper("event_type").alias("indicator"),
        F.col("value").cast("long").alias("value_int"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.date_format("ts", "E").alias("weekday"),
        F.lower(F.regexp_replace("event_type", "e", "3")).alias("slug"),
        k.alias("tag_k"),
        F.round(F.greatest(F.least("value", F.lit(95.0)), F.lit(5.0)), 6)
        .alias("clamped"),
        F.when(F.col("value") > 95.0, "high")
        .when(F.col("value") < 5.0, "low")
        .otherwise("ok").alias("band"),
        F.round(F.coalesce(F.col("value") / F.nullif(k, F.lit(0)), F.lit(-1.0)), 6)
        .alias("per_tag"),
    )
