"""KairosDB-response source — parse the nested JSON payload SLR consumes.

Reference: SLR POSTs a query to KairosDB and parses the response
(upstream:app/libs/zmon.py / sli.py response parsing [M], SURVEY.md §2.1 S2):

    {"queries": [{"results": [{
        "name": "...", "group_by": [{"group": {"key": "..."}}],
        "values": [[epoch_ms, value], ...]}]}]}

Spark-first shape: `from_json` with an explicit schema, `explode` down the
`queries[].results[]` nesting, then one more explode over the `values` pairs.
No fixture file exists, so the payload is synthesized (deterministically)
from `events` and parsed back — the parse path is the operator under test.

Scale note: in production this is `spark.read.json(path)` over raw response
dumps with the same explode pipeline; schema-on-read with an explicit schema
avoids the pathological infer-scan over TBs of JSON.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables

KAIROSDB_SCHEMA = T.StructType([
    T.StructField("queries", T.ArrayType(T.StructType([
        T.StructField("results", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("group_by", T.ArrayType(T.StructType([
                T.StructField("name", T.StringType()),
                T.StructField("group", T.MapType(T.StringType(), T.StringType())),
            ]))),
            T.StructField("values", T.ArrayType(T.ArrayType(T.DoubleType()))),
        ]))),
    ]))),
])


def parse_kairosdb_response(spark: SparkSession, payloads: DataFrame,
                            json_col: str = "payload") -> DataFrame:
    """payloads[json_col] (string) → rows (series_name, group_key, ts, value).

    Epoch milliseconds arrive as double inside the value pairs (KairosDB
    emits numbers); ts reconstruction is exact for the +-2^43 ms range.
    """
    parsed = payloads.select(
        F.from_json(F.col(json_col), KAIROSDB_SCHEMA).alias("r"))
    results = parsed.select(
        F.explode("r.queries").alias("q")).select(F.explode("q.results").alias("res"))
    return (
        results.select(
            F.col("res.name").alias("series_name"),
            F.element_at(F.col("res.group_by"), 1)["group"].alias("group_tags"),
            F.explode("res.values").alias("pair"),
        )
        .select(
            "series_name",
            F.col("group_tags").getItem("key").alias("group_key"),
            F.timestamp_micros(
                (F.element_at("pair", 1) * 1000).cast("long")).alias("ts"),
            F.element_at("pair", 2).alias("value"),
        )
    )


def synthesize_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a KairosDB-shaped JSON payload from the first minutes of
    `events` (deterministic; driver-side once, small)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    rows = (
        ev.where(F.col("ts") < F.lit("2024-01-01 02:00:00"))
        # cast through timestamp: unix_millis rejects TIMESTAMP_NTZ sources
        .select("event_type",
                F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
                "value")
        .collect()
    )
    series: dict[str, list[list[float]]] = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append([float(r["ms"]), r["value"]])
    payload = json.dumps({"queries": [{"results": [
        {"name": f"zmon.check.{name}",
         "group_by": [{"name": "tag", "group": {"key": name}}],
         "values": sorted(vals)}
        for name, vals in sorted(series.items())
    ]}]})
    return spark.createDataFrame([(payload,)], "payload string")


@register("source_kairosdb_json")  # rows-only: no JSON fixture file exists
def source_kairosdb_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = synthesize_payload(spark, sf_dir)
    points = parse_kairosdb_response(spark, payloads)
    return (
        points.groupBy("series_name", "group_key")
        .agg(F.count(F.lit(1)).alias("n_points"),
             F.round(F.avg("value"), 6).alias("avg_value"),
             F.min("ts").alias("first_ts"),
             F.max("ts").alias("last_ts"))
        .orderBy("series_name")
    )
