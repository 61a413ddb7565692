"""Sinks — idempotent per-minute SLI upsert (SURVEY.md §2.1 S4).

Reference: SLR upserts per-minute rows into Postgres on conflict
`(indicator_id, timestamp)` so re-running an overlapping window never
duplicates [H]. Spark-first equivalent: partitioned parquet with DYNAMIC
partition overwrite — re-writing a day replaces exactly that day's
partition; within a batch, `dropDuplicates` on the natural key.

At 100 TB the same contract is a Delta/Iceberg `MERGE INTO` on
(indicator, minute); the partition-overwrite variant here is the
pure-parquet mechanism with identical idempotence semantics, and the
day-partitioned layout is what makes report time-range scans prune.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables


def write_minute_rollup(df: DataFrame, path: str) -> None:
    """Write (indicator, minute, value...) rows partitioned by day with
    dynamic partition overwrite — the idempotent upsert unit is a day."""
    (
        df.withColumn("day", F.to_date("minute"))
        .repartition("day")  # one writer task per partition -> no small files
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )


def minute_rollup(ev: DataFrame, time_filter=None) -> DataFrame:
    df = ev if time_filter is None else ev.where(time_filter)
    return (
        df.groupBy(F.col("event_type").alias("indicator"),
                   SF.minute("ts").alias("minute"))
        .agg(F.round(F.avg("value"), 6).alias("value"),
             F.count(F.lit(1)).alias("n_points"))
    )


@register("sink_upsert_minute")  # rows-only: sink semantics, asserted via re-read
def sink_upsert_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write minute rollups for days 1-7, then RE-write days 4-7 (overlap);
    idempotence holds iff the re-read equals the one-shot result — returned
    row counts/aggregates let the driver (and pytest) pin that."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    out = os.path.join(tempfile.gettempdir(), "slr_spark_sink_upsert")

    first = minute_rollup(ev, (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08"))
    write_minute_rollup(first, out)
    # Overlapping re-run (the updater's backfill window, upstream:app/updater.py [M])
    rerun = minute_rollup(ev, (F.col("ts") >= "2024-01-04") & (F.col("ts") < "2024-01-08"))
    write_minute_rollup(rerun, out)

    return (
        spark.read.parquet(out)
        .groupBy("indicator")
        .agg(F.count(F.lit(1)).alias("n_minutes"),
             F.countDistinct("minute").alias("n_distinct_minutes"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("indicator")
    )
