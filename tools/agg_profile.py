"""Decomposition profile of the four sf10 perf-weak agg headliners
(VERDICT r10 #1): where does the Spark time actually go — cache scan,
key computation, hash-agg kernel, or plan shape? Each variant is a
fresh-plan best-of-N (rebuild the DataFrame per run — reused frames
replay shuffle outputs and read ~20x fast). Output: one JSON blob on
stdout; feeds SCALE.md §8 and the r11 operator changes.

Variants per query:

resample_minute_avg (10M events, 1-week range):
  scan_count     filtered count(*) only — the scan floor
  scan_sum       + one ungrouped sum(value) — scan + trivial agg
  group_long     group on raw long minute bucket (unix_micros div), no
                 timestamp conversion until after the agg
  group_ts       the current shape (date_trunc minute + event_type)
  group_nokey    group on minute only (drop the string key) — isolates
                 the string-key hashing cost

slo_daily_health (10M events):
  scan_count     count(*) — scan floor
  day_agg_only   the day-level metrics WITHOUT n_users (30 groups)
  distinct_only  count(DISTINCT user_id) per day alone
  split_join     day_agg ⋈ distinct (two scans, each lighter stage 1)
  current        the registered two-stage (day,user) plan
  expand         single-pass with countDistinct (Catalyst Expand)

pricing_summary (60M lineitem):
  scan_count     filtered count(*)
  current        registered single-pass agg
  no_round       same without round() wrappers

dedup_exact (5M documents):
  scan_count     count(*)
  md5_count      groupBy(md5) count only — isolates md5 + shuffle
  current        registered query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark import registry
from service_level_reporting_spark.session import get_spark
from service_level_reporting_spark.tables import (
    cache_tables, clear_table_cache, events_between, load_tables)
from tools import floor_curve, scale_sweep

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

N = 5


def best(make_df, n: int = N) -> float:
    make_df().collect()                 # warm codegen/broadcast
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        make_df().collect()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4)


def main() -> None:
    spark = get_spark(app_name="slr-agg-profile", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    scale_sweep.ensure_built(spark)
    floor_curve.build_sf10(spark)
    sf = floor_curve.SF10
    clear_table_cache()
    cache_tables(spark, sf, ("lineitem", "events", "documents"))
    qs = registry.aux_queries()
    out: dict = {"metric": "agg_profile_sf10", "runs_per_variant": N}

    # ---- resample_minute_avg ------------------------------------------
    LO, HI = "2024-01-08", "2024-01-15"

    def ev():
        return events_between(spark, sf, LO, HI)

    r = {}
    r["scan_count"] = best(lambda: ev().agg(F.count(F.lit(1))))
    r["scan_sum"] = best(lambda: ev().agg(F.sum("value")))
    r["group_long"] = best(lambda: (
        ev().groupBy(((F.unix_micros(F.col("ts").cast("timestamp"))
                       / 60_000_000)
                      .cast("long")).alias("b"), "event_type")
        .agg(SF.r6(F.avg("value")).alias("avg_value"),
             F.count(F.lit(1)).alias("n_points"))
        .select(F.timestamp_micros(F.col("b") * 60_000_000).alias("minute"),
                "event_type", "avg_value", "n_points")))
    r["group_ts"] = best(lambda: qs["resample_minute_avg"](spark, sf))
    r["group_nokey"] = best(lambda: (
        ev().groupBy(SF.minute("ts").alias("minute"))
        .agg(SF.r6(F.avg("value")).alias("avg_value"),
             F.count(F.lit(1)).alias("n_points"))))
    out["resample_minute_avg"] = r
    print(f"resample: {r}", file=sys.stderr)

    # ---- slo_daily_health ----------------------------------------------
    def events_all():
        return load_tables(spark, sf, ("events",))["events"]

    is_err = F.col("event_type") == "error"
    err_value = F.when(is_err, F.col("value"))

    def day_agg_only():
        return (events_all()
                .groupBy(F.to_date("ts").alias("_d"))
                .agg(SF.r6(F.avg(err_value)).alias("avg_value"),
                     F.min(err_value).alias("min_value"),
                     F.max(err_value).alias("max_value"),
                     F.count(err_value).alias("n_points"),
                     SF.breach_count(err_value, 5.0, 95.0).alias("breaches"),
                     F.count(F.lit(1)).alias("n_total")))

    def distinct_only():
        return (events_all()
                .groupBy(F.to_date("ts").alias("_d"), "user_id")
                .agg(F.lit(1).alias("_one"))
                .groupBy("_d")
                .agg(F.count(F.lit(1)).alias("n_users")))

    def split_join():
        return day_agg_only().join(distinct_only(), "_d")

    def expand():
        return (events_all()
                .groupBy(F.to_date("ts").alias("_d"))
                .agg(SF.r6(F.avg(err_value)).alias("avg_value"),
                     F.count(err_value).alias("n_points"),
                     SF.breach_count(err_value, 5.0, 95.0).alias("breaches"),
                     F.count(F.lit(1)).alias("n_total"),
                     F.countDistinct("user_id").alias("n_users")))

    s = {}
    s["scan_count"] = best(lambda: events_all().agg(F.count(F.lit(1))))
    s["day_agg_only"] = best(day_agg_only)
    s["distinct_only"] = best(distinct_only)
    s["split_join"] = best(split_join)
    s["current"] = best(lambda: qs["slo_daily_health"](spark, sf))
    s["expand"] = best(expand)
    out["slo_daily_health"] = s
    print(f"slo: {s}", file=sys.stderr)

    # ---- pricing_summary -----------------------------------------------
    def li():
        return (load_tables(spark, sf, ("lineitem",))["lineitem"]
                .where(F.col("l_shipdate") <= F.lit("2000-09-02")))

    p = {}
    p["scan_count"] = best(lambda: li().agg(F.count(F.lit(1))))
    p["current"] = best(lambda: qs["pricing_summary"](spark, sf))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    p["no_round"] = best(lambda: (
        li().groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"),
             F.sum(disc_price), F.sum(charge), F.avg("l_quantity"),
             F.avg("l_extendedprice"), F.avg("l_discount"),
             F.count(F.lit(1)))))
    out["pricing_summary"] = p
    print(f"pricing: {p}", file=sys.stderr)

    # ---- dedup_exact -----------------------------------------------------
    def docs():
        return load_tables(spark, sf, ("documents",))["documents"]

    d = {}
    d["scan_count"] = best(lambda: docs().agg(F.count(F.lit(1))))
    d["md5_count"] = best(lambda: (
        docs().groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)))
    d["current"] = best(lambda: qs["dedup_exact"](spark, sf))
    out["dedup_exact"] = d
    print(f"dedup: {d}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
