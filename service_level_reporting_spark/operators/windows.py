"""Window-function operators over SLI series.

Reference: "current value" of an indicator is the newest row per indicator
(`ORDER BY timestamp DESC LIMIT 1` [H]); the rest (moving average, rank,
delta, cumulative error budget) are natural report extensions marked origin-N
in SURVEY.md §2.5.

Scale notes: every window here partitions by a series key (event_type /
user_id) — Spark shuffles once on that key and sorts within partitions; no
global sort. `moving_average` uses a ROWS frame over the already-aggregated
daily series (30 rows per series), so the window input is tiny even at 100 TB
raw — aggregate first, window second is the pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables

from service_level_reporting_spark.operators.sli import TARGET_LO, TARGET_HI


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("event_type", SF.day_str("ts").alias("day"))
        .agg(F.avg("value").alias("v"),
             F.count(F.when(SF.is_breach(F.col("value"), TARGET_LO, TARGET_HI),
                            F.lit(1))).alias("breaches"))
    )


_DAILY_SQL = f"""
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, avg(value) AS v,
               count(CASE WHEN value < {TARGET_LO} OR value > {TARGET_HI}
                          THEN 1 END) AS breaches
        FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
"""


# W1 — newest row per series key ("current SLI value" [H])
@register(
    "latest_value_per_key",
    oracle="""
    SELECT user_id, event_type, ts, value
    FROM (
        SELECT user_id, event_type, ts, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def latest_value_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (Window.partitionBy("user_id", "event_type")
         .orderBy(F.desc("ts"), F.desc("event_id")))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "value")
    )


# W2 — trailing 7-day moving average of the daily series (ROWS frame)
@register(
    "moving_average_7d",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, day, round(v, 6) AS avg_value,
           round(avg(v) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
               AS ma7
    FROM daily
    """,
)
def moving_average_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0))
    return _daily(spark, sf_dir).select(
        "event_type", "day",
        SF.r6(F.col("v")).alias("avg_value"),
        SF.r6(F.avg("v").over(w)).alias("ma7"),
    )


# W3 — rank days by breach count within each series (report ordering [L])
@register(
    "rank_days_by_breaches",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, day, breaches,
           rank() OVER (PARTITION BY event_type
                        ORDER BY breaches DESC, day) AS breach_rank
    FROM daily
    """,
)
def rank_days_by_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy(F.desc("breaches"), F.asc("day"))
    return _daily(spark, sf_dir).select(
        "event_type", "day", "breaches", F.rank().over(w).alias("breach_rank"))


# W4 — day-over-day delta (lag) of the daily series
@register(
    "delta_vs_prev_day",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, day, round(v, 6) AS avg_value,
           round(v - lag(v) OVER (PARTITION BY event_type ORDER BY day), 6)
               AS delta
    FROM daily
    """,
)
def delta_vs_prev_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("day")
    return _daily(spark, sf_dir).select(
        "event_type", "day",
        SF.r6(F.col("v")).alias("avg_value"),
        SF.r6(F.col("v") - F.lag("v").over(w)).alias("delta"),
    )


# W5 — cumulative error budget burn (running breach total per series)
@register(
    "cumulative_error_budget",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT event_type, day, breaches,
           CAST(sum(breaches) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_breaches
    FROM daily
    """,
)
def cumulative_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    return _daily(spark, sf_dir).select(
        "event_type", "day", "breaches",
        F.sum("breaches").over(w).alias("cum_breaches"),
    )
