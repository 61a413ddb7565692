"""Report/catalog queries — SLR's REST report surface re-expressed in Spark.

Reference: the weekly/monthly report endpoint aggregates SLI values per day,
counts SLO breaches, computes compliance, and joins the catalog hierarchy
(ProductGroup → Product → SLO → Target) for labels/ordering
(upstream:app/resources/report.py#get_report [H], SURVEY.md §2.4 A6–A11,
§2.3 J1, §2.6 O1–O3).

The testdata star dims stand in for the catalog (FIXTURES.md §A): broadcast
joins against `region`/`nation`/`customer` model the FK walk SLR does with
SQLAlchemy relationships.

Scale notes: dims are broadcast (no shuffle on the fact side); rollup is one
pass (Spark expands grouping sets in the partial aggregate); pagination uses
row_number over a global sort — at 100 TB you'd never deep-paginate anyway,
same as the reference's LIMIT/OFFSET REST pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables


# ---------------------------------------------------------------------------
# A7 — ratio SLI: error rate per day (classic ZMON SLI = errors/total [M])
# ---------------------------------------------------------------------------

@register(
    "report_error_rate_daily",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           count(*) AS n_total,
           round(count(CASE WHEN event_type = 'error' THEN 1 END) / count(*), 6)
               AS error_rate
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d')
    """,
)
def report_error_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    n_errors = F.count(F.when(F.col("event_type") == "error", F.lit(1)))
    n_total = F.count(F.lit(1))
    return ev.groupBy(SF.day_str("ts").alias("day")).agg(
        n_errors.alias("n_errors"),
        n_total.alias("n_total"),
        SF.r6(SF.safe_ratio(n_errors, n_total)).alias("error_rate"),
    )


# ---------------------------------------------------------------------------
# A9 — rollup totals: per (event_type, day), per event_type, grand total —
# the report's nested dict with subtotals as ONE grouping-sets pass [M]
# ---------------------------------------------------------------------------

@register(
    "report_rollup",
    oracle="""
    SELECT coalesce(event_type, 'ALL')             AS event_type,
           coalesce(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
           count(*)                                AS n_points,
           round(avg(value), 6)                    AS avg_value
    FROM events
    GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
    """,
)
def report_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.rollup(F.col("event_type"), SF.day_str("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_points"),
             SF.r6(F.avg("value")).alias("avg_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n_points",
            "avg_value",
        )
    )


# ---------------------------------------------------------------------------
# J1 — FK walk across broadcast dims (catalog joins: values→slo→product→group
# via SQLAlchemy relationships [H]); star analog: orders→customer→nation→region
# ---------------------------------------------------------------------------

@register(
    "report_region_revenue",
    oracle="""
    SELECT r.r_name AS region,
           n.n_name AS nation,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def report_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "region"))
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             SF.r2(F.sum("o_totalprice")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# A8 — distinct entities per window (exact; approx variant below is the
# 100 TB path: one pass, fixed memory, no exact-distinct shuffle explosion)
# ---------------------------------------------------------------------------

@register(
    "agg_distinct_users",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(DISTINCT user_id)  AS n_users,
           count(*)                 AS n_events
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d')
    """,
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy(SF.day_str("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("agg_distinct_users_approx")  # rows-only: HLL sketch is engine-specific
def agg_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy(SF.day_str("ts").alias("day")).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# A11 — percentile SLIs (p95 latency-style; KairosDB offers a percentile
# aggregator SLR can request [M]). Exact interpolated percentile matches
# DuckDB quantile_cont; approx_percentile is the scale path (rows-only).
# ---------------------------------------------------------------------------

@register(
    "agg_percentile",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        SF.r6(F.percentile("value", 0.50)).alias("p50"),
        SF.r6(F.percentile("value", 0.95)).alias("p95"),
        SF.r6(F.percentile("value", 0.99)).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register("agg_percentile_approx")  # rows-only: t-digest/GK sketch differs per engine
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# O1 — sorted pagination (list endpoints' LIMIT/OFFSET [M]); row_number over
# a deterministic (price, key) order so pages are stable in both engines
# ---------------------------------------------------------------------------

@register(
    "order_limit_paginate",
    oracle="""
    WITH ranked AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    SELECT o_orderkey, o_custkey, o_totalprice, rn
    FROM ranked WHERE rn > 20 AND rn <= 30
    """,
)
def order_limit_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice",
                 F.row_number().over(w).alias("rn"))
        .where((F.col("rn") > 20) & (F.col("rn") <= 30))
    )


# ---------------------------------------------------------------------------
# O2 — top-k heavy hitters ("worst minutes" in a report [L]); Spark plans
# this as TakeOrderedAndProject — no global sort materialization
# ---------------------------------------------------------------------------

@register(
    "topk_worst_minutes",
    oracle="""
    WITH per_minute AS (
        SELECT date_trunc('minute', ts) AS minute,
               round(avg(value), 6) AS avg_value,
               count(*) AS n
        FROM events WHERE event_type = 'error'
        GROUP BY date_trunc('minute', ts)
    )
    SELECT minute, avg_value, n
    FROM per_minute
    ORDER BY avg_value DESC, minute
    LIMIT 10
    """,
)
def topk_worst_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.where(F.col("event_type") == "error")
        .groupBy(SF.minute("ts").alias("minute"))
        .agg(SF.r6(F.avg("value")).alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("avg_value"), F.asc("minute"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# O3 — union of series (report iterates the SLIs of an SLO and stacks their
# series [H]); unionByName keeps it schema-safe when series diverge
# ---------------------------------------------------------------------------

@register(
    "union_series",
    oracle="""
    WITH stacked AS (
        SELECT 'err'  AS series, ts, value FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT 'buy' AS series, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT series, strftime(ts, '%Y-%m-%d') AS day,
           round(avg(value), 6) AS avg_value, count(*) AS n
    FROM stacked GROUP BY series, strftime(ts, '%Y-%m-%d')
    """,
)
def union_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    err = ev.where(F.col("event_type") == "error").select(
        F.lit("err").alias("series"), "ts", "value")
    buy = ev.where(F.col("event_type") == "purchase").select(
        F.lit("buy").alias("series"), "ts", "value")
    return (
        err.unionByName(buy)
        .groupBy("series", SF.day_str("ts").alias("day"))
        .agg(SF.r6(F.avg("value")).alias("avg_value"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# S5 — nested report JSON (response shaping in report.py [H]): day rows
# nested under the series key, serialized. JSON text differs between engines
# (key order/float formatting) → rows-only check; pytest pins the structure.
# ---------------------------------------------------------------------------

@register("report_nested_json")
def report_nested_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.groupBy("event_type", SF.day_str("ts").alias("day"))
        .agg(SF.r6(F.avg("value")).alias("avg_value"), F.count(F.lit(1)).alias("n"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.to_json(
                F.array_sort(F.collect_list(F.struct("day", "avg_value", "n")))
            ).alias("report_json")
        )
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot — report matrix shaping (the nested product→slo→day report
# is a pivot in disguise; first-class here). Explicit value list => single
# pass, stable schema (no distinct-scan), which is the 100 TB form.
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "report_pivot_daily_matrix",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           round(avg(CASE WHEN event_type = 'click'    THEN value END), 6) AS click,
           round(avg(CASE WHEN event_type = 'error'    THEN value END), 6) AS error,
           round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
           round(avg(CASE WHEN event_type = 'signup'   THEN value END), 6) AS signup,
           round(avg(CASE WHEN event_type = 'view'     THEN value END), 6) AS view
    FROM events GROUP BY 1
    """,
)
def report_pivot_daily_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(SF.day_str("ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(SF.r6(F.avg("value")))
    )


@register(
    "report_unpivot_metrics",
    oracle="""
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               round(avg(value), 6) AS avg_value,
               round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value
        FROM events GROUP BY 1
    )
    SELECT day, 'avg_value' AS metric, avg_value AS value FROM d
    UNION ALL SELECT day, 'min_value', min_value FROM d
    UNION ALL SELECT day, 'max_value', max_value FROM d
    """,
)
def report_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wide = (
        ev.groupBy(SF.day_str("ts").alias("day"))
        .agg(SF.r6(F.avg("value")).alias("avg_value"),
             SF.r6(F.min("value")).alias("min_value"),
             SF.r6(F.max("value")).alias("max_value"))
    )
    return wide.unpivot(
        ids=["day"], values=["avg_value", "min_value", "max_value"],
        variableColumnName="metric", valueColumnName="value")


# ---------------------------------------------------------------------------
# A9 sibling — CUBE with grouping_id: all 4 grouping combinations of
# (event_type, user-bucket) in one pass. grouping_id disambiguates real
# NULLs from subtotal rows — the robust form of the coalesce('ALL') idiom.
# ---------------------------------------------------------------------------

@register(
    "report_cube_grouping_id",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_bucket,
           GROUPING(event_type) * 2 + GROUPING(user_id % 10) AS gid,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY CUBE(event_type, user_id % 10)
    """,
)
def report_cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    bucket = (F.col("user_id") % 10).cast("string").alias("user_bucket")
    return (
        ev.cube(F.col("event_type"), bucket)
        .agg(F.grouping_id().alias("gid"),
             F.count(F.lit(1)).alias("n"),
             SF.r6(F.avg("value")).alias("avg_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("user_bucket", F.lit("ALL")).alias("user_bucket"),
            "gid", "n", "avg_value",
        )
    )


# ---------------------------------------------------------------------------
# Per-series SLO targets as a DIMENSION (the reference's real shape: each
# Indicator has its own Target row, applied by join — not a global literal
# band). Tiny targets dim broadcasts; breach logic is the same A5 CASE.
# ---------------------------------------------------------------------------

SERIES_TARGETS = [  # (event_type, target_lo, target_hi)
    ("click", 5.0, 95.0),
    ("error", 0.0, 60.0),
    ("purchase", 10.0, 99.0),
    ("signup", 2.0, 90.0),
    ("view", 1.0, 98.0),
]

_TARGETS_SQL = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in SERIES_TARGETS)


@register(
    "slo_breaches_per_target_dim",
    oracle=f"""
    WITH targets(event_type, lo, hi) AS (VALUES {_TARGETS_SQL})
    SELECT e.event_type,
           strftime(e.ts, '%Y-%m-%d') AS day,
           count(*) AS n,
           count(CASE WHEN e.value < t.lo OR e.value > t.hi THEN 1 END)
               AS breaches,
           round(1.0 - count(CASE WHEN e.value < t.lo OR e.value > t.hi
                                  THEN 1 END) * 1.0 / count(*), 6)
               AS compliance
    FROM events e JOIN targets t USING (event_type)
    GROUP BY e.event_type, strftime(e.ts, '%Y-%m-%d')
    """,
)
def slo_breaches_per_target_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    targets = spark.createDataFrame(
        SERIES_TARGETS, "event_type string, lo double, hi double")
    breach = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(targets), "event_type")
        .groupBy("event_type", SF.day_str("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.count(F.when(breach, 1)).alias("breaches"),
             SF.r6(1.0 - F.count(F.when(breach, 1)) / F.count(F.lit(1)))
             .alias("compliance"))
    )


# ---------------------------------------------------------------------------
# GROUPING SETS through the engine's SQL entry path: the same Catalyst plan
# the DataFrame API produces, declared as SQL over registered views —
# demonstrating that the full spark.sql() surface is first-class here.
# ---------------------------------------------------------------------------

@register(
    "report_grouping_sets_sql",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_bucket,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10))
    """,
)
def report_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from service_level_reporting_spark.tables import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql("""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(CAST(user_id % 10 AS STRING), 'ALL') AS user_bucket,
               count(*) AS n,
               round(avg(value), 6) AS avg_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10))
    """)


# ---------------------------------------------------------------------------
# NTILE quartiles — distribution reporting (latency-quartile style).
# ---------------------------------------------------------------------------

@register(
    "report_value_quartiles",
    oracle="""
    SELECT event_type, q,
           count(*) AS n,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi
    FROM (SELECT event_type, value,
                 ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
                     AS q
          FROM events)
    GROUP BY event_type, q
    """,
)
def report_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(4).over(w).alias("q"))
        .groupBy("event_type", "q")
        .agg(F.count(F.lit(1)).alias("n"),
             SF.r6(F.min("value")).alias("lo"),
             SF.r6(F.max("value")).alias("hi"))
    )


# ---------------------------------------------------------------------------
# Fixed-width value histogram (width_bucket): distribution reporting with
# deterministic bucket edges — unlike ntile, bucket boundaries are
# data-independent, so histograms from different partitions/days merge by
# simple addition (the property that matters for incremental 100 TB rollups).
# ---------------------------------------------------------------------------

HIST_LO, HIST_HI, HIST_NBUCKETS = 0.0, 100.0, 20


@register(
    "report_value_histogram",
    oracle=f"""
    -- DuckDB 1.0.0 has no width_bucket; same arithmetic spelled out
    SELECT event_type,
           CASE WHEN value < {HIST_LO} THEN 0
                WHEN value >= {HIST_HI} THEN {HIST_NBUCKETS} + 1
                ELSE CAST(floor((value - {HIST_LO})
                     / (({HIST_HI} - {HIST_LO}) / {HIST_NBUCKETS})) AS BIGINT) + 1
           END AS bucket,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def report_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    bucket = F.width_bucket(
        "value", F.lit(HIST_LO), F.lit(HIST_HI), F.lit(HIST_NBUCKETS))
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
