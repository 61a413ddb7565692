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


# A7 (error rate) and A8-exact (distinct users) live in sli.slo_daily_health
# since round 2: they share the events scan and the day grain with the
# flagship daily report, so they are served by the same single-pass
# aggregate (one job instead of three).


# ---------------------------------------------------------------------------
# A9 — the full grouping-sets family in ONE labeled pass (round-2
# consolidation): ROLLUP (the report's nested dict with subtotals [M]),
# CUBE + grouping_id (all 4 combos; gid disambiguates real NULLs from
# subtotal rows), and GROUPING SETS declared through the spark.sql() entry
# path — demonstrating the SQL surface is first-class. Spark expands each
# grouping set in the partial aggregate: one scan per part, no join.
# ---------------------------------------------------------------------------

@register(
    "report_rollup_cube_gsets",
    oracle="""
    SELECT 'rollup' AS part,
           coalesce(event_type, 'ALL')               AS event_type,
           coalesce(strftime(ts, '%Y-%m-%d'), 'ALL') AS key2,
           GROUPING(event_type) * 2
             + GROUPING(strftime(ts, '%Y-%m-%d'))    AS gid,
           count(*)                                  AS n_points,
           round(avg(value), 6)                      AS avg_value
    FROM events
    GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
    UNION ALL
    SELECT 'cube',
           coalesce(event_type, 'ALL'),
           coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL'),
           GROUPING(event_type) * 2 + GROUPING(user_id % 10),
           count(*),
           round(avg(value), 6)
    FROM events
    GROUP BY CUBE(event_type, user_id % 10)
    UNION ALL
    SELECT 'gsets',
           coalesce(event_type, 'ALL'),
           coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL'),
           GROUPING(event_type) * 2 + GROUPING(user_id % 10),
           count(*),
           round(avg(value), 6)
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10))
    """,
)
def report_rollup_cube_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from service_level_reporting_spark.tables import register_views

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    bucket = (F.col("user_id") % 10).cast("string").alias("user_bucket")

    def finish(grouped, part: str, key2: str):
        return (
            grouped.agg(F.grouping_id().alias("gid"),
                        F.count(F.lit(1)).alias("n_points"),
                        SF.r6(F.avg("value")).alias("avg_value"))
            .select(
                F.lit(part).alias("part"),
                F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
                F.coalesce(key2, F.lit("ALL")).alias("key2"),
                "gid", "n_points", "avg_value",
            )
        )

    rollup = finish(ev.rollup(F.col("event_type"), SF.day_str("ts").alias("day")),
                    "rollup", "day")
    cube = finish(ev.cube(F.col("event_type"), bucket), "cube", "user_bucket")
    register_views(spark, sf_dir, ("events",))
    gsets = spark.sql("""
        SELECT 'gsets' AS part,
               coalesce(event_type, 'ALL') AS event_type,
               coalesce(CAST(user_id % 10 AS STRING), 'ALL') AS key2,
               GROUPING(event_type) * 2 + GROUPING(user_id % 10) AS gid,
               count(*) AS n_points,
               round(avg(value), 6) AS avg_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10))
    """)
    return rollup.unionByName(cube).unionByName(gsets)


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


# A8-exact (count distinct users per day) lives in sli.slo_daily_health
# since round 2 (same scan, same grain). The APPROX variants — the 100 TB
# path: one pass, fixed memory, no exact-distinct shuffle explosion — are
# consolidated into report_sketch_summary below.


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


# ---------------------------------------------------------------------------
# Sketch summary (rows-only, round-2 consolidation of the approx family +
# nested-JSON shaping): per series, the HLL distinct-user estimate (A8
# approx), the t-digest p95 (A11 approx), and the S5 nested report JSON
# (day rows nested under the series key, serialized — engine-specific text,
# pytest pins the structure). These are the fixed-memory one-pass sketches
# that replace exact distinct/percentile at 100 TB.
# ---------------------------------------------------------------------------

@register("report_sketch_summary")  # rows-only: HLL/t-digest/JSON text differ per engine
def report_sketch_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.groupBy("event_type", SF.day_str("ts").alias("day"))
        .agg(SF.r6(F.avg("value")).alias("avg_value"), F.count(F.lit(1)).alias("n"))
    )
    nested = (
        daily.groupBy("event_type")
        .agg(
            F.to_json(
                F.array_sort(F.collect_list(F.struct("day", "avg_value", "n")))
            ).alias("report_json")
        )
    )
    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
        F.count(F.lit(1)).alias("n"),
    )
    # r4 session 2: the STORED-state sketch family rides in the same row —
    # the Count-Min heavy-hitter estimate for the busiest user per series
    # (operators/sketches.py; merged count matrices, exact-additive),
    # carried as cms_top_user_est next to the exact count so the driver
    # artifact records the one-sided-error claim, not just shape.
    # r5 (VERDICT item 6): the estimate is evaluated IN-FRAME — the merged
    # sketch rows broadcast-join the top-user probes and a vectorized
    # pandas_udf does the min-over-rows lookup. No collect: the same plan
    # holds at a high-cardinality group key, where the old driver-side
    # reassembly (collect + Python dict + createDataFrame) would not.
    from service_level_reporting_spark.operators.sketches import (
        cms_estimate_col, cms_merge, cms_partial)

    top_user = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .withColumn("rk", F.row_number().over(
            Window.partitionBy("event_type")
            .orderBy(F.desc("n_exact"), F.asc("user_id"))))
        .where(F.col("rk") == 1)
        .select("event_type", "user_id", "n_exact",
                F.xxhash64("user_id").alias("h"))
    )
    merged = (cms_merge(cms_partial(ev, ["event_type"], "user_id"),
                        ["event_type"])
              .select("event_type", "counts"))
    cms_df = (
        top_user.join(F.broadcast(merged), "event_type")
        .select("event_type",
                F.col("user_id").alias("top_user"),
                F.col("n_exact").alias("top_user_n_exact"),
                cms_estimate_col(F.col("counts"), F.col("h"))
                .alias("cms_top_user_est"))
    )
    return (sketches.join(nested, "event_type")
            .join(cms_df, "event_type").orderBy("event_type"))


# ---------------------------------------------------------------------------
# O1 + O2 — ordered pagination and top-k over ONE ranked series (round-2
# consolidation). One window pass ranks the per-minute error series; the
# 'topk' part is the report's worst-minutes heavy hitters, the 'page'
# part is the REST LIMIT/OFFSET page (rows 21-30) — same deterministic
# (value DESC, minute) order so pages are stable in both engines.
# ---------------------------------------------------------------------------

@register(
    "page_topk_minutes",
    oracle="""
    WITH ranked AS (
        SELECT minute, avg_value, n,
               row_number() OVER (ORDER BY avg_value DESC, minute) AS rn
        FROM (
            SELECT date_trunc('minute', ts) AS minute,
                   round(avg(value), 6) AS avg_value,
                   count(*) AS n
            FROM events WHERE event_type = 'error'
            GROUP BY date_trunc('minute', ts)
        )
    )
    SELECT CASE WHEN rn <= 10 THEN 'topk' ELSE 'page' END AS part,
           minute, avg_value, n, rn
    FROM ranked
    WHERE rn <= 10 OR (rn > 20 AND rn <= 30)
    """,
)
def page_topk_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_minute = (
        ev.where(F.col("event_type") == "error")
        .groupBy(SF.minute("ts").alias("minute"))
        .agg(SF.r6(F.avg("value")).alias("avg_value"), F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("avg_value"), F.asc("minute"))
    return (
        per_minute.select("minute", "avg_value", "n",
                          F.row_number().over(w).alias("rn"))
        .where((F.col("rn") <= 10) | ((F.col("rn") > 20) & (F.col("rn") <= 30)))
        .select(F.when(F.col("rn") <= 10, "topk").otherwise("page").alias("part"),
                "minute", "avg_value", "n", "rn")
    )


# ---------------------------------------------------------------------------
# O3 + pivot/unpivot — series stacking and matrix shaping as one labeled
# long-form result (round-2 consolidation):
#   'series' part — unionByName of two SLI series, daily stats (the report
#     iterates the SLIs of an SLO and stacks their series [H]).
#   'pivot_roundtrip' part — daily matrix via pivot (explicit value list =>
#     single pass, stable schema — the 100 TB form), then unpivot back to
#     long form; cells for (day × type) combos with no data survive as NULL
#     rows, which is the pivot-shape contract the oracle mirrors.
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "series_long_stack",
    oracle="""
    SELECT 'series' AS part, series, day, avg_value, n
    FROM (
        SELECT series, strftime(ts, '%Y-%m-%d') AS day,
               round(avg(value), 6) AS avg_value, count(*) AS n
        FROM (
            SELECT 'err' AS series, ts, value FROM events WHERE event_type = 'error'
            UNION ALL
            SELECT 'buy', ts, value FROM events WHERE event_type = 'purchase'
        ) GROUP BY series, strftime(ts, '%Y-%m-%d')
    )
    UNION ALL
    SELECT 'pivot_roundtrip', u.series, p.day, u.avg_value, NULL
    FROM (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               round(avg(CASE WHEN event_type = 'click'    THEN value END), 6) AS click,
               round(avg(CASE WHEN event_type = 'error'    THEN value END), 6) AS error,
               round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
               round(avg(CASE WHEN event_type = 'signup'   THEN value END), 6) AS signup,
               round(avg(CASE WHEN event_type = 'view'     THEN value END), 6) AS view
        FROM events GROUP BY 1
    ) p, LATERAL (VALUES ('click', p.click), ('error', p.error),
                         ('purchase', p.purchase), ('signup', p.signup),
                         ('view', p.view)) AS u(series, avg_value)
    """,
)
def series_long_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    err = ev.where(F.col("event_type") == "error").select(
        F.lit("err").alias("series"), "ts", "value")
    buy = ev.where(F.col("event_type") == "purchase").select(
        F.lit("buy").alias("series"), "ts", "value")
    series = (
        err.unionByName(buy)
        .groupBy("series", SF.day_str("ts").alias("day"))
        .agg(SF.r6(F.avg("value")).alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(F.lit("series").alias("part"), "series", "day", "avg_value", "n")
    )
    wide = (
        ev.groupBy(SF.day_str("ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(SF.r6(F.avg("value")))
    )
    roundtrip = (
        wide.unpivot(ids=["day"], values=list(EVENT_TYPES),
                     variableColumnName="series", valueColumnName="avg_value")
        .select(F.lit("pivot_roundtrip").alias("part"), "series", "day",
                "avg_value", F.lit(None).cast("long").alias("n"))
    )
    return series.unionByName(roundtrip)


# Per-series SLO targets as a DIMENSION (the reference's real shape) moved
# to relational.join_range_targets in round 2 — consolidated with the
# range-band join it shares its broadcast-tiny-dim shape with. The
# SERIES_TARGETS dim lives there.


# ---------------------------------------------------------------------------
# Distribution reporting as one labeled pass (round-2 consolidation):
#   'quartile' part — NTILE(4) data-dependent quartiles (latency-quartile
#     style), bucket = quartile index.
#   'hist' part — fixed-width histogram (width_bucket): deterministic
#     data-INdependent bucket edges, so histograms from different
#     partitions/days merge by simple addition (the property that matters
#     for incremental 100 TB rollups). lo/hi are the observed min/max value
#     inside each bucket for both parts.
# ---------------------------------------------------------------------------

HIST_LO, HIST_HI, HIST_NBUCKETS = 0.0, 100.0, 20


@register(
    "report_value_distribution",
    oracle=f"""
    SELECT 'quartile' AS part, event_type, q AS bucket,
           count(*) AS n,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi
    FROM (SELECT event_type, value,
                 ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
                     AS q
          FROM events)
    GROUP BY event_type, q
    UNION ALL
    -- DuckDB 1.0.0 has no width_bucket; same arithmetic spelled out
    SELECT 'hist', event_type,
           CASE WHEN value < {HIST_LO} THEN 0
                WHEN value >= {HIST_HI} THEN {HIST_NBUCKETS} + 1
                ELSE CAST(floor((value - {HIST_LO})
                     / (({HIST_HI} - {HIST_LO}) / {HIST_NBUCKETS})) AS BIGINT) + 1
           END AS bucket,
           count(*),
           round(min(value), 6),
           round(max(value), 6)
    FROM events GROUP BY 2, 3
    """,
)
def report_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    quartiles = (
        ev.select("event_type", "value", F.ntile(4).over(w).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             SF.r6(F.min("value")).alias("lo"),
             SF.r6(F.max("value")).alias("hi"))
        .select(F.lit("quartile").alias("part"), "event_type",
                F.col("bucket").cast("long").alias("bucket"), "n", "lo", "hi")
    )
    bucket = F.width_bucket(
        "value", F.lit(HIST_LO), F.lit(HIST_HI), F.lit(HIST_NBUCKETS))
    hist = (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             SF.r6(F.min("value")).alias("lo"),
             SF.r6(F.max("value")).alias("hi"))
        .select(F.lit("hist").alias("part"), "event_type",
                F.col("bucket").cast("long").alias("bucket"), "n", "lo", "hi")
    )
    return quartiles.unionByName(hist)


# ---------------------------------------------------------------------------
# r4 session 2 (aux) — the two classic event-analytics reports a monitoring
# /product stack runs on exactly this events shape; both fully SQL-oracled:
#   'retention' — cohort users by FIRST-SEEN day, count distinct active
#     users per (cohort_day, day-offset 0..7). Two-shuffle shape: distinct
#     (user, day) then a broadcastable per-user cohort join.
#   'funnel'    — strictly-ordered signup -> view -> purchase sequence per
#     user (each stage's first event must follow the previous stage's),
#     corpus-level stage survival counts. Sequential conditional mins =
#     three tiny per-user aggs chained by inequality joins.
# 100 TB: both shuffle on user_id (the natural event-log bucketing key —
# co-located buckets make every stage here exchange-free); the retention
# matrix is at most |cohorts| x 8 rows out.
# ---------------------------------------------------------------------------

@register(
    "report_user_analytics",
    aux=True,
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ), cohort AS (
        SELECT user_id, min(day) AS d0 FROM active GROUP BY user_id
    ), retention AS (
        SELECT 'retention' AS part,
               strftime(c.d0, '%Y-%m-%d') AS key,
               date_diff('day', c.d0, a.day) AS offset,
               count(DISTINCT a.user_id) AS n
        FROM active a JOIN cohort c USING (user_id)
        WHERE date_diff('day', c.d0, a.day) <= 7
        GROUP BY 2, 3
    ), s AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s.t1 GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > v.t2 GROUP BY e.user_id
    )
    SELECT * FROM retention
    UNION ALL
    SELECT 'funnel', 'signup', NULL, count(*) FROM s
    UNION ALL
    SELECT 'funnel', 'view_after_signup', NULL, count(*) FROM v
    UNION ALL
    SELECT 'funnel', 'purchase_after_view', NULL, count(*) FROM p
    """,
)
def report_user_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # r13 (guide §2.3): `active` feeds the cohort build AND the retention
    # join — persisted so the events scan + distinct shuffle run once
    active = (ev.select("user_id",
                        F.date_trunc("day", "ts").alias("day")).distinct()
              .persist(StorageLevel.MEMORY_AND_DISK))
    cohort = active.groupBy("user_id").agg(F.min("day").alias("d0"))
    offset = F.datediff(F.col("day"), F.col("d0")).cast("long")
    retention = (
        active.join(cohort, "user_id")
        .where(offset <= 7)
        .groupBy(F.date_format("d0", "yyyy-MM-dd").alias("key"),
                 offset.alias("offset"))
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.lit("retention").alias("part"), "key", "offset", "n")
    )

    def first_after(etype, prev, prev_col):
        e = ev.where(F.col("event_type") == etype).select("user_id", "ts")
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias("t"))
        return (e.join(prev, "user_id")
                .where(F.col("ts") > F.col(prev_col))
                .groupBy("user_id").agg(F.min("ts").alias("t")))

    s = first_after("signup", None, None)
    v = first_after("view", s.select("user_id",
                                     F.col("t").alias("t1")), "t1")
    p = first_after("purchase", v.select("user_id",
                                         F.col("t").alias("t2")), "t2")

    def stage(df, name):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("funnel").alias("part"), F.lit(name).alias("key"),
            F.lit(None).cast("long").alias("offset"), "n")

    return (retention
            .unionByName(stage(s, "signup"))
            .unionByName(stage(v, "view_after_signup"))
            .unionByName(stage(p, "purchase_after_view")))
