"""Relational completeness operators over the star schema.

The reference's catalog queries are simple FK joins + sorts (SQLAlchemy over
Postgres); these queries extend that surface to the full join/set-op algebra
an analytics engine needs at scale (SURVEY.md §2.3 J2/J4–J6, §2.6 O4,
§2.4 A10) — origin N (scale mandate), marked as such in SURVEY §2.

Scale notes:
* `pricing_summary` / `top_revenue_orders` are the bench headliners — single
  scan each, partial agg before shuffle, broadcast for the small side.
* `join_large_smj` explicitly disables broadcast to exercise the sort-merge
  path that a 100 TB fact⋈fact join must take; AQE handles skew/coalesce.
* `join_asof` uses the union+last(ignorenulls) window trick — one shuffle on
  the series key, no per-row subqueries; this is the standard Spark as-of
  pattern when there is no native ASOF join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary (BASELINE.md headline #1)
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_extendedprice), 6)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            SF.r2(F.sum("l_quantity")).alias("sum_qty"),
            SF.r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            SF.r2(F.sum(disc_price)).alias("sum_disc_price"),
            SF.r2(F.sum(charge)).alias("sum_charge"),
            SF.r6(F.avg("l_quantity")).alias("avg_qty"),
            SF.r6(F.avg("l_extendedprice")).alias("avg_price"),
            SF.r6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3-style: 3-way join + agg + top-10 (BASELINE.md headline #2).
# Deterministic top-10: order by rounded revenue, then orderkey.
# ---------------------------------------------------------------------------

@register(
    "top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey AS o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_day
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    # Join order matters at scale: broadcast the filtered customer dim onto
    # orders FIRST (map-side, no shuffle), so only the ~1/5 of orders in the
    # segment reach the big lineitem join's shuffle.
    orders_in_seg = (
        t["orders"]
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    # r5: AGGREGATE-BEFORE-JOIN. Revenue per order is independent of the
    # customer filter (it sums an order's own lineitems), so the lineitem
    # side pre-aggregates on l_orderkey BEFORE the join: the partial agg
    # collapses ~4 lineitems/order map-side and the exchange carries ~15M
    # aggregated rows instead of 60M raw rows at sf10 — measured 3.8 ->
    # 3.1 s same-window best-of-5 (value-identical results). At 100 TB the
    # win compounds: lineitem at rest is clustered by orderkey, so the
    # partial agg collapses fully and the join input shrinks 4x before any
    # network. SHUFFLE_HASH on the filtered orders side as before (build
    # side bounded by AQE skew split; SHJ spills since Spark 3).
    li_rev = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("rev_raw"))
    )
    return (
        li_rev.join(orders_in_seg.hint("SHUFFLE_HASH"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_orderkey").alias("o_orderkey"),
                SF.r2(F.col("rev_raw")).alias("revenue"),
                SF.day_str("o_orderdate").alias("order_day"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J2 — large⋈large sort-merge join (fact⋈fact; broadcast explicitly off so
# the SMJ path is exercised — the only viable strategy at 100 TB)
# ---------------------------------------------------------------------------

@register(
    "join_large_smj",
    oracle="""
    SELECT o.o_orderpriority,
           count(DISTINCT o.o_orderkey) AS n_orders,
           count(*) AS n_lineitems,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
)
def join_large_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].where(F.col("o_orderstatus") == "F").hint("merge")
    return (
        orders.join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lineitems"),
            SF.r2(F.sum("l_extendedprice")).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# J4 + O4 — semi/anti joins (report skips products without data in window
# [M]) and set ops on entity keys across windows (retained/churned users),
# one labeled result (round-2 consolidation — all four parts are
# "membership of a key set" questions answered as segment counts).
# ---------------------------------------------------------------------------

@register(
    "join_semi_anti_setops",
    oracle="""
    WITH fo AS (
        SELECT a.user_id AS au, b.user_id AS bu
        FROM (SELECT DISTINCT user_id FROM events
              WHERE ts < TIMESTAMP '2024-01-15') a
        FULL JOIN (SELECT DISTINCT user_id FROM events
                   WHERE ts >= TIMESTAMP '2024-01-15') b
        ON a.user_id = b.user_id
    )
    SELECT 'with_orders' AS segment, count(*) AS n
    FROM customer c WHERE c.c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders', count(*)
    FROM customer c WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'retained', count(*) FROM (
        SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-15'
        INTERSECT
        SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-15')
    UNION ALL
    SELECT 'churned', count(*) FROM (
        SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '2024-01-15'
        EXCEPT
        SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-15')
    UNION ALL
    SELECT 'outer_both', count(*) FROM fo
    WHERE au IS NOT NULL AND bu IS NOT NULL
    UNION ALL
    SELECT 'outer_first_only', count(*) FROM fo
    WHERE bu IS NULL
    UNION ALL
    SELECT 'outer_second_only', count(*) FROM fo
    WHERE au IS NULL
    """,
)
def join_semi_anti_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins, set ops, AND the full-outer reconciliation of the
    same cohort split — three different operator families answering the
    same retention question, which is exactly why each needs its own plan:
    semi/anti never materialize the right side's columns, INTERSECT/EXCEPT
    dedup both sides, FULL OUTER keeps every key with per-side presence
    (the shape audits/backfills use to find rows missing from either
    side). All shuffle on the key only."""
    from pyspark import StorageLevel

    t = load_tables(spark, sf_dir, ("customer", "orders", "events"))
    on = F.col("c_custkey") == F.col("o_custkey")

    def seg(df, label):
        return (df.agg(F.count(F.lit(1)).alias("n"))
                .select(F.lit(label).alias("segment"), "n"))

    semi = seg(t["customer"].join(t["orders"], on, "left_semi"), "with_orders")
    anti = seg(t["customer"].join(t["orders"], on, "left_anti"), "without_orders")
    ev = t["events"]
    cut = F.lit("2024-01-15")
    # r13 (guide §2.3): each window's distinct-user set feeds THREE
    # consumers (intersect, except, full-outer) — unpersisted, the raw
    # events scan + distinct shuffle ran three times per window
    # (plans/r13/join_semi_anti_setops_before.txt: 10 scans). The sets
    # are small (distinct user ids); one scan + one distinct each now.
    w1 = (ev.where(F.col("ts") < cut).select("user_id").distinct()
          .persist(StorageLevel.MEMORY_AND_DISK))
    w2 = (ev.where(F.col("ts") >= cut).select("user_id").distinct()
          .persist(StorageLevel.MEMORY_AND_DISK))
    retained = seg(w1.intersect(w2), "retained")
    churned = seg(w1.exceptAll(w2), "churned")
    fo = (w1.select(F.col("user_id").alias("au"))
          .join(w2.select(F.col("user_id").alias("bu")),
                F.col("au") == F.col("bu"), "full_outer"))
    outer = fo.agg(
        F.count(F.when(F.col("au").isNotNull()
                       & F.col("bu").isNotNull(), 1)).alias("outer_both"),
        F.count(F.when(F.col("bu").isNull(), 1)).alias("outer_first_only"),
        F.count(F.when(F.col("au").isNull(), 1)).alias("outer_second_only"),
    ).selectExpr(
        "stack(3, 'outer_both', outer_both, "
        "'outer_first_only', outer_first_only, "
        "'outer_second_only', outer_second_only) AS (segment, n)")
    return (semi.unionByName(anti).unionByName(retained)
            .unionByName(churned).unionByName(outer))


# ---------------------------------------------------------------------------
# J5 — range/interval join + per-series target dimension, one labeled
# result (round-2 consolidation — both are "tiny band/target table joined
# onto the fact" shapes, broadcast → no shuffle on the fact side):
#   'value_band'  — classify each value into its enclosing half-open band
#     (target bands as a JOIN instead of literal predicates — the general
#     form of SLR's target check); range-predicate join → broadcast BNLJ.
#   'target_dim'  — each Indicator has its OWN Target row applied by
#     equi-join (the reference's real shape — not a global literal band),
#     daily breach/compliance per series.
# ---------------------------------------------------------------------------

BANDS = [  # (band, lo, hi) — half-open [lo, hi) so bands partition the line
    ("low", 0.0, 25.0),
    ("mid", 25.0, 75.0),
    ("high", 75.0, 150.0),
    ("extreme", 150.0, 1e9),
]

SERIES_TARGETS = [  # (event_type, target_lo, target_hi)
    ("click", 5.0, 95.0),
    ("error", 0.0, 60.0),
    ("purchase", 10.0, 99.0),
    ("signup", 2.0, 90.0),
    ("view", 1.0, 98.0),
]

_TARGETS_SQL = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in SERIES_TARGETS)


@register(
    "join_range_targets",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 25.0), ('mid', 25.0, 75.0),
               ('high', 75.0, 150.0), ('extreme', 150.0, 1e9)
    ),
    targets(event_type, lo, hi) AS (VALUES {_TARGETS_SQL})
    SELECT 'value_band' AS part, b.band AS key1, CAST(NULL AS VARCHAR) AS key2,
           count(*) AS n, CAST(NULL AS BIGINT) AS breaches,
           round(avg(e.value), 6) AS metric
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    UNION ALL
    SELECT 'target_dim', e.event_type, strftime(e.ts, '%Y-%m-%d'),
           count(*),
           count(CASE WHEN e.value < t.lo OR e.value > t.hi THEN 1 END),
           round(1.0 - count(CASE WHEN e.value < t.lo OR e.value > t.hi
                                  THEN 1 END) * 1.0 / count(*), 6)
    FROM events e JOIN targets t USING (event_type)
    GROUP BY e.event_type, strftime(e.ts, '%Y-%m-%d')
    """,
)
def join_range_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    bands = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    value_band = (
        ev.join(F.broadcast(bands),
                (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), SF.r6(F.avg("value")).alias("metric"))
        .select(F.lit("value_band").alias("part"),
                F.col("band").alias("key1"),
                F.lit(None).cast("string").alias("key2"),
                "n", F.lit(None).cast("long").alias("breaches"), "metric")
    )
    targets = spark.createDataFrame(
        SERIES_TARGETS, "event_type string, lo double, hi double")
    breach = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    target_dim = (
        ev.join(F.broadcast(targets), "event_type")
        .groupBy("event_type", SF.day_str("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.count(F.when(breach, 1)).alias("breaches"),
             SF.r6(1.0 - F.count(F.when(breach, 1)) / F.count(F.lit(1)))
             .alias("metric"))
        .select(F.lit("target_dim").alias("part"),
                F.col("event_type").alias("key1"),
                F.col("day").alias("key2"), "n", "breaches", "metric")
    )
    return value_band.unionByName(target_dim)


# ---------------------------------------------------------------------------
# J6 — as-of join: for each purchase, the latest error value for the same
# user at-or-before the purchase time ("latest target/config version at event
# time" pattern). Spark has no ASOF JOIN: union both sides, carry the error
# value forward with last(ignorenulls) over (user, ts), keep purchase rows.
# One shuffle on user_id; no per-row lookups. Oracle: DuckDB native ASOF.
# ---------------------------------------------------------------------------

@register(
    "join_asof",
    oracle="""
    -- errors are pre-aggregated to ONE row per (user_id, ts) — max(value) —
    -- so duplicate-timestamp error rows can't make the ASOF match
    -- nondeterministic (both engines would otherwise pick arbitrarily)
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           p.ts AS purchase_ts,
           e.value AS last_error_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value
                    FROM events WHERE event_type = 'error'
                    GROUP BY user_id, ts) e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("double").alias("err_v"),
        F.lit(1).alias("is_p"))
    # Deterministic tie rule (mirrored in the oracle): collapse error rows
    # sharing (user_id, ts) to max(value) BEFORE the as-of alignment.
    errors = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_v"))
        .select(F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
                "err_v", F.lit(0).alias("is_p")))
    unioned = purchases.unionByName(errors)
    # Order by (ts, is_p, event_id): an error AT the same instant as a
    # purchase sorts first, matching ASOF's p.ts >= e.ts inclusivity;
    # event_id makes the total order unique for tied purchases.
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").asc(), F.col("is_p").asc(), F.col("event_id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        unioned.withColumn("last_error_value", F.last("err_v", ignorenulls=True).over(w))
        .where(F.col("is_p") == 1)
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"), "last_error_value")
    )


# ---------------------------------------------------------------------------
# A10 — partial/final aggregation identity: avg computed by the engine's
# two-phase hash agg must equal sum/count done explicitly (guards against
# avg-of-avgs style bugs in any future custom aggregate). Since round 2 this
# is a pytest-pinned property (tests/test_physical_plans.py asserts the
# partial/final plan shape; tests/test_differential.py the identity) rather
# than a registry entry — the two-phase agg itself is exercised by every
# grouped query above.
# ---------------------------------------------------------------------------

def agg_partial_final_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        SF.r6(F.avg("value")).alias("avg_direct"),
        SF.r6(F.sum("value") / F.count("value")).alias("avg_manual"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q5-style: 5-way star join (region-filtered local-supplier volume).
# The deep-star shape exercises Catalyst's join reordering: all four dims
# broadcast, the lineitem⋈orders backbone is the only shuffled pair.
# ---------------------------------------------------------------------------

@register(
    "regional_supplier_volume",
    # r12 (VERDICT #7) rotation: J1 FK-broadcast-join coverage in the
    # driver window is carried by report_region_revenue; this second J1
    # row moved to aux (still SQL-oracled in the pytest differential)
    # to make room for agg_time_weighted (A12) in the 50-row window.
    aux=True,
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir,
                    ("customer", "orders", "lineitem", "supplier",
                     "nation", "region"))
    nr = (t["nation"]
          .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("n_nationkey", "n_name"))
    sup = (t["supplier"]
           .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_nationkey", "n_name"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(SF.r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )
