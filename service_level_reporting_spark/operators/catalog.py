"""Catalog entities as DATA — the reference's ProductGroup → Product → SLO
→ Target hierarchy (upstream:app/resources/{product_group,product,slo,
target}.py [H]) synthesized as real dimension DataFrames and exercised
end-to-end as the FK walk every report performs.

Testdata ships no catalog tables, so the dims are built deterministically
from literal rows (same recipe as relational.SERIES_TARGETS, extended to a
4-level chain); the SQL oracle sees the identical rows as VALUES CTEs, so
the full walk is value-hash-checked.

Scale notes (100 TB): the catalog is tiny by construction (thousands of
rows against billions of datapoints) — it is pre-joined into ONE flat
denormalized dim on the driver-side-free path (all joins broadcast, no
shuffle), then broadcast onto the fact scan. The fact side shuffles only
for the final groupBy on the report grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# (pg_id, pg_name)
PRODUCT_GROUPS = [(i, f"group_{name}") for i, name in
                  enumerate(("infrastructure", "shop", "platform"), start=1)]

# (p_id, pg_id, p_name) — FK onto product_group
PRODUCTS = [(p, (p % len(PRODUCT_GROUPS)) + 1, f"product_{p}")
            for p in range(1, 9)]

# (slo_id, p_id, title) — FK onto product
SLOS = [(s, (s % len(PRODUCTS)) + 1, f"slo_{s}") for s in range(1, 13)]

# (target_id, slo_id, event_type, lo, hi) — FK onto slo; each SLO tracks one
# indicator series against its own band
TARGETS = [(100 + s, s, EVENT_TYPES[s % len(EVENT_TYPES)],
            float(s % 7), 95.0 - (s % 11)) for s, _, _ in SLOS]


def _values_sql(rows) -> str:
    def lit(v):
        return f"'{v}'" if isinstance(v, str) else repr(v)
    return ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)


def _local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Literal rows as a JVM-side LocalRelation (`VALUES` + cast projection).

    `spark.createDataFrame` would parallelize even a 12-row dim into a
    Python-pickled RDD over defaultParallelism partitions — every broadcast
    build of such a dim then pays a multi-task job with Python-worker
    round-trips (measured ~1 s/dim; ~6 s when coalesced to 1 task because
    the pickled partitions deserialize serially). A VALUES LocalRelation
    plans as `LocalTableScan`: broadcast builds collect it driver-side with
    no job and no Python workers."""
    fields = [f.strip().rsplit(" ", 1) for f in schema.split(",")]
    cols = ", ".join(f"c{i + 1}" for i in range(len(fields)))
    proj = ", ".join(f"CAST(c{i + 1} AS {typ}) AS {name}"
                     for i, (name, typ) in enumerate(fields))
    return spark.sql(
        f"SELECT {proj} FROM (VALUES {_values_sql(rows)}) AS t({cols})")


def catalog_dims(spark: SparkSession) -> dict[str, DataFrame]:
    """The four catalog dimensions as DataFrames (deterministic literals)."""
    return {
        "product_group": _local_df(
            spark, PRODUCT_GROUPS, "pg_id int, pg_name string"),
        "product": _local_df(
            spark, PRODUCTS, "p_id int, pg_id int, p_name string"),
        "slo": _local_df(spark, SLOS, "slo_id int, p_id int, title string"),
        "target": _local_df(
            spark, TARGETS, "target_id int, slo_id int, event_type string, "
                            "lo double, hi double"),
    }


# Per-session memo: a deployment keeps the resolved catalog resident (the
# reference loads it from Postgres once per report run, not per query), so
# the dim⋈dim walk is paid once per session, not once per query. Keyed by
# applicationId — stable per JVM app (id(spark._jsparkSession) is NOT: py4j
# hands out a fresh wrapper object per access).
_FLAT_MEMO: dict[str, DataFrame] = {}


def flat_catalog(spark: SparkSession) -> DataFrame:
    """Targets denormalized up the chain: target ⋈ slo ⋈ product ⋈ group.
    All four joins are broadcast (tiny dims) — zero shuffle. The collapsed
    dim is cached + memoized per session: every report query broadcasts the
    SAME resolved catalog instead of re-running the walk."""
    key = spark.sparkContext.applicationId
    if key not in _FLAT_MEMO:
        d = catalog_dims(spark)
        flat = (
            d["target"]
            .join(F.broadcast(d["slo"]), "slo_id")
            .join(F.broadcast(d["product"]), "p_id")
            .join(F.broadcast(d["product_group"]), "pg_id")
            .select("pg_name", "p_name", "slo_id", "title",
                    "event_type", "lo", "hi")
        )
        # Materialize the walk once and pin the result as a LocalRelation:
        # later queries broadcast a ready dim (no job, no Python workers)
        # instead of re-running the join tree. The collect is bounded by the
        # catalog size — same discipline as the IVF codebook cap, not a
        # fact-side collect.
        rows = [tuple(r) for r in flat.collect()]
        _FLAT_MEMO[key] = _local_df(
            spark, rows,
            "pg_name string, p_name string, slo_id int, title string, "
            "event_type string, lo double, hi double")
    return _FLAT_MEMO[key]


@register(
    "report_catalog_walk",
    oracle=f"""
    WITH product_group(pg_id, pg_name) AS (VALUES {_values_sql(PRODUCT_GROUPS)}),
         product(p_id, pg_id, p_name) AS (VALUES {_values_sql(PRODUCTS)}),
         slo(slo_id, p_id, title) AS (VALUES {_values_sql(SLOS)}),
         target(target_id, slo_id, event_type, lo, hi) AS
             (VALUES {_values_sql(TARGETS)})
    SELECT g.pg_name, p.p_name, s.slo_id, strftime(e.ts, '%Y-%m-%d') AS day,
           count(*) AS n,
           count(CASE WHEN e.value < t.lo OR e.value > t.hi THEN 1 END)
               AS breaches,
           round(1.0 - count(CASE WHEN e.value < t.lo OR e.value > t.hi
                                  THEN 1 END) * 1.0 / count(*), 6)
               AS compliance
    FROM events e
    JOIN target t        ON e.event_type = t.event_type
    JOIN slo s           ON t.slo_id = s.slo_id
    JOIN product p       ON s.p_id = p.p_id
    JOIN product_group g ON p.pg_id = g.pg_id
    GROUP BY g.pg_name, p.p_name, s.slo_id, strftime(e.ts, '%Y-%m-%d')
    """,
)
def report_catalog_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's weekly-report FK walk with targets-from-data: every
    SLO's band applied to its indicator series, rolled up per day, labeled
    through product → product-group. Each event row fans out to every SLO
    tracking its series — intended: one datapoint feeds many SLOs."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # Derive the day string BEFORE the fan-out join: one format per event
    # row instead of one per (event × matching-SLO) row.
    ev = ev.select("event_type", SF.day_str("ts").alias("day"), "value")
    cat = flat_catalog(spark)
    breach = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(cat), "event_type")
        .groupBy("pg_name", "p_name", "slo_id", "day")
        .agg(F.count(F.lit(1)).alias("n"),
             F.count(F.when(breach, 1)).alias("breaches"),
             SF.r6(1.0 - F.count(F.when(breach, 1)) / F.count(F.lit(1)))
             .alias("compliance"))
    )
